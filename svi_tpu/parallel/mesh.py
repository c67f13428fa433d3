"""Device meshes for SVI-TPU (behavioral analog of §2.4 in SURVEY.md:
the reference's NCCL/xfuser process groups become `jax.sharding.Mesh` axes).

Axes:
  'data' — data parallel (training batches; CFG cond/uncond pairs at inference)
  'sp'   — sequence parallel over the f·h·w token axis (ICI collectives)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, sp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if sp is None:
        sp = n // data
    assert data * sp == n, f"mesh {data}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(data, sp)
    return Mesh(arr, axis_names=("data", "sp"))


def make_sp_mesh(devices=None) -> Mesh:
    """All devices on the sequence axis (inference USP analog)."""
    return make_mesh(data=1, sp=None, devices=devices)


def make_training_mesh(strategy: str, devices=None) -> Mesh | None:
    """Mesh for a --training_strategy flag (scripts/train_svi*.py; the analog
    of the reference's deepspeed_stage selection, train_svi.py:156-161).

    data_parallel: all devices on 'data' (DDP analog)
    sp:            all devices on 'sp' (sequence-parallel DiT forward)
    dataxsp:       2 x n/2 2D mesh
    Returns None on a single device (plain forward is faster than a 1-shard
    shard_map).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n == 1:
        return None
    if strategy == "data_parallel":
        return make_mesh(data=n, sp=1, devices=devices)
    if strategy == "sp":
        return make_mesh(data=1, sp=n, devices=devices)
    if strategy == "dataxsp":
        data = 2 if n % 2 == 0 else 1
        return make_mesh(data=data, sp=n // data, devices=devices)
    raise ValueError(f"unknown training strategy {strategy!r}")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
