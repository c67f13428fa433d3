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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
