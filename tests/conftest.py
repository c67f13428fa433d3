"""Test configuration: run JAX on CPU with 8 virtual devices.

This is the TPU-native analog of "test multi-node without a real cluster"
(SURVEY.md §4): sequence-/data-parallel meshes are exercised on a virtual
8-device CPU topology.

Note: this container's sitecustomize imports jax and registers the axon TPU
plugin before pytest starts, so env vars alone are too late — we also flip
jax.config, which works as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the axon TPU tunnel presets this; tests run on CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
