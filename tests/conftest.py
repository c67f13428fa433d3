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
# This box's XLA:CPU lowers f32 dots to a reduced-precision (bf16-class)
# fastmath path by default (measured 0.018 abs error on a 1280-dim f32
# matmul vs 1e-6 at "highest"). Golden-parity tolerances assume true f32.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


# ---------------------------------------------------------------------------
# Fast torch construction for billion-parameter reference modules
# ---------------------------------------------------------------------------
# These golden-parity modules construct full-size reference torch models
# (SDXLUNet, ChatGLM, HunyuanVideoDiT, ...) and immediately overwrite every
# tensor with a seeded randn state. torch's default kaiming/xavier init for
# billions of parameters costs several MINUTES per construction on this
# single-CPU box (measured 492 s for SDXLUNet vs 2 s with init skipped), so
# the samplers are no-ops for the duration of these modules
# (reference_loader.fast_init). Files whose tests consume default-init
# reference weights (tiny Wan configs etc.) are NOT listed.

_FAST_INIT_MODULES = {
    "test_sd", "test_sdxl", "test_sdxl_video", "test_sd3", "test_flux",
    "test_cog", "test_controlnets", "test_hunyuan_dit", "test_hunyuan_video",
    "test_image_quality", "test_ipadapter", "test_kolors", "test_motion",
    "test_omnigen", "test_stepvideo", "test_svd", "test_tiler",
}

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _fast_torch_init(request):
    if request.module.__name__ in _FAST_INIT_MODULES:
        from reference_loader import fast_init

        with fast_init():
            yield
    else:
        yield


@pytest.fixture(autouse=True, scope="module")
def _bound_process_memory():
    """Release jit executables + cached arrays after each test module.

    A full single-process `pytest tests/` accumulates every module's compiled
    executables and their kept-alive constants (measured ~50 GB RSS and a
    fatal crash around the 50th file); per-module jax.clear_caches() keeps
    the suite bounded at the cost of re-jitting shared helpers. File-sharded
    runs (one pytest per file) are unaffected."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


# ---------------------------------------------------------------------------
# Allocation mitigation for this microVM
# ---------------------------------------------------------------------------
# Page faults on this Firecracker guest cost ~200us each (100% sys-time under
# large allocations), so every fresh mmap of a billion-parameter tensor costs
# minutes. Steering glibc away from mmap for large blocks and disabling trim
# keeps freed pages in the heap for reuse, so repeated big-model
# constructions fault each page once per process instead of once per tensor.
try:
    import ctypes

    _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))  # M_MMAP_THRESHOLD
    _libc.mallopt(ctypes.c_int(-1), ctypes.c_int(-1))       # M_TRIM_THRESHOLD
except Exception:  # best-effort; absence of glibc mallopt is fine
    pass
