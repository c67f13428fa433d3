"""svi_tpu — TPU-native infinite-length video generation (Stable-Video-Infinity rebuild).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
vita-epfl/Stable-Video-Infinity: clip-by-clip autoregressive video generation with the
Wan 2.1 video diffusion transformer, a causal 3D video VAE, flow-matching sampling,
LoRA adapters, classifier-free guidance, sequence parallelism over TPU meshes, and
Error-Recycling LoRA fine-tuning.

Layout (mirrors SURVEY.md §2's component inventory, TPU-first):
  ops/        Pallas kernels + functional primitives (flash attention, RoPE, norms,
              causal conv3d streaming).
  models/     Wan DiT, causal 3D VAE, umT5 text encoder, CLIP image encoder, LoRA,
              checkpoint ingestion (safetensors / torch pickles, key-hash detection).
  schedulers/ FlowMatch (rectified flow) scheduler as pure functions.
  pipelines/  SVI per-clip pipelines + infinite clip loop (shot/film/tom, dance, talk).
  parallel/   Device mesh, sharding rules, sequence-parallel attention.
  training/   Error-Recycling LoRA trainer: replay buffers, injection, extraction.
  utils/      Host-side image/video/audio processing.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "~/.cache/jax_svi"):
    """Persistent XLA compilation cache — first jit of each (resolution,
    frames) shape costs minutes on TPU; later processes reload in <1s."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
