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
