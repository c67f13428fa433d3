"""Normalization primitives, all computed in float32 and cast back.

Behavioral references:
  - RMSNorm / WanRMSNorm: diffsynth/models/wan_video_dit.py:34-50, 186-197
  - WanLayerNorm / nn.LayerNorm(elementwise_affine=False): wan_video_dit.py:305-333
  - T5LayerNorm (no mean subtraction, weight outside): wan_video_text_encoder.py:22-35
  - VAE RMS_norm (channel-dim F.normalize * sqrt(dim) * gamma): wan_video_vae.py:55-70
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x * rsqrt(mean(x^2)) in f32, cast back, then * weight (ref dit.py:42-50)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(dtype) * weight


def t5_layer_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """T5-style RMS norm: rsqrt in f32, cast to weight dtype if low-precision,
    weight multiplies outside (ref text_encoder.py:30-35)."""
    xf = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight.dtype in (jnp.float16, jnp.bfloat16):
        y = y.astype(weight.dtype)
    return weight * y


def layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last dim in f32, cast back (ref dit.py:305-319)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def channel_rms_norm(
    x: jax.Array, gamma: jax.Array, bias: jax.Array | None = None, channel_axis: int = 1
) -> jax.Array:
    """VAE RMS_norm: L2-normalize along the channel axis * sqrt(dim) * gamma
    (ref wan_video_vae.py:55-70 — F.normalize uses eps=1e-12 clamp on the norm).

    gamma is broadcast-shaped by the caller (e.g. (C,1,1,1) for video tensors).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=channel_axis, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12)
    dim = x.shape[channel_axis]
    y = y * jnp.sqrt(jnp.float32(dim)) * gamma.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """GELU with tanh approximation (ref dit.py:334, text_encoder.py:15-19)."""
    return jax.nn.gelu(x, approximate=True)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation (ref dit.py:150-151)."""
    return x * (1 + scale) + shift
