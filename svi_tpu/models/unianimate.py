"""UniAnimate auxiliary embedding stacks (pose / reference-pose / inpaint).

Behavioral reference: diffsynth/pipelines/wan_video.py —
  * randomref_embedding_pose (:544-558): 6-conv2d stack embedding the
    REFERENCE pose image into the 20-channel `y` conditioning grid;
  * learn_in_embedding (WanRepalceAnyoneVideoPipeline :1310-1318): 4-conv3d
    stack embedding (masked video ‖ mask) into latent-shaped features;
  * inpaint_embedding (:1320-1326): 3-conv3d stack refining the VAE-encoded
    masked video in latent space.

(The main dwpose_embedding conv stack is shared with SVI-Dance —
svi_tpu/models/pose_embedding.py.)

All stacks are SiLU-separated torch Sequentials in the reference; here they
are channels-last XLA convs over plain param lists with torch-layout
ingestion, golden-parity-tested in tests/test_unianimate.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

CONCAT_DIM = 4
_W = CONCAT_DIM * 4  # base width 16

# (kernel, stride, padding) per conv. 2D specs use 2-tuples.
RANDOMREF_LAYERS = [
    ((3, 3), (1, 1), (1, 1)),
    ((3, 3), (1, 1), (1, 1)),
    ((3, 3), (1, 1), (1, 1)),
    ((3, 3), (2, 2), (1, 1)),
    ((3, 3), (2, 2), (1, 1)),
    ((3, 3), (2, 2), (1, 1)),
]
RANDOMREF_CHANNELS = [3, _W, _W, _W, _W, _W, 20]

LEARN_IN_LAYERS = [
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
]
LEARN_IN_CHANNELS = [4, _W, _W, _W, 16]

INPAINT_LAYERS = [
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
]
INPAINT_CHANNELS = [16, _W, _W, 16]


def _init_stack(key, layers, channels, dtype):
    keys = jax.random.split(key, len(layers))
    params = []
    for i, (k, _, _) in enumerate(layers):
        cin, cout = channels[i], channels[i + 1]
        fan_in = cin * int(np.prod(k))
        lim = 1.0 / math.sqrt(fan_in)
        k1, k2 = jax.random.split(keys[i])
        params.append({
            "w": jax.random.uniform(k1, (*k, cin, cout), jnp.float32, -lim, lim).astype(dtype),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim).astype(dtype),
        })
    return params


def _stack_from_torch(sd, prefix, n_layers, spatial_dims, dtype):
    """torch Sequential keys '{prefix}{2i}.weight' -> channels-last params."""
    perm3 = (2, 3, 4, 1, 0)
    perm2 = (2, 3, 1, 0)
    params = []
    for i in range(n_layers):
        w = sd[f"{prefix}{2 * i}.weight"]
        b = sd[f"{prefix}{2 * i}.bias"]
        if hasattr(w, "detach"):
            w = w.detach().float().numpy()
            b = b.detach().float().numpy()
        perm = perm3 if spatial_dims == 3 else perm2
        params.append({
            "w": jnp.asarray(np.transpose(np.asarray(w), perm), dtype),
            "b": jnp.asarray(np.asarray(b), dtype),
        })
    return params


def _run_stack(params, layers, x, dims):
    dn = ("NDHWC", "DHWIO", "NDHWC") if dims == 3 else ("NHWC", "HWIO", "NHWC")
    for i, (k, stride, pad) in enumerate(layers):
        x = jax.lax.conv_general_dilated(
            x, params[i]["w"].astype(x.dtype), window_strides=stride,
            padding=[(p, p) for p in pad], dimension_numbers=dn,
        ) + params[i]["b"].astype(x.dtype)
        if i < len(layers) - 1:
            x = jax.nn.silu(x)
    return x


# --- randomref_embedding_pose ------------------------------------------------


def init_randomref(key, dtype=jnp.float32):
    return _init_stack(key, RANDOMREF_LAYERS, RANDOMREF_CHANNELS, dtype)


def randomref_from_torch(sd, dtype=jnp.float32):
    clean = {k.split("randomref_embedding_pose.")[-1]: v for k, v in sd.items()}
    return _stack_from_torch(clean, "", len(RANDOMREF_LAYERS), 2, dtype)


def randomref_forward(params, ref_pose: jax.Array) -> jax.Array:
    """ref_pose: (b, H, W, 3) in [0,255] -> (b, 20, 1, H/8, W/8), the additive
    term for the 20-channel `y` (ref :730-732)."""
    x = _run_stack(params, RANDOMREF_LAYERS, ref_pose.astype(params[0]["w"].dtype) / 255.0, 2)
    return jnp.moveaxis(x, -1, 1)[:, :, None]  # (b, 20, 1, h, w)


# --- learn_in_embedding (ReplaceAnyone) ---------------------------------------


def init_learn_in(key, dtype=jnp.float32):
    return _init_stack(key, LEARN_IN_LAYERS, LEARN_IN_CHANNELS, dtype)


def learn_in_from_torch(sd, dtype=jnp.float32):
    clean = {k.split("learn_in_embedding.")[-1]: v for k, v in sd.items()}
    return _stack_from_torch(clean, "", len(LEARN_IN_LAYERS), 3, dtype)


def learn_in_forward(params, masked_video: jax.Array) -> jax.Array:
    """masked_video: (b, 4, F, H, W) = (video * ~mask ‖ ~mask); the reference
    prepends 3 copies of the first frame before the stack (ref :1552-1554).
    Returns latent-shaped (b, 16, F_lat, H/8, W/8)."""
    x = jnp.concatenate(
        [jnp.repeat(masked_video[:, :, :1], 3, axis=2), masked_video], axis=2
    )
    x = jnp.moveaxis(x.astype(params[0]["w"].dtype), 1, -1)
    return jnp.moveaxis(_run_stack(params, LEARN_IN_LAYERS, x, 3), -1, 1)


# --- inpaint_embedding (ReplaceAnyone) ----------------------------------------


def init_inpaint(key, dtype=jnp.float32):
    return _init_stack(key, INPAINT_LAYERS, INPAINT_CHANNELS, dtype)


def inpaint_from_torch(sd, dtype=jnp.float32):
    clean = {k.split("inpaint_embedding.")[-1]: v for k, v in sd.items()}
    return _stack_from_torch(clean, "", len(INPAINT_LAYERS), 3, dtype)


def inpaint_forward(params, latents: jax.Array) -> jax.Array:
    """(b, 16, f, h, w) latent-space refinement of the masked-video encoding
    (ref :1555)."""
    x = jnp.moveaxis(latents.astype(params[0]["w"].dtype), 1, -1)
    return jnp.moveaxis(_run_stack(params, INPAINT_LAYERS, x, 3), -1, 1)
