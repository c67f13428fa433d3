"""DWPose skeleton-video embedding for SVI-Dance.

Behavioral reference: diffsynth/pipelines/svi_video_dance.py:254-268 —
a 7-conv3d stack (SiLU between) that compresses the pose video (3, F+3, H, W)
to patch-grid tokens (dim, F'/4, H/16, W/16), added to the DiT patch tokens
(`add_condition`, svi_video_dance.py:103-104). Weights ride inside the LoRA
safetensors and are captured via ModelManager.state_dict_new_module
(model_manager.py:516-518).

Channels-last XLA convs; symmetric (non-causal) padding like torch Conv3d.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# (kernel, stride, padding) per conv; channels: 3 -> 16 -> ... -> dim
_LAYERS = [
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ((3, 3, 3), (1, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((1, 2, 2), (1, 2, 2), (0, 0, 0)),
]
CONCAT_DIM = 4  # base width = concat_dim * 4 = 16 (ref :254)


def _channels(dim: int):
    w = CONCAT_DIM * 4
    chans = [3] + [w] * (len(_LAYERS) - 1) + [dim]
    return chans


def init_params(key, dim: int, dtype=jnp.float32):
    chans = _channels(dim)
    keys = jax.random.split(key, len(_LAYERS))
    params = []
    for i, ((kt, kh, kw), _, _) in enumerate(_LAYERS):
        cin, cout = chans[i], chans[i + 1]
        fan_in = cin * kt * kh * kw
        lim = 1.0 / math.sqrt(fan_in)
        k1, k2 = jax.random.split(keys[i])
        params.append({
            "w": jax.random.uniform(k1, (kt, kh, kw, cin, cout), jnp.float32, -lim, lim).astype(dtype),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim).astype(dtype),
        })
    return params


def params_from_torch_state_dict(sd: dict, dtype=jnp.float32):
    """Keys '0.weight', '2.weight', ... (Sequential indices 0,2,4,6,8,10,12),
    optionally prefixed 'dwpose_embedding.'."""
    clean = {}
    for k, v in sd.items():
        if "dwpose_embedding." in k:
            k = k.split("dwpose_embedding.")[1]
        clean[k] = np.asarray(v, np.float32) if not hasattr(v, "shape") else v

    def conv(i):
        w = clean[f"{i}.weight"]
        if hasattr(w, "detach"):
            w = w.detach().float().numpy()
        b = clean[f"{i}.bias"]
        if hasattr(b, "detach"):
            b = b.detach().float().numpy()
        return {
            "w": jnp.asarray(np.transpose(np.asarray(w), (2, 3, 4, 1, 0)), dtype),
            "b": jnp.asarray(np.asarray(b), dtype),
        }

    return [conv(2 * i) for i in range(len(_LAYERS))]


def forward(params, pose: jax.Array) -> jax.Array:
    """pose: (b, 3, F, H, W) float in [0, 255] WITHOUT the 3-frame prefix.
    Returns add_condition tokens (b, F'/4 * H/16 * W/16, dim) — the reference
    prepends 3 copies of the first frame and divides by 255
    (svi_video_dance.py:526-529) before the conv stack, then flattens
    'b c f h w -> b (f h w) c'."""
    x = jnp.concatenate([jnp.repeat(pose[:, :, :1], 3, axis=2), pose], axis=2) / 255.0
    x = jnp.moveaxis(x.astype(params[0]["w"].dtype), 1, -1)  # (b,F,H,W,3)
    for i, ((kt, kh, kw), stride, pad) in enumerate(_LAYERS):
        x = jax.lax.conv_general_dilated(
            x, params[i]["w"], window_strides=stride,
            padding=[(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + params[i]["b"]
        if i < len(_LAYERS) - 1:
            x = jax.nn.silu(x)
    b, f, h, w, c = x.shape
    return x.reshape(b, f * h * w, c)
