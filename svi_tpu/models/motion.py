"""AnimateDiff motion modules for the SD / SDXL UNets.

Behavioral reference: diffsynth/models/sd_motion.py (TemporalBlock :52-95,
TemporalTransformerBlock :6-49, SDMotionModel :97-143) and sdxl_motion.py
(SDXLMotionModel :6-51): per-pixel temporal self-attention blocks with
learned 32-frame positional embeddings, invoked after specific UNet blocks
(pipelines/dancer.py "4.2 AnimateDiff": call_block_id maps UNet block index
-> motion module index). Video frames ride the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import Params, _dense, _group_norm, _layer_norm, _lin_from, _norm_from, _t

SD_MOTION_CALL_MAP = {
    1: 0, 4: 1, 9: 2, 12: 3, 17: 4, 20: 5, 24: 6, 26: 7, 29: 8, 32: 9,
    34: 10, 36: 11, 40: 12, 43: 13, 46: 14, 50: 15, 53: 16, 56: 17,
    60: 18, 63: 19, 66: 20,
}
SDXL_MOTION_CALL_MAP = {
    0: 0, 2: 1, 7: 2, 10: 3, 15: 4, 18: 5, 25: 6, 28: 7, 31: 8, 35: 9,
    38: 10, 41: 11, 44: 12, 46: 13, 48: 14,
}


def _temporal_attention(p, x, pe, num_heads, head_dim, batch_size):
    """One temporal attention: tokens regrouped (b f) hw c -> (b hw) f c,
    learned positional embedding added to the attention INPUT only
    (ref sd_motion.py:30-41)."""
    bf, hw, c = x.shape
    f = bf // batch_size
    y = x.reshape(batch_size, f, hw, c).transpose(0, 2, 1, 3)
    y = y.reshape(batch_size * hw, f, c)
    y = y + pe[:, :f].astype(y.dtype)
    q = _dense(p["to_q"], y).reshape(-1, f, num_heads, head_dim)
    k = _dense(p["to_k"], y).reshape(-1, f, num_heads, head_dim)
    v = _dense(p["to_v"], y).reshape(-1, f, num_heads, head_dim)
    o = flash_attention(q, k, v).reshape(-1, f, num_heads * head_dim)
    o = _dense(p["to_out"], o)
    o = o.reshape(batch_size, hw, f, c).transpose(0, 2, 1, 3)
    return o.reshape(bf, hw, c)


def temporal_block(p, x, num_heads, head_dim, batch_size=1):
    """TemporalBlock.forward (ref sd_motion.py:72-95). x: (B*F,H,W,C)
    channels-last."""
    bf, h, w, c = x.shape
    residual = x
    y = _group_norm(p["norm"], x, eps=1e-6).reshape(bf, h * w, c)
    y = _dense(p["proj_in"], y)
    for tp in p["transformer_blocks"]:
        y = y + _temporal_attention(tp["attn1"], _layer_norm(tp["norm1"], y),
                                    tp["pe1"], num_heads, head_dim, batch_size)
        y = y + _temporal_attention(tp["attn2"], _layer_norm(tp["norm2"], y),
                                    tp["pe2"], num_heads, head_dim, batch_size)
        h_ = _dense(tp["act_fn"], _layer_norm(tp["norm3"], y))
        a, gate = jnp.split(h_, 2, axis=-1)
        h_ = a * jax.nn.gelu(gate.astype(jnp.float32),
                             approximate=False).astype(y.dtype)
        y = y + _dense(tp["ff"], h_)
    y = _dense(p["proj_out"], y).reshape(bf, h, w, c)
    return y + residual


def motion_hooks(params: Params, call_map=None, batch_size=1):
    """Build the {plan_index: fn(x)} hook dict consumed by sd._run_plan."""
    call_map = SD_MOTION_CALL_MAP if call_map is None else call_map

    def make(mp):
        num_heads = 8
        head_dim = mp["proj_in"]["w"].shape[-1] // num_heads
        return lambda x: temporal_block(mp, x, num_heads, head_dim, batch_size)

    return {bid: make(params["motion_modules"][mid])
            for bid, mid in call_map.items()}


def motion_params_from_torch(sd: dict) -> Params:
    mods = []
    i = 0
    while f"motion_modules.{i}.norm.weight" in sd:
        m = f"motion_modules.{i}"
        blocks = []
        j = 0
        while f"{m}.transformer_blocks.{j}.norm1.weight" in sd:
            t = f"{m}.transformer_blocks.{j}"
            blocks.append({
                "pe1": jnp.asarray(_t(sd[f"{t}.pe1"])),
                "norm1": _norm_from(sd, f"{t}.norm1"),
                "attn1": {k: _lin_from(sd, f"{t}.attn1.{k}")
                          for k in ("to_q", "to_k", "to_v", "to_out")},
                "pe2": jnp.asarray(_t(sd[f"{t}.pe2"])),
                "norm2": _norm_from(sd, f"{t}.norm2"),
                "attn2": {k: _lin_from(sd, f"{t}.attn2.{k}")
                          for k in ("to_q", "to_k", "to_v", "to_out")},
                "norm3": _norm_from(sd, f"{t}.norm3"),
                "act_fn": _lin_from(sd, f"{t}.act_fn.proj"),
                "ff": _lin_from(sd, f"{t}.ff"),
            })
            j += 1
        mods.append({
            "norm": _norm_from(sd, f"{m}.norm"),
            "proj_in": _lin_from(sd, f"{m}.proj_in"),
            "transformer_blocks": blocks,
            "proj_out": _lin_from(sd, f"{m}.proj_out"),
        })
        i += 1
    return {"motion_modules": mods}
