"""Stable Diffusion 3 / 3.5 family (MMDiT + 16-channel VAE + text encoders).

Behavioral reference: diffsynth/models/sd3_dit.py (SD3DiT :330-410 — PatchEmbed
with cropped global pos-embed, AdaLayerNorm modulation, JointTransformerBlock
with joint text/image attention, optional per-head RMS q/k norms and dual
blocks for SD3.5, final only-out-a block), sd3_vae_{encoder,decoder}.py
(scaling 1.5305, shift 0.0609, 16-channel latent), sd3_text_encoder.py
(CLIP-L variant returning pooled+penultimate; bigG reused from SDXL; T5-XXL).

TPU-first: the homogeneous middle JointTransformerBlocks are stacked and run
under one `lax.scan` (one compiled block body instead of 24 unrolled copies);
joint attention runs our flash kernel over the concatenated image+text
sequence; all modulation math stays in the stream dtype with f32 layer-norm
statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import (
    Params,
    _conv_from,
    _dense,
    _group_norm,
    _lin_from,
    _norm_from,
    _run_plan,
    _t,
    timestep_embedding,
)

SD3_VAE_SCALING_FACTOR = 1.5305
SD3_VAE_SHIFT_FACTOR = 0.0609

SD3_VAE_ENCODER_PLAN = (
    [("res", 128, 128), ("res", 128, 128), ("down", 128, 0, True),
     ("res", 128, 256), ("res", 256, 256), ("down", 256, 0, True),
     ("res", 256, 512), ("res", 512, 512), ("down", 512, 0, True),
     ("res", 512, 512), ("res", 512, 512),
     ("res", 512, 512), ("vae_attn", 512), ("res", 512, 512)]
)

SD3_VAE_DECODER_PLAN = (
    [("res", 512, 512), ("vae_attn", 512), ("res", 512, 512)]
    + [("res", 512, 512)] * 3 + [("up", 512)]
    + [("res", 512, 512)] * 3 + [("up", 512)]
    + [("res", 512, 256), ("res", 256, 256), ("res", 256, 256), ("up", 256)]
    + [("res", 256, 128), ("res", 128, 128), ("res", 128, 128)]
)


def sd3_vae_encode(params: Params, image, tiled=False, tile_size=64,
                   tile_stride=32):
    """SD3VAEEncoder.forward (ref sd3_vae_encoder.py:52-76): 16-ch latent,
    (x - 0.0609) * 1.5305, no quant_conv. tiled: whole-forward feathered
    tiling (ref :41-50)."""
    import jax.numpy as jnp

    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                sd3_vae_encode(params, jnp.moveaxis(t, -1, 1)), 1, -1),
            jnp.moveaxis(image, 1, -1), tile_size, tile_stride), -1, 1)
    x = jnp.moveaxis(image, 1, -1)
    from .sd import _conv2d

    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD3_VAE_ENCODER_PLAN, params["blocks"], x, None, None,
                  eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    x = (x[..., :16] - SD3_VAE_SHIFT_FACTOR) * SD3_VAE_SCALING_FACTOR
    return jnp.moveaxis(x, -1, 1)


def sd3_vae_decode(params: Params, latents, tiled=False, tile_size=64,
                   tile_stride=32):
    """SD3VAEDecoder.forward (ref sd3_vae_decoder.py:56-76)."""
    from .sd import _conv2d

    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                sd3_vae_decode(params, jnp.moveaxis(t, -1, 1)), 1, -1),
            jnp.moveaxis(latents, 1, -1), tile_size, tile_stride), -1, 1)
    x = jnp.moveaxis(latents, 1, -1) / SD3_VAE_SCALING_FACTOR + SD3_VAE_SHIFT_FACTOR
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD3_VAE_DECODER_PLAN, params["blocks"], x, None, None,
                  eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


# ---------------------------------------------------------------------------
# MMDiT
# ---------------------------------------------------------------------------


def _ln_nowb(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.square(xf).mean(-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * w.astype(x.dtype)) if w is not None else y.astype(x.dtype)


def _qkv(p, x, num_heads, head_dim, rms_q=None, rms_k=None):
    """JointAttention.process_qkv (ref sd3_dit.py:125-135): fused qkv where
    the head axis is laid out [q-heads | k-heads | v-heads]."""
    b, s, _ = x.shape
    qkv = _dense(p, x).reshape(b, s, 3, num_heads, head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if rms_q is not None:
        q = _rms(q, rms_q.get("w"))
    if rms_k is not None:
        k = _rms(k, rms_k.get("w"))
    return q, k, v


def _joint_attention(p, xa, xb, num_heads, head_dim, only_out_a=False):
    """JointAttention.forward (ref sd3_dit.py:138-156): concat image+text
    tokens, one attention, split back."""
    sa = xa.shape[1]
    qa, ka, va = _qkv(p["a_to_qkv"], xa, num_heads, head_dim,
                      p.get("norm_q_a"), p.get("norm_k_a"))
    qb, kb, vb = _qkv(p["b_to_qkv"], xb, num_heads, head_dim,
                      p.get("norm_q_b"), p.get("norm_k_b"))
    q = jnp.concatenate([qa, qb], axis=1)
    k = jnp.concatenate([ka, kb], axis=1)
    v = jnp.concatenate([va, vb], axis=1)
    o = flash_attention(q, k, v)
    o = o.reshape(o.shape[0], o.shape[1], num_heads * head_dim)
    oa = _dense(p["a_to_out"], o[:, :sa])
    if only_out_a:
        return oa
    return oa, _dense(p["b_to_out"], o[:, sa:])


def _single_attention(p, x, num_heads, head_dim):
    """SingleAttention.forward (ref sd3_dit.py:160-199)."""
    q, k, v = _qkv(p["a_to_qkv"], x, num_heads, head_dim,
                   p.get("norm_q_a"), p.get("norm_k_a"))
    o = flash_attention(q, k, v)
    return _dense(p["a_to_out"], o.reshape(o.shape[0], o.shape[1], -1))


def _ada_mod(p, temb, n_chunks):
    """AdaLayerNorm linear (ref sd3_dit.py:70-95): silu(temb) -> n*dim,
    chunked into per-token broadcastable (B,1,dim) pieces."""
    emb = _dense(p["linear"], jax.nn.silu(temb))[:, None]
    return jnp.split(emb, n_chunks, axis=2)


def _ff(p, x):
    h = _dense(p["0"], x)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return _dense(p["2"], h)


def _joint_block(p, xa, xb, temb, num_heads, head_dim, dual=False,
                 final=False):
    """JointTransformerBlock / Dual / Final (ref sd3_dit.py:244-330)."""
    if dual:
        (shift_a, scale_a, gate_a, shift_mlp_a, scale_mlp_a, gate_mlp_a,
         shift_a2, scale_a2, gate_a2) = _ada_mod(p["norm1_a"], temb, 9)
        norm_a = _ln_nowb(xa)
        na = norm_a * (1 + scale_a) + shift_a
        na2 = norm_a * (1 + scale_a2) + shift_a2
    else:
        shift_a, scale_a, gate_a, shift_mlp_a, scale_mlp_a, gate_mlp_a = \
            _ada_mod(p["norm1_a"], temb, 6)
        na = _ln_nowb(xa) * (1 + scale_a) + shift_a

    if final:
        # single=True AdaLayerNorm chunks as (scale, shift) (ref :82-85)
        scale_b, shift_b = _ada_mod(p["norm1_b"], temb, 2)
        nb = _ln_nowb(xb) * (1 + scale_b) + shift_b
        attn_a = _joint_attention(p["attn"], na, nb, num_heads, head_dim,
                                  only_out_a=True)
        xa = xa + gate_a * attn_a
        na = _ln_nowb(xa) * (1 + scale_mlp_a) + shift_mlp_a
        return xa + gate_mlp_a * _ff(p["ff_a"], na), xb

    shift_b, scale_b, gate_b, shift_mlp_b, scale_mlp_b, gate_mlp_b = \
        _ada_mod(p["norm1_b"], temb, 6)
    nb = _ln_nowb(xb) * (1 + scale_b) + shift_b

    attn_a, attn_b = _joint_attention(p["attn"], na, nb, num_heads, head_dim)
    xa = xa + gate_a * attn_a
    if dual:
        xa = xa + gate_a2 * _single_attention(p["attn2"], na2, num_heads,
                                              head_dim)
    na = _ln_nowb(xa) * (1 + scale_mlp_a) + shift_mlp_a
    xa = xa + gate_mlp_a * _ff(p["ff_a"], na)

    xb = xb + gate_b * attn_b
    nb = _ln_nowb(xb) * (1 + scale_mlp_b) + shift_mlp_b
    xb = xb + gate_mlp_b * _ff(p["ff_b"], nb)
    return xa, xb


def sd3_dit_forward(params: Params, hidden_states, timestep, prompt_emb,
                    pooled_prompt_emb, patch_size=2, tiled=False,
                    tile_size=128, tile_stride=64):
    """SD3DiT.forward (ref sd3_dit.py:365-400). hidden_states: (B,16,H,W)
    NCHW latents; prompt_emb: (B,S,4096); pooled: (B,2048). tiled: whole-
    forward latent-space tiling (ref :339-349 — layer-wise tiling is
    impossible due to the global positional embedding)."""
    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(sd3_dit_forward(
                params, jnp.moveaxis(t, -1, 1), timestep, prompt_emb,
                pooled_prompt_emb, patch_size), 1, -1),
            jnp.moveaxis(hidden_states, 1, -1), tile_size, tile_stride), -1, 1)
    x = hidden_states
    b, _, h, w = x.shape
    dtype = x.dtype

    temb = timestep_embedding(jnp.atleast_1d(timestep), 256).astype(dtype)
    temb = _dense(params["time_embedder"]["2"],
                  jax.nn.silu(_dense(params["time_embedder"]["0"], temb)))
    temb = temb + _dense(
        params["pooled_text_embedder"]["2"],
        jax.nn.silu(_dense(params["pooled_text_embedder"]["0"],
                           pooled_prompt_emb.astype(dtype))))
    ctx = _dense(params["context_embedder"], prompt_emb)

    # PatchEmbed (ref :28-52): stride-2 conv patchify + cropped pos embed
    xl = jnp.moveaxis(x, 1, -1)
    xl = jax.lax.conv_general_dilated(
        xl, params["pos_embedder"]["proj"]["w"].astype(dtype),
        (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["pos_embedder"]["proj"]["b"].astype(dtype)
    hp, wp = h // patch_size, w // patch_size
    pe = params["pos_embedder"]["pos_embed"]
    top = (pe.shape[1] - hp) // 2
    left = (pe.shape[2] - wp) // 2
    xl = xl + pe[:, top:top + hp, left:left + wp].astype(dtype)
    xa = xl.reshape(b, hp * wp, -1)

    num_heads = xa.shape[-1] // 64
    for p in params.get("dual_blocks", []):
        xa, ctx = _joint_block(p, xa, ctx, temb, num_heads, 64, dual=True)

    def body(carry, p):
        xa, xb = carry
        xa, xb = _joint_block(p, xa, xb, temb, num_heads, 64)
        return (xa, xb), None

    if params.get("mid_blocks") is not None:
        (xa, ctx), _ = jax.lax.scan(body, (xa, ctx), params["mid_blocks"])
    xa, _ = _joint_block(params["final_block"], xa, ctx, temb, num_heads, 64,
                         final=True)

    scale, shift = _ada_mod(params["norm_out"], temb, 2)  # single=True order
    xa = _ln_nowb(xa) * (1 + scale) + shift
    xa = _dense(params["proj_out"], xa)
    # unpatchify: B (H W) (P Q C) -> B C (H P) (W Q)  (ref :399)
    xa = xa.reshape(b, hp, wp, patch_size, patch_size, -1)
    xa = xa.transpose(0, 5, 1, 3, 2, 4).reshape(b, -1, h, w)
    return xa


# ---------------------------------------------------------------------------
# text encoder 1 (CLIP-L variant: pooled WITHOUT projection + penultimate)
# ---------------------------------------------------------------------------


def sd3_text_encoder_1_forward(params: Params, input_ids, clip_skip: int = 2,
                               extra_mask=None):
    """SD3TextEncoder1.forward (ref sd3_text_encoder.py:11-24): returns
    (pooled_embeds, hidden_states) — pooled is final-LN EOS-token state (no
    text_projection), hidden is the pre-LN state clip_skip layers from the
    end. extra_mask (B,S): 0 -> key masked out (ref :15-16, applied from the
    first sample like the reference). Params structure matches
    sd.sd_text_encoder_params_from_torch."""
    from .sd import _attention, _layer_norm

    embeds = params["token_embedding"][input_ids] + params["position_embeds"][0]
    s = embeds.shape[1]
    mask = jnp.triu(jnp.full((s, s), float("-inf"), jnp.float32), 1)[None, None]
    if extra_mask is not None:
        mask = jnp.where(extra_mask[0][None, None, None, :] == 0,
                         float("-inf"), mask)
    encoders = params["encoders"]
    n_layers = encoders["layer_norm1"]["w"].shape[0]
    keep = n_layers - clip_skip

    def layer(x, p):
        h = _attention(p["attn"], _layer_norm(p["layer_norm1"], x),
                       None, num_heads=12, head_dim=64, mask=mask)
        x = x + h
        y = _dense(p["fc1"], _layer_norm(p["layer_norm2"], x))
        y = y * jax.nn.sigmoid(1.702 * y.astype(jnp.float32)).astype(y.dtype)
        return x + _dense(p["fc2"], y)

    def body(carry, xs):
        x, hidden = carry
        i, p = xs
        x = layer(x, p)
        return (x, jnp.where(i == keep, x, hidden)), None

    (embeds, hidden), _ = jax.lax.scan(
        body, (embeds, embeds), (jnp.arange(n_layers), encoders))
    final = _layer_norm(params["final_layer_norm"], embeds)
    pooled = final[jnp.arange(final.shape[0]), jnp.argmax(input_ids, axis=-1)]
    return pooled, hidden


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def _attn_p(sd, prefix, joint=True):
    p = {"a_to_qkv": _lin_from(sd, f"{prefix}.a_to_qkv"),
         "a_to_out": _lin_from(sd, f"{prefix}.a_to_out")}
    if joint:
        p["b_to_qkv"] = _lin_from(sd, f"{prefix}.b_to_qkv")
        if f"{prefix}.b_to_out.weight" in sd:
            p["b_to_out"] = _lin_from(sd, f"{prefix}.b_to_out")
    for n in ("norm_q_a", "norm_k_a", "norm_q_b", "norm_k_b"):
        if f"{prefix}.{n}.weight" in sd:
            p[n] = {"w": jnp.asarray(_t(sd[f"{prefix}.{n}.weight"]))}
    return p


def _joint_block_p(sd, prefix, dual=False, final=False):
    p = {
        "norm1_a": {"linear": _lin_from(sd, f"{prefix}.norm1_a.linear")},
        "norm1_b": {"linear": _lin_from(sd, f"{prefix}.norm1_b.linear")},
        "attn": _attn_p(sd, f"{prefix}.attn"),
        "ff_a": {"0": _lin_from(sd, f"{prefix}.ff_a.0"),
                 "2": _lin_from(sd, f"{prefix}.ff_a.2")},
    }
    if not final:
        p["ff_b"] = {"0": _lin_from(sd, f"{prefix}.ff_b.0"),
                     "2": _lin_from(sd, f"{prefix}.ff_b.2")}
    if dual:
        p["attn2"] = _attn_p(sd, f"{prefix}.attn2", joint=False)
    return p


def sd3_dit_params_from_torch(sd: dict, num_dual_blocks: int = 0) -> Params:
    n = 0
    while f"blocks.{n}.norm1_a.linear.weight" in sd:
        n += 1
    dual = [_joint_block_p(sd, f"blocks.{i}", dual=True)
            for i in range(num_dual_blocks)]
    mids = [_joint_block_p(sd, f"blocks.{i}")
            for i in range(num_dual_blocks, n - 1)]
    params = {
        "pos_embedder": {
            "proj": _conv_from(sd, "pos_embedder.proj"),
            "pos_embed": jnp.asarray(_t(sd["pos_embedder.pos_embed"])),
        },
        "time_embedder": {
            "0": _lin_from(sd, "time_embedder.timestep_embedder.0"),
            "2": _lin_from(sd, "time_embedder.timestep_embedder.2"),
        },
        "pooled_text_embedder": {
            "0": _lin_from(sd, "pooled_text_embedder.0"),
            "2": _lin_from(sd, "pooled_text_embedder.2"),
        },
        "context_embedder": _lin_from(sd, "context_embedder"),
        "dual_blocks": dual,
        "mid_blocks": (jax.tree.map(lambda *xs: jnp.stack(xs), *mids)
                       if mids else None),
        "final_block": _joint_block_p(sd, f"blocks.{n - 1}", final=True),
        "norm_out": {"linear": _lin_from(sd, "norm_out.linear")},
        "proj_out": _lin_from(sd, "proj_out"),
    }
    return params


def sd3_vae_encoder_params_from_torch(sd: dict) -> Params:
    from .sd import _block_from

    return {
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d)
                   for i, d in enumerate(SD3_VAE_ENCODER_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }


def sd3_vae_decoder_params_from_torch(sd: dict) -> Params:
    from .sd import _block_from

    return {
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d)
                   for i, d in enumerate(SD3_VAE_DECODER_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }
