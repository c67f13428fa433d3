"""FLUX.1 family (double/single-stream MMDiT + 16-channel VAE).

Behavioral reference: diffsynth/models/flux_dit.py (FluxDiT :278-470 — 19
joint "double-stream" blocks then 38 fused "single-stream" blocks over the
concatenated [text | image] sequence, 3-axis RoPE (16/56/56 per 128-dim head),
guidance embedder, AdaLayerNormContinuous head), flux_vae.py (SD3 VAE with
scaling 0.3611 / shift 0.1159), flux_text_encoder.py (CLIP-L pooled + T5-XXL).

TPU-first: both block families are stacked and scanned (`lax.scan`), RoPE is
an interleaved-pair rotation from precomputed cos/sin tables (computed once
per resolution, f32), attention runs the flash kernel (head_dim 128 → the
flat Pallas path) when no entity mask is present, and the fused
qkv+mlp single-block linear stays one big MXU matmul as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import Params, _dense, _lin_from, _t, timestep_embedding
from .sd3 import (
    SD3_VAE_DECODER_PLAN,
    SD3_VAE_ENCODER_PLAN,
    _ada_mod,
    _ff,
    _ln_nowb,
    _rms,
    sd3_vae_decoder_params_from_torch,
    sd3_vae_encoder_params_from_torch,
)

FLUX_VAE_SCALING_FACTOR = 0.3611
FLUX_VAE_SHIFT_FACTOR = 0.1159


def flux_vae_encode(params: Params, image):
    """FluxVAEEncoder (ref flux_vae.py:5-13): SD3 VAE arch, scale 0.3611 /
    shift 0.1159."""
    from .sd import _conv2d, _group_norm, _run_plan

    x = jnp.moveaxis(image, 1, -1)
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD3_VAE_ENCODER_PLAN, params["blocks"], x, None, None,
                  eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    x = (x[..., :16] - FLUX_VAE_SHIFT_FACTOR) * FLUX_VAE_SCALING_FACTOR
    return jnp.moveaxis(x, -1, 1)


def flux_vae_decode(params: Params, latents):
    """FluxVAEDecoder (ref flux_vae.py:16-24)."""
    from .sd import _conv2d, _group_norm, _run_plan

    x = jnp.moveaxis(latents, 1, -1) / FLUX_VAE_SCALING_FACTOR \
        + FLUX_VAE_SHIFT_FACTOR
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD3_VAE_DECODER_PLAN, params["blocks"], x, None, None,
                  eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def flux_rope_tables(ids, axes_dim=(16, 56, 56), theta=10000.0):
    """RoPEEmbedding (ref flux_dit.py:15-42): per-axis rotary angle tables.
    ids: (B, S, 3) positions. Returns cos, sin of shape (B, S, head_dim//2)
    f32 (pairs laid out axis-major, matching the reference's concat)."""
    outs = []
    for i, d in enumerate(axes_dim):
        scale = jnp.arange(0, d, 2, dtype=jnp.float64 if jax.config.jax_enable_x64
                           else jnp.float32) / d
        omega = 1.0 / (theta ** scale)
        outs.append(ids[..., i].astype(jnp.float32)[..., None] * omega[None, None])
    out = jnp.concatenate(outs, axis=-1)
    return jnp.cos(out), jnp.sin(out)


def _apply_rope(x, cos, sin):
    """Interleaved-pair rotation in f32 (ref flux_dit.py:66-71)."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = cos[:, :, None]  # (B,S,1,D/2) broadcasting over heads
    s = sin[:, :, None]
    out = jnp.stack([c * xe - s * xo, s * xe + c * xo], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# attention / blocks
# ---------------------------------------------------------------------------


def _qkv_rms(p_qkv, x, num_heads, head_dim, rms_q, rms_k):
    b, s, _ = x.shape
    qkv = _dense(p_qkv, x).reshape(b, s, 3, num_heads, head_dim)
    q = _rms(qkv[:, :, 0], rms_q["w"])
    k = _rms(qkv[:, :, 1], rms_k["w"])
    return q, k, qkv[:, :, 2]


def _attn(q, k, v, mask=None):
    if mask is None:
        return flash_attention(q, k, v)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (q.shape[-1] ** -0.5)
    probs = jax.nn.softmax(logits + mask.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnsk,bknd->bsnd", probs.astype(v.dtype), v)


def _flux_joint_attention(p, xa, xb, cos, sin, num_heads, head_dim,
                          only_out_a=False, mask=None):
    """FluxJointAttention.forward (ref flux_dit.py:73-106): text (b) tokens
    lead the concatenated sequence."""
    sb = xb.shape[1]
    qa, ka, va = _qkv_rms(p["a_to_qkv"], xa, num_heads, head_dim,
                          p["norm_q_a"], p["norm_k_a"])
    qb, kb, vb = _qkv_rms(p["b_to_qkv"], xb, num_heads, head_dim,
                          p["norm_q_b"], p["norm_k_b"])
    q = _apply_rope(jnp.concatenate([qb, qa], axis=1), cos, sin)
    k = _apply_rope(jnp.concatenate([kb, ka], axis=1), cos, sin)
    v = jnp.concatenate([vb, va], axis=1)
    o = _attn(q, k, v, mask)
    o = o.reshape(o.shape[0], o.shape[1], num_heads * head_dim)
    oa = _dense(p["a_to_out"], o[:, sb:])
    if only_out_a:
        return oa
    return oa, _dense(p["b_to_out"], o[:, :sb])


def _flux_joint_block(p, xa, xb, temb, cos, sin, num_heads, head_dim,
                      mask=None):
    """FluxJointTransformerBlock.forward (ref flux_dit.py:110-151)."""
    shift_a, scale_a, gate_a, shift_mlp_a, scale_mlp_a, gate_mlp_a = \
        _ada_mod(p["norm1_a"], temb, 6)
    shift_b, scale_b, gate_b, shift_mlp_b, scale_mlp_b, gate_mlp_b = \
        _ada_mod(p["norm1_b"], temb, 6)
    na = _ln_nowb(xa) * (1 + scale_a) + shift_a
    nb = _ln_nowb(xb) * (1 + scale_b) + shift_b
    attn_a, attn_b = _flux_joint_attention(p["attn"], na, nb, cos, sin,
                                           num_heads, head_dim, mask=mask)
    xa = xa + gate_a * attn_a
    na = _ln_nowb(xa) * (1 + scale_mlp_a) + shift_mlp_a
    xa = xa + gate_mlp_a * _ff(p["ff_a"], na)
    xb = xb + gate_b * attn_b
    nb = _ln_nowb(xb) * (1 + scale_mlp_b) + shift_mlp_b
    xb = xb + gate_mlp_b * _ff(p["ff_b"], nb)
    return xa, xb


def _flux_single_block(p, x, temb, cos, sin, num_heads, head_dim, mask=None):
    """FluxSingleTransformerBlock.forward (ref flux_dit.py:205-260): one fused
    qkv+mlp projection, attention and tanh-GELU MLP concatenated into a single
    output projection, gated residual."""
    dim = x.shape[-1]
    emb = _dense(p["norm"]["linear"], jax.nn.silu(temb))
    shift, scale, gate = jnp.split(emb[:, None], 3, axis=2)
    nx = _ln_nowb(x) * (1 + scale) + shift
    h = _dense(p["to_qkv_mlp"], nx)
    qkv, mlp = h[..., :dim * 3], h[..., dim * 3:]
    b, s, _ = qkv.shape
    qkv = qkv.reshape(b, s, 3, num_heads, head_dim)
    q = _apply_rope(_rms(qkv[:, :, 0], p["norm_q_a"]["w"]), cos, sin)
    k = _apply_rope(_rms(qkv[:, :, 1], p["norm_k_a"]["w"]), cos, sin)
    o = _attn(q, k, qkv[:, :, 2], mask)
    o = o.reshape(b, s, num_heads * head_dim)
    mlp = jax.nn.gelu(mlp.astype(jnp.float32), approximate=True).astype(x.dtype)
    return x + gate * _dense(p["proj_out"], jnp.concatenate([o, mlp], axis=2))


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def prepare_image_ids(latents):
    """Ref flux_dit.py:307-321: (B, (H/2)(W/2), 3) ids = (0, row, col)."""
    b, _, h, w = latents.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (h // 2, w // 2), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h // 2, w // 2), 1)
    ids = jnp.stack([jnp.zeros_like(rows), rows, cols], axis=-1)
    return jnp.broadcast_to(ids.reshape(1, -1, 3), (b, (h // 2) * (w // 2), 3))


def _patchify(x):
    """B C (H P) (W Q) -> B (H W) (C P Q) with P=Q=2 (ref :296-298)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // 2) * (w // 2), c * 4)


def _unpatchify(x, h, w):
    b = x.shape[0]
    c = x.shape[-1] // 4
    x = x.reshape(b, h // 2, w // 2, c, 2, 2)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)


def flux_dit_forward(params: Params, hidden_states, timestep, prompt_emb,
                     pooled_prompt_emb, guidance=None, text_ids=None,
                     image_ids=None, attn_mask=None):
    """FluxDiT.forward (ref flux_dit.py:404-470). hidden_states (B,16,H,W);
    prompt_emb (B,S,4096) T5 states; pooled (B,768) CLIP; guidance scalar per
    sample (embedded *1000 when the guidance embedder exists)."""
    x = hidden_states
    b, _, h, w = x.shape
    dtype = x.dtype
    if image_ids is None:
        image_ids = prepare_image_ids(x)
    if text_ids is None:
        text_ids = jnp.zeros((b, prompt_emb.shape[1], 3), jnp.float32)

    temb = timestep_embedding(jnp.atleast_1d(timestep), 256).astype(dtype)
    temb = _dense(params["time_embedder"]["2"],
                  jax.nn.silu(_dense(params["time_embedder"]["0"], temb)))
    temb = temb + _dense(
        params["pooled_text_embedder"]["2"],
        jax.nn.silu(_dense(params["pooled_text_embedder"]["0"],
                           pooled_prompt_emb.astype(dtype))))
    if "guidance_embedder" in params and guidance is not None:
        g = timestep_embedding(jnp.atleast_1d(guidance) * 1000, 256).astype(dtype)
        temb = temb + _dense(params["guidance_embedder"]["2"],
                             jax.nn.silu(_dense(params["guidance_embedder"]["0"], g)))

    xa = _dense(params["x_embedder"], _patchify(x))
    ctx = _dense(params["context_embedder"], prompt_emb)
    cos, sin = flux_rope_tables(jnp.concatenate([text_ids, image_ids], axis=1))

    num_heads = xa.shape[-1] // 128

    def joint_body(carry, p):
        a, c_ = carry
        a, c_ = _flux_joint_block(p, a, c_, temb, cos, sin, num_heads, 128,
                                  mask=attn_mask)
        return (a, c_), None

    (xa, ctx), _ = jax.lax.scan(joint_body, (xa, ctx), params["blocks"])

    xs = jnp.concatenate([ctx, xa], axis=1)

    def single_body(x_, p):
        return _flux_single_block(p, x_, temb, cos, sin, num_heads, 128,
                                  mask=attn_mask), None

    xs, _ = jax.lax.scan(single_body, xs, params["single_blocks"])
    xa = xs[:, ctx.shape[1]:]

    emb = _dense(params["final_norm_out"]["linear"], jax.nn.silu(temb))
    scale, shift = jnp.split(emb[:, None], 2, axis=2)  # continuous: scale 1st
    xa = _ln_nowb(xa) * (1 + scale) + shift
    return _unpatchify(_dense(params["final_proj_out"], xa), h, w)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def _rms_p(sd, prefix):
    return {"w": jnp.asarray(_t(sd[f"{prefix}.weight"]))}


def _joint_p(sd, prefix):
    return {
        "norm1_a": {"linear": _lin_from(sd, f"{prefix}.norm1_a.linear")},
        "norm1_b": {"linear": _lin_from(sd, f"{prefix}.norm1_b.linear")},
        "attn": {
            "a_to_qkv": _lin_from(sd, f"{prefix}.attn.a_to_qkv"),
            "b_to_qkv": _lin_from(sd, f"{prefix}.attn.b_to_qkv"),
            "a_to_out": _lin_from(sd, f"{prefix}.attn.a_to_out"),
            "b_to_out": _lin_from(sd, f"{prefix}.attn.b_to_out"),
            "norm_q_a": _rms_p(sd, f"{prefix}.attn.norm_q_a"),
            "norm_k_a": _rms_p(sd, f"{prefix}.attn.norm_k_a"),
            "norm_q_b": _rms_p(sd, f"{prefix}.attn.norm_q_b"),
            "norm_k_b": _rms_p(sd, f"{prefix}.attn.norm_k_b"),
        },
        "ff_a": {"0": _lin_from(sd, f"{prefix}.ff_a.0"),
                 "2": _lin_from(sd, f"{prefix}.ff_a.2")},
        "ff_b": {"0": _lin_from(sd, f"{prefix}.ff_b.0"),
                 "2": _lin_from(sd, f"{prefix}.ff_b.2")},
    }


def _single_p(sd, prefix):
    return {
        "norm": {"linear": _lin_from(sd, f"{prefix}.norm.linear")},
        "to_qkv_mlp": _lin_from(sd, f"{prefix}.to_qkv_mlp"),
        "norm_q_a": _rms_p(sd, f"{prefix}.norm_q_a"),
        "norm_k_a": _rms_p(sd, f"{prefix}.norm_k_a"),
        "proj_out": _lin_from(sd, f"{prefix}.proj_out"),
    }


def flux_dit_params_from_torch(sd: dict) -> Params:
    n_joint = 0
    while f"blocks.{n_joint}.norm1_a.linear.weight" in sd:
        n_joint += 1
    n_single = 0
    while f"single_blocks.{n_single}.norm.linear.weight" in sd:
        n_single += 1
    params = {
        "time_embedder": {
            "0": _lin_from(sd, "time_embedder.timestep_embedder.0"),
            "2": _lin_from(sd, "time_embedder.timestep_embedder.2"),
        },
        "pooled_text_embedder": {
            "0": _lin_from(sd, "pooled_text_embedder.0"),
            "2": _lin_from(sd, "pooled_text_embedder.2"),
        },
        "context_embedder": _lin_from(sd, "context_embedder"),
        "x_embedder": _lin_from(sd, "x_embedder"),
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_joint_p(sd, f"blocks.{i}") for i in range(n_joint)]),
        "single_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_single_p(sd, f"single_blocks.{i}") for i in range(n_single)]),
        "final_norm_out": {"linear": _lin_from(sd, "final_norm_out.linear")},
        "final_proj_out": _lin_from(sd, "final_proj_out"),
    }
    if "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_embedder"] = {
            "0": _lin_from(sd, "guidance_embedder.timestep_embedder.0"),
            "2": _lin_from(sd, "guidance_embedder.timestep_embedder.2"),
        }
    return params


def flux_vae_encoder_params_from_torch(sd: dict) -> Params:
    return sd3_vae_encoder_params_from_torch(sd)


def flux_vae_decoder_params_from_torch(sd: dict) -> Params:
    return sd3_vae_decoder_params_from_torch(sd)
