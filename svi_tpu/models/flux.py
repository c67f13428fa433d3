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
import numpy as np

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


def flux_vae_encode(params: Params, image, tiled=False, tile_size=64,
                    tile_stride=32):
    """FluxVAEEncoder (ref flux_vae.py:5-13): SD3 VAE arch, scale 0.3611 /
    shift 0.1159. tiled: whole-forward feathered tiling (inherited from
    SD3VAEEncoder, ref sd3_vae_encoder.py:41-50)."""
    from .sd import _conv2d, _group_norm, _run_plan

    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                flux_vae_encode(params, jnp.moveaxis(t, -1, 1)), 1, -1),
            jnp.moveaxis(image, 1, -1), tile_size, tile_stride), -1, 1)
    x = jnp.moveaxis(image, 1, -1)
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD3_VAE_ENCODER_PLAN, params["blocks"], x, None, None,
                  eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    x = (x[..., :16] - FLUX_VAE_SHIFT_FACTOR) * FLUX_VAE_SCALING_FACTOR
    return jnp.moveaxis(x, -1, 1)


def flux_vae_decode(params: Params, latents, tiled=False, tile_size=64,
                    tile_stride=32):
    """FluxVAEDecoder (ref flux_vae.py:16-24)."""
    from .sd import _conv2d, _group_norm, _run_plan

    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                flux_vae_decode(params, jnp.moveaxis(t, -1, 1)), 1, -1),
            jnp.moveaxis(latents, 1, -1), tile_size, tile_stride), -1, 1)
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


def _ip_attend(x, q, ipadapter):
    """interact_with_ipadapter (ref flux_dit.py:7-12): extra attention of the
    given queries onto the IP tokens, scaled and added. x (B,S,D_model);
    q (B,S,N,D); ipadapter dict ip_k/ip_v (B,T,N,D) + scale."""
    b, s = x.shape[:2]
    o = flash_attention(q, ipadapter["ip_k"].astype(q.dtype),
                        ipadapter["ip_v"].astype(q.dtype))
    return x + ipadapter.get("scale", 1.0) * o.reshape(b, s, -1)


def _flux_joint_attention(p, xa, xb, cos, sin, num_heads, head_dim,
                          only_out_a=False, mask=None, ipadapter=None):
    """FluxJointAttention.forward (ref flux_dit.py:73-106): text (b) tokens
    lead the concatenated sequence. The IP-Adapter attends with the
    PRE-rope image queries (ref :98-99 uses q_a before apply_rope)."""
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
    oa = o[:, sb:]
    if ipadapter is not None:
        oa = _ip_attend(oa, qa, ipadapter)
    oa = _dense(p["a_to_out"], oa)
    if only_out_a:
        return oa
    return oa, _dense(p["b_to_out"], o[:, :sb])


def _flux_joint_block(p, xa, xb, temb, cos, sin, num_heads, head_dim,
                      mask=None, ipadapter=None):
    """FluxJointTransformerBlock.forward (ref flux_dit.py:110-151)."""
    shift_a, scale_a, gate_a, shift_mlp_a, scale_mlp_a, gate_mlp_a = \
        _ada_mod(p["norm1_a"], temb, 6)
    shift_b, scale_b, gate_b, shift_mlp_b, scale_mlp_b, gate_mlp_b = \
        _ada_mod(p["norm1_b"], temb, 6)
    na = _ln_nowb(xa) * (1 + scale_a) + shift_a
    nb = _ln_nowb(xb) * (1 + scale_b) + shift_b
    attn_a, attn_b = _flux_joint_attention(p["attn"], na, nb, cos, sin,
                                           num_heads, head_dim, mask=mask,
                                           ipadapter=ipadapter)
    xa = xa + gate_a * attn_a
    na = _ln_nowb(xa) * (1 + scale_mlp_a) + shift_mlp_a
    xa = xa + gate_mlp_a * _ff(p["ff_a"], na)
    xb = xb + gate_b * attn_b
    nb = _ln_nowb(xb) * (1 + scale_mlp_b) + shift_mlp_b
    xb = xb + gate_mlp_b * _ff(p["ff_b"], nb)
    return xa, xb


def _flux_single_block(p, x, temb, cos, sin, num_heads, head_dim, mask=None,
                       ipadapter=None):
    """FluxSingleTransformerBlock.forward (ref flux_dit.py:205-260): one fused
    qkv+mlp projection, attention and tanh-GELU MLP concatenated into a single
    output projection, gated residual. The IP-Adapter here attends with the
    POST-rope queries over the full sequence (ref :237-243)."""
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
    if ipadapter is not None:
        o = _ip_attend(o, q, ipadapter)
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


def _entity_attention_mask(patched_masks, s_txt, s_img):
    """construct_mask (ref flux_dit.py:341-373): each entity prompt attends
    only to its masked image tokens (and vice versa); entity prompts cannot
    attend each other; the global prompt (last group) sees everything its
    all-ones mask allows. Returns an additive (B,1,S,S) f32 mask."""
    n = len(patched_masks)
    b = patched_masks[0].shape[0]
    total = n * s_txt + s_img
    m = jnp.ones((b, total, total), bool)
    img0 = n * s_txt
    for i, pm in enumerate(patched_masks):
        imask = pm.sum(axis=-1) > 0  # (B, s_img)
        blk = jnp.repeat(imask[:, None, :], s_txt, axis=1)
        m = m.at[:, i * s_txt:(i + 1) * s_txt, img0:].set(blk)
        m = m.at[:, img0:, i * s_txt:(i + 1) * s_txt].set(
            jnp.swapaxes(blk, 1, 2))
    for i in range(n):
        for j in range(n):
            if i != j:
                m = m.at[:, i * s_txt:(i + 1) * s_txt,
                         j * s_txt:(j + 1) * s_txt].set(False)
    return jnp.where(m, 0.0, float("-inf")).astype(jnp.float32)[:, None]


def flux_dit_forward(params: Params, hidden_states, timestep, prompt_emb,
                     pooled_prompt_emb, guidance=None, text_ids=None,
                     image_ids=None, attn_mask=None, controlnet_res=None,
                     ipadapter=None, tiled=False, tile_size=128,
                     tile_stride=64, entity_prompt_emb=None,
                     entity_masks=None):
    """FluxDiT.forward (ref flux_dit.py:404-470). hidden_states (B,16,H,W);
    prompt_emb (B,S,4096) T5 states; pooled (B,768) CLIP; guidance scalar per
    sample (embedded *1000 when the guidance embedder exists).

    controlnet_res: optional (joint_res (19,B,S,D), single_res (38,B,S,D))
    stacks added per block (ref pipelines/flux_image.py:618-636).
    ipadapter: optional (ip_k (57,B,T,N,D), ip_v, scale) per-block K/V
    from flux_ipadapter_forward — joint blocks take rows [:19], single
    blocks rows [19:].

    tiled: whole-forward latent tiling with per-tile RoPE ids (ref
    flux_dit.py:322-338 — layer-wise tiling impossible due to the global
    positional embedding)."""
    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(flux_dit_forward(
                params, jnp.moveaxis(t, -1, 1), timestep, prompt_emb,
                pooled_prompt_emb, guidance=guidance, text_ids=text_ids,
                image_ids=None), 1, -1),
            jnp.moveaxis(hidden_states, 1, -1), tile_size, tile_stride), -1, 1)
    b, _, h, w = hidden_states.shape
    xa, ctx, temb, cos, sin, attn_mask = flux_dit_prelude(
        params, hidden_states, timestep, prompt_emb, pooled_prompt_emb,
        guidance=guidance, text_ids=text_ids, image_ids=image_ids,
        attn_mask=attn_mask, entity_prompt_emb=entity_prompt_emb,
        entity_masks=entity_masks)
    xa = flux_dit_blocks(params, xa, ctx, temb, cos, sin,
                         attn_mask=attn_mask, controlnet_res=controlnet_res,
                         ipadapter=ipadapter)
    return flux_dit_head(params, xa, temb, h, w)


def flux_dit_prelude(params: Params, hidden_states, timestep, prompt_emb,
                     pooled_prompt_emb, guidance=None, text_ids=None,
                     image_ids=None, attn_mask=None, entity_prompt_emb=None,
                     entity_masks=None):
    """Everything before the block stacks (ref lets_dance_flux:564-597):
    time/pooled/guidance conditioning, patchify+x_embedder, context
    embedding (with the EliGen entity grouping), RoPE tables. Split out so
    TeaCache can decide reuse on the embedded tokens (ref :600-606)."""
    x = hidden_states
    b, _, h, w = x.shape
    dtype = x.dtype
    # conditioning follows the latent compute dtype (callers may hand f32
    # encoder outputs to a bf16 model; mixed ctx/xa would promote the block
    # scan carry and break under jit)
    prompt_emb = prompt_emb.astype(dtype)
    if entity_prompt_emb is not None:
        entity_prompt_emb = entity_prompt_emb.astype(dtype)
    if image_ids is None:
        image_ids = prepare_image_ids(x)
    if text_ids is None:
        text_ids = jnp.zeros((b, prompt_emb.shape[1], 3), jnp.float32)

    if entity_prompt_emb is not None and entity_masks is not None:
        # EliGen (ref flux_dit.py:376-402 process_entity_masks): entity
        # prompt groups lead the text stream [e_0..e_{n-1} | global] with a
        # block attention mask; rope text ids are repeated per group.
        n_ent = entity_masks.shape[1]
        rep = x.shape[1]
        mask_imgs = [jnp.repeat(entity_masks[:, i].astype(dtype), rep, axis=1)
                     for i in range(n_ent)]
        mask_imgs.append(jnp.ones_like(mask_imgs[0]))  # global sees all
        patched = [_patchify(m) for m in mask_imgs]
        s_txt = prompt_emb.shape[1]
        attn_mask = _entity_attention_mask(patched, s_txt, patched[0].shape[1])
        prompt_emb = jnp.concatenate(
            [entity_prompt_emb[:, i] for i in range(n_ent)] + [prompt_emb],
            axis=1)
        text_ids = jnp.concatenate([text_ids] * (n_ent + 1), axis=1)

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
    return xa, ctx, temb, cos, sin, attn_mask


def flux_teacache_modulated(params: Params, xa, temb):
    """blocks[0].norm1_a modulated input — the TeaCache decision signal
    (ref flux_image.py:480-483)."""
    p0 = jax.tree.map(lambda a: a[0], params["blocks"])
    shift_a, scale_a, *_ = _ada_mod(p0["norm1_a"], temb, 6)
    return _ln_nowb(xa) * (1 + scale_a) + shift_a


def flux_dit_blocks(params: Params, xa, ctx, temb, cos, sin, attn_mask=None,
                    controlnet_res=None, ipadapter=None):
    """The joint + single block stacks (ref lets_dance_flux:608-637);
    returns the final image tokens (pre-head)."""
    num_heads = xa.shape[-1] // 128
    n_joint = jax.tree.leaves(params["blocks"])[0].shape[0]
    joint_res = single_res = None
    if controlnet_res is not None:
        joint_res, single_res = controlnet_res
    ip_joint = ip_single = None
    if ipadapter is not None:
        ip_k, ip_v, ip_scale = ipadapter
        ip_joint = (ip_k[:n_joint], ip_v[:n_joint])
        ip_single = (ip_k[n_joint:], ip_v[n_joint:])

    def joint_body(carry, args):
        a, c_ = carry
        p, res, ip = args
        ipk = None if ip is None else {"ip_k": ip[0], "ip_v": ip[1],
                                       "scale": ip_scale}
        a, c_ = _flux_joint_block(p, a, c_, temb, cos, sin, num_heads, 128,
                                  mask=attn_mask, ipadapter=ipk)
        if res is not None:
            a = a + res.astype(a.dtype)
        return (a, c_), None

    (xa, ctx), _ = jax.lax.scan(joint_body, (xa, ctx),
                                (params["blocks"], joint_res, ip_joint))

    xs = jnp.concatenate([ctx, xa], axis=1)
    sb = ctx.shape[1]

    def single_body(x_, args):
        p, res, ip = args
        ipk = None if ip is None else {"ip_k": ip[0], "ip_v": ip[1],
                                       "scale": ip_scale}
        x_ = _flux_single_block(p, x_, temb, cos, sin, num_heads, 128,
                                mask=attn_mask, ipadapter=ipk)
        if res is not None:
            x_ = x_.at[:, sb:].add(res.astype(x_.dtype))
        return x_, None

    xs, _ = jax.lax.scan(single_body, xs,
                         (params["single_blocks"], single_res, ip_single))
    return xs[:, ctx.shape[1]:]


def flux_dit_head(params: Params, xa, temb, h, w):
    """AdaLayerNormContinuous head + unpatchify (ref lets_dance_flux:643-646)."""
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


# ---------------------------------------------------------------------------
# ControlNet (ref flux_controlnet.py)
# ---------------------------------------------------------------------------


def align_res_stack(res, num_blocks):
    """align_res_stack_to_original_blocks (ref flux_controlnet.py:51-57):
    res (n, B, S, D) -> (num_blocks, B, S, D) by interval repetition."""
    n = res.shape[0]
    interval = (num_blocks + n - 1) // n
    idx = np.arange(num_blocks) // interval
    return res[idx]


def flux_controlnet_forward(params: Params, hidden_states,
                            controlnet_conditioning, timestep, prompt_emb,
                            pooled_prompt_emb, guidance=None, text_ids=None,
                            image_ids=None, processor_id_index=None,
                            num_joint_out=19, num_single_out=38):
    """FluxControlNet.forward (ref flux_controlnet.py:59-103): a truncated
    FluxDiT whose per-block linear taps become residuals for the full DiT;
    the control image is patchified into an extra x-embedding; union
    ControlNets prepend a task-mode embedding to the text tokens.

    Returns (joint_res (num_joint_out,B,S,D), single_res (num_single_out,...))
    already aligned to the full DiT's block counts."""
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
        g = timestep_embedding(jnp.atleast_1d(guidance) * 1000,
                               256).astype(dtype)
        temb = temb + _dense(params["guidance_embedder"]["2"],
                             jax.nn.silu(_dense(
                                 params["guidance_embedder"]["0"], g)))

    ctx = _dense(params["context_embedder"], prompt_emb)
    if "controlnet_mode_embedder" in params:  # union mode (ref :84-88)
        mode = params["controlnet_mode_embedder"][
            jnp.asarray([[processor_id_index]])].astype(dtype)
        ctx = jnp.concatenate([jnp.broadcast_to(mode, (b, 1, ctx.shape[-1])),
                               ctx], axis=1)
        text_ids = jnp.concatenate([text_ids[:, :1], text_ids], axis=1)
    cos, sin = flux_rope_tables(jnp.concatenate([text_ids, image_ids],
                                                axis=1))

    xa = _dense(params["x_embedder"], _patchify(x))
    xa = xa + _dense(params["controlnet_x_embedder"],
                     _patchify(controlnet_conditioning))

    num_heads = xa.shape[-1] // 128

    def joint_body(carry, args):
        a, c_ = carry
        p, tap = args
        a, c_ = _flux_joint_block(p, a, c_, temb, cos, sin, num_heads, 128)
        return (a, c_), _dense(tap, a)

    (xa, ctx), joint_res = jax.lax.scan(
        joint_body, (xa, ctx), (params["blocks"],
                                params["controlnet_blocks"]))

    xs = jnp.concatenate([ctx, xa], axis=1)
    sb = ctx.shape[1]

    def single_body(x_, args):
        p, tap = args
        x_ = _flux_single_block(p, x_, temb, cos, sin, num_heads, 128)
        return x_, _dense(tap, x_[:, sb:])

    _, single_res = jax.lax.scan(
        single_body, xs, (params["single_blocks"],
                          params["controlnet_single_blocks"]))

    return (align_res_stack(joint_res, num_joint_out),
            align_res_stack(single_res, num_single_out))


def flux_controlnet_params_from_torch(sd: dict) -> Params:
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
        "controlnet_x_embedder": _lin_from(sd, "controlnet_x_embedder"),
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_joint_p(sd, f"blocks.{i}") for i in range(n_joint)]),
        "single_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_single_p(sd, f"single_blocks.{i}") for i in range(n_single)]),
        "controlnet_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_lin_from(sd, f"controlnet_blocks.{i}")
              for i in range(n_joint)]),
        "controlnet_single_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_lin_from(sd, f"controlnet_single_blocks.{i}")
              for i in range(n_single)]),
    }
    if "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_embedder"] = {
            "0": _lin_from(sd, "guidance_embedder.timestep_embedder.0"),
            "2": _lin_from(sd, "guidance_embedder.timestep_embedder.2"),
        }
    if "controlnet_mode_embedder.weight" in sd:
        params["controlnet_mode_embedder"] = jnp.asarray(
            _t(sd["controlnet_mode_embedder.weight"]))
    return params


# ---------------------------------------------------------------------------
# IP-Adapter (ref flux_ipadapter.py)
# ---------------------------------------------------------------------------


def flux_ipadapter_forward(params: Params, image_emb, scale=1.0,
                           num_heads=24, head_dim=128):
    """FluxIpAdapter.forward (ref flux_ipadapter.py:52-74): SigLIP image
    embedding (B,1152) -> 128 tokens of 4096 via the MLP projector, then
    per-block K/V projections (k RMS-normed, no affine).

    Returns (ip_k (L,1,T,N,D), ip_v (L,1,T,N,D), scale) for
    flux_dit_forward(ipadapter=...)."""
    x = _dense(params["image_proj"]["0"], image_emb)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _dense(params["image_proj"]["2"], x)
    d = params["image_proj"]["norm"]["w"].shape[0]
    x = x.reshape(-1, x.shape[-1] // d, d)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)
         * params["image_proj"]["norm"]["w"].astype(jnp.float32)
         + params["image_proj"]["norm"]["b"].astype(jnp.float32)
         ).astype(x.dtype)
    x = x.reshape(1, -1, d)

    def body(_, p):
        t = x.shape[1]
        ip_k = _dense(p["to_k_ip"], x).reshape(1, t, num_heads, head_dim)
        kf = ip_k.astype(jnp.float32)
        ip_k = (kf * jax.lax.rsqrt((kf * kf).mean(-1, keepdims=True) + 1e-5)
                ).astype(x.dtype)
        ip_v = _dense(p["to_v_ip"], x).reshape(1, t, num_heads, head_dim)
        return None, (ip_k, ip_v)

    _, (ip_k, ip_v) = jax.lax.scan(body, None, params["ipadapter_modules"])
    return ip_k, ip_v, scale


def flux_ipadapter_params_from_torch(sd: dict) -> Params:
    n = 0
    while f"ipadapter_modules.{n}.to_k_ip.weight" in sd:
        n += 1
    return {
        "image_proj": {
            "0": _lin_from(sd, "image_proj.proj.0"),
            "2": _lin_from(sd, "image_proj.proj.2"),
            "norm": {"w": jnp.asarray(_t(sd["image_proj.norm.weight"])),
                     "b": jnp.asarray(_t(sd["image_proj.norm.bias"]))},
        },
        "ipadapter_modules": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[{"to_k_ip": _lin_from(sd, f"ipadapter_modules.{i}.to_k_ip"),
               "to_v_ip": _lin_from(sd, f"ipadapter_modules.{i}.to_v_ip")}
              for i in range(n)]),
    }
