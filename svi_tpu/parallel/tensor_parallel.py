"""Tensor-parallel DiT forward: WEIGHTS sharded over the mesh ('tp' = the
'sp' mesh axis reused), Megatron-style.

This is what makes the 14B flagship fit: bf16 14B = 28GB > one v5e's 16GB HBM,
but sharded 8-way each chip holds 3.5GB. Per block:

  * q/k/v and ffn.0 are COLUMN-parallel (output features sharded — each chip
    computes its own attention heads / ffn hidden slice);
  * o and ffn.2 are ROW-parallel (input features sharded, partial sums
    combined with one psum per matmul — 2 psums per block over ICI);
  * q/k norms are RMSNorm over the FULL model dim (wan_video_dit.py:221-222),
    so the mean-of-squares itself is a psum;
  * tokens, adaLN modulation, and context stay replicated (full dim).

Sequence stays replicated here (32k bf16 tokens ≈ 335MB — fine); combine with
sequence_parallel in a 2D mesh in a later round.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import wan_dit
from ..ops.attention import flash_attention
from ..ops.norms import gelu_tanh, layer_norm, modulate
from ..ops.rope import apply_rope, rope_angles_for_grid

AXIS = "sp"  # reuse the mesh's second axis as the tensor axis


def _rms_norm_tp(x, weight_local, eps, axis):
    """RMSNorm over the full (sharded) feature dim: psum the sum-of-squares."""
    xf = x.astype(jnp.float32)
    local_sq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    local_n = xf.shape[-1]
    total_sq = jax.lax.psum(local_sq, axis)
    total_n = local_n * jax.lax.psum(1, axis)
    y = xf * jax.lax.rsqrt(total_sq / total_n + eps)
    return y.astype(x.dtype) * weight_local


def _dense(p, x):
    """Column-parallel (or replicated) dense. Delegates to wan_dit._dense so
    every quantized leaf layout (w_q8 / w_q / packed w_q4) executes sharded
    exactly as it does single-chip: out features (and their per-channel
    scales) are sharded, the matmul is shard-local. For W8A8 the dynamic
    per-token activation scale is computed over the full (replicated) input
    features, so column-parallel W8A8 is bit-identical to single-chip."""
    return wan_dit._dense(p, x)


def _dense_row(p, x, axis):
    """Row-parallel: partial matmul + psum, bias added once (post-psum).

    Quantized leaves: the local shard dequantizes its int8/int4 partial
    product to float BEFORE the psum (per-output-channel scales are
    replicated at row sites), so partial sums combine exactly. W8A8 numerics
    differ slightly from single-chip — each shard quantizes its activation
    slice with its own per-token max, which is a finer (more accurate)
    grid than the global one."""
    if "b" in p:
        pb = {k: v for k, v in p.items() if k != "b"}
        y = jax.lax.psum(wan_dit._dense(pb, x), axis)
        return y + p["b"].astype(x.dtype)
    return jax.lax.psum(wan_dit._dense(p, x), axis)


def _self_attention_tp(p, cfg, x, cos, sin, n_local, axis):
    b, s, d = x.shape
    hd = cfg.head_dim
    q = _rms_norm_tp(_dense(p["q"], x), p["norm_q"]["w"], cfg.eps, axis)
    k = _rms_norm_tp(_dense(p["k"], x), p["norm_k"]["w"], cfg.eps, axis)
    v = _dense(p["v"], x).reshape(b, s, n_local, hd)
    q = apply_rope(q.reshape(b, s, n_local, hd), cos, sin)
    k = apply_rope(k.reshape(b, s, n_local, hd), cos, sin)
    o = flash_attention(q, k, v).reshape(b, s, n_local * hd)
    return _dense_row(p["o"], o, axis)


def _cross_attention_tp(p, cfg, x, ctx, n_local, num_img_tokens, axis):
    b, s, d = x.shape
    hd = cfg.head_dim
    if cfg.has_image_input:
        img, txt = ctx[:, :num_img_tokens], ctx[:, num_img_tokens:]
    else:
        img, txt = None, ctx
    q = _rms_norm_tp(_dense(p["q"], x), p["norm_q"]["w"], cfg.eps, axis).reshape(b, s, n_local, hd)
    k = _rms_norm_tp(_dense(p["k"], txt), p["norm_k"]["w"], cfg.eps, axis)
    v = _dense(p["v"], txt)
    lk = txt.shape[1]
    o = flash_attention(q, k.reshape(b, lk, n_local, hd), v.reshape(b, lk, n_local, hd))
    if img is not None:
        k_img = _rms_norm_tp(_dense(p["k_img"], img), p["norm_k_img"]["w"], cfg.eps, axis)
        v_img = _dense(p["v_img"], img)
        li = img.shape[1]
        o = o + flash_attention(q, k_img.reshape(b, li, n_local, hd), v_img.reshape(b, li, n_local, hd))
    return _dense_row(p["o"], o.reshape(b, s, n_local * hd), axis)


def _audio_cross_attention_tp(p, cfg, x, audio, num_frames, n_local, axis):
    """Per-frame audio cross attention, head-parallel (wan_dit.
    _audio_cross_attention with q/k/v column-sharded by head and the output
    projection row-parallel; per-frame grouping is token-local, so the only
    collective is the proj psum). Uses the SPLIT k_linear/v_linear produced by
    shard_dit_params_tp (the fused kv_linear out-layout (2, n, hd) cannot be
    head-sharded with a flat PartitionSpec)."""
    b, S, d = x.shape
    f = num_frames
    s = S // f
    hd = cfg.head_dim
    xf = x.reshape(b * f, s, d)
    q = _dense(p["q_linear"], xf).reshape(b * f, s, n_local, hd)
    na = audio.shape[2]
    a = audio.reshape(b * f, na, -1).astype(x.dtype)
    k = _dense(p["k_linear"], a).reshape(b * f, na, n_local, hd)
    v = _dense(p["v_linear"], a).reshape(b * f, na, n_local, hd)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b * f, s, n_local * hd)
    return _dense_row(p["proj"], o.reshape(b, S, n_local * hd), axis)


def _dit_block_tp(p, cfg, x, context, t_mod, cos, sin, n_local, num_img_tokens, axis,
                  audio_embed=None, num_frames=0, add_condition=None):
    mod = p["modulation"].astype(t_mod.dtype) + t_mod
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention_tp(p["self_attn"], cfg, input_x, cos, sin, n_local, axis)
    if cfg.enable_customtalk and audio_embed is not None:
        # customtalk pre-FFNs are tiny bottlenecks (d->128->d) — replicated
        def _pre_ffn(fp, v):
            return _dense(fp["2"], gelu_tanh(_dense(fp["0"], v)))

        cond_in = add_condition if add_condition is not None else x
        x_in_ctx = x + _pre_ffn(p["customtalk_context_pre_ffns"], layer_norm(cond_in, eps=cfg.eps))
        x_c = _cross_attention_tp(
            p["cross_attn"], cfg,
            layer_norm(x_in_ctx, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
            n_local, num_img_tokens, axis,
        )
        x = x + x_c
        x_in_audio = x + _pre_ffn(p["customtalk_audio_pre_ffns"], layer_norm(x_c, eps=cfg.eps))
        xa = layer_norm(x_in_audio, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x_a = _audio_cross_attention_tp(p["audio_cross_attn"], cfg, xa, audio_embed,
                                        num_frames, n_local, axis)
        x = x + x_a
        input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
        h = gelu_tanh(_dense(p["ffn"]["0"], input_x))
        ffn = _dense_row(p["ffn"]["2"], h, axis)
        return x + gate_mlp * ffn, x_a
    x = x + _cross_attention_tp(
        p["cross_attn"], cfg,
        layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
        n_local, num_img_tokens, axis,
    )
    if cfg.enable_multitalk and audio_embed is not None:
        xa = layer_norm(x, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x = x + _audio_cross_attention_tp(p["audio_cross_attn"], cfg, xa, audio_embed,
                                          num_frames, n_local, axis)
    input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    h = gelu_tanh(_dense(p["ffn"]["0"], input_x))
    ffn = _dense_row(p["ffn"]["2"], h, axis)
    return x + gate_mlp * ffn


def block_param_specs(has_image_input: bool, multitalk: bool = False,
                      customtalk: bool = False) -> dict:
    """PartitionSpecs for the STACKED per-block params (leading layer axis).

    column-parallel (out sharded): q/k/v, ffn.0 — w (L, in, out) -> shard axis 2,
      b (L, out) -> shard axis 1; their full-dim q/k norms slice the same way.
    row-parallel (in sharded): o, ffn.2 — w (L, in, out) -> shard axis 1,
      b replicated.
    audio_cross_attn (multitalk/customtalk): q/k/v column-parallel by head
      (kv_linear pre-split by split_audio_kv), proj row-parallel.
    """
    col_w = P(None, None, AXIS)
    col_b = P(None, AXIS)
    row_w = P(None, AXIS, None)
    rep = P()

    def col(pspec_bias=col_b):
        return {"w": col_w, "b": pspec_bias}

    attn = {
        "q": col(), "k": col(), "v": col(),
        "o": {"w": row_w, "b": rep},
        "norm_q": {"w": col_b}, "norm_k": {"w": col_b},
    }
    cross = dict(attn)
    if has_image_input:
        cross = dict(attn)
        cross["k_img"] = col()
        cross["v_img"] = col()
        cross["norm_k_img"] = {"w": col_b}
    specs = {
        "self_attn": attn,
        "cross_attn": cross,
        "norm3": {"w": rep, "b": rep},
        "ffn": {"0": col(), "2": {"w": row_w, "b": rep}},
        "modulation": rep,
    }
    if multitalk or customtalk:
        specs["audio_cross_attn"] = {
            "q_linear": col(),
            "k_linear": col(),
            "v_linear": col(),
            "proj": {"w": row_w, "b": rep},
        }
        specs["norm_x"] = {"w": rep, "b": rep}
    if customtalk:
        pre = {"0": {"w": rep, "b": rep}, "2": {"w": rep, "b": rep}}
        specs["customtalk_context_pre_ffns"] = pre
        specs["customtalk_audio_pre_ffns"] = pre
    return specs


def block_param_specs_for(blocks: dict, has_image_input: bool,
                          multitalk: bool = False, customtalk: bool = False,
                          axis: str = AXIS) -> dict:
    """PartitionSpecs derived from the ACTUAL blocks pytree, so quantized
    param layouts (quantize_params_w8a8 / _int8 / _int4) shard correctly:

    column-parallel sites: every leaf's last axis is the out-feature axis
      (w (L,in,out), w_q8, packed w_q4 (L,in/2,out), group scales
      (L,in/G,out), per-channel scales (L,1,out), biases (L,out)) — shard it.
    row-parallel sites: weights (L,in,out) shard the in axis; biases and
      per-output-channel scales are replicated (applied post- or pre-psum
      uniformly). Packed int4 CANNOT row-shard: the half-split nibble layout
      interleaves input rows i and i+in/2 in one byte row, which does not
      match the contiguous activation slice a shard holds — use w8a8/int8
      quantization for tensor-parallel serving (int4 exists to fit one chip,
      which TP makes unnecessary).
    """
    base = block_param_specs(has_image_input, multitalk, customtalk)
    if axis != AXIS:
        base = jax.tree.map(
            lambda s: P(*(axis if a == AXIS else a for a in s)),
            base, is_leaf=lambda x: isinstance(x, P))
    col_w = P(None, None, axis)
    row_w = P(None, axis, None)
    row_leaf = {"w": row_w, "b": P(), "w_q8": row_w, "scale8": P(),
                "w_q": row_w, "scale": P()}

    def walk(spec_site, param_site):
        out = {}
        role = None
        if isinstance(spec_site, dict) and "w" in spec_site:
            role = ("col" if spec_site["w"] == col_w
                    else "row" if spec_site["w"] == row_w else None)
        for k, v in param_site.items():
            if isinstance(v, dict):
                out[k] = walk(spec_site[k], v)
            elif k in spec_site:
                out[k] = spec_site[k]
            elif role == "col":
                out[k] = P(*([None] * (v.ndim - 1) + [axis]))
            elif role == "row":
                if k not in row_leaf:
                    raise ValueError(
                        f"packed-int4 leaf {k!r} cannot be row-sharded "
                        "(half-split nibble layout); quantize with w8a8/int8 "
                        "for tensor parallelism")
                out[k] = row_leaf[k]
            else:
                raise ValueError(f"no spec for leaf {k!r} at a replicated site")
        return out

    return walk(base, blocks)


def split_audio_kv(blocks: dict) -> dict:
    """Split the fused audio kv_linear (out layout (2, n, hd), wan_dit.
    _audio_cross_attention) into separate k_linear/v_linear so the out axis
    can be head-sharded."""
    if "audio_cross_attn" not in blocks:
        return blocks
    blocks = dict(blocks)
    aca = dict(blocks["audio_cross_attn"])
    kv = aca.pop("kv_linear")
    # every leaf's last axis is the out-feature axis (true for w, biases,
    # quantized weights, and their per-channel/group scales alike)
    d = next(iter(kv.values())).shape[-1] // 2
    aca["k_linear"] = {k: v[..., :d] for k, v in kv.items()}
    aca["v_linear"] = {k: v[..., d:] for k, v in kv.items()}
    blocks["audio_cross_attn"] = aca
    return blocks


def shard_dit_params_tp(params: dict, cfg, mesh: Mesh) -> dict:
    """Place the DiT params with TP shardings (blocks sharded over AXIS,
    everything else replicated) — each chip then holds ~1/n of the blocks'
    weights, which is where ~99% of the parameters live."""
    blocks = split_audio_kv(params["blocks"]) if "blocks" in params else {}
    specs = block_param_specs_for(blocks, cfg.has_image_input,
                                  cfg.enable_multitalk, cfg.enable_customtalk)
    rep = NamedSharding(mesh, P())

    def place(path_spec, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, path_spec))

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = jax.tree.map(place, specs, blocks)
        else:
            out[k] = jax.tree.map(lambda x: jax.device_put(x, rep), v)
    return out


def forward_tp(
    params,
    cfg,
    x: jax.Array,
    timestep: jax.Array,
    context: jax.Array,
    clip_feature: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    add_condition: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    audio_embed_tuple=None,
) -> jax.Array:
    """Tensor-parallel equivalent of wan_dit.forward (inference). Requires
    cfg.num_heads and cfg.ffn_dim divisible by the AXIS size. Supports the
    multitalk/customtalk audio branches (the 14B multitalk DiT is exactly the
    model that needs TP to fit — ref test_svi_talk.py:156-172)."""
    n_tp = mesh.shape[AXIS]
    assert cfg.num_heads % n_tp == 0, f"{cfg.num_heads} heads over {n_tp} chips"
    assert cfg.ffn_dim % n_tp == 0
    n_local = cfg.num_heads // n_tp

    tokens, ctx, t, t_mod, grid = wan_dit.forward_prelude(
        params, cfg, x, timestep, context, clip_feature, y, add_condition
    )
    n_img = clip_feature.shape[1] if (cfg.has_image_input and clip_feature is not None) else 257
    cos, sin = rope_angles_for_grid(grid, cfg.head_dim)
    cos = jnp.asarray(cos)
    sin = jnp.asarray(sin)

    audio_embed = None
    if (cfg.enable_multitalk or cfg.enable_customtalk) and audio_embed_tuple is not None:
        audio_embed = wan_dit.audio_proj_forward(
            params, cfg, audio_embed_tuple[0], audio_embed_tuple[1]
        )
    customtalk_carry = cfg.enable_customtalk and audio_embed is not None
    b, S, d = tokens.shape
    cond0 = (add_condition.astype(tokens.dtype) if add_condition is not None
             else jnp.zeros((b, S, d), tokens.dtype)) if customtalk_carry else jnp.zeros((0,), cfg.dtype)
    audio_in = audio_embed if audio_embed is not None else jnp.zeros((0,), cfg.dtype)

    # params["blocks"] arrives pre-sharded (and audio-kv-split) from
    # shard_dit_params_tp; derive the shard_map specs from its actual
    # structure so quantized layouts (w_q8/w_q/w_q4 + scales) line up
    specs = block_param_specs_for(params["blocks"], cfg.has_image_input,
                                  cfg.enable_multitalk, cfg.enable_customtalk)
    rep = P()
    dspec = P("data")

    def run(blocks, tok, ctx_, t_mod_, cos_f, sin_f, audio_, cond_):
        audio_ = audio_ if audio_embed is not None else None

        def block_fn(tk, bp, cond=None):
            return _dit_block_tp(
                bp, cfg, tk, ctx_, t_mod_, cos_f, sin_f, n_local, n_img, AXIS,
                audio_embed=audio_, num_frames=grid[0], add_condition=cond,
            )

        if customtalk_carry:
            def ct_body(carry, bp):
                tk, cond = carry
                tk, cond = block_fn(tk, bp, cond)
                return (tk, cond), None

            (tok, _), _ = jax.lax.scan(ct_body, (tok, cond_), blocks)
        else:
            def scan_body(tk, bp):
                return block_fn(tk, bp), None

            tok, _ = jax.lax.scan(scan_body, tok, blocks)
        return tok

    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(specs, dspec, dspec, dspec, rep, rep,
                  dspec if audio_embed is not None else rep,
                  dspec if customtalk_carry else rep),
        out_specs=dspec,
        check_vma=False,
    )
    tokens = run_sharded(params["blocks"], tokens, ctx, t_mod, cos, sin,
                         audio_in, cond0)
    return wan_dit.forward_head(params, cfg, tokens, t, grid)
