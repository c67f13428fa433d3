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
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _dense_row(p, x, axis):
    """Row-parallel: partial matmul + psum, bias added once (post-psum)."""
    y = jax.lax.psum(x @ p["w"].astype(x.dtype), axis)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


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


def _dit_block_tp(p, cfg, x, context, t_mod, cos, sin, n_local, num_img_tokens, axis):
    mod = p["modulation"].astype(t_mod.dtype) + t_mod
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention_tp(p["self_attn"], cfg, input_x, cos, sin, n_local, axis)
    x = x + _cross_attention_tp(
        p["cross_attn"], cfg,
        layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
        n_local, num_img_tokens, axis,
    )
    input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    h = gelu_tanh(_dense(p["ffn"]["0"], input_x))
    ffn = _dense_row(p["ffn"]["2"], h, axis)
    return x + gate_mlp * ffn


def block_param_specs(has_image_input: bool) -> dict:
    """PartitionSpecs for the STACKED per-block params (leading layer axis).

    column-parallel (out sharded): q/k/v, ffn.0 — w (L, in, out) -> shard axis 2,
      b (L, out) -> shard axis 1; their full-dim q/k norms slice the same way.
    row-parallel (in sharded): o, ffn.2 — w (L, in, out) -> shard axis 1,
      b replicated.
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
    return {
        "self_attn": attn,
        "cross_attn": cross,
        "norm3": {"w": rep, "b": rep},
        "ffn": {"0": col(), "2": {"w": row_w, "b": rep}},
        "modulation": rep,
    }


def shard_dit_params_tp(params: dict, cfg, mesh: Mesh) -> dict:
    """Place the DiT params with TP shardings (blocks sharded over AXIS,
    everything else replicated) — each chip then holds ~1/n of the blocks'
    weights, which is where ~99% of the parameters live."""
    specs = block_param_specs(cfg.has_image_input)
    rep = NamedSharding(mesh, P())

    def place(path_spec, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, path_spec))

    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = jax.tree.map(place, specs, v)
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
) -> jax.Array:
    """Tensor-parallel equivalent of wan_dit.forward (inference). Requires
    cfg.num_heads and cfg.ffn_dim divisible by the AXIS size."""
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

    specs = block_param_specs(cfg.has_image_input)
    rep = P()
    dspec = P("data")

    def run(blocks, tok, ctx_, t_mod_, cos_f, sin_f):
        def scan_body(tk, bp):
            return _dit_block_tp(
                bp, cfg, tk, ctx_, t_mod_, cos_f, sin_f, n_local, n_img, AXIS
            ), None

        tok, _ = jax.lax.scan(scan_body, tok, blocks)
        return tok

    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(specs, dspec, dspec, dspec, rep, rep),
        out_specs=dspec,
        check_vma=False,
    )
    tokens = run_sharded(params["blocks"], tokens, ctx, t_mod, cos, sin)
    return wan_dit.forward_head(params, cfg, tokens, t, grid)
