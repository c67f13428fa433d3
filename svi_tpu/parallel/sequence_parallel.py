"""Sequence-parallel DiT forward over a TPU mesh.

TPU-native replacement for the reference's USP (Ulysses+ring via xfuser,
diffsynth/distributed/xdit_context_parallel.py): the f·h·w patch-token axis is
sharded over the mesh's 'sp' axis with `shard_map`; each shard applies its own
RoPE slice (ref :27-40 semantics), self-attention ALL-GATHERs K/V over ICI
(keys carry their rope'd positions, so gather order == global token order),
the modulated head runs shard-local, and tokens re-assemble via the out spec.
The CFG/batch axis shards over 'data'.

Padded tail tokens (sequence rounded up to the shard multiple) are masked out
of attention via the flash kernel's kv_len and dropped at unpatchify.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import wan_dit
from ..ops.attention import flash_attention
from ..ops.norms import gelu_tanh, layer_norm, modulate, rms_norm
from ..ops.rope import apply_rope, rope_angles_for_grid


def _self_attention_sp(p, cfg, x, cos_l, sin_l, kv_len, axis, lora, lora_scale):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    from ..models.wan_dit import _dense_lora, _l

    q = rms_norm(_dense_lora(p["q"], x, _l(lora, "q"), lora_scale), p["norm_q"]["w"], eps=cfg.eps)
    k = rms_norm(_dense_lora(p["k"], x, _l(lora, "k"), lora_scale), p["norm_k"]["w"], eps=cfg.eps)
    v = _dense_lora(p["v"], x, _l(lora, "v"), lora_scale).reshape(b, s, n, hd)
    q = apply_rope(q.reshape(b, s, n, hd), cos_l, sin_l)
    k = apply_rope(k.reshape(b, s, n, hd), cos_l, sin_l)
    # gather keys/values across sequence shards (ICI collective)
    k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    o = flash_attention(q, k, v, kv_len=kv_len).reshape(b, s, d)
    return _dense_lora(p["o"], o, _l(lora, "o"), lora_scale)


def _dit_block_sp(p, cfg, x, context, t_mod, cos_l, sin_l, kv_len, axis, lora, lora_scale,
                  num_img_tokens=257):
    from ..models.wan_dit import _cross_attention, _dense_lora, _l

    mod = p["modulation"].astype(t_mod.dtype) + t_mod
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention_sp(
        p["self_attn"], cfg, input_x, cos_l, sin_l, kv_len, axis,
        _l(lora, "self_attn"), lora_scale,
    )
    x = x + _cross_attention(
        p["cross_attn"], cfg,
        layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
        num_img_tokens=num_img_tokens, lora=_l(lora, "cross_attn"), lora_scale=lora_scale,
    )
    input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    ffn_lora = _l(lora, "ffn")
    h = gelu_tanh(_dense_lora(p["ffn"]["0"], input_x, _l(ffn_lora, "0"), lora_scale))
    ffn = _dense_lora(p["ffn"]["2"], h, _l(ffn_lora, "2"), lora_scale)
    return x + gate_mlp * ffn


def forward_sp(
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
    lora=None,
    lora_scale: float = 1.0,
    use_remat: bool = False,
) -> jax.Array:
    """Sequence-parallel equivalent of wan_dit.forward. Call under jit with
    `mesh`'s axes ('data', 'sp'); batch shards over 'data'."""
    n_sp = mesh.shape["sp"]
    n_img = clip_feature.shape[1] if (cfg.has_image_input and clip_feature is not None) else 257
    tokens, ctx, t, t_mod, grid = wan_dit.forward_prelude(
        params, cfg, x, timestep, context, clip_feature, y, add_condition
    )
    b, S, d = tokens.shape
    S_pad = (S + n_sp - 1) // n_sp * n_sp
    if S_pad != S:
        tokens = jnp.pad(tokens, ((0, 0), (0, S_pad - S), (0, 0)))
    cos, sin = rope_angles_for_grid(grid, cfg.head_dim)
    cos = jnp.asarray(np.pad(cos, ((0, S_pad - S), (0, 0))))
    sin = jnp.asarray(np.pad(sin, ((0, S_pad - S), (0, 0))))

    lora_in = lora if lora is not None else {}
    tok_spec = P("data", "sp", None)
    rep = P()
    dspec = P("data")

    def run(blocks, tok, ctx_, t_mod_, t_, cos_f, sin_f, lora_):
        shard = tok.shape[1]
        i = jax.lax.axis_index("sp")
        cos_l = jax.lax.dynamic_slice_in_dim(cos_f, i * shard, shard)
        sin_l = jax.lax.dynamic_slice_in_dim(sin_f, i * shard, shard)
        lora_ = lora_ or None

        def block_fn(tk, bp, lbp):
            return _dit_block_sp(
                bp, cfg, tk, ctx_, t_mod_, cos_l, sin_l, S, "sp", lbp, lora_scale,
                num_img_tokens=n_img,
            )

        if use_remat:
            block_fn = jax.checkpoint(block_fn)

        if lora_ is None:
            def scan_body(tk, bp):
                return block_fn(tk, bp, None), None

            tok, _ = jax.lax.scan(scan_body, tok, blocks)
        else:
            def scan_body(tk, xs):
                return block_fn(tk, *xs), None

            tok, _ = jax.lax.scan(scan_body, tok, (blocks, lora_))
        # shard-local head (wan_dit.head): modulated norm + output projection
        return wan_dit.head({"head": head_params}, cfg, tok, t_)

    head_params = params["head"]
    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(rep, tok_spec, dspec, dspec, dspec, rep, rep, rep),
        out_specs=tok_spec,
        check_vma=False,
    )
    out = run_sharded(params["blocks"], tokens, ctx, t_mod, t, cos, sin, lora_in)
    out = out[:, :S]
    return wan_dit.unpatchify(params, cfg, out, grid)
