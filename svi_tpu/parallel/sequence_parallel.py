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


def ring_attention(q, k_local, v_local, axis: str, kv_len_total: int):
    """Ring attention over the 'axis' shards: K/V blocks rotate with ppermute
    while each step's partial flash result merges via logsumexp (compute and
    ICI transfer overlap; bandwidth-optimal vs all-gather). Layout (B,S,N,D);
    shards are ordered blocks of the global (padded) sequence; keys at global
    positions >= kv_len_total are masked."""
    from ..ops.attention import flash_attention_with_lse

    b, s, n, d = q.shape
    qt = jnp.swapaxes(q, 1, 2)  # (B,N,S,D)
    n_dev = jax.lax.axis_size(axis)  # static mesh axis size
    my_idx = jax.lax.axis_index(axis)
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def step_fn(i, carry):
        o, lse, kb, vb = carry
        src = (my_idx - i) % n_dev
        # valid keys inside this rotated block (padding sits at the global end)
        blk_valid = jnp.clip(kv_len_total - src * s, 0, s)
        kt = jnp.swapaxes(kb, 1, 2)
        vt = jnp.swapaxes(vb, 1, 2)
        o_i, lse_i = flash_attention_with_lse(qt, kt, vt, kv_len=blk_valid)
        # cross-shard softmax merge (guide: cross_chip_softmax_combine)
        lse_new = jnp.logaddexp(lse, lse_i)
        w_old = jnp.exp(lse - lse_new)[..., None]
        w_new = jnp.exp(lse_i - lse_new)[..., None]
        o = o * w_old + o_i.astype(jnp.float32) * w_new
        # rotate K/V to the next chip (point-to-point over ICI)
        kb = jax.lax.ppermute(kb, axis, perm)
        vb = jax.lax.ppermute(vb, axis, perm)
        return o, lse_new, kb, vb

    o0 = jnp.zeros((b, n, s, d), jnp.float32)
    lse0 = jnp.full((b, n, s), -1e30, jnp.float32)
    o, lse, _, _ = jax.lax.fori_loop(0, n_dev, step_fn, (o0, lse0, k_local, v_local))
    return jnp.swapaxes(o, 1, 2).astype(q.dtype)


def _self_attention_sp(p, cfg, x, cos_l, sin_l, kv_len, axis, lora, lora_scale, ring=False):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    from ..models.wan_dit import _dense_lora, _l

    q = rms_norm(_dense_lora(p["q"], x, _l(lora, "q"), lora_scale), p["norm_q"]["w"], eps=cfg.eps)
    k = rms_norm(_dense_lora(p["k"], x, _l(lora, "k"), lora_scale), p["norm_k"]["w"], eps=cfg.eps)
    v = _dense_lora(p["v"], x, _l(lora, "v"), lora_scale).reshape(b, s, n, hd)
    q = apply_rope(q.reshape(b, s, n, hd), cos_l, sin_l)
    k = apply_rope(k.reshape(b, s, n, hd), cos_l, sin_l)
    if ring:
        o = ring_attention(q, k, v, axis, kv_len).reshape(b, s, d)
    else:
        # gather keys/values across sequence shards (ICI collective)
        k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        o = flash_attention(q, k, v, kv_len=kv_len).reshape(b, s, d)
    return _dense_lora(p["o"], o, _l(lora, "o"), lora_scale)


def _audio_attn_sp(p, cfg, x_local, audio_embed, num_frames, kv_len, axis):
    """Per-frame audio cross-attention under sequence sharding.

    The per-frame token grouping (ref attention.py:282-372 rearranges
    `B (N_t S) C -> (B N_t) S C`) needs frame-aligned token blocks, but SP
    shards are arbitrary contiguous slices — so tokens are all-gathered over
    ICI (one (b,S,d) gather; the audio attn itself is tiny vs self-attn),
    the exact single-device per-frame attention runs on the true sequence,
    and each shard keeps its own slice of the output. The reference's SP
    analog is the block-diagonal xformers mask (attention.py:348-356).
    """
    from ..models.wan_dit import _audio_cross_attention

    shard = x_local.shape[1]
    x_full = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)  # (b, S_pad, d)
    o_full = _audio_cross_attention(p, cfg, x_full[:, :kv_len], audio_embed, num_frames)
    s_pad = x_full.shape[1]
    if s_pad != kv_len:
        o_full = jnp.pad(o_full, ((0, 0), (0, s_pad - kv_len), (0, 0)))
    i = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(o_full, i * shard, shard, axis=1)


def _dit_block_sp(p, cfg, x, context, t_mod, cos_l, sin_l, kv_len, axis, lora, lora_scale,
                  num_img_tokens=257, ring=False, audio_embed=None, num_frames=0,
                  add_condition=None):
    from ..models.wan_dit import _cross_attention, _dense, _dense_lora, _l

    mod = p["modulation"].astype(t_mod.dtype) + t_mod
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention_sp(
        p["self_attn"], cfg, input_x, cos_l, sin_l, kv_len, axis,
        _l(lora, "self_attn"), lora_scale, ring=ring,
    )
    if cfg.enable_customtalk and audio_embed is not None:
        # customtalk (wan_video_dit_talk.py:358-383): bottleneck FFNs gate the
        # context/audio attention inputs; the audio-attn output becomes the
        # next block's add_condition carry. All pre-FFNs are feature-dim
        # (shard-local); only the per-frame audio attn needs the SP gather.
        def _pre_ffn(fp, v):
            return _dense(fp["2"], gelu_tanh(_dense(fp["0"], v)))

        cond_in = add_condition if add_condition is not None else x
        x_in_ctx = x + _pre_ffn(p["customtalk_context_pre_ffns"], layer_norm(cond_in, eps=cfg.eps))
        x_c = _cross_attention(
            p["cross_attn"], cfg,
            layer_norm(x_in_ctx, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
            num_img_tokens=num_img_tokens, lora=_l(lora, "cross_attn"), lora_scale=lora_scale,
        )
        x = x + x_c
        x_in_audio = x + _pre_ffn(p["customtalk_audio_pre_ffns"], layer_norm(x_c, eps=cfg.eps))
        xa = layer_norm(x_in_audio, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x_a = _audio_attn_sp(p["audio_cross_attn"], cfg, xa, audio_embed, num_frames, kv_len, axis)
        x = x + x_a
        input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
        ffn_lora = _l(lora, "ffn")
        h = gelu_tanh(_dense_lora(p["ffn"]["0"], input_x, _l(ffn_lora, "0"), lora_scale))
        ffn = _dense_lora(p["ffn"]["2"], h, _l(ffn_lora, "2"), lora_scale)
        return x + gate_mlp * ffn, x_a
    x = x + _cross_attention(
        p["cross_attn"], cfg,
        layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
        num_img_tokens=num_img_tokens, lora=_l(lora, "cross_attn"), lora_scale=lora_scale,
    )
    if cfg.enable_multitalk and audio_embed is not None:
        xa = layer_norm(x, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x = x + _audio_attn_sp(p["audio_cross_attn"], cfg, xa, audio_embed, num_frames, kv_len, axis)
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
    ring: bool = False,
    audio_embed_tuple=None,
    remat_granularity: Optional[int] = None,
    save_attention: bool = False,
    offload_carries: bool = False,
) -> jax.Array:
    """Sequence-parallel equivalent of wan_dit.forward. Call under jit with
    `mesh`'s axes ('data', 'sp'); batch shards over 'data'. Supports the
    multitalk/customtalk audio branches (SVI-Talk, ref svi_video_talk.py
    :83-155): audio_embed_tuple as in wan_dit.forward."""
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

    audio_embed = None
    if (cfg.enable_multitalk or cfg.enable_customtalk) and audio_embed_tuple is not None:
        # AudioProjModel is tiny — runs replicated, outside the shard_map
        audio_embed = wan_dit.audio_proj_forward(
            params, cfg, audio_embed_tuple[0], audio_embed_tuple[1]
        )
    customtalk_carry = cfg.enable_customtalk and audio_embed is not None
    cond0 = None
    if customtalk_carry:
        cond0 = (add_condition.astype(tokens.dtype) if add_condition is not None
                 else jnp.zeros((b, S, d), tokens.dtype))
        if S_pad != S:
            cond0 = jnp.pad(cond0, ((0, 0), (0, S_pad - S), (0, 0)))
    audio_in = audio_embed if audio_embed is not None else jnp.zeros((0,), cfg.dtype)
    cond_in = cond0 if cond0 is not None else jnp.zeros((0,), cfg.dtype)

    lora_in = lora if lora is not None else {}
    tok_spec = P("data", "sp", None)
    rep = P()
    dspec = P("data")

    def run(blocks, tok, ctx_, t_mod_, t_, cos_f, sin_f, lora_, audio_, cond_):
        shard = tok.shape[1]
        i = jax.lax.axis_index("sp")
        cos_l = jax.lax.dynamic_slice_in_dim(cos_f, i * shard, shard)
        sin_l = jax.lax.dynamic_slice_in_dim(sin_f, i * shard, shard)
        lora_ = lora_ or None
        audio_ = audio_ if audio_embed is not None else None

        def block_fn(tk, bp, lbp, cond=None):
            if use_remat and offload_carries:
                tk = jax.ad_checkpoint.checkpoint_name(tk, "block_carry")
            return _dit_block_sp(
                bp, cfg, tk, ctx_, t_mod_, cos_l, sin_l, S, "sp", lbp, lora_scale,
                num_img_tokens=n_img, ring=ring, audio_embed=audio_,
                num_frames=grid[0], add_condition=cond,
            )

        policy = None
        if use_remat and offload_carries:
            policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=(["flash_out", "flash_lse"]
                                          if save_attention else []),
                names_which_can_be_offloaded=["block_carry"],
                offload_src="device", offload_dst="pinned_host")
        elif use_remat and save_attention:
            policy = jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse")
        if use_remat:
            block_fn = jax.checkpoint(block_fn, policy=policy)
        group = remat_granularity if use_remat else None

        if customtalk_carry:
            def ct_body(carry, xs):
                tk, cond = carry
                if lora_ is None:
                    tk, cond = block_fn(tk, xs, None, cond)
                else:
                    tk, cond = block_fn(tk, xs[0], xs[1], cond)
                return (tk, cond)

            xs = blocks if lora_ is None else (blocks, lora_)
            tok, _ = wan_dit.scan_blocks_remat(ct_body, (tok, cond_), xs,
                                               group=group, policy=policy)
        elif lora_ is None:
            def scan_body(tk, bp):
                return block_fn(tk, bp, None)

            tok = wan_dit.scan_blocks_remat(scan_body, tok, blocks,
                                            group=group, policy=policy)
        else:
            def scan_body(tk, xs):
                return block_fn(tk, *xs)

            tok = wan_dit.scan_blocks_remat(scan_body, tok, (blocks, lora_),
                                            group=group, policy=policy)
        # shard-local head (wan_dit.head): modulated norm + output projection
        return wan_dit.head({"head": head_params}, cfg, tok, t_)

    head_params = params["head"]
    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(rep, tok_spec, dspec, dspec, dspec, rep, rep, rep,
                  dspec if audio_embed is not None else rep,
                  tok_spec if customtalk_carry else rep),
        out_specs=tok_spec,
        check_vma=False,
    )
    out = run_sharded(params["blocks"], tokens, ctx, t_mod, t, cos, sin, lora_in,
                      audio_in, cond_in)
    out = out[:, :S]
    return wan_dit.unpatchify(params, cfg, out, grid)
