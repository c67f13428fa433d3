"""Combined tensor×sequence parallel DiT forward over a 3-axis mesh
('data', 'tp', 'sp').

The production 14B shape: weights shard over 'tp' (fit), the 32k-token
sequence shards over 'sp' (activation bandwidth + more chips), CFG/batch over
'data'. Per block: q/k/v + ffn.0 column-parallel over 'tp' (local heads /
hidden slice), K/V all-gathered (or ring-rotated) over 'sp', o + ffn.2
row-parallel with one psum over 'tp' each, full-dim q/k RMSNorm via 'tp' psum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import wan_dit
from ..ops.attention import flash_attention
from ..ops.norms import gelu_tanh, layer_norm, modulate
from ..ops.rope import apply_rope, rope_angles_for_grid
from .sequence_parallel import ring_attention
from .tensor_parallel import _dense, _dense_row, _rms_norm_tp

TP, SP = "tp", "sp"


def make_mesh3(data: int = 1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert data * tp * sp == len(devices[: data * tp * sp])
    arr = np.asarray(devices[: data * tp * sp]).reshape(data, tp, sp)
    return Mesh(arr, axis_names=("data", TP, SP))


def _self_attention_tpsp(p, cfg, x, cos_l, sin_l, kv_len, n_local, ring):
    b, s, d = x.shape
    hd = cfg.head_dim
    q = _rms_norm_tp(_dense(p["q"], x), p["norm_q"]["w"], cfg.eps, TP)
    k = _rms_norm_tp(_dense(p["k"], x), p["norm_k"]["w"], cfg.eps, TP)
    v = _dense(p["v"], x).reshape(b, s, n_local, hd)
    q = apply_rope(q.reshape(b, s, n_local, hd), cos_l, sin_l)
    k = apply_rope(k.reshape(b, s, n_local, hd), cos_l, sin_l)
    if ring:
        o = ring_attention(q, k, v, SP, kv_len).reshape(b, s, n_local * hd)
    else:
        k = jax.lax.all_gather(k, SP, axis=1, tiled=True)
        v = jax.lax.all_gather(v, SP, axis=1, tiled=True)
        o = flash_attention(q, k, v, kv_len=kv_len).reshape(b, s, n_local * hd)
    return _dense_row(p["o"], o, TP)


def _cross_attention_tpsp(p, cfg, x, ctx, n_local, num_img_tokens):
    b, s, d = x.shape
    hd = cfg.head_dim
    if cfg.has_image_input:
        img, txt = ctx[:, :num_img_tokens], ctx[:, num_img_tokens:]
    else:
        img, txt = None, ctx
    q = _rms_norm_tp(_dense(p["q"], x), p["norm_q"]["w"], cfg.eps, TP).reshape(b, s, n_local, hd)
    k = _rms_norm_tp(_dense(p["k"], txt), p["norm_k"]["w"], cfg.eps, TP)
    v = _dense(p["v"], txt)
    lk = txt.shape[1]
    o = flash_attention(q, k.reshape(b, lk, n_local, hd), v.reshape(b, lk, n_local, hd))
    if img is not None:
        k_img = _rms_norm_tp(_dense(p["k_img"], img), p["norm_k_img"]["w"], cfg.eps, TP)
        v_img = _dense(p["v_img"], img)
        li = img.shape[1]
        o = o + flash_attention(q, k_img.reshape(b, li, n_local, hd), v_img.reshape(b, li, n_local, hd))
    return _dense_row(p["o"], o.reshape(b, s, n_local * hd), TP)


def _audio_attn_tpsp(p, cfg, x_local, audio, num_frames, kv_len, n_local):
    """Per-frame audio cross attention under 2D TPxSP: tokens all-gather over
    'sp' (frame grouping needs the true sequence), q/k/v head-local over 'tp'
    (split k_linear/v_linear from shard_dit_params_tpsp), proj row-psum over
    'tp', each sp shard keeps its slice."""
    b, shard, d_model = x_local.shape
    x_full = jax.lax.all_gather(x_local, SP, axis=1, tiled=True)
    x = x_full[:, :kv_len]
    f = num_frames
    s = kv_len // f
    hd = cfg.head_dim
    xf = x.reshape(b * f, s, d_model)
    q = _dense(p["q_linear"], xf).reshape(b * f, s, n_local, hd)
    na = audio.shape[2]
    a = audio.reshape(b * f, na, -1).astype(x.dtype)
    k = _dense(p["k_linear"], a).reshape(b * f, na, n_local, hd)
    v = _dense(p["v_linear"], a).reshape(b * f, na, n_local, hd)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, kv_len, n_local * hd)
    o = _dense_row(p["proj"], o, TP)
    s_pad = x_full.shape[1]
    if s_pad != kv_len:
        o = jnp.pad(o, ((0, 0), (0, s_pad - kv_len), (0, 0)))
    i = jax.lax.axis_index(SP)
    return jax.lax.dynamic_slice_in_dim(o, i * shard, shard, axis=1)


def _dit_block_tpsp(p, cfg, x, context, t_mod, cos_l, sin_l, kv_len, n_local,
                    num_img_tokens, ring, audio_embed=None, num_frames=0,
                    add_condition=None):
    mod = p["modulation"].astype(t_mod.dtype) + t_mod
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention_tpsp(
        p["self_attn"], cfg, input_x, cos_l, sin_l, kv_len, n_local, ring
    )
    if cfg.enable_customtalk and audio_embed is not None:
        def _pre_ffn(fp, v):
            return _dense(fp["2"], gelu_tanh(_dense(fp["0"], v)))

        cond_in = add_condition if add_condition is not None else x
        x_in_ctx = x + _pre_ffn(p["customtalk_context_pre_ffns"], layer_norm(cond_in, eps=cfg.eps))
        x_c = _cross_attention_tpsp(
            p["cross_attn"], cfg,
            layer_norm(x_in_ctx, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
            n_local, num_img_tokens,
        )
        x = x + x_c
        x_in_audio = x + _pre_ffn(p["customtalk_audio_pre_ffns"], layer_norm(x_c, eps=cfg.eps))
        xa = layer_norm(x_in_audio, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x_a = _audio_attn_tpsp(p["audio_cross_attn"], cfg, xa, audio_embed,
                               num_frames, kv_len, n_local)
        x = x + x_a
        input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
        h = gelu_tanh(_dense(p["ffn"]["0"], input_x))
        ffn = _dense_row(p["ffn"]["2"], h, TP)
        return x + gate_mlp * ffn, x_a
    x = x + _cross_attention_tpsp(
        p["cross_attn"], cfg,
        layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
        n_local, num_img_tokens,
    )
    if cfg.enable_multitalk and audio_embed is not None:
        xa = layer_norm(x, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x = x + _audio_attn_tpsp(p["audio_cross_attn"], cfg, xa, audio_embed,
                                 num_frames, kv_len, n_local)
    input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    h = gelu_tanh(_dense(p["ffn"]["0"], input_x))
    ffn = _dense_row(p["ffn"]["2"], h, TP)
    return x + gate_mlp * ffn


def _block_param_specs_tp(cfg, blocks: dict) -> dict:
    """Specs for the (audio-kv-split, possibly quantized) blocks pytree,
    on the 'tp' axis (tensor_parallel derives them on 'sp')."""
    from .tensor_parallel import block_param_specs_for

    return block_param_specs_for(blocks, cfg.has_image_input,
                                 cfg.enable_multitalk, cfg.enable_customtalk,
                                 axis=TP)


def shard_dit_params_tpsp(params: dict, cfg, mesh: Mesh) -> dict:
    from .tensor_parallel import split_audio_kv

    blocks = split_audio_kv(params["blocks"]) if "blocks" in params else {}
    specs = _block_param_specs_tp(cfg, blocks)
    rep = NamedSharding(mesh, P())
    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = jax.tree.map(
                lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
                specs, blocks,
                is_leaf=lambda x: isinstance(x, P) or not isinstance(x, dict),
            )
        else:
            out[k] = jax.tree.map(lambda x: jax.device_put(x, rep), v)
    return out


def forward_tpsp(
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
    ring: bool = False,
    audio_embed_tuple=None,
) -> jax.Array:
    """2D tensor x sequence parallel forward. num_heads % tp == 0,
    ffn_dim % tp == 0. Supports multitalk/customtalk audio (the 14B
    multitalk deployment shape)."""
    n_tp, n_sp = mesh.shape[TP], mesh.shape[SP]
    assert cfg.num_heads % n_tp == 0 and cfg.ffn_dim % n_tp == 0
    n_local = cfg.num_heads // n_tp

    tokens, ctx, t, t_mod, grid = wan_dit.forward_prelude(
        params, cfg, x, timestep, context, clip_feature, y, add_condition
    )
    n_img = clip_feature.shape[1] if (cfg.has_image_input and clip_feature is not None) else 257
    b, S, d = tokens.shape
    S_pad = (S + n_sp - 1) // n_sp * n_sp
    if S_pad != S:
        tokens = jnp.pad(tokens, ((0, 0), (0, S_pad - S), (0, 0)))
    cos, sin = rope_angles_for_grid(grid, cfg.head_dim)
    cos = jnp.asarray(np.pad(cos, ((0, S_pad - S), (0, 0))))
    sin = jnp.asarray(np.pad(sin, ((0, S_pad - S), (0, 0))))

    audio_embed = None
    if (cfg.enable_multitalk or cfg.enable_customtalk) and audio_embed_tuple is not None:
        audio_embed = wan_dit.audio_proj_forward(
            params, cfg, audio_embed_tuple[0], audio_embed_tuple[1]
        )
    customtalk_carry = cfg.enable_customtalk and audio_embed is not None
    cond0 = jnp.zeros((0,), cfg.dtype)
    if customtalk_carry:
        cond0 = (add_condition.astype(tokens.dtype) if add_condition is not None
                 else jnp.zeros((b, S, d), tokens.dtype))
        if S_pad != S:
            cond0 = jnp.pad(cond0, ((0, 0), (0, S_pad - S), (0, 0)))
    audio_in = audio_embed if audio_embed is not None else jnp.zeros((0,), cfg.dtype)

    # params["blocks"] arrives pre-sharded (audio-kv-split, possibly
    # quantized) from shard_dit_params_tpsp; derive specs from its structure
    specs = _block_param_specs_tp(cfg, params["blocks"])
    tok_spec = P("data", SP, None)
    rep = P()
    dspec = P("data")

    def run(blocks, tok, ctx_, t_mod_, t_, cos_f, sin_f, audio_, cond_):
        shard = tok.shape[1]
        i = jax.lax.axis_index(SP)
        cos_l = jax.lax.dynamic_slice_in_dim(cos_f, i * shard, shard)
        sin_l = jax.lax.dynamic_slice_in_dim(sin_f, i * shard, shard)
        audio_ = audio_ if audio_embed is not None else None

        def block_fn(tk, bp, cond=None):
            return _dit_block_tpsp(
                bp, cfg, tk, ctx_, t_mod_, cos_l, sin_l, S, n_local, n_img, ring,
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
        return wan_dit.head({"head": head_params}, cfg, tok, t_)

    head_params = params["head"]
    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(specs, tok_spec, dspec, dspec, dspec, rep, rep,
                  dspec if audio_embed is not None else rep,
                  tok_spec if customtalk_carry else rep),
        out_specs=tok_spec,
        check_vma=False,
    )
    out = run_sharded(params["blocks"], tokens, ctx, t_mod, t, cos, sin,
                      audio_in, cond0)
    out = out[:, :S]
    return wan_dit.unpatchify(params, cfg, out, grid)
