"""HunyuanDiT (image) family.

Behavioral reference: diffsynth/models/hunyuan_dit.py (HunyuanDiT :229-437 —
U-ViT: 21 down blocks + 19 up blocks with long skip connections, per-head
LayerNorm q/k norms + 2D RoPE, shift-only adaLN modulation, f32 layer norms;
AttentionPool :140-173; TimestepEmbedder :212-226) and
pipelines/hunyuan_image.py (ImageSizeManager :15-121 — aspect-cropped 2D
rotary tables, head_size 88). The VAE is SDXL's; the scheduler is DDIM
v-prediction (beta_end 0.03). Text encoders are transformers BertModel /
T5EncoderModel subclasses in the reference (hunyuan_dit_text_encoder.py) —
host-side preprocessing, wrapped lazily in the pipeline.

TPU-first: blocks keep the python-level U-ViT skip list (heterogeneous down /
up params), f32 norm statistics, flash attention for the 1024-token-scale
spatial sequence (head_dim 88 routes to the BNSD kernel).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import Params, _dense, _layer_norm, _lin_from, _norm_from, _t
from .sd import timestep_embedding


# ---------------------------------------------------------------------------
# RoPE tables (ref pipelines/hunyuan_image.py:15-121)
# ---------------------------------------------------------------------------


def _fill_resize_and_crop(src, tgt):
    th, tw = (tgt, tgt) if isinstance(tgt, int) else tgt
    h, w = src
    if h / w > th / tw:
        rh, rw = th, int(round(th / h * w))
    else:
        rh, rw = int(round(tw / w * h)), tw
    top = int(round((th - rh) / 2.0))
    left = int(round((tw - rw) / 2.0))
    return (top, left), (top + rh, left + rw)


def calc_rope(height, width, patch_size=2, head_size=88):
    """ImageSizeManager.calc_rope: non-repeated pair tables (S, head_size//2)
    as f32 numpy (host-side, per resolution)."""
    th, tw = height // 8 // patch_size, width // 8 // patch_size
    base = 512 // 8 // patch_size
    start, stop = _fill_resize_and_crop((th, tw), base)
    grid_h = np.linspace(start[0], stop[0], th, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1], tw, endpoint=False, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h)  # w first (ref :68)

    def one_axis(pos, dim):
        freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
        return np.outer(pos.reshape(-1), freqs)
    # ref get_meshgrid stacks w first (:68 "here w goes first"), so the
    # "height" half of the table actually carries the w positions
    ang = np.concatenate([one_axis(gw, head_size // 2),
                          one_axis(gh, head_size // 2)], axis=1)
    return np.cos(ang), np.sin(ang)


def _apply_rope(x, cos, sin):
    """x: (B,S,N,D); cos/sin (S,D/2) pair tables (ref :21-32)."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None].astype(jnp.float32)
    s = sin[None, :, None].astype(jnp.float32)
    out = jnp.stack([c * xe - s * xo, s * xe + c * xo], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _head_ln(p, x, eps=1e-6):
    """Per-head affine LayerNorm over head_dim (rota q_norm/k_norm)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _self_attention(p, x, cos, sin, num_heads, head_dim):
    b, s, _ = x.shape
    q = _dense(p["to_q"], x).reshape(b, s, num_heads, head_dim)
    k = _dense(p["to_k"], x).reshape(b, s, num_heads, head_dim)
    v = _dense(p["to_v"], x).reshape(b, s, num_heads, head_dim)
    q = _apply_rope(_head_ln(p["q_norm"], q), cos, sin)
    k = _apply_rope(_head_ln(p["k_norm"], k), cos, sin)
    o = flash_attention(q, k, v).reshape(b, s, num_heads * head_dim)
    return _dense(p["to_out"], o)


def _cross_attention(p, x, ctx, cos, sin, num_heads, head_dim):
    """rota2: q/k normed, RoPE on q only (ref :39-44, rotary_emb_on_k=False)."""
    b, s, _ = x.shape
    sk = ctx.shape[1]
    q = _dense(p["to_q"], x).reshape(b, s, num_heads, head_dim)
    k = _dense(p["to_k"], ctx).reshape(b, sk, num_heads, head_dim)
    v = _dense(p["to_v"], ctx).reshape(b, sk, num_heads, head_dim)
    q = _apply_rope(_head_ln(p["q_norm"], q), cos, sin)
    k = _head_ln(p["k_norm"], k)
    o = flash_attention(q, k, v).reshape(b, s, num_heads * head_dim)
    return _dense(p["to_out"], o)


def _block(p, x, cond, text, cos, sin, num_heads, head_dim, residual=None):
    """HunyuanDiTBlock.forward (ref :119-137)."""
    if residual is not None:
        x = jnp.concatenate([x, residual], axis=-1)
        x = _dense(p["skip_linear"], _layer_norm(p["skip_norm"], x))
    shift = _dense(p["modulation"],
                   jax.nn.silu(cond.astype(jnp.float32)).astype(cond.dtype))
    x = x + _self_attention(p["attn1"], _layer_norm(p["norm1"], x)
                            + shift[:, None], cos, sin, num_heads, head_dim)
    x = x + _cross_attention(p["attn2"], _layer_norm(p["norm3"], x), text,
                             cos, sin, num_heads, head_dim)
    h = _dense(p["mlp_0"], _layer_norm(p["norm2"], x))
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return x + _dense(p["mlp_2"], h)


def _attention_pool(p, x, num_heads=8):
    """AttentionPool.forward (ref :140-173): mean-token query MHA, out proj."""
    b, s, d = x.shape
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"][None].astype(x.dtype)
    hd = d // num_heads
    q = _dense(p["q_proj"], x[:, :1]).reshape(b, 1, num_heads, hd)
    k = _dense(p["k_proj"], x).reshape(b, s + 1, num_heads, hd)
    v = _dense(p["v_proj"], x).reshape(b, s + 1, num_heads, hd)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, 1, d)
    return _dense(p["c_proj"], o)[:, 0]


def hunyuan_dit_forward(params: Params, hidden_states, text_emb, text_emb_t5,
                        text_emb_mask, text_emb_mask_t5, timestep, size_emb,
                        freq_cis_img, num_layers_down=21, tiled=False,
                        tile_size=64, tile_stride=32):
    """HunyuanDiT.forward (ref :349-437). hidden_states (B,4,H,W) NCHW;
    text_emb (B,77,1024) BERT states; text_emb_t5 (B,256,2048) raw mT5 states;
    masks (B,77)/(B,256); size_emb (B,6); freq_cis_img = calc_rope tables.

    tiled: per-BLOCK feathered tiling over the patch grid (ref
    tiled_block_forward :311-346) — every tile is exactly tile_size^2
    patches, so freq_cis_img must be the tables for one tile
    (calc_rope(tile_size*16, tile_size*16), ref hunyuan_image.py:193-206);
    U-ViT skip residuals are sliced per tile like the hidden states."""
    x = hidden_states
    b, _, h, w = x.shape
    dtype = x.dtype
    cos, sin = (jnp.asarray(freq_cis_img[0]), jnp.asarray(freq_cis_img[1]))

    # prepare_text_emb (ref :355-362)
    t5p = params["t5_embedder"]
    t5e = _dense(t5p["0"], text_emb_t5)
    t5e = jax.nn.silu(t5e.astype(jnp.float32)).astype(dtype)
    t5e = _dense(t5p["2"], t5e)
    text = jnp.concatenate([text_emb, t5e], axis=1)
    mask = jnp.concatenate([text_emb_mask, text_emb_mask_t5], axis=-1) != 0
    text = jnp.where(mask[:, :, None],
                     text, params["text_emb_padding"][None].astype(dtype))

    # prepare_extra_emb (ref :364-381)
    pooled = _attention_pool(params["t5_pooler"], text_emb_t5)
    temb = timestep_embedding(jnp.atleast_1d(timestep), 256).astype(dtype)
    temb = _dense(params["timestep_embedder"]["2"],
                  jax.nn.silu(_dense(params["timestep_embedder"]["0"], temb)))
    size = timestep_embedding(size_emb.reshape(-1), 256).astype(dtype)
    size = size.reshape(b, 6 * 256)
    style = jnp.broadcast_to(params["style_embedder"].astype(dtype)[None],
                             (b, params["style_embedder"].shape[0]))
    extra = jnp.concatenate([pooled.astype(dtype), size, style], axis=1)
    eh = _dense(params["extra_embedder"]["0"], extra)
    eh = jax.nn.silu(eh.astype(jnp.float32)).astype(dtype)
    cond = temb + _dense(params["extra_embedder"]["2"], eh)

    # patchify (stride-2 conv, ref :176-190)
    xl = jnp.moveaxis(x, 1, -1)
    xl = jax.lax.conv_general_dilated(
        xl, params["patch_embedder"]["w"].astype(dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embedder"]["b"].astype(dtype)
    xa = xl.reshape(b, (h // 2) * (w // 2), -1)

    num_heads = 16
    head_dim = xa.shape[-1] // num_heads
    residuals = []
    if tiled:
        from .tiler import fast_tiled_forward

        hp, wp = h // 2, w // 2
        xg = xa.reshape(b, hp, wp, -1)
        for i, bp in enumerate(params["blocks"]):
            rg = residuals.pop() if i >= num_layers_down else None

            def tile_fn(hl, hr, wl, wr, _bp=bp, _rg=rg, _xg=xg):
                n = (hr - hl) * (wr - wl)
                xt = _xg[:, hl:hr, wl:wr].reshape(b, n, -1)
                rt = None if _rg is None \
                    else _rg[:, hl:hr, wl:wr].reshape(b, n, -1)
                out = _block(_bp, xt, cond, text, cos, sin, num_heads,
                             head_dim, residual=rt)
                return out.reshape(b, hr - hl, wr - wl, -1)

            xg = fast_tiled_forward(tile_fn, xg, tile_size, tile_stride)
            if i < num_layers_down - 2:
                residuals.append(xg)
        xa = xg.reshape(b, hp * wp, -1)
    else:
        for i, bp in enumerate(params["blocks"]):
            residual = residuals.pop() if i >= num_layers_down else None
            xa = _block(bp, xa, cond, text, cos, sin, num_heads, head_dim,
                        residual=residual)
            if i < num_layers_down - 2:
                residuals.append(xa)

    # final layer (ref :68-86)
    emb = _dense(params["final_layer"]["adaLN_modulation"],
                 jax.nn.silu(cond.astype(jnp.float32)).astype(dtype))
    shift, scale = jnp.split(emb, 2, axis=1)
    from .sd3 import _ln_nowb

    xa = _ln_nowb(xa) * (1 + scale[:, None]) + shift[:, None]
    xa = _dense(params["final_layer"]["linear"], xa)
    # unpatchify B (H W) (P Q C) -> B C (H P) (W Q), keep eps half (ref :436)
    c = xa.shape[-1] // 4
    xa = xa.reshape(b, h // 2, w // 2, 2, 2, c)
    xa = xa.transpose(0, 5, 1, 3, 2, 4).reshape(b, c, h, w)
    return xa[:, :c // 2]


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def _attn_p(sd, a, r):
    return {
        "to_q": _lin_from(sd, f"{a}.to_q"),
        "to_k": _lin_from(sd, f"{a}.to_k"),
        "to_v": _lin_from(sd, f"{a}.to_v"),
        "to_out": _lin_from(sd, f"{a}.to_out"),
        "q_norm": _norm_from(sd, f"{r}.q_norm"),
        "k_norm": _norm_from(sd, f"{r}.k_norm"),
    }


def _block_p(sd, prefix):
    p = {
        "norm1": _norm_from(sd, f"{prefix}.norm1"),
        "attn1": _attn_p(sd, f"{prefix}.attn1", f"{prefix}.rota1"),
        "norm3": _norm_from(sd, f"{prefix}.norm3"),
        "attn2": _attn_p(sd, f"{prefix}.attn2", f"{prefix}.rota2"),
        "norm2": _norm_from(sd, f"{prefix}.norm2"),
        "modulation": _lin_from(sd, f"{prefix}.modulation.1"),
        "mlp_0": _lin_from(sd, f"{prefix}.mlp.0"),
        "mlp_2": _lin_from(sd, f"{prefix}.mlp.2"),
    }
    if f"{prefix}.skip_norm.weight" in sd:
        p["skip_norm"] = _norm_from(sd, f"{prefix}.skip_norm")
        p["skip_linear"] = _lin_from(sd, f"{prefix}.skip_linear")
    return p


def hunyuan_dit_params_from_torch(sd: dict) -> Params:
    n = 0
    while f"blocks.{n}.norm1.weight" in sd:
        n += 1
    w = _t(sd["patch_embedder.proj.weight"])
    return {
        "text_emb_padding": jnp.asarray(_t(sd["text_emb_padding"])),
        "t5_embedder": {"0": _lin_from(sd, "t5_embedder.0"),
                        "2": _lin_from(sd, "t5_embedder.2")},
        "t5_pooler": {
            "positional_embedding":
                jnp.asarray(_t(sd["t5_pooler.positional_embedding"])),
            "q_proj": _lin_from(sd, "t5_pooler.q_proj"),
            "k_proj": _lin_from(sd, "t5_pooler.k_proj"),
            "v_proj": _lin_from(sd, "t5_pooler.v_proj"),
            "c_proj": _lin_from(sd, "t5_pooler.c_proj"),
        },
        "style_embedder": jnp.asarray(_t(sd["style_embedder"])),
        "patch_embedder": {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                           "b": jnp.asarray(_t(sd["patch_embedder.proj.bias"]))},
        "timestep_embedder": {
            "0": _lin_from(sd, "timestep_embedder.mlp.0"),
            "2": _lin_from(sd, "timestep_embedder.mlp.2"),
        },
        "extra_embedder": {"0": _lin_from(sd, "extra_embedder.0"),
                           "2": _lin_from(sd, "extra_embedder.2")},
        "blocks": [_block_p(sd, f"blocks.{i}") for i in range(n)],
        "final_layer": {
            "norm_final": None,
            "linear": _lin_from(sd, "final_layer.linear"),
            "adaLN_modulation": _lin_from(sd, "final_layer.adaLN_modulation.1"),
        },
    }
