"""CogVideoX family (DiT + causal-cached 3D VAE).

Behavioral reference: diffsynth/models/cog_dit.py (CogDiT :111-339 — 42
joint text+video blocks sharing one affine adaLN per sub-layer, 48 heads of
64 with q/k LayerNorms, 3D RoPE on video tokens only, single-norm head) and
cog_vae.py (CogVAEEncoder/Decoder :189-361 — CachedConv3d streaming with a
2-frame time cache, CogVideoXSpatialNorm3D latent-conditioned group norms,
time-compressing avg-pool / nearest-upsample resamplers, scaling 0.7).

TPU-first: DiT blocks are stacked and scanned; the VAE is functional — the
conv time-caches are an explicit pytree threaded through chunk calls
(streaming without module state); convs run channels-last (B,T,H,W,C).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import Params, _dense, _lin_from, _norm_from, _t, timestep_embedding
from .sd3 import _ff


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _apply_rope(x, cos, sin):
    """Interleaved-pair rotation, pair tables (S, D/2) (ref cog_dit.py:61-70:
    x*cos + rotate_half(x)*sin with repeat_interleaved tables)."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None].astype(jnp.float32)
    s = sin[None, :, None].astype(jnp.float32)
    out = jnp.stack([c * xe - s * xo, s * xe + c * xo], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _ada(p, temb, n):
    emb = _dense(p["linear"], jax.nn.silu(temb))[:, None]
    return jnp.split(emb, n, axis=2)


def _cog_block(p, x, ctx, temb, cos, sin, num_heads=48, head_dim=64):
    """CogDiTBlock.forward (ref cog_dit.py:45-108): the SAME affine LayerNorm
    (inside each CogAdaLayerNorm) modulates both streams; attention runs over
    [text | video] with RoPE on the video part only."""
    sb = ctx.shape[1]
    shift_a, scale_a, gate_a, shift_b, scale_b, gate_b = _ada(p["norm1"], temb, 6)
    nx = _ln(p["norm1"]["norm"], x, 1e-5) * (1 + scale_a) + shift_a
    nc = _ln(p["norm1"]["norm"], ctx, 1e-5) * (1 + scale_b) + shift_b
    io = jnp.concatenate([nc, nx], axis=1)
    b, s, _ = io.shape
    q = _dense(p["attn1"]["to_q"], io).reshape(b, s, num_heads, head_dim)
    k = _dense(p["attn1"]["to_k"], io).reshape(b, s, num_heads, head_dim)
    v = _dense(p["attn1"]["to_v"], io).reshape(b, s, num_heads, head_dim)
    q = _ln(p["norm_q"], q, 1e-6)
    k = _ln(p["norm_k"], k, 1e-6)
    q = jnp.concatenate([q[:, :sb], _apply_rope(q[:, sb:], cos, sin)], axis=1)
    k = jnp.concatenate([k[:, :sb], _apply_rope(k[:, sb:], cos, sin)], axis=1)
    o = flash_attention(q, k, v).reshape(b, s, num_heads * head_dim)
    o = _dense(p["attn1"]["to_out"], o)
    x = x + gate_a * o[:, sb:]
    ctx = ctx + gate_b * o[:, :sb]

    shift_a, scale_a, gate_a, shift_b, scale_b, gate_b = _ada(p["norm2"], temb, 6)
    nx = _ln(p["norm2"]["norm"], x, 1e-5) * (1 + scale_a) + shift_a
    nc = _ln(p["norm2"]["norm"], ctx, 1e-5) * (1 + scale_b) + shift_b
    io = _ff(p["ff"], jnp.concatenate([nc, nx], axis=1))
    x = x + gate_a * io[:, sb:]
    ctx = ctx + gate_b * io[:, :sb]
    return x, ctx


def _resize_crop_region(src, tgt_w, tgt_h):
    h, w = src
    if h / w > tgt_h / tgt_w:
        rh, rw = tgt_h, int(round(tgt_h / h * w))
    else:
        rh, rw = int(round(tgt_w / w * h)), tgt_w
    top = int(round((tgt_h - rh) / 2.0))
    left = int(round((tgt_w - rw) / 2.0))
    return (top, left), (top + rh, left + rw)


def prepare_rope_tables(height, width, num_frames, embed_dim=64, theta=10000.0):
    """3D rotary tables (ref cog_dit.py:125-228): dims (t,h,w)=(16,24,24),
    aspect-cropped h/w grids against base 480x720. Returns pair tables
    (S, embed_dim//2) f32 numpy."""
    gh, gw = height // 2, width // 2
    start, stop = _resize_crop_region((gh, gw), 720 // 16, 480 // 16)
    grid_h = np.linspace(start[0], stop[0], gh, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1], gw, endpoint=False, dtype=np.float32)
    grid_t = np.arange(num_frames, dtype=np.float32)

    def axis(pos, dim):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
        return np.outer(pos, freqs)
    ft = axis(grid_t, embed_dim // 4)            # (T, 8)
    fh = axis(grid_h, embed_dim // 8 * 3)        # (H, 12)
    fw = axis(grid_w, embed_dim // 8 * 3)        # (W, 12)
    ang = np.concatenate([
        np.broadcast_to(ft[:, None, None], (len(grid_t), gh, gw, ft.shape[-1])),
        np.broadcast_to(fh[None, :, None], (len(grid_t), gh, gw, fh.shape[-1])),
        np.broadcast_to(fw[None, None, :], (len(grid_t), gh, gw, fw.shape[-1])),
    ], axis=-1).reshape(-1, embed_dim // 2)
    return np.cos(ang), np.sin(ang)


def cog_dit_forward(params: Params, hidden_states, timestep, prompt_emb,
                    image_rotary_emb=None, tiled=False, tile_size=(60, 90),
                    tile_stride=(30, 45)):
    """CogDiT.forward (ref cog_dit.py:287-325). hidden_states (B,16,T,H,W).
    tiled: whole-forward spatial 2D tiling of the video latent with per-tile
    RoPE tables (ref :287-296)."""
    if tiled:
        from . import tiler as _tiler

        if isinstance(tile_size, int):
            tile_size = (tile_size, tile_size)
        if isinstance(tile_stride, int):
            tile_stride = (tile_stride, tile_stride)
        out = _tiler.tiled_forward_2dto3d(
            lambda v: jnp.transpose(cog_dit_forward(
                params, jnp.transpose(v, (0, 4, 1, 2, 3)), timestep,
                prompt_emb), (0, 2, 3, 4, 1)),
            jnp.transpose(hidden_states, (0, 2, 3, 4, 1)),
            tuple(tile_size), tuple(tile_stride))
        return jnp.transpose(out, (0, 4, 1, 2, 3))
    x = hidden_states
    b, _, tt, h, w = x.shape
    dtype = x.dtype
    if image_rotary_emb is None:
        image_rotary_emb = prepare_rope_tables(h, w, tt)
    cos, sin = (jnp.asarray(image_rotary_emb[0]), jnp.asarray(image_rotary_emb[1]))

    # patchify: Conv3d k=(1,2,2) == per-frame stride-2 conv (ref :11-19)
    xl = x.transpose(0, 2, 3, 4, 1).reshape(b * tt, h, w, x.shape[1])
    pw = params["patchify"]["w"].astype(dtype)  # (1,2,2,C,D) HWIO-with-time
    xl = jax.lax.conv_general_dilated(
        xl, pw[0], (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patchify"]["b"].astype(dtype)
    xa = xl.reshape(b, tt * (h // 2) * (w // 2), -1)

    temb = timestep_embedding(jnp.atleast_1d(timestep), 3072).astype(dtype)
    temb = _dense(params["time_embedder"]["2"],
                  jax.nn.silu(_dense(params["time_embedder"]["0"], temb)))
    ctx = _dense(params["context_embedder"], prompt_emb)

    def body(carry, p):
        xa, ctx = carry
        xa, ctx = _cog_block(p, xa, ctx, temb, cos, sin)
        return (xa, ctx), None

    (xa, ctx), _ = jax.lax.scan(body, (xa, ctx), params["blocks"])

    xa = _ln(params["norm_final"], jnp.concatenate([ctx, xa], axis=1),
             1e-5)[:, ctx.shape[1]:]
    shift, scale = _ada(params["norm_out"], temb, 2)  # shift first (ref :34)
    xa = _ln(params["norm_out"]["norm"], xa, 1e-5) * (1 + scale) + shift
    xa = _dense(params["proj_out"], xa)
    # B (T H W) (C P Q) -> B C T (H P) (W Q)  (ref :231-233)
    c = xa.shape[-1] // 4
    xa = xa.reshape(b, tt, h // 2, w // 2, c, 2, 2)
    return xa.transpose(0, 4, 1, 2, 5, 3, 6).reshape(b, c, tt, h, w)


def _dit_block_p(sd, prefix):
    return {
        "norm1": {"linear": _lin_from(sd, f"{prefix}.norm1.linear"),
                  "norm": _norm_from(sd, f"{prefix}.norm1.norm")},
        "attn1": {
            "to_q": _lin_from(sd, f"{prefix}.attn1.to_q"),
            "to_k": _lin_from(sd, f"{prefix}.attn1.to_k"),
            "to_v": _lin_from(sd, f"{prefix}.attn1.to_v"),
            "to_out": _lin_from(sd, f"{prefix}.attn1.to_out"),
        },
        "norm_q": _norm_from(sd, f"{prefix}.norm_q"),
        "norm_k": _norm_from(sd, f"{prefix}.norm_k"),
        "norm2": {"linear": _lin_from(sd, f"{prefix}.norm2.linear"),
                  "norm": _norm_from(sd, f"{prefix}.norm2.norm")},
        "ff": {"0": _lin_from(sd, f"{prefix}.ff.0"),
               "2": _lin_from(sd, f"{prefix}.ff.2")},
    }


def cog_dit_params_from_torch(sd: dict) -> Params:
    n = 0
    while f"blocks.{n}.norm1.linear.weight" in sd:
        n += 1
    w = _t(sd["patchify.proj.weight"])  # (D, C, 1, 2, 2)
    return {
        "patchify": {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
                     "b": jnp.asarray(_t(sd["patchify.proj.bias"]))},
        "time_embedder": {
            "0": _lin_from(sd, "time_embedder.timestep_embedder.0"),
            "2": _lin_from(sd, "time_embedder.timestep_embedder.2"),
        },
        "context_embedder": _lin_from(sd, "context_embedder"),
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_dit_block_p(sd, f"blocks.{i}") for i in range(n)]),
        "norm_final": _norm_from(sd, "norm_final"),
        "norm_out": {"linear": _lin_from(sd, "norm_out.linear"),
                     "norm": _norm_from(sd, "norm_out.norm")},
        "proj_out": _lin_from(sd, "proj_out"),
    }


# ---------------------------------------------------------------------------
# VAE (channels-last (B,T,H,W,C); explicit streaming cache pytree)
# ---------------------------------------------------------------------------

COG_VAE_SCALING_FACTOR = 0.7

COG_VAE_ENCODER_PLAN = (
    [("res", 128, 128)] * 3 + [("down", 128, True)]
    + [("res", 128, 256), ("res", 256, 256), ("res", 256, 256), ("down", 256, True)]
    + [("res", 256, 256)] * 3 + [("down", 256, False)]
    + [("res", 256, 512)] + [("res", 512, 512)] * 4
)

COG_VAE_DECODER_PLAN = (
    [("res", 512, 512)] * 6 + [("up", 512, True)]
    + [("res", 512, 256)] + [("res", 256, 256)] * 3 + [("up", 256, True)]
    + [("res", 256, 256)] * 4 + [("up", 256, False)]
    + [("res", 256, 128)] + [("res", 128, 128)] * 3
)


def _cached_conv3d(p, x, cache):
    """CachedConv3d (ref cog_vae.py:169-186): 2-frame leading time cache
    (first call: first frame repeated twice), spatial SAME(1,1), time VALID.
    Returns (y, new_cache)."""
    if cache is None:
        cache = jnp.concatenate([x[:, :1]] * 2, axis=1)
    xin = jnp.concatenate([cache, x], axis=1)
    new_cache = xin[:, -2:]
    k = p["w"].astype(x.dtype)  # (KT,KH,KW,I,O)
    pad_h = (k.shape[1] - 1) // 2
    pad_w = (k.shape[2] - 1) // 2
    y = jax.lax.conv_general_dilated(
        xin, k, (1, 1, 1),
        ((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"].astype(x.dtype)
    return y, new_cache


def _conv1(p, x):
    return jnp.einsum("bthwc,cd->bthwd", x, p["w"][0, 0, 0].astype(x.dtype)) \
        + p["b"].astype(x.dtype)


def _group_norm_3d(p, x, groups=32, eps=1e-6):
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _nearest_idx(out_len, in_len):
    return (np.arange(out_len) * in_len // out_len).astype(np.int32)


def _interp_nearest(z, t, h, w):
    """torch F.interpolate(mode='nearest') exact semantics: floor(i*in/out)."""
    z = jnp.take(z, jnp.asarray(_nearest_idx(t, z.shape[1])), axis=1)
    z = jnp.take(z, jnp.asarray(_nearest_idx(h, z.shape[2])), axis=2)
    return jnp.take(z, jnp.asarray(_nearest_idx(w, z.shape[3])), axis=3)


def _spatial_norm(p, f, zq):
    """CogVideoXSpatialNorm3D (ref :103-125): zq nearest-resized to f (first
    frame handled separately when f has odd time), affine group norm, then
    f_norm * conv_y(zq) + conv_b(zq)."""
    _, t, h, w, _ = f.shape
    if t > 1 and t % 2 == 1:
        z = jnp.concatenate([
            _interp_nearest(zq[:, :1], 1, h, w),
            _interp_nearest(zq[:, 1:], t - 1, h, w)], axis=1)
    else:
        z = _interp_nearest(zq, t, h, w)
    return _group_norm_3d(p["norm_layer"], f) * _conv1(p["conv_y"], z) \
        + _conv1(p["conv_b"], z)


def _res3d(p, x, zq, cache, pref):
    """Resnet3DBlock (ref :128-166)."""
    def norm(which, y):
        np_ = p[which]
        if "conv_y" in np_:
            return _spatial_norm(np_, y, zq)
        return _group_norm_3d(np_, y)
    h0 = x
    h, cache[f"{pref}.conv1"] = _cached_conv3d(
        p["conv1"], jax.nn.silu(norm("norm1", x)), cache.get(f"{pref}.conv1"))
    h, cache[f"{pref}.conv2"] = _cached_conv3d(
        p["conv2"], jax.nn.silu(norm("norm2", h)), cache.get(f"{pref}.conv2"))
    if "conv_shortcut" in p:
        h0 = _conv1(p["conv_shortcut"], x)
    return h0 + h, cache


def _downsample3d(p, x, compress_time):
    """Downsample3D (ref :7-54): odd-aware time avg-pool then asymmetric
    spatial pad + stride-2 per-frame conv."""
    if compress_time:
        if x.shape[1] % 2 == 1:
            first, rest = x[:, :1], x[:, 1:]
            if rest.shape[1] > 0:
                rest = (rest[:, 0::2] + rest[:, 1::2]) / 2
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = (x[:, 0::2] + x[:, 1::2]) / 2
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    b, t, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), p["w"][0].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], -1)


def _upsample3d(p, x, compress_time):
    """Upsample3D (ref :57-100): nearest x2 (time too when compressing and
    T>1, odd first frame spatial-only), then 3x3 per-frame conv."""
    b, t, h, w, c = x.shape
    if compress_time:
        if t > 1 and t % 2 == 1:
            first = jnp.repeat(jnp.repeat(x[:, :1], 2, axis=2), 2, axis=3)
            rest = x[:, 1:]
            rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2),
                              2, axis=3)
            x = jnp.concatenate([first, rest], axis=1)
        elif t > 1:
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2),
                           2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    else:
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    b, t, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), p["w"][0].astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], -1)


def _run_vae(plan, params, x, zq, cache):
    for i, (desc, p) in enumerate(zip(plan, params)):
        if desc[0] == "res":
            x, cache = _res3d(p, x, zq, cache, f"blocks.{i}")
        elif desc[0] == "down":
            x = _downsample3d(p, x, desc[2])
        else:
            x = _upsample3d(p, x, desc[2])
    return x, cache


def cog_vae_encode_chunk(params: Params, video, cache=None):
    """CogVAEEncoder.forward (ref :309-320). video (B,3,T,H,W) in [-1,1];
    returns ((B,16,T/4,H/8,W/8) latents, cache)."""
    cache = {} if cache is None else cache
    x = video.transpose(0, 2, 3, 4, 1)
    zq = x
    x, cache["conv_in"] = _cached_conv3d(params["conv_in"], x,
                                         cache.get("conv_in"))
    x, cache = _run_vae(COG_VAE_ENCODER_PLAN, params["blocks"], x, zq, cache)
    x = jax.nn.silu(_group_norm_3d(params["norm_out"], x))
    x, cache["conv_out"] = _cached_conv3d(params["conv_out"], x,
                                          cache.get("conv_out"))
    x = x[..., :16] * COG_VAE_SCALING_FACTOR
    return x.transpose(0, 4, 1, 2, 3), cache


def cog_vae_decode_chunk(params: Params, latents, cache=None):
    """CogVAEDecoder.forward (ref :224-235). latents (B,16,T,H,W)."""
    cache = {} if cache is None else cache
    x = (latents / COG_VAE_SCALING_FACTOR).transpose(0, 2, 3, 4, 1)
    zq = x
    x, cache["conv_in"] = _cached_conv3d(params["conv_in"], x,
                                         cache.get("conv_in"))
    x, cache = _run_vae(COG_VAE_DECODER_PLAN, params["blocks"], x, zq, cache)
    x = jax.nn.silu(_spatial_norm(params["norm_out"], x, zq))
    x, cache["conv_out"] = _cached_conv3d(params["conv_out"], x,
                                          cache.get("conv_out"))
    return x.transpose(0, 4, 1, 2, 3), cache


def cog_vae_encode_video(params: Params, video, tiled=False,
                         tile_size=(60, 90), tile_stride=(30, 45),
                         progress_bar=lambda x: x):
    """encode_small_video (ref :339-358): 8-frame chunks (first chunk grabs
    the odd leading frame), fresh cache per video. tiled: feathered spatial
    tiling in pixel units tile_size*8 (ref encode_video :323-337)."""
    t = video.shape[2]
    if tiled:
        from . import tiler as _tiler

        out = _tiler.tiled_forward_2dto3d(
            lambda v: jnp.transpose(cog_vae_encode_video(
                params, jnp.transpose(v, (0, 4, 1, 2, 3))), (0, 2, 3, 4, 1)),
            jnp.transpose(video, (0, 2, 3, 4, 1)),
            tuple(i * 8 for i in tile_size), tuple(i * 8 for i in tile_stride),
            scales=(16 / 3, (t // 4 + t % 2) / t, 1 / 8, 1 / 8),
            progress_bar=progress_bar)
        return jnp.transpose(out, (0, 4, 1, 2, 3))
    outs, cache = [], None
    for i in range(t // 8):
        tl = i * 8 + t % 2 - (t % 2 and i == 0)
        tr = i * 8 + 8 + t % 2
        out, cache = cog_vae_encode_chunk(params, video[:, :, tl:tr], cache)
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


def cog_vae_decode_video(params: Params, latents, tiled=False,
                         tile_size=(60, 90), tile_stride=(30, 45),
                         progress_bar=lambda x: x):
    """decode_small_video (ref :254-273): 2-latent-frame chunks. tiled:
    feathered spatial tiling in latent units (ref decode_video :237-252)."""
    t = latents.shape[2]
    if tiled:
        from . import tiler as _tiler

        out = _tiler.tiled_forward_2dto3d(
            lambda v: jnp.transpose(cog_vae_decode_video(
                params, jnp.transpose(v, (0, 4, 1, 2, 3))), (0, 2, 3, 4, 1)),
            jnp.transpose(latents, (0, 2, 3, 4, 1)),
            tuple(tile_size), tuple(tile_stride),
            scales=(3 / 16, (t // 2 * 8 + t % 2) / t, 8, 8),
            progress_bar=progress_bar)
        return jnp.transpose(out, (0, 4, 1, 2, 3))
    outs, cache = [], None
    for i in range(t // 2):
        tl = i * 2 + t % 2 - (t % 2 and i == 0)
        tr = i * 2 + 2 + t % 2
        out, cache = cog_vae_decode_chunk(params, latents[:, :, tl:tr], cache)
        outs.append(out)
    return jnp.concatenate(outs, axis=2)


def _conv3d_p(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _conv2d_p(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])  # (O,I,KH,KW) -> (1,KH,KW,I,O)
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))[None]),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _vae_norm_p(sd, prefix):
    if f"{prefix}.conv_y.weight" in sd:
        return {"norm_layer": _norm_from(sd, f"{prefix}.norm_layer"),
                "conv_y": _conv3d_p(sd, f"{prefix}.conv_y"),
                "conv_b": _conv3d_p(sd, f"{prefix}.conv_b")}
    return _norm_from(sd, prefix)


def _vae_block_p(sd, i, desc):
    b = f"blocks.{i}"
    if desc[0] == "res":
        p = {"norm1": _vae_norm_p(sd, f"{b}.norm1"),
             "conv1": _conv3d_p(sd, f"{b}.conv1"),
             "norm2": _vae_norm_p(sd, f"{b}.norm2"),
             "conv2": _conv3d_p(sd, f"{b}.conv2")}
        if f"{b}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = _conv3d_p(sd, f"{b}.conv_shortcut")
        return p
    return _conv2d_p(sd, f"{b}.conv")


def cog_vae_encoder_params_from_torch(sd: dict) -> Params:
    return {
        "conv_in": _conv3d_p(sd, "conv_in"),
        "blocks": [_vae_block_p(sd, i, d)
                   for i, d in enumerate(COG_VAE_ENCODER_PLAN)],
        "norm_out": _norm_from(sd, "norm_out"),
        "conv_out": _conv3d_p(sd, "conv_out"),
    }


def cog_vae_decoder_params_from_torch(sd: dict) -> Params:
    return {
        "conv_in": _conv3d_p(sd, "conv_in"),
        "blocks": [_vae_block_p(sd, i, d)
                   for i, d in enumerate(COG_VAE_DECODER_PLAN)],
        "norm_out": _vae_norm_p(sd, "norm_out"),
        "conv_out": _conv3d_p(sd, "conv_out"),
    }
