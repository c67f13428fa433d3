"""Wan 2.1 causal 3D video VAE, TPU-native.

Behavioral reference: diffsynth/models/wan_video_vae.py (CausalConv3d :33,
Resample :82, ResidualBlock :198, AttentionBlock :235, Encoder3d :276,
Decoder3d :379, VideoVAE_ :492, WanVideoVAE :599).

The reference streams frames through the network with per-conv Python-side
mutable caches (CACHE_T=2 trailing input frames per causal conv). Here the
cache is an explicit pytree threaded through pure functions, so the chunk loop
can run as `lax.scan` on device:

  * every causal 3x3x3 conv carries a (b, 2, h, w, c) cache of its last two
    input frames, zero-initialized — numerically identical to the reference's
    "pad 2 zero frames at start, then cache" behavior;
  * `downsample3d` time convs carry a 1-frame cache and skip the conv on the
    first chunk (reference :162-173);
  * `upsample3d` time convs skip conv+frame-doubling on the first chunk (the
    'Rep' sentinel, reference :120-156) and use a zero cache on the second.

Chunking matches the reference exactly: the encoder consumes frames as
1 + 4·k chunks (:525-550); the decoder emits 1 then 4 frames per latent step
(:552-575, out_T = 4·T − 3). Everything computes in float32 (bf16 VAE
accumulates visible artifacts — reference FAQ.md:27), channels-last layout.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import channel_rms_norm

CACHE_T = 2

# Per-channel latent normalization (reference wan_video_vae.py:604-614).
LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], dtype=np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: tuple[bool, ...] = (False, True, True)
    dtype: Any = jnp.float32

    @property
    def temporal_upsample(self):
        return self.temporal_downsample[::-1]


WAN_VAE = WanVAEConfig()


# ---------------------------------------------------------------------------
# Primitive layers (channels-last: x is (b, t, h, w, c))
# ---------------------------------------------------------------------------


def _conv3d(p, x, strides=(1, 1, 1), spatial_pad=None):
    kt, kh, kw = p["w"].shape[:3]
    if spatial_pad is None:
        spatial_pad = (kh // 2, kw // 2)
    # weights follow the streaming dtype; accumulation is always f32 (the
    # mixed-precision safeguard against the reference's bf16-VAE artifact
    # accumulation, FAQ.md:27 — storage bf16, math f32)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=strides,
        padding=[(0, 0), (spatial_pad[0], spatial_pad[0]), (spatial_pad[1], spatial_pad[1])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def causal_conv3d(p, x, cache, strides=(1, 1, 1)):
    """Causal 3D conv with explicit 2-frame input cache (ref :33-52).

    cache: (b, CACHE_T, h, w, cin) of the conv's trailing input frames (zeros
    at stream start — equivalent to the reference's 2-frame front zero-pad).
    Returns (y, new_cache).
    """
    kt = p["w"].shape[0]
    if kt == 1:
        return _conv3d(p, x, strides), cache
    x_in = jnp.concatenate([cache, x], axis=1)
    new_cache = x_in[:, -CACHE_T:]
    return _conv3d(p, x_in, strides), new_cache


def _conv2d(p, x, strides=(1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _per_frame(fn, x):
    """Apply an (b', h, w, c) function across time by folding t into batch."""
    b, t, h, w, c = x.shape
    y = fn(x.reshape(b * t, h, w, c))
    return y.reshape(b, t, *y.shape[1:])


def _rms_norm_video(p, x):
    """VAE RMS_norm over channels, channels-last (ref :55-70)."""
    return channel_rms_norm(x, p["gamma"], channel_axis=-1)


def residual_block(p, x, caches, idx):
    """ResidualBlock (ref :198-232): two cached causal convs + shortcut."""
    h = x
    if "shortcut" in p:
        h = _conv3d(p["shortcut"], x)
    y = jax.nn.silu(_rms_norm_video(p["norm1"], x))
    y, caches[idx] = causal_conv3d(p["conv1"], y, caches[idx])
    y = jax.nn.silu(_rms_norm_video(p["norm2"], y))
    y, caches[idx + 1] = causal_conv3d(p["conv2"], y, caches[idx + 1])
    return y + h, idx + 2


def attention_block(p, x):
    """Single-head per-frame spatial self-attention (ref :235-273), via the
    fused flash kernel (the dense h·w × h·w logits are ~600MB/chunk at 480p)."""
    from ..ops.attention import flash_attention

    b, t, h, w, c = x.shape
    y = _rms_norm_video(p["norm"], x)
    qkv = _per_frame(lambda f: _conv2d(p["to_qkv"], f), y)  # (b,t,h,w,3c)
    qkv = qkv.reshape(b * t, h * w, 3 * c)
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    o = flash_attention(q[:, :, None], k[:, :, None], v[:, :, None])[:, :, 0]
    o = o.reshape(b, t, h, w, c)
    o = _per_frame(lambda f: _conv2d(p["proj"], f), o)
    return x + o


def resample(p, mode, x, caches, idx, first):
    """Resample (ref :82-174). Returns (y, next_cache_idx)."""
    b, t, h, w, c = x.shape
    if mode == "upsample3d":
        # temporal part FIRST (ref :122-156): conv doubles channels -> frames
        if not first:
            y, caches[idx] = causal_conv3d(p["time_conv"], x, caches[idx])
            # (b,t,h,w,2c) -> interleave channel groups as frame pairs
            y = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
            x = y.reshape(b, t * 2, h, w, c)
            t = t * 2
        else:
            # 'Rep' first chunk: skip conv; leave a zero cache behind, but
            # advance the cache with this chunk's trailing frame semantics:
            # reference stores 'Rep' and on the next chunk pads with zeros,
            # i.e. the cache entering chunk 1 is all-zero — already true.
            pass
        idx += 1
    if mode in ("upsample2d", "upsample3d"):
        def up(f):
            f = jnp.repeat(jnp.repeat(f, 2, axis=1), 2, axis=2)  # nearest-exact 2x
            return _conv2d(p["conv"], f)
        x = _per_frame(up, x)
    elif mode in ("downsample2d", "downsample3d"):
        def down(f):
            f = jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)))  # ZeroPad2d((0,1,0,1))
            return _conv2d(p["conv"], f, strides=(2, 2), padding="VALID")
        x = _per_frame(down, x)
    if mode == "downsample3d":
        # temporal part AFTER spatial (ref :162-173); 1-frame cache, stride 2
        if first:
            caches[idx] = x[:, -1:]
        else:
            x_in = jnp.concatenate([caches[idx], x], axis=1)
            caches[idx] = x_in[:, -1:]
            x = _conv3d(p["time_conv"], x_in, strides=(2, 1, 1), spatial_pad=(0, 0))
        idx += 1
    return x, idx


# ---------------------------------------------------------------------------
# Encoder / Decoder plans (static layer lists derived from config)
# ---------------------------------------------------------------------------


def encoder_plan(cfg: WanVAEConfig):
    """Mirror of Encoder3d.__init__ (ref :276-326): list of (kind, in, out)."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan = [("conv_in", 3, dims[0])]
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_dim
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", d, out_dim))
            d = out_dim
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
            plan.append((mode, out_dim, out_dim))
    out_dim = dims[-1]
    plan += [("res", out_dim, out_dim), ("attn", out_dim, out_dim), ("res", out_dim, out_dim)]
    plan.append(("head", out_dim, cfg.z_dim * 2))
    return plan


def decoder_plan(cfg: WanVAEConfig):
    """Mirror of Decoder3d.__init__ (ref :379-430)."""
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    plan = [("conv_in", cfg.z_dim, dims[0])]
    plan += [("res", dims[0], dims[0]), ("attn", dims[0], dims[0]), ("res", dims[0], dims[0])]
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        if i in (1, 2, 3):
            in_dim = in_dim // 2
        d = in_dim
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", d, out_dim))
            d = out_dim
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temporal_upsample[i] else "upsample2d"
            plan.append((mode, out_dim, out_dim // 2))
    plan.append(("head", dims[-1], 3))
    return plan


def _init_conv3d(key, kt, kh, kw, cin, cout, dtype):
    fan_in = cin * kt * kh * kw
    lim = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw_, (kt, kh, kw, cin, cout), jnp.float32, -lim, lim).astype(dtype),
        "b": jax.random.uniform(kb_, (cout,), jnp.float32, -lim, lim).astype(dtype),
    }


def _init_conv2d(key, kh, kw, cin, cout, dtype):
    fan_in = cin * kh * kw
    lim = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32, -lim, lim).astype(dtype),
        "b": jax.random.uniform(kb_, (cout,), jnp.float32, -lim, lim).astype(dtype),
    }


def _init_layer(key, kind, cin, cout, dtype):
    keys = jax.random.split(key, 6)
    if kind in ("conv_in", "head"):
        p = _init_conv3d(keys[0], 3, 3, 3, cin, cout, dtype)
        if kind == "head":
            return {"norm": {"gamma": jnp.ones((cin,), dtype)}, "conv": p}
        return {"conv": p}
    if kind == "res":
        p = {
            "norm1": {"gamma": jnp.ones((cin,), dtype)},
            "conv1": _init_conv3d(keys[0], 3, 3, 3, cin, cout, dtype),
            "norm2": {"gamma": jnp.ones((cout,), dtype)},
            "conv2": _init_conv3d(keys[1], 3, 3, 3, cout, cout, dtype),
        }
        if cin != cout:
            p["shortcut"] = _init_conv3d(keys[2], 1, 1, 1, cin, cout, dtype)
        return p
    if kind == "attn":
        return {
            "norm": {"gamma": jnp.ones((cin,), dtype)},
            "to_qkv": _init_conv2d(keys[0], 1, 1, cin, cin * 3, dtype),
            "proj": {"w": jnp.zeros((1, 1, cin, cin), dtype), "b": jnp.zeros((cin,), dtype)},
        }
    if kind in ("upsample2d", "upsample3d"):
        p = {"conv": _init_conv2d(keys[0], 3, 3, cin, cin // 2, dtype)}
        if kind == "upsample3d":
            p["time_conv"] = _init_conv3d(keys[1], 3, 1, 1, cin, cin * 2, dtype)
        return p
    if kind in ("downsample2d", "downsample3d"):
        p = {"conv": _init_conv2d(keys[0], 3, 3, cin, cin, dtype)}
        if kind == "downsample3d":
            p["time_conv"] = _init_conv3d(keys[1], 3, 1, 1, cin, cin, dtype)
        return p
    raise ValueError(kind)


def init_params(key, cfg: WanVAEConfig = WAN_VAE):
    enc_plan, dec_plan = encoder_plan(cfg), decoder_plan(cfg)
    keys = jax.random.split(key, len(enc_plan) + len(dec_plan) + 2)
    enc = [_init_layer(keys[i], *enc_plan[i], cfg.dtype) for i in range(len(enc_plan))]
    dec = [
        _init_layer(keys[len(enc_plan) + i], *dec_plan[i], cfg.dtype)
        for i in range(len(dec_plan))
    ]
    z2 = cfg.z_dim * 2
    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _init_conv3d(keys[-2], 1, 1, 1, z2, z2, cfg.dtype),
        "conv2": _init_conv3d(keys[-1], 1, 1, 1, cfg.z_dim, cfg.z_dim, cfg.dtype),
    }


# ---------------------------------------------------------------------------
# Streaming forward passes
# ---------------------------------------------------------------------------


def _run_plan(plan, params, x, caches, first):
    idx = 0
    for (kind, cin, cout), p in zip(plan, params):
        if kind == "conv_in":
            x, caches[idx] = causal_conv3d(p["conv"], x, caches[idx])
            idx += 1
        elif kind == "res":
            x, idx = residual_block(p, x, caches, idx)
        elif kind == "attn":
            x = attention_block(p, x)
        elif kind == "head":
            # head conv always in f32: the decoder emits 8-bit RGB whose step
            # (1/255) is below bf16 resolution at 1.0
            x = jax.nn.silu(_rms_norm_video(p["norm"], x)).astype(jnp.float32)
            x, caches[idx] = causal_conv3d(p["conv"], x, caches[idx])
            idx += 1
        else:
            x, idx = resample(p, kind, x, caches, idx, first)
    return x, caches


def _cache_specs(plan, cfg, b, h, w, decoder):
    """Static (shape per cache slot) for a given input spatial size."""
    specs = []
    ch, cw = h, w
    for kind, cin, cout in plan:
        if kind == "conv_in":
            specs.append((b, CACHE_T, ch, cw, cin))
        elif kind == "res":
            specs.append((b, CACHE_T, ch, cw, cin))
            specs.append((b, CACHE_T, ch, cw, cout))
        elif kind == "downsample2d":
            ch, cw = ch // 2, cw // 2
        elif kind == "downsample3d":
            ch, cw = ch // 2, cw // 2
            specs.append((b, 1, ch, cw, cout))
        elif kind == "upsample3d":
            specs.append((b, CACHE_T, ch, cw, cin))
            ch, cw = ch * 2, cw * 2
        elif kind == "upsample2d":
            ch, cw = ch * 2, cw * 2
        elif kind == "head":
            specs.append((b, CACHE_T, ch, cw, cin))
    return specs


def init_caches(plan, cfg, b, h, w, decoder=False, dtype=jnp.float32):
    return [jnp.zeros(s, dtype) for s in _cache_specs(plan, cfg, b, h, w, decoder)]


def _latent_scale(cfg, mean, std):
    if mean is None:
        mean = LATENT_MEAN if cfg.z_dim == 16 else np.zeros(cfg.z_dim, np.float32)
    if std is None:
        std = LATENT_STD if cfg.z_dim == 16 else np.ones(cfg.z_dim, np.float32)
    return jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32)


def _pick_chunk(n_steps: int, requested: int) -> int:
    """Largest divisor of n_steps that is <= requested (scan needs equal
    chunk sizes; falling back keeps any frame count working)."""
    for c in range(min(requested, n_steps), 0, -1):
        if n_steps % c == 0:
            return c
    return 1


def encode(params, cfg: WanVAEConfig, video: jax.Array, mean=None, std=None,
           compute_dtype=None, time_chunk: int = 2) -> jax.Array:
    """video: (b, 3, T, H, W) in [-1, 1], T = 1 + 4k -> latents (b, 16, t, h, w),
    normalized by LATENT_MEAN/STD (ref VideoVAE_.encode :525-550).

    compute_dtype (default cfg.dtype = f32) sets the streaming precision of
    the conv stack. bf16 halves HBM traffic; all conv accumulation, norm
    statistics, the head conv and the latent normalization stay f32
    (mixed precision, gated by test_wan_vae.py's PSNR check)."""
    cdt = compute_dtype or cfg.dtype
    b, _, T, H, W = video.shape
    assert T % 4 == 1, f"encoder expects 1+4k frames, got {T}"
    x = jnp.moveaxis(video.astype(cdt), 1, -1)  # (b,T,H,W,3)
    plan = encoder_plan(cfg)
    caches = init_caches(plan, cfg, b, H, W, dtype=cdt)

    out0, caches = _run_plan(plan, params["encoder"], x[:, :1], caches, first=True)

    n_lat = (T - 1) // 4
    if n_lat > 0:
        # temporal chunking: process `chunk` latent frames (4*chunk pixel
        # frames) per scan step. Causal convs with explicit caches make any
        # chunking bit-equivalent to the reference's fixed 4-frame streaming
        # (wan_video_vae.py:525-550) — larger chunks just feed the MXU more
        # parallel work per conv call (~2x encode throughput at chunk 5).
        chunk = _pick_chunk(n_lat, time_chunk)
        n_chunks = n_lat // chunk
        chunks = x[:, 1:].reshape(b, n_chunks, 4 * chunk, H, W, 3)

        def body(caches, chunk_x):
            y, caches = _run_plan(plan, params["encoder"], chunk_x, caches, first=False)
            return caches, y

        caches, outs = jax.lax.scan(body, caches, jnp.moveaxis(chunks, 1, 0))
        # outs: (n_chunks, b, chunk, h, w, 2z)
        rest = jnp.moveaxis(outs, 0, 1).reshape(b, n_lat, *out0.shape[2:])
        out = jnp.concatenate([out0, rest], axis=1)
    else:
        out = out0

    out = _conv3d(params["conv1"], out)
    mu = out[..., : cfg.z_dim]
    lm, ls = _latent_scale(cfg, mean, std)
    mu = (mu - lm) / ls
    return jnp.moveaxis(mu, -1, 1)  # (b, z, t, h, w)


def decode(params, cfg: WanVAEConfig, latents: jax.Array, mean=None, std=None, clamp=True,
           compute_dtype=None, time_chunk: int = 1) -> jax.Array:
    """latents (b, 16, t, h, w) -> video (b, 3, 4t-3, 8h, 8w), clamped [-1,1]
    (ref VideoVAE_.decode :552-575). compute_dtype / time_chunk: see encode
    (decode chunks are in LATENT frames). Default 1: at 480p the decoder is
    already MXU-saturated at one latent frame per step — measured on v5e,
    chunk 2 is ~19% SLOWER (worse layouts at full output res) and chunk 4
    OOMs; the knob exists for smaller resolutions."""
    cdt = compute_dtype or cfg.dtype
    b, z, t, h, w = latents.shape
    x = jnp.moveaxis(latents.astype(jnp.float32), 1, -1)
    lm, ls = _latent_scale(cfg, mean, std)
    x = x * ls + lm
    x = _conv3d(params["conv2"], x).astype(cdt)

    plan = decoder_plan(cfg)
    caches = init_caches(plan, cfg, b, h, w, decoder=True, dtype=cdt)

    out0, caches = _run_plan(plan, params["decoder"], x[:, :1], caches, first=True)

    if t > 1:
        chunk = _pick_chunk(t - 1, time_chunk)
        n_chunks = (t - 1) // chunk
        chunks = x[:, 1:].reshape(b, n_chunks, chunk, h, w, z)

        def body(caches, chunk_x):
            y, caches = _run_plan(plan, params["decoder"], chunk_x, caches, first=False)
            return caches, y

        caches, outs = jax.lax.scan(body, caches, jnp.moveaxis(chunks, 1, 0))
        rest = jnp.moveaxis(outs, 0, 1).reshape(b, (t - 1) * 4, *out0.shape[2:])
        out = jnp.concatenate([out0, rest], axis=1)
    else:
        out = out0

    if clamp:
        # single_decode clamps (ref :753-756); the tiled path clamps only
        # after blending (ref :690-691), so tiled_decode passes clamp=False.
        out = jnp.clip(out, -1.0, 1.0)
    return jnp.moveaxis(out, -1, 1)  # (b, 3, T, H, W)


# ---------------------------------------------------------------------------
# Spatially tiled encode / decode with feathered blending (ref :621-744)
# ---------------------------------------------------------------------------


def _build_1d_mask(length, left_bound, right_bound, border_width):
    x = np.ones((length,), np.float32)
    bw = min(border_width, length)
    if not left_bound and bw > 0:
        x[:bw] = (np.arange(bw) + 1) / bw
    if not right_bound and bw > 0:
        x[-bw:] = ((np.arange(bw) + 1) / bw)[::-1]
    return x


def build_mask(shape_hw, is_bound, border_width):
    """Feathered blend mask (ref build_mask :630-640). shape (1,1,1,H,W)."""
    H, W = shape_hw
    hm = _build_1d_mask(H, is_bound[0], is_bound[1], border_width[0])
    wm = _build_1d_mask(W, is_bound[2], is_bound[3], border_width[1])
    m = np.minimum(hm[:, None], wm[None, :])
    return jnp.asarray(m[None, None, None], jnp.float32)


def _tile_tasks(H, W, size, stride):
    tasks = []
    for hh in range(0, H, stride[0]):
        if hh - stride[0] >= 0 and hh - stride[0] + size[0] >= H:
            continue
        for ww in range(0, W, stride[1]):
            if ww - stride[1] >= 0 and ww - stride[1] + size[1] >= W:
                continue
            tasks.append((hh, hh + size[0], ww, ww + size[1]))
    return tasks


def tiled_encode(params, cfg, video, tile_size=(272, 272), tile_stride=(144, 128), mean=None, std=None,
                 compute_dtype=None):
    """Spatially tiled encode with feathered blending (ref :695-744).
    tile_size/stride in PIXELS (the reference passes latent units *8)."""
    b, _, T, H, W = video.shape
    up = 8
    out_T = (T + 3) // 4
    values = jnp.zeros((b, cfg.z_dim, out_T, H // up, W // up), jnp.float32)
    weight = jnp.zeros((1, 1, out_T, H // up, W // up), jnp.float32)
    for hh, h_, ww, w_ in _tile_tasks(H, W, tile_size, tile_stride):
        h_ = min(h_, H)
        w_ = min(w_, W)
        tile = video[:, :, :, hh:h_, ww:w_]
        lat = encode(params, cfg, tile, mean=mean, std=std,
                     compute_dtype=compute_dtype).astype(jnp.float32)
        mask = build_mask(
            lat.shape[-2:],
            is_bound=(hh == 0, h_ >= H, ww == 0, w_ >= W),
            border_width=((tile_size[0] - tile_stride[0]) // up, (tile_size[1] - tile_stride[1]) // up),
        )
        th, tw = hh // up, ww // up
        values = values.at[:, :, :, th : th + lat.shape[3], tw : tw + lat.shape[4]].add(lat * mask)
        weight = weight.at[:, :, :, th : th + lat.shape[3], tw : tw + lat.shape[4]].add(mask)
    return values / weight


def tiled_decode(params, cfg, latents, tile_size=(34, 34), tile_stride=(18, 16), mean=None, std=None,
                 compute_dtype=None):
    """Spatially tiled decode (ref :643-692). tile_size/stride in LATENT units."""
    b, _, T, h, w = latents.shape
    up = 8
    out_T = T * 4 - 3
    values = jnp.zeros((b, 3, out_T, h * up, w * up), jnp.float32)
    weight = jnp.zeros((1, 1, out_T, h * up, w * up), jnp.float32)
    for hh, h_, ww, w_ in _tile_tasks(h, w, tile_size, tile_stride):
        h_ = min(h_, h)
        w_ = min(w_, w)
        tile = latents[:, :, :, hh:h_, ww:w_]
        vid = decode(params, cfg, tile, mean=mean, std=std, clamp=False,
                     compute_dtype=compute_dtype).astype(jnp.float32)
        mask = build_mask(
            vid.shape[-2:],
            is_bound=(hh == 0, h_ >= h, ww == 0, w_ >= w),
            border_width=((tile_size[0] - tile_stride[0]) * up, (tile_size[1] - tile_stride[1]) * up),
        )
        th, tw = hh * up, ww * up
        values = values.at[:, :, :, th : th + vid.shape[3], tw : tw + vid.shape[4]].add(vid * mask)
        weight = weight.at[:, :, :, th : th + vid.shape[3], tw : tw + vid.shape[4]].add(mask)
    return jnp.clip(values / weight, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Torch checkpoint ingestion
# ---------------------------------------------------------------------------


def config_from_state_dict(sd) -> WanVAEConfig:
    """Infer VAE width/z_dim from checkpoint shapes (structure is fixed)."""
    d = sd
    if any(k.startswith("model.") for k in d):
        d = {k[len("model."):]: v for k, v in d.items() if k.startswith("model.")}
    dim = int(d["encoder.conv1.weight"].shape[0])
    z_dim = int(d["conv2.weight"].shape[0])
    return WanVAEConfig(dim=dim, z_dim=z_dim)


def _t(arr) -> np.ndarray:
    if hasattr(arr, "detach"):
        arr = arr.detach().to("cpu")
        if str(arr.dtype) == "torch.bfloat16":
            arr = arr.float()
        arr = arr.numpy()
    return np.asarray(arr)


def _conv3d_from(sd, prefix, dtype):
    w = _t(sd[f"{prefix}.weight"])  # (out, in, kt, kh, kw)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), dtype),
        "b": jnp.asarray(_t(sd[f"{prefix}.bias"]), dtype),
    }


def _conv2d_from(sd, prefix, dtype):
    w = _t(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
        "b": jnp.asarray(_t(sd[f"{prefix}.bias"]), dtype),
    }


def _gamma_from(sd, prefix, dtype):
    g = _t(sd[f"{prefix}.gamma"])  # (c,1,1,1) or (c,1,1)
    return {"gamma": jnp.asarray(g.reshape(-1), dtype)}


def _layers_from_torch(sd, plan, root, cfg):
    """Walk the reference Sequential numbering to map params per plan entry.

    Encoder3d: conv1, downsamples.{i}, middle.{0,1,2}, head.{0,2}.
    Decoder3d: conv1, middle.{0,1,2}, upsamples.{i}, head.{0,2}.
    """
    dt = cfg.dtype
    out = []
    seq_i = 0  # index within downsamples/upsamples
    is_enc = root == "encoder"
    body = "downsamples" if is_enc else "upsamples"
    mid_i = 0
    in_middle_section = False

    def res_from(prefix):
        p = {
            "norm1": _gamma_from(sd, f"{prefix}.residual.0", dt),
            "conv1": _conv3d_from(sd, f"{prefix}.residual.2", dt),
            "norm2": _gamma_from(sd, f"{prefix}.residual.3", dt),
            "conv2": _conv3d_from(sd, f"{prefix}.residual.6", dt),
        }
        if f"{prefix}.shortcut.weight" in sd:
            p["shortcut"] = _conv3d_from(sd, f"{prefix}.shortcut", dt)
        return p

    def attn_from(prefix):
        return {
            "norm": _gamma_from(sd, f"{prefix}.norm", dt),
            "to_qkv": _conv2d_from(sd, f"{prefix}.to_qkv", dt),
            "proj": _conv2d_from(sd, f"{prefix}.proj", dt),
        }

    n_body = sum(
        1 for k, _, _ in plan if k in ("res", "attn", "upsample2d", "upsample3d",
                                       "downsample2d", "downsample3d")
    ) - 3  # middle section has 3 entries (res, attn, res)

    # figure out which plan indices belong to middle: encoder middle is the
    # last res/attn/res before head; decoder middle is right after conv_in.
    kinds = [k for k, _, _ in plan]
    if is_enc:
        middle_idx = set(range(len(plan) - 4, len(plan) - 1))
    else:
        middle_idx = {1, 2, 3}

    for i, (kind, cin, cout) in enumerate(plan):
        if kind == "conv_in":
            out.append({"conv": _conv3d_from(sd, f"{root}.conv1", dt)})
        elif kind == "head":
            out.append({
                "norm": _gamma_from(sd, f"{root}.head.0", dt),
                "conv": _conv3d_from(sd, f"{root}.head.2", dt),
            })
        elif i in middle_idx:
            prefix = f"{root}.middle.{mid_i}"
            out.append(res_from(prefix) if kind == "res" else attn_from(prefix))
            mid_i += 1
        elif kind == "res":
            out.append(res_from(f"{root}.{body}.{seq_i}"))
            seq_i += 1
        elif kind == "attn":
            out.append(attn_from(f"{root}.{body}.{seq_i}"))
            seq_i += 1
        else:  # resample
            prefix = f"{root}.{body}.{seq_i}"
            p = {}
            if kind in ("upsample2d", "upsample3d"):
                p["conv"] = _conv2d_from(sd, f"{prefix}.resample.1", dt)
            else:
                p["conv"] = _conv2d_from(sd, f"{prefix}.resample.1", dt)
            if kind in ("upsample3d", "downsample3d"):
                p["time_conv"] = _conv3d_from(sd, f"{prefix}.time_conv", dt)
            out.append(p)
            seq_i += 1
    return out


def params_from_torch_state_dict(sd: dict, cfg: WanVAEConfig = WAN_VAE):
    """Reference state dict (keys 'model.encoder...' via WanVideoVAE or bare
    'encoder...' via VideoVAE_) -> our pytree."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    return {
        "encoder": _layers_from_torch(sd, encoder_plan(cfg), "encoder", cfg),
        "decoder": _layers_from_torch(sd, decoder_plan(cfg), "decoder", cfg),
        "conv1": _conv3d_from(sd, "conv1", cfg.dtype),
        "conv2": _conv3d_from(sd, "conv2", cfg.dtype),
    }
