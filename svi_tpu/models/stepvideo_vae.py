"""StepVideo VAE (version-2), TPU-native.

Behavioral reference: diffsynth/models/stepvideo_vae.py — a causal 3D
KL-VAE that maps 17-frame pixel chunks to 3-frame latent chunks of 64
channels at 1/16 spatial scale (StepVideoVAE :909-1015: frame_len=17,
latent_len=3), with:
  * causal time padding on every 3D conv (CausalConv :226-260);
  * "zero-pad" group norms — norm+SiLU then two zero FRAMES prepended, so
    the following conv is time-valid (base_group_norm_with_zero_pad
    :431-438 + CausalConvAfterNorm :463-487);
  * per-frame ("spatial") group-norm statistics in version 2
    (base_group_norm :32-60, flag set at :927);
  * pixel-unshuffle/shuffle patchify stages with channel-averaging /
    channel-duplicating shortcuts (:262-400);
  * causal single-head attention over flattened (t,h,w) tokens in the mid
    blocks (AttnBlock :489-517);
  * chunked encode/decode with cross-chunk frame blending (mix :1021-1031)
    and feathered spatially-tiled decode (tiled_decode :1052-1100).

TPU-first: everything is functional over a params pytree in channels-last
(B,T,H,W,C) layout; the causal mid attention is computed in query chunks
(memory-bounded, no S^2 logits materialization); convs are XLA NDHWC convs
on the MXU. Structure is derived from the params tree (key names encode the
down/upsample kind), so one forward serves any channel configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sd import Params, _t

# ---------------------------------------------------------------------------
# primitives (channels-last video: (B, T, H, W, C))
# ---------------------------------------------------------------------------


def _conv3d(p, x, stride=(1, 1, 1), time_pad=0, spatial_pad=0):
    if time_pad:
        x = jnp.pad(x, ((0, 0), (time_pad, 0), (0, 0), (0, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride,
        ((0, 0), (spatial_pad, spatial_pad), (spatial_pad, spatial_pad)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["b"].astype(x.dtype)


def _causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv (ref :226-260): time pad k_t-1 at the front, spatial
    half-kernel SAME padding."""
    kt, kh = p["w"].shape[0], p["w"].shape[1]
    return _conv3d(p, x, stride, time_pad=kt - 1, spatial_pad=kh // 2)


def _conv2d(p, x, stride=1, padding=1):
    b, t = x.shape[:2]
    xf = x.reshape((b * t,) + x.shape[2:])
    y = jax.lax.conv_general_dilated(
        xf, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["b"].astype(x.dtype)
    return y.reshape((b, t) + y.shape[1:])


def _gn(p, x, act_silu=False, groups=32, eps=1e-5):
    """Per-frame ("spatial") group norm (ref base_group_norm :32-60 with
    .spatial=True): statistics over (H, W, C/groups) for each (b, t)."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mean = xf.mean(axis=(2, 3, 5), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(2, 3, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    y = y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    if act_silu:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def _gn_zero_pad(p, x, pad_size=2):
    """base_group_norm_with_zero_pad (ref :431-438): norm+SiLU, then prepend
    `pad_size` zero frames (the causal padding of the conv that follows)."""
    y = _gn(p, x, act_silu=True)
    return jnp.pad(y, ((0, 0), (pad_size, 0), (0, 0), (0, 0), (0, 0)))


def _causal_attention(q, k, v, chunk=512):
    """Single-head causal attention over flattened (t,h,w) tokens (ref
    AttnBlock.attention :497-508, sdpa is_causal=True). q,k,v (B,S,C).
    Computed in query chunks so the S^2 logits never materialize."""
    b, s, c = q.shape
    scale = c ** -0.5
    pad = (-s) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    kf = k.astype(jnp.float32)

    def one(i, qc):
        logits = jnp.einsum("bsc,bkc->bsk", qc, kf) * scale
        qidx = i * chunk + jnp.arange(chunk)
        mask = qidx[:, None] >= jnp.arange(s)[None, :]
        logits = jnp.where(mask[None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bsk,bkc->bsc", probs, v.astype(jnp.float32))

    n = qp.shape[1] // chunk
    outs = jax.lax.map(lambda i: one(i, jax.lax.dynamic_slice_in_dim(
        qp, i * chunk, chunk, axis=1)), jnp.arange(n))
    out = outs.transpose(1, 0, 2, 3).reshape(b, n * chunk, c)[:, :s]
    return out.astype(q.dtype)


def _attn_block(p, x):
    """AttnBlock (ref :489-517): GN -> 1x1 q/k/v -> causal attn -> 1x1 + x."""
    b, t, h, w, c = x.shape
    nx = _gn(p["norm"], x, act_silu=False)
    q = _conv3d(p["q"], nx).reshape(b, t * h * w, c)
    k = _conv3d(p["k"], nx).reshape(b, t * h * w, c)
    v = _conv3d(p["v"], nx).reshape(b, t * h * w, c)
    o = _causal_attention(q, k, v).reshape(b, t, h, w, c)
    return _conv3d(p["proj_out"], o) + x


def _resnet_block(p, x):
    """Resnet3DBlock (ref :519-541): zero-pad GN+SiLU -> time-valid conv."""
    h = _gn_zero_pad(p["norm1"], x)
    h = _conv3d(p["conv1"], h, spatial_pad=1)
    sc = _conv3d(p["nin_shortcut"], x) if "nin_shortcut" in p else x
    h = _gn_zero_pad(p["norm2"], h)
    return _conv3d(p["conv2"], h, spatial_pad=1) + sc


def _res3d_block_upsample(p, x):
    """Res3DBlockUpsample (ref :676-715): out = silu(conv_path + x) + x."""
    h = _causal_conv3d(p["conv1"], x)
    h = _gn(p["norm1"], h, act_silu=True)
    h = _causal_conv3d(p["conv2"], h)
    h = _gn(p["norm2"], h, act_silu=False)
    return jax.nn.silu(h + x) + x


def _pixel_unshuffle_3d(x, factor):
    """ref :318-326 / :345-353 in channels-last: front time pad factor-1;
    channel order (c major, ft, fh, fw minor)."""
    x = jnp.pad(x, ((0, 0), (factor - 1, 0), (0, 0), (0, 0), (0, 0)))
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // factor, factor, h // factor, factor,
                  w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // factor, h // factor, w // factor,
                     c * factor ** 3)


def _pixel_shuffle_3d(x, factor):
    """ref :306-317: channel split (c', ft, fh, fw); drops factor-1 leading
    frames."""
    b, t, h, w, c = x.shape
    nc = c // factor ** 3
    x = x.reshape(b, t, h, w, nc, factor, factor, factor)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor, h * factor, w * factor, nc)
    return x[:, factor - 1:]


def _chan_avg_down(x, out_channels, factor):
    """PixelUnshuffleChannelAveragingDownSampleLayer3D (ref :355-378)."""
    y = _pixel_unshuffle_3d(x, factor) if factor > 1 else x
    b, t, h, w, c = y.shape
    return y.reshape(b, t, h, w, out_channels, c // out_channels).mean(-1)


def _chan_dup_up(x, out_channels, factor):
    """ChannelDuplicatingPixelUnshuffleUpSampleLayer3D (ref :262-281)."""
    c = x.shape[-1]
    repeats = out_channels * factor ** 3 // c
    y = jnp.repeat(x, repeats, axis=-1)
    if factor == 1:
        return y
    b, t, h, w, _ = y.shape
    y = y.reshape(b, t, h, w, out_channels, factor, factor, factor)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    y = y.reshape(b, t * factor, h * factor, w * factor, out_channels)
    return y[:, factor - 1:]


def _nearest_up(x, axes):
    for ax in axes:
        x = jnp.repeat(x, 2, axis=ax)
    return x


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def stepvideo_vae_encode_chunk(params: Params, x):
    """VideoEncoder.forward, version 2 (ref :563-675). x (B, T, C, H, W)
    pixel chunk -> (B, t_lat, 2*z, h/16, w/16) moments (mean | logvar)."""
    enc = params["encoder"]
    h = x.transpose(0, 1, 3, 4, 2)  # channels-last
    h = _causal_conv3d(enc["conv_in"], h)
    for level in enc["down"]:
        for blk in level["block"]:
            h = _resnet_block(blk, h)
        if "downsample3d" in level:
            h = _causal_conv3d(level["downsample3d"], h, stride=(2, 2, 2))
        elif "downsample2d" in level:
            # Downsample2D with padding=0: right/bottom pad 1 (ref :213-222)
            h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv2d(level["downsample2d"], h, stride=2, padding=0)
    h = _resnet_block(enc["mid"]["block_1"], h)
    h = _attn_block(enc["mid"]["attn_1"], h)
    h = _resnet_block(enc["mid"]["block_2"], h)

    h = _gn(enc["norm_out"], h, act_silu=True)
    out_ch = enc["conv_patchify"]["w"].shape[-1]
    shortcut = _chan_avg_down(h, out_ch * 8, 2)
    h = _causal_conv3d(enc["conv_patchify"], h)
    h = _pixel_unshuffle_3d(h, 2) + shortcut
    z_ch2 = enc["conv_out"]["w"].shape[-1]
    shortcut = _chan_avg_down(h, z_ch2, 1)
    h = _causal_conv3d(enc["conv_out"], h) + shortcut
    return h.transpose(0, 1, 4, 2, 3)  # (B, t, 2z, h, w)


def stepvideo_vae_decode_chunk(params: Params, z, temporal_downsample=4):
    """VideoDecoder.forward, version 2 (ref :758-868). z (B, t_lat, z, h, w)
    -> (B, C, T, H, W) pixel chunk (ref returns channel-first)."""
    dec = params["decoder"]
    h = z.transpose(0, 1, 3, 4, 2)
    ch = dec["conv_in"]["w"].shape[-1]
    h = _causal_conv3d(dec["conv_in"], h) + _chan_dup_up(h, ch, 1)
    block_in = dec["conv_unpatchify"]["w"].shape[-1] // 8
    shortcut = _chan_dup_up(h, block_in, 2)
    h = _causal_conv3d(dec["conv_unpatchify"], h)
    h = _pixel_shuffle_3d(h, 2) + shortcut

    h = _resnet_block(dec["mid"]["block_1"], h)
    h = _attn_block(dec["mid"]["attn_1"], h)
    h = _resnet_block(dec["mid"]["block_2"], h)

    for level in reversed(dec["up"]):
        for blk in level["block"]:
            h = _resnet_block(blk, h)
        if "upsample3d" in level:
            h = _nearest_up(h, (1, 2, 3))
            h = _res3d_block_upsample(level["upsample3d"], h)
        elif "upsample2d" in level:
            h = _nearest_up(h, (2, 3))
            h = _conv2d(level["upsample2d"], h, stride=1, padding=1)

    h = _gn_zero_pad(dec["norm_out"], h)
    h = _conv3d(dec["conv_out"], h, spatial_pad=1)
    h = h[:, temporal_downsample - 1:]
    return h.transpose(0, 4, 1, 2, 3)


# ---------------------------------------------------------------------------
# chunked public API
# ---------------------------------------------------------------------------

FRAME_LEN = 17
LATENT_LEN = 3


def gaussian_sample(moments, rng=None, deterministic=False):
    """DiagonalGaussianDistribution (ref :878-906); moments (B,T,2z,H,W)."""
    mean, logvar = jnp.split(moments, 2, axis=2)
    if deterministic or rng is None:
        return mean
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(rng, mean.shape, jnp.float32
                                          ).astype(mean.dtype)


def stepvideo_vae_encode(params: Params, video, rng=None, deterministic=False):
    """StepVideoVAE.encode (ref :975-983): 17-frame chunks -> sample."""
    chunks = [stepvideo_vae_encode_chunk(params, video[:, i:i + FRAME_LEN])
              for i in range(0, video.shape[1], FRAME_LEN)]
    moments = jnp.concatenate(chunks, axis=1)
    return gaussian_sample(moments, rng, deterministic)


def mix(x, frame_len=FRAME_LEN, smooth_scale=0.6):
    """Cross-chunk frame blending (ref :1021-1031): the last frame of each
    chunk and the first of the next are blended with the ORIGINAL values."""
    t = x.shape[1]
    front = np.arange(frame_len - 1, t - 1, frame_len)
    back = front + 1
    xf, xb = x[:, front], x[:, back]
    x = x.at[:, front].set(xf * smooth_scale + xb * (1 - smooth_scale))
    x = x.at[:, back].set(xb * smooth_scale + xf * (1 - smooth_scale))
    return x


def stepvideo_vae_decode(params: Params, latents, smooth_scale=0.6,
                         decode_chunk_fn=None):
    """StepVideoVAE.single_decode + mix (ref :1033-1040, :1102-1109).
    latents (B, T_lat, z, h, w) -> (B, T, 3, H, W)."""
    fn = decode_chunk_fn or (lambda z: stepvideo_vae_decode_chunk(params, z))
    chunks = [fn(latents[:, i:i + LATENT_LEN]).transpose(0, 2, 1, 3, 4)
              for i in range(0, latents.shape[1], LATENT_LEN)]
    return mix(jnp.concatenate(chunks, axis=1), smooth_scale=smooth_scale)


def _build_1d_mask(length, left_bound, right_bound, border_width):
    x = np.ones((length,), np.float32)
    if not left_bound:
        x[:border_width] = (np.arange(border_width) + 1) / border_width
    if not right_bound:
        x[-border_width:] = np.flip((np.arange(border_width) + 1)
                                    / border_width)
    return x


def stepvideo_vae_tiled_decode(params: Params, latents, tile_size=(34, 34),
                               tile_stride=(16, 16), smooth_scale=0.6,
                               decode_chunk_fn=None):
    """StepVideoVAE.tiled_decode (ref :1052-1100): feather-blended spatial
    tiles, 3-latent-frame chunks, 16x upscale. Host-side accumulation.

    Reference quirk preserved: the tiled path accumulates channel-first, so
    the reference's subsequent mix() slices the 3-channel dim and is a no-op
    (ref decode :1102-1109) — numerics here match that (no cross-chunk frame
    blending); only the output layout is normalized to (B, T, C, H, W) for
    API consistency with the untiled path."""
    fn = decode_chunk_fn or (lambda z: stepvideo_vae_decode_chunk(params, z))
    b, t, _, hh, ww = latents.shape
    size_h, size_w = tile_size
    stride_h, stride_w = tile_stride
    values = np.zeros((b, 3, t // 3 * 17, hh * 16, ww * 16), np.float32)
    weight = np.zeros((1, 1, t // 3 * 17, hh * 16, ww * 16), np.float32)
    for ti in range(0, t, 3):
        for h in range(0, hh, stride_h):
            if h - stride_h >= 0 and h - stride_h + size_h >= hh:
                continue
            for w in range(0, ww, stride_w):
                if w - stride_w >= 0 and w - stride_w + size_w >= ww:
                    continue
                h_, w_ = h + size_h, w + size_w
                tile = latents[:, ti:ti + 3, :, h:h_, w:w_]
                out = np.asarray(fn(tile), np.float32)
                mh = _build_1d_mask(out.shape[3], h == 0, h_ >= hh,
                                    (size_h - stride_h) * 16)
                mw = _build_1d_mask(out.shape[4], w == 0, w_ >= ww,
                                    (size_w - stride_w) * 16)
                m = np.minimum(mh[:, None], mw[None, :])[None, None, None]
                tt, th, tw = out.shape[2:]
                t0, h0, w0 = ti // 3 * 17, h * 16, w * 16
                values[:, :, t0:t0 + tt, h0:h0 + th, w0:w0 + tw] += out * m
                weight[:, :, t0:t0 + tt, h0:h0 + th, w0:w0 + tw] += m
    del smooth_scale  # the reference's mix is a no-op on the tiled layout
    return jnp.asarray(values / weight).transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# torch state-dict ingestion
# ---------------------------------------------------------------------------


def _c3(sd, prefix):
    return {"w": jnp.asarray(np.transpose(_t(sd[f"{prefix}.weight"]),
                                          (2, 3, 4, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _c2(sd, prefix):
    return {"w": jnp.asarray(np.transpose(_t(sd[f"{prefix}.weight"]),
                                          (2, 3, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _n(sd, prefix):
    return {"w": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _res_p(sd, prefix):
    p = {"norm1": _n(sd, f"{prefix}.norm1"),
         "conv1": _c3(sd, f"{prefix}.conv1.conv"),
         "norm2": _n(sd, f"{prefix}.norm2"),
         "conv2": _c3(sd, f"{prefix}.conv2.conv")}
    if f"{prefix}.nin_shortcut.conv.weight" in sd:
        p["nin_shortcut"] = _c3(sd, f"{prefix}.nin_shortcut.conv")
    return p


def _attn_p(sd, prefix):
    return {"norm": _n(sd, f"{prefix}.norm"),
            "q": _c3(sd, f"{prefix}.q.conv"),
            "k": _c3(sd, f"{prefix}.k.conv"),
            "v": _c3(sd, f"{prefix}.v.conv"),
            "proj_out": _c3(sd, f"{prefix}.proj_out.conv")}


def stepvideo_vae_params_from_torch(sd: dict) -> Params:
    """Keys follow the reference module tree (StepVideoVAE, version 2).
    Handles the decoder.conv_out key remap (ref init_from_ckpt :951-959)."""
    sd = {(k.replace("decoder.conv_out.", "decoder.conv_out.conv.")
           if k.startswith("decoder.conv_out.")
           and not k.startswith("decoder.conv_out.conv.") else k): v
          for k, v in sd.items()}

    down = []
    i = 0
    while f"encoder.down.{i}.block.0.norm1.weight" in sd:
        level = {"block": []}
        j = 0
        while f"encoder.down.{i}.block.{j}.norm1.weight" in sd:
            level["block"].append(_res_p(sd, f"encoder.down.{i}.block.{j}"))
            j += 1
        if f"encoder.down.{i}.downsample.conv.conv.weight" in sd:
            level["downsample3d"] = _c3(
                sd, f"encoder.down.{i}.downsample.conv.conv")
        elif f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample2d"] = _c2(
                sd, f"encoder.down.{i}.downsample.conv")
        down.append(level)
        i += 1

    up = []
    i = 0
    while f"decoder.up.{i}.block.0.norm1.weight" in sd:
        level = {"block": []}
        j = 0
        while f"decoder.up.{i}.block.{j}.norm1.weight" in sd:
            level["block"].append(_res_p(sd, f"decoder.up.{i}.block.{j}"))
            j += 1
        if f"decoder.up.{i}.upsample.conv3d.conv1.conv.weight" in sd:
            pre = f"decoder.up.{i}.upsample.conv3d"
            level["upsample3d"] = {
                "conv1": _c3(sd, f"{pre}.conv1.conv"),
                "norm1": _n(sd, f"{pre}.norm1"),
                "conv2": _c3(sd, f"{pre}.conv2.conv"),
                "norm2": _n(sd, f"{pre}.norm2")}
        elif f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample2d"] = _c2(sd, f"decoder.up.{i}.upsample.conv")
        up.append(level)
        i += 1

    return {
        "encoder": {
            "conv_in": _c3(sd, "encoder.conv_in.conv"),
            "down": down,
            "mid": {"block_1": _res_p(sd, "encoder.mid.block_1"),
                    "attn_1": _attn_p(sd, "encoder.mid.attn_1"),
                    "block_2": _res_p(sd, "encoder.mid.block_2")},
            "norm_out": _n(sd, "encoder.norm_out"),
            "conv_patchify": _c3(sd, "encoder.conv_patchify.conv.conv"),
            "conv_out": _c3(sd, "encoder.conv_out.conv"),
        },
        "decoder": {
            "conv_in": _c3(sd, "decoder.conv_in.conv"),
            "conv_unpatchify": _c3(sd, "decoder.conv_unpatchify.conv.conv"),
            "mid": {"block_1": _res_p(sd, "decoder.mid.block_1"),
                    "attn_1": _attn_p(sd, "decoder.mid.attn_1"),
                    "block_2": _res_p(sd, "decoder.mid.block_2")},
            "up": up,
            "norm_out": _n(sd, "decoder.norm_out"),
            "conv_out": _c3(sd, "decoder.conv_out.conv"),
        },
    }
