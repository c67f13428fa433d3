"""RIFE video frame interpolation (IFNet), TPU-native.

Behavioral reference: diffsynth/extensions/RIFE/__init__.py — a 3-stage
coarse-to-fine flow network (IFBlocks at scales 4/2/1), bilinear backward
warping with border padding (align_corners=True grid_sample), sigmoid blend
mask; RIFEInterpolater doubles the frame rate, RIFESmoother blends each frame
with its neighbors' interpolation.

TPU-native pieces: the grid_sample warp is a vectorized bilinear gather
(floor/ceil take + fractional lerp, coordinates clamped to the border);
F.interpolate(bilinear, align_corners=False) maps to jax.image.resize
('linear', antialias=False — torch doesn't anti-alias on downscale);
ConvTranspose2d maps to an lhs-dilated conv with a pre-flipped kernel;
torch's symmetric padding=1 at stride 2 is kept explicit (XLA SAME would
shift the grid). Channels-last.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1):
    # torch Conv2d(k=3, padding=1): SYMMETRIC padding even at stride 2
    # (XLA "SAME" would pad asymmetrically there and shift the sampling grid)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _prelu(p, x):
    a = p["a"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _conv_prelu(p, x, stride=1):
    return _prelu(p, _conv(p, x, stride))


def _deconv(p, x):
    """ConvTranspose2d(k=4, s=2, p=1): doubles H/W (torch semantics) as an
    input-dilated conv — padding k-1-p=2 each side, kernel pre-flipped and
    transposed to forward-conv HWIO layout at load time."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _resize_bilinear(x, h, w):
    """F.interpolate(mode='bilinear', align_corners=False) analog — torch
    does NOT anti-alias on downscale, so antialias=False."""
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="linear", antialias=False
    )


def warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward warp (ref :8-23): grid_sample(bilinear, border,
    align_corners=True) at grid = base + flow(pixels). x: (B,H,W,C);
    flow: (B,H,W,2) in PIXEL units (dx, dy)."""
    b, h, w, c = x.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    # ref normalizes to [-1,1] then grid_sample align_corners=True maps back
    # to [0, size-1]: net effect = base pixel coords + pixel flow
    px = jnp.clip(xs + flow[..., 0], 0.0, w - 1.0)
    py = jnp.clip(ys + flow[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def gather(yy, xx):
        flat = x.reshape(b, h * w, c)
        idx = yy * w + xx  # (B,H,W)
        return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# IFNet
# ---------------------------------------------------------------------------


def _ifblock_forward(p, x, flow, scale):
    """IFBlock (ref :34-57): downscale, residual conv trunk, two deconv heads."""
    b, h, w, _ = x.shape
    hs, ws = int(h / scale), int(w / scale)
    x = _resize_bilinear(x, hs, ws)
    flow = _resize_bilinear(flow, hs, ws) * (1.0 / scale)
    feat = _conv_prelu(p["conv0_0"], jnp.concatenate([x, flow], -1), stride=2)
    feat = _conv_prelu(p["conv0_1"], feat, stride=2)
    for blk in ("convblock0", "convblock1", "convblock2", "convblock3"):
        feat = _conv_prelu(p[f"{blk}_1"], _conv_prelu(p[f"{blk}_0"], feat)) + feat
    f = _deconv(p["conv1_2"], _prelu(p["conv1_1"], _deconv(p["conv1_0"], feat)))
    m = _deconv(p["conv2_2"], _prelu(p["conv2_1"], _deconv(p["conv2_0"], feat)))
    f = _resize_bilinear(f, h, w) * scale
    m = _resize_bilinear(m, h, w)
    return f, m


def ifnet_forward(params, x: jax.Array, scale_list=(4, 2, 1)):
    """IFNet.forward inference path (ref :60-100). x: (B, H, W, 6) = the two
    frames stacked channel-wise; returns (flow_list, mask, merged_list) with
    merged[2] the interpolated middle frame."""
    img0, img1 = x[..., :3], x[..., 3:6]
    flow = jnp.zeros((*x.shape[:3], 4), x.dtype)
    mask = jnp.zeros((*x.shape[:3], 1), x.dtype)
    warped_img0, warped_img1 = img0, img1
    flow_list, merged, mask_list = [], [], []
    for i, blk in enumerate(("block0", "block1", "block2")):
        f0, m0 = _ifblock_forward(
            params[blk], jnp.concatenate([warped_img0, warped_img1, mask], -1),
            flow, scale_list[i],
        )
        f1, m1 = _ifblock_forward(
            params[blk], jnp.concatenate([warped_img1, warped_img0, -mask], -1),
            jnp.concatenate([flow[..., 2:4], flow[..., :2]], -1), scale_list[i],
        )
        flow = flow + (f0 + jnp.concatenate([f1[..., 2:4], f1[..., :2]], -1)) / 2
        mask = mask + (m0 - m1) / 2
        mask_list.append(mask)
        flow_list.append(flow)
        warped_img0 = warp(img0, flow[..., :2])
        warped_img1 = warp(img1, flow[..., 2:4])
        merged.append((warped_img0, warped_img1))
    sig = jax.nn.sigmoid(mask_list[2])
    merged = [
        m[0] * jax.nn.sigmoid(mk) + m[1] * (1 - jax.nn.sigmoid(mk))
        for m, mk in zip(merged, mask_list)
    ]
    return flow_list, sig, merged


def init_params(key, c=90):
    """Random IFNet (inference blocks only; in_planes = 7 + 4)."""

    def conv_init(k, kh, kw, cin, cout):
        fan_in = cin * kh * kw
        lim = 1.0 / math.sqrt(fan_in)
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim),
            "a": jnp.full((cout,), 0.25, jnp.float32),
        }

    def deconv_init(k, cin, cout, prelu=False):
        fan_in = cin * 16
        lim = 1.0 / math.sqrt(fan_in)
        k1, k2 = jax.random.split(k)
        p = {
            "w": jax.random.uniform(k1, (4, 4, cin, cout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim),
        }
        return p

    def block_init(k):
        ks = jax.random.split(k, 16)
        p = {
            "conv0_0": conv_init(ks[0], 3, 3, 11, c // 2),
            "conv0_1": conv_init(ks[1], 3, 3, c // 2, c),
        }
        for i, blk in enumerate(("convblock0", "convblock1", "convblock2", "convblock3")):
            p[f"{blk}_0"] = conv_init(ks[2 + 2 * i], 3, 3, c, c)
            p[f"{blk}_1"] = conv_init(ks[3 + 2 * i], 3, 3, c, c)
        p["conv1_0"] = deconv_init(ks[10], c, c // 2)
        p["conv1_1"] = {"a": jnp.full((c // 2,), 0.25, jnp.float32)}
        p["conv1_2"] = deconv_init(ks[11], c // 2, 4)
        p["conv2_0"] = deconv_init(ks[12], c, c // 2)
        p["conv2_1"] = {"a": jnp.full((c // 2,), 0.25, jnp.float32)}
        p["conv2_2"] = deconv_init(ks[13], c // 2, 1)
        return p

    k0, k1, k2 = jax.random.split(key, 3)
    return {"block0": block_init(k0), "block1": block_init(k1), "block2": block_init(k2)}


def params_from_torch_state_dict(sd: dict):
    """torch IFNet state dict (keys possibly 'module.'-prefixed,
    ref IFNetStateDictConverter :107-116) -> pytree. Inference blocks only
    (block_tea is the training-time teacher)."""

    def t(a):
        if hasattr(a, "detach"):
            a = a.detach().float().numpy()
        return np.asarray(a)

    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv_from(prefix, prelu_prefix):
        return {
            "w": jnp.asarray(np.transpose(t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))),
            "b": jnp.asarray(t(sd[f"{prefix}.bias"])),
            "a": jnp.asarray(t(sd[f"{prelu_prefix}.weight"]).reshape(-1)),
        }

    def deconv_from(prefix):
        # torch ConvTranspose2d weight (in, out, kh, kw): spatial-flip and
        # transpose to forward-conv (kh, kw, in, out) for the dilated conv
        w = np.flip(t(sd[f"{prefix}.weight"]), axis=(2, 3))
        return {
            "w": jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))),
            "b": jnp.asarray(t(sd[f"{prefix}.bias"])),
        }

    def block_from(b):
        p = {
            "conv0_0": conv_from(f"{b}.conv0.0.0", f"{b}.conv0.0.1"),
            "conv0_1": conv_from(f"{b}.conv0.1.0", f"{b}.conv0.1.1"),
        }
        for i in range(4):
            p[f"convblock{i}_0"] = conv_from(f"{b}.convblock{i}.0.0", f"{b}.convblock{i}.0.1")
            p[f"convblock{i}_1"] = conv_from(f"{b}.convblock{i}.1.0", f"{b}.convblock{i}.1.1")
        p["conv1_0"] = deconv_from(f"{b}.conv1.0")
        p["conv1_1"] = {"a": jnp.asarray(t(sd[f"{b}.conv1.1.weight"]).reshape(-1))}
        p["conv1_2"] = deconv_from(f"{b}.conv1.2")
        p["conv2_0"] = deconv_from(f"{b}.conv2.0")
        p["conv2_1"] = {"a": jnp.asarray(t(sd[f"{b}.conv2.1.weight"]).reshape(-1))}
        p["conv2_2"] = deconv_from(f"{b}.conv2.2")
        return p

    return {b: block_from(b) for b in ("block0", "block1", "block2")}


# ---------------------------------------------------------------------------
# PIL-facing wrappers (ref RIFEInterpolater :119-197, RIFESmoother :200-242)
# ---------------------------------------------------------------------------


class RIFEInterpolater:
    def __init__(self, params, **call_defaults):
        self.params = params
        # default kwargs merged into every __call__ (the reference stores
        # scale/batch_size/interpolate on the instance, RIFE.py:8-18)
        self.call_defaults = call_defaults
        self._fwd = jax.jit(
            lambda p, x, sl: ifnet_forward(p, x, sl), static_argnums=(2,)
        )

    @classmethod
    def from_model_manager(cls, model_manager, **kwargs):
        return cls(model_manager.fetch_model("rife")[0], **kwargs)

    def _process(self, images):
        """PIL -> (N, H, W, 3) float BGR (the reference channel-swaps, :136)."""
        arrs = []
        for im in images:
            w, h = im.size
            if w % 32 or h % 32:
                im = im.resize(((w + 31) // 32, (h + 31) // 32))
            arrs.append(np.asarray(im, np.float32)[:, :, [2, 1, 0]] / 255.0)
        return np.stack(arrs)

    def _decode(self, arr, size):
        from PIL import Image

        out = []
        for a in arr:
            im = Image.fromarray(
                (np.clip(a[..., [2, 1, 0]], 0, 1) * 255).astype(np.uint8)
            )
            if im.size != size:
                im = im.resize(size)
            out.append(im)
        return out

    def _run_pairs(self, frames, scale, batch_size):
        pairs = np.concatenate([frames[:-1], frames[1:]], axis=-1)
        outs = []
        sl = (4 / scale, 2 / scale, 1 / scale)
        for i in range(0, pairs.shape[0], batch_size):
            _, _, merged = self._fwd(self.params, jnp.asarray(pairs[i:i + batch_size]), sl)
            outs.append(np.asarray(merged[2]))
        return np.clip(np.concatenate(outs, axis=0), 0, 1)

    def interpolate(self, images, scale=1.0, batch_size=4, num_iter=1,
                    progress_bar=lambda x: x):
        """Doubles the frame count num_iter times (ref :170-197)."""
        size = images[0].size
        frames = self._process(images)
        for _ in range(num_iter):
            mids = self._run_pairs(frames, scale, batch_size)
            out = []
            for f, m in zip(frames, mids):
                out += [f, m]
            out.append(frames[-1])
            frames = np.stack(out)
        return self._decode(frames, size)


class RIFESmoother(RIFEInterpolater):
    """Temporal smoothing: re-interpolate each frame from its neighbors and
    blend (ref :200-242)."""

    def __call__(self, rendered_frames, scale=1.0, batch_size=4, num_iter=1, **kw):
        scale = self.call_defaults.get("scale", scale)
        batch_size = self.call_defaults.get("batch_size", batch_size)
        num_iter = self.call_defaults.get("num_iter", num_iter)
        size = rendered_frames[0].size
        frames = self._process(rendered_frames)
        sl = (4 / scale, 2 / scale, 1 / scale)

        def run(pairs):
            outs = []
            for i in range(0, pairs.shape[0], batch_size):
                _, _, merged = self._fwd(self.params, jnp.asarray(pairs[i:i + batch_size]), sl)
                outs.append(np.asarray(merged[2]))
            return np.concatenate(outs, axis=0)

        for _ in range(num_iter):
            mids = run(np.concatenate([frames[:-2], frames[2:]], axis=-1))
            blended = run(np.concatenate([frames[1:-1], mids], axis=-1))
            frames[1:-1] = blended
        return self._decode(frames, size)
