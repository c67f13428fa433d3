"""ESRGAN 4x upscaler (RRDBNet), TPU-native.

Behavioral reference: diffsynth/extensions/ESRGAN/__init__.py — 23 RRDB
blocks (each 3 residual dense blocks of 5 convs with dense concats and
LeakyReLU 0.2), trunk conv, two nearest-2x upsamples with convs, HR head.

TPU-first design: the 23 identical RRDB blocks are STACKED along a leading
axis and run as one `lax.scan` (single-block compilation); convs are
channels-last XLA convs; dense concatenation feeds the MXU as one widening
matmul per conv.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RRDBNetConfig:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32


def _conv_init(key, kh, kw, cin, cout):
    fan_in = cin * kh * kw
    lim = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -lim, lim),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -lim, lim),
    }


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(p, x):
    """ResidualDenseBlock (ref :7-24): 5 convs with dense concats."""
    x1 = _lrelu(_conv(p["conv1"], x))
    x2 = _lrelu(_conv(p["conv2"], jnp.concatenate([x, x1], -1)))
    x3 = _lrelu(_conv(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
    x4 = _lrelu(_conv(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
    x5 = _conv(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
    return x5 * 0.2 + x


def _rrdb(p, x):
    """RRDB (ref :27-39)."""
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return out * 0.2 + x


def init_params(key, cfg: RRDBNetConfig = RRDBNetConfig()):
    keys = jax.random.split(key, 8)

    def rdb_init(k):
        ks = jax.random.split(k, 5)
        f, g = cfg.num_feat, cfg.num_grow_ch
        return {
            "conv1": _conv_init(ks[0], 3, 3, f, g),
            "conv2": _conv_init(ks[1], 3, 3, f + g, g),
            "conv3": _conv_init(ks[2], 3, 3, f + 2 * g, g),
            "conv4": _conv_init(ks[3], 3, 3, f + 3 * g, g),
            "conv5": _conv_init(ks[4], 3, 3, f + 4 * g, f),
        }

    def rrdb_init(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"rdb1": rdb_init(k1), "rdb2": rdb_init(k2), "rdb3": rdb_init(k3)}

    return {
        "conv_first": _conv_init(keys[0], 3, 3, cfg.num_in_ch, cfg.num_feat),
        "body": jax.vmap(rrdb_init)(jax.random.split(keys[1], cfg.num_block)),
        "conv_body": _conv_init(keys[2], 3, 3, cfg.num_feat, cfg.num_feat),
        "conv_up1": _conv_init(keys[3], 3, 3, cfg.num_feat, cfg.num_feat),
        "conv_up2": _conv_init(keys[4], 3, 3, cfg.num_feat, cfg.num_feat),
        "conv_hr": _conv_init(keys[5], 3, 3, cfg.num_feat, cfg.num_feat),
        "conv_last": _conv_init(keys[6], 3, 3, cfg.num_feat, cfg.num_out_ch),
    }


def esrgan_forward(params, x: jax.Array) -> jax.Array:
    """x: (B, H, W, 3) in [0,1] -> (B, 4H, 4W, 3) (ref RRDBNet.forward
    :56-67; upsampling is nearest-2x via `repeat`)."""
    feat = _conv(params["conv_first"], x)

    def body(f, bp):
        return _rrdb(bp, f), None

    body_feat, _ = jax.lax.scan(body, feat, params["body"])
    feat = feat + _conv(params["conv_body"], body_feat)
    feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
    feat = _lrelu(_conv(params["conv_up1"], feat))
    feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
    feat = _lrelu(_conv(params["conv_up2"], feat))
    return _conv(params["conv_last"], _lrelu(_conv(params["conv_hr"], feat)))


def params_from_torch_state_dict(sd: dict, cfg: RRDBNetConfig = RRDBNetConfig()):
    """torch RRDBNet state dict -> stacked pytree."""

    def t(a):
        if hasattr(a, "detach"):
            a = a.detach().float().numpy()
        return np.asarray(a)

    def conv_from(prefix):
        return {
            "w": jnp.asarray(np.transpose(t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))),
            "b": jnp.asarray(t(sd[f"{prefix}.bias"])),
        }

    def rdb_from(prefix):
        return {f"conv{i}": conv_from(f"{prefix}.conv{i}") for i in range(1, 6)}

    blocks = [
        {f"rdb{j}": rdb_from(f"body.{i}.rdb{j}") for j in (1, 2, 3)}
        for i in range(cfg.num_block)
    ]
    return {
        "conv_first": conv_from("conv_first"),
        "body": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "conv_body": conv_from("conv_body"),
        "conv_up1": conv_from("conv_up1"),
        "conv_up2": conv_from("conv_up2"),
        "conv_hr": conv_from("conv_hr"),
        "conv_last": conv_from("conv_last"),
    }


class ESRGAN:
    """PIL-facing wrapper (ref ESRGAN :85-137)."""

    def __init__(self, params, cfg: RRDBNetConfig = RRDBNetConfig()):
        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(esrgan_forward)

    @staticmethod
    def from_model_manager(model_manager):
        return ESRGAN(*model_manager.fetch_model("esrgan"))

    def upscale(self, images, batch_size=4, progress_bar=lambda x: x):
        from PIL import Image

        single = not isinstance(images, list)
        if single:
            images = [images]
        arr = np.stack([np.asarray(im, np.float32) / 255.0 for im in images])
        outs = []
        for i in progress_bar(range(0, arr.shape[0], batch_size)):
            out = self._fwd(self.params, jnp.asarray(arr[i:i + batch_size]))
            outs.append(np.asarray(out))
        out = np.concatenate(outs, axis=0)
        out_images = [
            Image.fromarray((np.clip(o, 0, 1) * 255).astype(np.uint8)) for o in out
        ]
        return out_images[0] if single else out_images
