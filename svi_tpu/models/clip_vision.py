"""XLM-Roberta-CLIP ViT-H/14 vision tower (Wan's image encoder), TPU-native.

Behavioral reference: diffsynth/models/wan_video_image_encoder.py
(VisionTransformer :386, AttentionBlock :289, SelfAttention :231,
QuickGELU :219, WanImageEncoder :852). Only the vision tower is needed by the
SVI pipelines: `encode_image` bicubic-resizes the first conditioning frame to
224², CLIP-normalizes, and returns the penultimate (31-of-32 block) tokens —
(b, 257, 1280) — as DiT cross-attention context (ref :864-880).

ViT-H/14 config: image 224, patch 14 (257 tokens with cls), dim 1280,
heads 16, layers 32, mlp_ratio 4, activation plain GELU, pre-norm.
Runs in float32 (conditioning encode is precision-sensitive,
svi_video.py:296-362).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention
from ..ops.norms import layer_norm

Params = dict

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    norm_eps: float = 1e-5
    activation: str = "gelu"  # ViT-H uses plain GELU (ref :835 activation='gelu')
    dtype: Any = jnp.float32

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2


VIT_H_14 = ClipVisionConfig()


def _act(cfg, x):
    if cfg.activation == "quick_gelu":
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _block(p: Params, cfg: ClipVisionConfig, x: jax.Array) -> jax.Array:
    """Pre-norm ViT block (ref AttentionBlock :322-329 forward, post_norm=False)."""
    b, L, d = x.shape
    n, hd = cfg.num_heads, d // cfg.num_heads
    y = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=cfg.norm_eps)
    qkv = y @ p["attn"]["to_qkv"]["w"] + p["attn"]["to_qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = flash_attention(
        q.reshape(b, L, n, hd), k.reshape(b, L, n, hd), v.reshape(b, L, n, hd)
    ).reshape(b, L, d)
    x = x + (o @ p["attn"]["proj"]["w"] + p["attn"]["proj"]["b"])
    y = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"], eps=cfg.norm_eps)
    h = _act(cfg, y @ p["mlp"]["fc1"]["w"] + p["mlp"]["fc1"]["b"])
    return x + (h @ p["mlp"]["fc2"]["w"] + p["mlp"]["fc2"]["b"])


def forward_tokens(params: Params, cfg: ClipVisionConfig, pixels: jax.Array,
                   use_31_block: bool = True) -> jax.Array:
    """pixels: (b, 3, 224, 224), already CLIP-normalized. Returns (b, 257, dim)
    after 31 of 32 blocks (ref VisionTransformer.forward :458-477)."""
    b = pixels.shape[0]
    ps = cfg.patch_size
    hw = cfg.image_size // ps
    # Conv2d patch embed (kernel == stride) as reshape + dense, feature order
    # (c, kh, kw) to match torch conv weight layout.
    x = pixels.astype(cfg.dtype).reshape(b, 3, hw, ps, hw, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, hw * hw, 3 * ps * ps)
    x = x @ params["patch_embedding"]["w"]
    if "b" in params["patch_embedding"]:
        x = x + params["patch_embedding"]["b"]
    cls = jnp.broadcast_to(params["cls_embedding"], (b, 1, cfg.dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(x, params["pre_norm"]["w"], params["pre_norm"]["b"], eps=cfg.norm_eps)

    n_blocks = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    blocks = jax.tree.map(lambda a: a[:n_blocks], params["blocks"])

    def body(x, bp):
        return _block(bp, cfg, x), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def _bicubic_kernel(x):
    # torch/PIL bicubic (a = -0.75)
    a = -0.75
    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )


def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """Dense (dst, src) bicubic resize matrix, align_corners=False semantics."""
    scale = src / dst
    out = np.zeros((dst, src), np.float64)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center)) - 1
        idx = np.arange(lo, lo + 4)
        w = _bicubic_kernel(idx - center)
        w = w / w.sum()
        idx = np.clip(idx, 0, src - 1)
        for j, wj in zip(idx, w):
            out[i, j] += wj
    return out.astype(np.float32)


def resize_bicubic(img: jax.Array, size: tuple[int, int]) -> jax.Array:
    """img: (b, c, H, W) -> (b, c, size) via separable bicubic (torch
    F.interpolate(mode='bicubic', align_corners=False) semantics)."""
    b, c, H, W = img.shape
    mh = jnp.asarray(_resize_matrix(H, size[0]))
    mw = jnp.asarray(_resize_matrix(W, size[1]))
    out = jnp.einsum("oh,bchw->bcow", mh, img.astype(jnp.float32))
    return jnp.einsum("pw,bcow->bcop", mw, out)


def encode_image(params: Params, cfg: ClipVisionConfig, frames: jax.Array) -> jax.Array:
    """WanImageEncoder.encode_image (ref :864-880): frames (b, 3, H, W) in
    [-1, 1] -> bicubic 224² -> CLIP normalize -> 31-block tokens (b, 257, dim)."""
    x = resize_bicubic(frames, (cfg.image_size, cfg.image_size))
    x = x * 0.5 + 0.5
    x = (x - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]
    return forward_tokens(params, cfg, x, use_31_block=True)


# ---------------------------------------------------------------------------
# Init / torch ingestion
# ---------------------------------------------------------------------------


def init_params(key, cfg: ClipVisionConfig) -> Params:
    keys = jax.random.split(key, 6)
    dt = cfg.dtype
    gain = 1.0 / math.sqrt(cfg.dim)
    pdim = 3 * cfg.patch_size**2
    mdim = cfg.dim * cfg.mlp_ratio

    def lin(k, fi, fo):
        lim = 1.0 / math.sqrt(fi)
        k1, k2 = jax.random.split(k)
        return {
            "w": jax.random.uniform(k1, (fi, fo), jnp.float32, -lim, lim).astype(dt),
            "b": jax.random.uniform(k2, (fo,), jnp.float32, -lim, lim).astype(dt),
        }

    def block_init(k):
        ks = jax.random.split(k, 4)
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), dt), "b": jnp.zeros((cfg.dim,), dt)},
            "norm2": {"w": jnp.ones((cfg.dim,), dt), "b": jnp.zeros((cfg.dim,), dt)},
            "attn": {"to_qkv": lin(ks[0], cfg.dim, cfg.dim * 3), "proj": lin(ks[1], cfg.dim, cfg.dim)},
            "mlp": {"fc1": lin(ks[2], cfg.dim, mdim), "fc2": lin(ks[3], mdim, cfg.dim)},
        }

    return {
        # pre_norm=True => patch conv has no bias (ref :428-433)
        "patch_embedding": {
            "w": (jax.random.normal(keys[0], (pdim, cfg.dim)) / math.sqrt(pdim)).astype(dt)
        },
        "cls_embedding": (gain * jax.random.normal(keys[1], (1, 1, cfg.dim))).astype(dt),
        "pos_embedding": (gain * jax.random.normal(keys[2], (1, cfg.num_patches + 1, cfg.dim))).astype(dt),
        "pre_norm": {"w": jnp.ones((cfg.dim,), dt), "b": jnp.zeros((cfg.dim,), dt)},
        "blocks": jax.vmap(block_init)(jax.random.split(keys[3], cfg.num_layers)),
    }


def config_from_state_dict(sd) -> ClipVisionConfig:
    """Infer ViT architecture from checkpoint tensor shapes (vision tower)."""
    pref = ""
    for cand in ("model.visual.", "visual.", ""):
        if f"{cand}patch_embedding.weight" in sd:
            pref = cand
            break
    pe = sd[f"{pref}patch_embedding.weight"].shape  # (dim, 3, ps, ps)
    dim, ps = int(pe[0]), int(pe[2])
    n_tokens = int(sd[f"{pref}pos_embedding"].shape[1])
    hw = int(round((n_tokens - 1) ** 0.5))
    num_layers = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith(f"{pref}transformer.") and k.split(".")[2].isdigit()
    )
    mlp = int(sd[f"{pref}transformer.0.mlp.0.weight"].shape[0])
    # ViT-H uses 16 heads at dim 1280 (head_dim 80); scale proportionally.
    num_heads = max(1, dim // 80) if dim % 80 == 0 else max(1, dim // 64)
    return ClipVisionConfig(
        image_size=hw * ps, patch_size=ps, dim=dim, mlp_ratio=mlp // dim,
        num_heads=num_heads, num_layers=num_layers,
    )


def _t(arr):
    if hasattr(arr, "detach"):
        arr = arr.detach().to("cpu")
        if str(arr.dtype) == "torch.bfloat16":
            arr = arr.float()
        arr = arr.numpy()
    return np.asarray(arr)


def params_from_torch_state_dict(sd: dict, cfg: ClipVisionConfig) -> Params:
    """Ingest the reference's WanImageEncoder state dict (keys under
    'model.visual.'); the textual tower is dropped."""
    dt = cfg.dtype
    pref = ""
    for cand in ("model.visual.", "visual.", ""):
        if f"{cand}patch_embedding.weight" in sd:
            pref = cand
            break

    def lin(name):
        return {
            "w": jnp.asarray(_t(sd[f"{name}.weight"]).T, dt),
            "b": jnp.asarray(_t(sd[f"{name}.bias"]), dt),
        }

    def norm(name):
        return {
            "w": jnp.asarray(_t(sd[f"{name}.weight"]), dt),
            "b": jnp.asarray(_t(sd[f"{name}.bias"]), dt),
        }

    pe_w = _t(sd[f"{pref}patch_embedding.weight"])  # (dim, 3, ps, ps)
    patch = {"w": jnp.asarray(pe_w.reshape(cfg.dim, -1).T, dt)}
    if f"{pref}patch_embedding.bias" in sd:
        patch["b"] = jnp.asarray(_t(sd[f"{pref}patch_embedding.bias"]), dt)

    def block(i):
        b = f"{pref}transformer.{i}"
        return {
            "norm1": norm(f"{b}.norm1"),
            "norm2": norm(f"{b}.norm2"),
            "attn": {"to_qkv": lin(f"{b}.attn.to_qkv"), "proj": lin(f"{b}.attn.proj")},
            "mlp": {"fc1": lin(f"{b}.mlp.0"), "fc2": lin(f"{b}.mlp.2")},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "patch_embedding": patch,
        "cls_embedding": jnp.asarray(_t(sd[f"{pref}cls_embedding"]), dt),
        "pos_embedding": jnp.asarray(_t(sd[f"{pref}pos_embedding"]), dt),
        "pre_norm": norm(f"{pref}pre_norm"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
