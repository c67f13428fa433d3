"""IP-Adapters and the CLIP vision tower they (and SVD) use.

Behavioral reference: diffsynth/models/svd_image_encoder.py (SVDImageEncoder
:27-49 — CLIP ViT-H/bigG vision tower: class token + patch conv + learned
positions, non-causal GELU layers, pooled class-token projection),
sd_ipadapter.py (SDIpAdapter :18-52) and sdxl_ipadapter.py (SDXLIpAdapter
:44-100 + IpAdapterImageProjModel :17-29): the pooled image embedding is
projected to 4 context tokens, and per cross-attention block a dedicated
(to_k_ip, to_v_ip) pair produces extra K/V that the UNet adds as
`scale * attention(q, ip_k, ip_v)` (attention.py:29-35; wired through
sd._attention's `ipadapter` argument).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sd import (
    Params,
    _dense,
    _layer_norm,
    _lin_from,
    _norm_from,
    _t,
    clip_encoder_scan,
)

# call maps (ref sd_ipadapter.py:27-28, sdxl_ipadapter.py:53-67):
# (unet plan index, transformer_id) -> ipadapter module index
SD_IPADAPTER_MAP = {(i, 0): j for j, i in enumerate(
    [1, 4, 9, 12, 17, 20, 40, 43, 46, 50, 53, 56, 60, 63, 66, 29])}
SDXL_IPADAPTER_MAP = {i: j for j, i in enumerate(sum([
    [(7, i) for i in range(2)], [(10, i) for i in range(2)],
    [(15, i) for i in range(10)], [(18, i) for i in range(10)],
    [(25, i) for i in range(10)], [(28, i) for i in range(10)],
    [(31, i) for i in range(10)], [(35, i) for i in range(2)],
    [(38, i) for i in range(2)], [(41, i) for i in range(2)],
    [(21, i) for i in range(10)],
], []))}


def clip_image_encoder_forward(params: Params, pixel_values, num_heads=16,
                               pooled=True):
    """SVDImageEncoder.forward (ref svd_image_encoder.py:38-45).
    pixel_values: (B,3,224,224) CLIP-normalized. pooled=True returns the
    projected class-token embedding; False returns all final hidden states
    (pre post-LN), as SVD's conditioning uses."""
    x = jnp.moveaxis(pixel_values, 1, -1)
    dtype = x.dtype
    patch = params["patch_embedding"].astype(dtype)
    ps = patch.shape[0]
    emb = jax.lax.conv_general_dilated(
        x, patch, (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, gh, gw, d = emb.shape
    emb = emb.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype), (b, 1, d))
    emb = jnp.concatenate([cls, emb], axis=1) \
        + params["position_embeds"].astype(dtype)
    emb = _layer_norm(params["pre_layernorm"], emb)
    emb = clip_encoder_scan(params["encoders"], emb, num_heads=num_heads,
                            quick_gelu=False, causal=False)
    if not pooled:
        return emb
    emb = _layer_norm(params["post_layernorm"], emb[:, 0])
    return _dense(params["visual_projection"], emb)


def ipadapter_kv(params: Params, image_emb, call_map, scale=1.0):
    """SDIpAdapter/SDXLIpAdapter.forward (ref sd_ipadapter.py:34-49):
    project the pooled image embedding to 4 tokens, then per mapped
    cross-attention produce (ip_k, ip_v). Returns
    {plan_index: {transformer_id: {ip_k, ip_v, scale}}}."""
    tokens = _dense(params["image_proj"]["proj"], image_emb)
    n_ctx = params["image_proj"]["n_tokens"]
    tokens = tokens.reshape(-1, n_ctx, tokens.shape[-1] // n_ctx)
    tokens = _layer_norm(params["image_proj"]["norm"], tokens)
    tokens = tokens.reshape(1, -1, tokens.shape[-1])
    out = {}
    for (block_id, tid), mod_id in call_map.items():
        mod = params["modules"][mod_id]
        out.setdefault(block_id, {})[tid] = {
            "ip_k": _dense(mod["to_k_ip"], tokens),
            "ip_v": _dense(mod["to_v_ip"], tokens),
            "scale": scale,
        }
    return out


def sd_ipadapter_kv(params, image_emb, scale=1.0):
    return ipadapter_kv(params, image_emb, SD_IPADAPTER_MAP, scale)


# instant-style subset (ref sdxl_ipadapter.py:67-81: modules 34..43 only —
# the up-block attention layers)
SDXL_IPADAPTER_MAP_LESS = {k: v for k, v in SDXL_IPADAPTER_MAP.items()
                           if 34 <= v < 44}


def sdxl_ipadapter_kv(params, image_emb, scale=1.0, use_instant_style=False):
    return ipadapter_kv(
        params, image_emb,
        SDXL_IPADAPTER_MAP_LESS if use_instant_style else SDXL_IPADAPTER_MAP,
        scale)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def clip_image_encoder_params_from_torch(sd: dict) -> Params:
    layers = []
    i = 0
    while f"encoders.{i}.layer_norm1.weight" in sd:
        e = f"encoders.{i}"
        layers.append({
            "layer_norm1": _norm_from(sd, f"{e}.layer_norm1"),
            "attn": {
                "to_q": _lin_from(sd, f"{e}.attn.to_q"),
                "to_k": _lin_from(sd, f"{e}.attn.to_k"),
                "to_v": _lin_from(sd, f"{e}.attn.to_v"),
                "to_out": _lin_from(sd, f"{e}.attn.to_out"),
            },
            "layer_norm2": _norm_from(sd, f"{e}.layer_norm2"),
            "fc1": _lin_from(sd, f"{e}.fc1"),
            "fc2": _lin_from(sd, f"{e}.fc2"),
        })
        i += 1
    w = _t(sd["embeddings.patch_embedding.weight"])
    return {
        "class_embedding": jnp.asarray(_t(sd["embeddings.class_embedding"])[0]),
        "patch_embedding": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "position_embeds": jnp.asarray(_t(sd["embeddings.position_embeds"])[0]),
        "pre_layernorm": _norm_from(sd, "pre_layernorm"),
        "encoders": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "post_layernorm": _norm_from(sd, "post_layernorm"),
        "visual_projection": _lin_from(sd, "visual_projection", bias=False),
    }


def ipadapter_params_from_torch(sd: dict, n_tokens=4) -> Params:
    mods = []
    i = 0
    while f"ipadapter_modules.{i}.to_k_ip.weight" in sd:
        mods.append({
            "to_k_ip": _lin_from(sd, f"ipadapter_modules.{i}.to_k_ip",
                                 bias=False),
            "to_v_ip": _lin_from(sd, f"ipadapter_modules.{i}.to_v_ip",
                                 bias=False),
        })
        i += 1
    return {
        "image_proj": {
            "proj": _lin_from(sd, "image_proj.proj"),
            "norm": _norm_from(sd, "image_proj.norm"),
            "n_tokens": n_tokens,
        },
        "modules": mods,
    }
