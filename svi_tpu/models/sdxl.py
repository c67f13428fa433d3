"""Stable Diffusion XL family (UNet, dual CLIP text encoders, VAE).

Behavioral reference: diffsynth/models/sdxl_unet.py (SDXLUNet :5-140 — SD's
flat push/pop block list with wider channels, 2/10-layer transformer stacks,
cross dim 2048, and the add_time_id/add_text_embeds conditioning),
sdxl_text_encoder.py (SDXLTextEncoder :5-41 CLIP-L without final LN;
SDXLTextEncoder2 :44-86 OpenCLIP bigG with penultimate hidden states + pooled
text_projection), sdxl_vae_{encoder,decoder}.py (SD VAE, scaling 0.13025).

All compute primitives are shared with svi_tpu.models.sd (channels-last,
f32 group norms, Pallas flash attention for the spatial self-attention).
The is_kolors variant (ChatGLM 4096-dim text, ref :16-21) is supported via
the optional text_intermediate_proj params entry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sd import (
    Params,
    SD_VAE_DECODER_PLAN,
    SD_VAE_ENCODER_PLAN,
    _attention,
    _block_from,
    _conv2d,
    _conv_from,
    _dense,
    _group_norm,
    _layer_norm,
    _lin_from,
    _norm_from,
    _run_plan,
    _t,
    clip_encoder_scan,
    sd_vae_decode,
    sd_vae_encode,
    timestep_embedding,
)

SDXL_VAE_SCALING_FACTOR = 0.13025

# Block plan mirrors ref sdxl_unet.py:23-81 (descriptor kinds as in sd.py).
SDXL_UNET_PLAN = (
    [("res", 320, 320), ("push",), ("res", 320, 320), ("push",),
     ("down", 320, 1, False), ("push",)]
    + [("res", 320, 640), ("attn", 10, 64, 640), ("push",),
       ("res", 640, 640), ("attn", 10, 64, 640), ("push",),
       ("down", 640, 1, False), ("push",)]
    + [("res", 640, 1280), ("attn", 20, 64, 1280), ("push",),
       ("res", 1280, 1280), ("attn", 20, 64, 1280), ("push",)]
    + [("res", 1280, 1280), ("attn", 20, 64, 1280), ("res", 1280, 1280)]
    + [("pop",), ("res", 2560, 1280), ("attn", 20, 64, 1280),
       ("pop",), ("res", 2560, 1280), ("attn", 20, 64, 1280),
       ("pop",), ("res", 1920, 1280), ("attn", 20, 64, 1280), ("up", 1280)]
    + [("pop",), ("res", 1920, 640), ("attn", 10, 64, 640),
       ("pop",), ("res", 1280, 640), ("attn", 10, 64, 640),
       ("pop",), ("res", 960, 640), ("attn", 10, 64, 640), ("up", 640)]
    + [("pop",), ("res", 960, 320), ("pop",), ("res", 640, 320),
       ("pop",), ("res", 640, 320)]
)


def sdxl_unet_forward(params: Params, sample, timestep, encoder_hidden_states,
                      add_time_id, add_text_embeds, controlnet_res=None,
                      ipadapter_kwargs_list=None, motion=None, tiled=False,
                      tile_size=64, tile_stride=32):
    """SDXLUNet.forward (ref sdxl_unet.py:89-140). NCHW in/out.
    add_time_id: (B*6,) micro-conditioning ints; add_text_embeds: (B, 1280)
    pooled text embedding. controlnet_res: NCHW residuals inserted after
    block 22 (ref dancer.py:146)."""
    x = jnp.moveaxis(sample, 1, -1)
    t = timestep_embedding(jnp.atleast_1d(timestep), 320).astype(x.dtype)
    t = _dense(params["time_embedding"]["2"],
               jax.nn.silu(_dense(params["time_embedding"]["0"], t)))
    add_embeds = timestep_embedding(add_time_id.reshape(-1), 256)
    add_embeds = add_embeds.reshape(add_text_embeds.shape[0], -1)
    add_embeds = jnp.concatenate(
        [add_text_embeds, add_embeds.astype(add_text_embeds.dtype)], axis=-1)
    add_embeds = add_embeds.astype(x.dtype)
    add_embeds = _dense(params["add_time_embedding"]["2"],
                        jax.nn.silu(_dense(params["add_time_embedding"]["0"],
                                           add_embeds)))
    time_emb = t + add_embeds

    ctx = encoder_hidden_states
    if "text_intermediate_proj" in params:  # Kolors (ref :112)
        ctx = _dense(params["text_intermediate_proj"], ctx)
    x = _conv2d(params["conv_in"], x)
    if controlnet_res is not None:
        controlnet_res = [jnp.moveaxis(r, 1, -1).astype(x.dtype)
                          for r in controlnet_res]
    x = _run_plan(SDXL_UNET_PLAN, params["blocks"], x, time_emb, ctx,
                  controlnet_res=controlnet_res, controlnet_insert_at=22,
                  ipadapter_kwargs_list=ipadapter_kwargs_list, motion=motion,
                  tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-5)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


def sdxl_text_encoder_forward(params: Params, input_ids, clip_skip: int = 1):
    """SDXLTextEncoder.forward (ref sdxl_text_encoder.py:30-37): CLIP-L stack
    WITHOUT final layer norm (ref :21-22), hidden state from the clip_skip
    break point."""
    embeds = params["token_embedding"][input_ids] + params["position_embeds"][0]
    n_layers = params["encoders"]["layer_norm1"]["w"].shape[0]
    return clip_encoder_scan(params["encoders"], embeds, num_heads=12,
                             n_run=n_layers - (clip_skip - 1))


def sdxl_text_encoder_2_forward(params: Params, input_ids, clip_skip: int = 2):
    """SDXLTextEncoder2.forward (ref sdxl_text_encoder.py:72-82): bigG stack
    (20 heads, plain GELU); returns (pooled_embeds, hidden_states) where
    hidden_states is the pre-final-LN state clip_skip layers from the end and
    pooled is final-LN output at the argmax (EOS) token through
    text_projection."""
    embeds = params["token_embedding"][input_ids] + params["position_embeds"][0]
    s = embeds.shape[1]
    mask = jnp.triu(jnp.full((s, s), float("-inf"), jnp.float32), 1)[None, None]
    encoders = params["encoders"]
    n_layers = encoders["layer_norm1"]["w"].shape[0]
    keep = n_layers - clip_skip  # 0-indexed layer whose output is kept

    def layer(x, p):
        h = _attention(p["attn"], _layer_norm(p["layer_norm1"], x),
                       None, num_heads=20, head_dim=64, mask=mask)
        x = x + h
        y = _dense(p["fc1"], _layer_norm(p["layer_norm2"], x))
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
        return x + _dense(p["fc2"], y)

    def body(carry, xs):
        x, hidden = carry
        i, p = xs
        x = layer(x, p)
        hidden = jnp.where(i == keep, x, hidden)
        return (x, hidden), None

    (embeds, hidden), _ = jax.lax.scan(
        body, (embeds, embeds), (jnp.arange(n_layers), encoders))
    final = _layer_norm(params["final_layer_norm"], embeds)
    eos = jnp.argmax(input_ids, axis=-1)
    pooled = final[jnp.arange(final.shape[0]), eos]
    pooled = _dense(params["text_projection"], pooled)
    return pooled, hidden


def sdxl_vae_encode(params: Params, image, tiled=False, tile_size=64,
                    tile_stride=32):
    """SDXLVAEEncoder (ref sdxl_vae_encoder.py:4-12): SD VAE, scale 0.13025."""
    return sd_vae_encode(params, image, scaling_factor=SDXL_VAE_SCALING_FACTOR,
                         tiled=tiled, tile_size=tile_size,
                         tile_stride=tile_stride)


def sdxl_vae_decode(params: Params, latents, tiled=False, tile_size=64,
                    tile_stride=32):
    """SDXLVAEDecoder (ref sdxl_vae_decoder.py:4-11)."""
    return sd_vae_decode(params, latents, scaling_factor=SDXL_VAE_SCALING_FACTOR,
                         tiled=tiled, tile_size=tile_size,
                         tile_stride=tile_stride)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def sdxl_unet_params_from_torch(sd: dict) -> Params:
    p = {
        "time_embedding": {
            "0": _lin_from(sd, "time_embedding.0"),
            "2": _lin_from(sd, "time_embedding.2"),
        },
        "add_time_embedding": {
            "0": _lin_from(sd, "add_time_embedding.0"),
            "2": _lin_from(sd, "add_time_embedding.2"),
        },
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d) for i, d in enumerate(SDXL_UNET_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }
    if "text_intermediate_proj.weight" in sd:
        p["text_intermediate_proj"] = _lin_from(sd, "text_intermediate_proj")
    return p


def _clip_layers_from(sd: dict) -> Params:
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
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def sdxl_text_encoder_params_from_torch(sd: dict) -> Params:
    return {
        "token_embedding": jnp.asarray(_t(sd["token_embedding.weight"])),
        "position_embeds": jnp.asarray(_t(sd["position_embeds"])),
        "encoders": _clip_layers_from(sd),
    }


def sdxl_text_encoder_2_params_from_torch(sd: dict) -> Params:
    return {
        "token_embedding": jnp.asarray(_t(sd["token_embedding.weight"])),
        "position_embeds": jnp.asarray(_t(sd["position_embeds"])),
        "encoders": _clip_layers_from(sd),
        "final_layer_norm": _norm_from(sd, "final_layer_norm"),
        "text_projection": _lin_from(sd, "text_projection", bias=False),
    }
