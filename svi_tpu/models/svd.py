"""Stable Video Diffusion family (spatio-temporal UNet + temporal VAE decoder).

Behavioral reference: diffsynth/models/svd_unet.py (SVDUNet :238-417 — SD-XL
style flat plan where every spatial resnet/attention is paired with a
temporal counterpart merged through learnable-sigmoid PopMixBlocks; temporal
attention runs per-pixel across frames with sinusoidal or trainable
positional embeddings :138-215), svd_vae_decoder.py (SVDVAEDecoder :71-205 —
SD VAE decoder with sigmoid-mixed temporal resnets and a final temporal
conv), svd_vae_encoder.py (SD VAE encoder, scaling 0.13025), and
svd_image_encoder.py (CLIP ViT-H, implemented in models/ipadapter.py).

Frames ride the batch axis; channels-last (F,H,W,C) on device.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sd import (
    Params,
    _attention_block,
    _block_from,
    _conv2d,
    _conv_from,
    _dense,
    _group_norm,
    _layer_norm,
    _lin_from,
    _norm_from,
    _resnet_block,
    _t,
    timestep_embedding,
)

# ---------------------------------------------------------------------------
# plan (ref svd_unet.py:255-310). Descriptor kinds:
#  sres(cin,cout,eps) push tres(c,eps) mix mixp(c) attn(h,ch) tattn(h,ch)
#  down(c) up(c) pop
# ---------------------------------------------------------------------------


def _res_pair(cin, cout, eps, trailing_push=True):
    p = [("sres", cin, cout, eps), ("push",), ("tres", cout, eps), ("mix",)]
    return p + ([("push",)] if trailing_push else [])


def _attn_pair(heads, ch, trailing_push=True):
    p = [("attn", heads, 64, ch), ("push",), ("tattn", heads, 64, ch),
         ("mixp", ch)]
    return p + ([("push",)] if trailing_push else [])


SVD_UNET_PLAN = (
    # CrossAttnDownBlockSpatioTemporal x3
    _res_pair(320, 320, 1e-6) + _attn_pair(5, 320)
    + _res_pair(320, 320, 1e-6) + _attn_pair(5, 320)
    + [("down", 320), ("push",)]
    + _res_pair(320, 640, 1e-6) + _attn_pair(10, 640)
    + _res_pair(640, 640, 1e-6) + _attn_pair(10, 640)
    + [("down", 640), ("push",)]
    + _res_pair(640, 1280, 1e-6) + _attn_pair(20, 1280)
    + _res_pair(1280, 1280, 1e-6) + _attn_pair(20, 1280)
    + [("down", 1280), ("push",)]
    # DownBlockSpatioTemporal
    + _res_pair(1280, 1280, 1e-5) + _res_pair(1280, 1280, 1e-5)
    # UNetMidBlockSpatioTemporal
    + _res_pair(1280, 1280, 1e-5) + _attn_pair(20, 1280, False)
    + _res_pair(1280, 1280, 1e-5, False)
    # UpBlockSpatioTemporal
    + [("pop",)] + _res_pair(2560, 1280, 1e-6, False)
    + [("pop",)] + _res_pair(2560, 1280, 1e-6, False)
    + [("pop",)] + _res_pair(2560, 1280, 1e-6, False)
    + [("up", 1280)]
    # CrossAttnUpBlockSpatioTemporal x3
    + [("pop",)] + _res_pair(2560, 1280, 1e-6) + _attn_pair(20, 1280, False)
    + [("pop",)] + _res_pair(2560, 1280, 1e-6) + _attn_pair(20, 1280, False)
    + [("pop",)] + _res_pair(1920, 1280, 1e-6) + _attn_pair(20, 1280, False)
    + [("up", 1280)]
    + [("pop",)] + _res_pair(1920, 640, 1e-6) + _attn_pair(10, 640, False)
    + [("pop",)] + _res_pair(1280, 640, 1e-6) + _attn_pair(10, 640, False)
    + [("pop",)] + _res_pair(960, 640, 1e-6) + _attn_pair(10, 640, False)
    + [("up", 640)]
    + [("pop",)] + _res_pair(960, 320, 1e-6) + _attn_pair(5, 320, False)
    + [("pop",)] + _res_pair(640, 320, 1e-6) + _attn_pair(5, 320, False)
    + [("pop",)] + _res_pair(640, 320, 1e-6) + _attn_pair(5, 320, False)
)

# The reference's temporal resnets in up blocks use eps 1e-5 even where the
# spatial ones use 1e-6 (ref :281-283 vs :286-297); GroupNorm eps differences
# below 1e-5 are invisible at parity tolerance, so a single eps per pair is
# used for the temporal halves.


def _group_norm_video(p, x, groups=32, eps=1e-5):
    """GroupNorm over the whole clip (torch sees (1,C,F,H,W))."""
    f, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(f, h, w, groups, c // groups)
    mean = xf.mean(axis=(0, 1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(0, 1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(f, h, w, c)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _temporal_conv(p, x):
    """Conv3d kernel (3,1,1) over the frame axis; x (F,H,W,C)."""
    y = jax.lax.conv_general_dilated(
        x[None], p["w"].astype(x.dtype), (1, 1, 1),
        ((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    return y + p["b"].astype(x.dtype)


def _temporal_resnet(p, x, time_emb, eps):
    """TemporalResnetBlock (ref svd_unet.py:6-43; NO residual: the PopMix
    that follows blends against the pushed spatial output)."""
    h = _temporal_conv(p["conv1"], jax.nn.silu(_group_norm_video(p["norm1"], x, eps=eps)))
    if time_emb is not None and "time_emb_proj" in p:
        emb = _dense(p["time_emb_proj"], jax.nn.silu(time_emb))
        h = h + emb[0][None, None, None, :]
    h = _temporal_conv(p["conv2"], jax.nn.silu(_group_norm_video(p["norm2"], h, eps=eps)))
    if "conv_shortcut" in p:
        x = _dense({"w": p["conv_shortcut"]["w"][0, 0, 0],
                    "b": p["conv_shortcut"]["b"]}, x)
    return x + h


def _plain_attention(p, x, ctx, num_heads, head_dim):
    b, s, _ = x.shape
    sk = ctx.shape[1]
    q = _dense(p["to_q"], x).reshape(b, s, num_heads, head_dim)
    k = _dense(p["to_k"], ctx).reshape(b, sk, num_heads, head_dim)
    v = _dense(p["to_v"], ctx).reshape(b, sk, num_heads, head_dim)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (head_dim ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v)
    return _dense(p["to_out"], o.reshape(b, s, num_heads * head_dim))


def _geglu(p_act, p_ff, x):
    h = _dense(p_act, x)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
    return _dense(p_ff, h)


def positional_ids(num_frames, max_id=25, repeat_length=20, pivot=0):
    """PositionalID (ref svd_unet.py:115-135)."""
    ids = []
    for i in range(num_frames):
        fid = abs(i - pivot)
        if fid < max_id:
            ids.append(fid)
        else:
            pos = (fid - max_id) % (repeat_length * 2)
            ids.append(max_id - 2 - pos if pos < repeat_length
                       else max_id - 2 * repeat_length + pos)
    return np.array(ids, np.int32)


def _temporal_attention_block(p, x, text_emb, num_heads, head_dim):
    """TemporalAttentionBlock (ref svd_unet.py:180-214)."""
    f, h, w, c = x.shape
    if "positional_embedding" in p:  # trainable (long-video variant)
        pe = p["positional_embedding"][jnp.arange(f)]
    else:
        pe = timestep_embedding(jnp.arange(f), c)
    pe = pe.astype(x.dtype)
    pe = _dense(p["pe_proj_2"], jax.nn.silu(_dense(p["pe_proj_0"], pe)))
    x = x + pe[:, None, None, :]
    if "positional_conv" in p:
        xp = jnp.pad(x[None], ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                     mode="reflect")
        x = jax.lax.conv_general_dilated(
            xp, p["positional_conv"]["w"].astype(x.dtype), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0] + p["positional_conv"]["b"].astype(x.dtype)
    y = x.transpose(1, 2, 0, 3).reshape(h * w, f, c)

    y = y + _geglu(p["act_fn_in"], p["ff_in"], _layer_norm(p["norm_in"], y))
    y = y + _plain_attention(p["attn1"], _layer_norm(p["norm1"], y),
                             _layer_norm(p["norm1"], y), num_heads, head_dim)
    ctx = jnp.broadcast_to(text_emb.reshape(1, 1, -1),
                           (h * w, 1, text_emb.shape[-1]))
    y = y + _plain_attention(p["attn2"], _layer_norm(p["norm2"], y), ctx,
                             num_heads, head_dim)
    y = y + _geglu(p["act_fn_out"], p["ff_out"], _layer_norm(p["norm_out"], y))
    return y.reshape(h, w, f, c).transpose(2, 0, 1, 3)


def svd_unet_forward(params: Params, sample, timestep, encoder_hidden_states,
                     add_time_id):
    """SVDUNet.forward (ref svd_unet.py:373-417). sample (F,8,H,W) — frames
    on the batch axis; encoder_hidden_states (1,1,1024) CLIP image embedding;
    add_time_id (3,) = (fps-1, motion_bucket_id, noise_aug_strength)."""
    x = jnp.moveaxis(sample, 1, -1)
    dtype = x.dtype
    t = timestep_embedding(jnp.atleast_1d(timestep), 320).astype(dtype)
    t = _dense(params["time_embedding"]["2"],
               jax.nn.silu(_dense(params["time_embedding"]["0"], t)))
    add = timestep_embedding(add_time_id.reshape(-1), 256).astype(dtype)
    add = add.reshape(-1, 768)
    add = _dense(params["add_time_embedding"]["2"],
                 jax.nn.silu(_dense(params["add_time_embedding"]["0"], add)))
    time_emb = t + add  # (1, 1280)

    text_emb = encoder_hidden_states
    x = _conv2d(params["conv_in"], x)
    res_stack = [x]
    for desc, p in zip(SVD_UNET_PLAN, params["blocks"]):
        kind = desc[0]
        if kind == "sres":
            x = _resnet_block(p, x, jnp.broadcast_to(time_emb,
                                                     (x.shape[0], time_emb.shape[-1])),
                              eps=desc[3])
        elif kind == "tres":
            x = _temporal_resnet(p, x, time_emb, desc[2])
        elif kind == "attn":
            x = _attention_block(p, x, None, text_emb.reshape(1, -1, text_emb.shape[-1]),
                                 desc[1], desc[2])
        elif kind == "tattn":
            x = _temporal_attention_block(p, x, text_emb, desc[1], desc[2])
        elif kind == "push":
            res_stack.append(x)
        elif kind == "pop":
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
        elif kind in ("mix", "mixp"):
            res = res_stack.pop()
            alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)
                                   ).astype(x.dtype)
            x = alpha * res + (1 - alpha) * x
            if kind == "mixp":
                x = _dense(p["proj"], x)
                x = x + res_stack.pop()
        elif kind == "down":
            x = _conv2d(p["conv"], x, stride=2, padding=1)
        elif kind == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = _conv2d(p["conv"], x)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-5)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


# ---------------------------------------------------------------------------
# VAE decoder (ref svd_vae_decoder.py)
# ---------------------------------------------------------------------------

SVD_VAE_DECODER_PLAN = (
    [("sres", 512, 512), ("tres", 512), ("vae_attn", 512),
     ("sres", 512, 512), ("tres", 512)]
    + ([("sres", 512, 512), ("tres", 512)] * 3 + [("up", 512)])
    + ([("sres", 512, 512), ("tres", 512)] * 3 + [("up", 512)])
    + [("sres", 512, 256), ("tres", 256), ("sres", 256, 256), ("tres", 256),
       ("sres", 256, 256), ("tres", 256), ("up", 256)]
    + [("sres", 256, 128), ("tres", 128), ("sres", 128, 128), ("tres", 128),
       ("sres", 128, 128), ("tres", 128)]
)

SVD_VAE_SCALING_FACTOR = 0.18215


def _vae_temporal_resnet(p, x):
    """svd_vae_decoder TemporalResnetBlock (ref :45-69): temporal conv stack
    with residual, then sigmoid-mix against the spatial input."""
    h = _temporal_conv(p["conv1"], jax.nn.silu(_group_norm_video(p["norm1"], x, eps=1e-6)))
    h = _temporal_conv(p["conv2"], jax.nn.silu(_group_norm_video(p["norm2"], h, eps=1e-6)))
    x_temporal = x + h
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
    return alpha * x_temporal + (1 - alpha) * x


def svd_vae_decode(params: Params, latents):
    """SVDVAEDecoder.forward (ref :123-141). latents (4,T,H,W) -> video
    (3,T,8H,8W)."""
    from .sd import _attention, _vae_attention_block

    x = jnp.moveaxis(latents.transpose(1, 0, 2, 3), 1, -1) / SVD_VAE_SCALING_FACTOR
    x = _conv2d(params["conv_in"], x)
    for desc, p in zip(SVD_VAE_DECODER_PLAN, params["blocks"]):
        if desc[0] == "sres":
            x = _resnet_block(p, x, None, eps=1e-6)
        elif desc[0] == "tres":
            x = _vae_temporal_resnet(p, x)
        elif desc[0] == "vae_attn":
            x = _vae_attention_block(p, x, eps=1e-6)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = _conv2d(p["conv"], x)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-5)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    x = jnp.moveaxis(x, -1, 1).transpose(1, 0, 2, 3)  # C T H W
    y = jax.lax.conv_general_dilated(
        x.transpose(1, 2, 3, 0)[None], params["time_conv_out"]["w"].astype(x.dtype),
        (1, 1, 1), ((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0] + params["time_conv_out"]["b"].astype(x.dtype)
    return y.transpose(3, 0, 1, 2)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def _conv3d_p(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _tres_p(sd, b):
    p = {"norm1": _norm_from(sd, f"{b}.norm1"),
         "conv1": _conv3d_p(sd, f"{b}.conv1"),
         "norm2": _norm_from(sd, f"{b}.norm2"),
         "conv2": _conv3d_p(sd, f"{b}.conv2")}
    if f"{b}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin_from(sd, f"{b}.time_emb_proj")
    if f"{b}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv3d_p(sd, f"{b}.conv_shortcut")
    if f"{b}.mix_factor" in sd:
        p["mix_factor"] = jnp.asarray(_t(sd[f"{b}.mix_factor"]))
    return p


def _tattn_p(sd, b):
    p = {
        "pe_proj_0": _lin_from(sd, f"{b}.positional_embedding_proj.0"),
        "pe_proj_2": _lin_from(sd, f"{b}.positional_embedding_proj.2"),
        "norm_in": _norm_from(sd, f"{b}.norm_in"),
        "act_fn_in": _lin_from(sd, f"{b}.act_fn_in.proj"),
        "ff_in": _lin_from(sd, f"{b}.ff_in"),
        "norm1": _norm_from(sd, f"{b}.norm1"),
        "attn1": {k: _lin_from(sd, f"{b}.attn1.{k}")
                  for k in ("to_q", "to_k", "to_v", "to_out")},
        "norm2": _norm_from(sd, f"{b}.norm2"),
        "attn2": {k: _lin_from(sd, f"{b}.attn2.{k}")
                  for k in ("to_q", "to_k", "to_v", "to_out")},
        "norm_out": _norm_from(sd, f"{b}.norm_out"),
        "act_fn_out": _lin_from(sd, f"{b}.act_fn_out.proj"),
        "ff_out": _lin_from(sd, f"{b}.ff_out"),
    }
    if f"{b}.positional_embedding.embeddings" in sd:
        p["positional_embedding"] = jnp.asarray(
            _t(sd[f"{b}.positional_embedding.embeddings"]))
    if f"{b}.positional_conv.weight" in sd:
        p["positional_conv"] = _conv3d_p(sd, f"{b}.positional_conv")
    return p


def svd_unet_params_from_torch(sd: dict) -> Params:
    blocks = []
    for i, desc in enumerate(SVD_UNET_PLAN):
        b = f"blocks.{i}"
        kind = desc[0]
        if kind == "sres":
            blocks.append(_block_from(sd, i, ("res",)))
        elif kind == "tres":
            blocks.append(_tres_p(sd, b))
        elif kind == "attn":
            blocks.append(_block_from(sd, i, ("attn",)))
        elif kind == "tattn":
            blocks.append(_tattn_p(sd, b))
        elif kind in ("mix", "mixp"):
            p = {"mix_factor": jnp.asarray(_t(sd[f"{b}.mix_factor"]))}
            if f"{b}.proj.weight" in sd:
                p["proj"] = _lin_from(sd, f"{b}.proj")
            blocks.append(p)
        elif kind in ("down", "up"):
            blocks.append({"conv": _conv_from(sd, f"{b}.conv")})
        else:
            blocks.append({})
    return {
        "time_embedding": {"0": _lin_from(sd, "time_embedding.0"),
                           "2": _lin_from(sd, "time_embedding.2")},
        "add_time_embedding": {"0": _lin_from(sd, "add_time_embedding.0"),
                               "2": _lin_from(sd, "add_time_embedding.2")},
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": blocks,
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }


def svd_vae_decoder_params_from_torch(sd: dict) -> Params:
    blocks = []
    for i, desc in enumerate(SVD_VAE_DECODER_PLAN):
        b = f"blocks.{i}"
        if desc[0] == "sres":
            blocks.append(_block_from(sd, i, ("res",)))
        elif desc[0] == "tres":
            blocks.append(_tres_p(sd, b))
        elif desc[0] == "vae_attn":
            blocks.append(_block_from(sd, i, ("vae_attn",)))
        else:
            blocks.append({"conv": _conv_from(sd, f"{b}.conv")})
    return {
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": blocks,
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
        "time_conv_out": _conv3d_p(sd, "time_conv_out"),
    }
