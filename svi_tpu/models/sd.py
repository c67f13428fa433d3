"""Stable Diffusion 1.5 family (UNet, CLIP text encoder, image VAE), TPU-native.

Behavioral reference: diffsynth/models/sd_unet.py (SDUNet :230-343 — a FLAT
block list with an explicit push/pop residual stack), sd_text_encoder.py
(CLIP ViT-L text model with causal mask + quickGELU), sd_vae_encoder.py /
sd_vae_decoder.py (KL-VAE, scaling_factor 0.18215).

TPU-first notes: channels-last convs with f32 group-norm statistics; UNet
spatial self-attention (up to 4096 tokens at 512px) runs on the fused Pallas
flash kernel; the 77-token CLIP attention uses a plain masked XLA attention
(block sizes that small don't benefit from the kernel); the CLIP encoder
stack is scanned over stacked per-layer params. The architecture plans are
data (block descriptor lists), mirroring the reference's flat Sequential.

ControlNet residuals enter through sd_unet_forward(controlnet_res=...)
(models/controlnets.py) and IP-Adapter K/V through ipadapter_kwargs_list
(models/ipadapter.py). tiled=True routes the VAE through whole-forward
feathered tiling and the UNet attention blocks through per-transformer-block
tiling (models/tiler.py; ref sd_vae_*.py tiled_forward, sd_unet.py:172-190).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention

Params = dict


# ---------------------------------------------------------------------------
# primitives (channels-last)
# ---------------------------------------------------------------------------


def _conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _dense(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _group_norm(p, x, groups=32, eps=1e-5):
    """torch GroupNorm on (B,H,W,C): per-sample per-group stats in f32."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _ipadapter_attention(q, ipadapter, num_heads, hd):
    """interact_with_ipadapter (ref attention.py:29-35): extra attention of
    the same queries onto the 4 projected image tokens, scaled and added."""
    b, s = q.shape[0], q.shape[1]
    ip_k = ipadapter["ip_k"].reshape(1, -1, num_heads, hd).astype(q.dtype)
    ip_v = ipadapter["ip_v"].reshape(1, -1, num_heads, hd).astype(q.dtype)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        jnp.broadcast_to(ip_k, (b,) + ip_k.shape[1:]
                                         ).astype(jnp.float32)) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs,
                   jnp.broadcast_to(ip_v, (b,) + ip_v.shape[1:]))
    return ipadapter.get("scale", 1.0) * o.reshape(b, s, num_heads * hd)


def _attention(p, x, ctx=None, num_heads=8, head_dim=None, mask=None,
               ipadapter=None):
    """Attention (ref attention.py:15-65): to_q/k/v/out."""
    ctx = x if ctx is None else ctx
    b, s, _ = x.shape
    sk = ctx.shape[1]
    q = _dense(p["to_q"], x)
    k = _dense(p["to_k"], ctx)
    v = _dense(p["to_v"], ctx)
    hd = head_dim or q.shape[-1] // num_heads
    if mask is None:
        qh = q.reshape(b, s, num_heads, hd)
        o = flash_attention(
            qh, k.reshape(b, sk, num_heads, hd),
            v.reshape(b, sk, num_heads, hd),
        )
        if ipadapter is not None:
            o = o.reshape(b, s, num_heads * hd) \
                + _ipadapter_attention(qh, ipadapter, num_heads, hd)
        o = o.reshape(b, s, num_heads * hd)
    else:
        qh = q.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, sk, num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, sk, num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bnsd,bnkd->bnsk", qh.astype(jnp.float32),
                            kh.astype(jnp.float32)) * (hd ** -0.5)
        logits = logits + mask.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnsk,bnkd->bnsd", probs, vh).transpose(0, 2, 1, 3)
        o = o.reshape(b, s, num_heads * hd)
    return _dense(p["to_out"], o)


def timestep_embedding(timesteps, num_channels=320):
    """Timesteps (ref sd_unet.py:6-17): [cos | sin]."""
    half = num_channels // 2
    exponent = -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


# ---------------------------------------------------------------------------
# block forwards
# ---------------------------------------------------------------------------


def _resnet_block(p, x, time_emb, groups=32, eps=1e-5):
    """ResnetBlock (ref :94-123)."""
    h = _group_norm(p["norm1"], x, groups, eps)
    h = _conv2d(p["conv1"], jax.nn.silu(h))
    if time_emb is not None and "time_emb_proj" in p:
        emb = _dense(p["time_emb_proj"], jax.nn.silu(time_emb))
        h = h + emb[:, None, None, :]
    h = _group_norm(p["norm2"], h, groups, eps)
    h = _conv2d(p["conv2"], jax.nn.silu(h))
    if "conv_shortcut" in p:
        x = _conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _transformer_block(p, x, ctx, num_heads, head_dim, ipadapter=None):
    """BasicTransformerBlock (ref :31-67): self-attn, cross-attn (with
    optional IP-Adapter kv), GEGLU ff."""
    x = x + _attention(p["attn1"], _layer_norm(p["norm1"], x), None, num_heads, head_dim)
    x = x + _attention(p["attn2"], _layer_norm(p["norm2"], x), ctx, num_heads,
                       head_dim, ipadapter=ipadapter)
    h = _dense(p["act_fn"], _layer_norm(p["norm3"], x))
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x + _dense(p["ff"], h)


def _attention_block(p, x, time_emb, text_emb, num_heads, head_dim, eps=1e-6,
                     ipadapter_kwargs=None, tiled=False, tile_size=64,
                     tile_stride=32):
    """AttentionBlock (ref :126-208). ipadapter_kwargs:
    {transformer_id: {ip_k, ip_v, scale}}. tiled: per-transformer-block
    feathered spatial tiling (ref :172-190; IP-Adapter K/V are skipped on
    the tiled path exactly like the reference)."""
    b, h, w, c = x.shape
    residual = x
    y = _group_norm(p["norm"], x, eps=eps).reshape(b, h * w, c)
    y = _dense(p["proj_in"], y)
    ctx = text_emb
    if ctx.shape[0] != b:
        ctx = jnp.repeat(ctx, b // ctx.shape[0], axis=0)
    if tiled:
        from . import tiler

        ts = min(tile_size, min(h, w))
        y = y.reshape(b, h, w, c)
        for tp in p["transformer_blocks"]:
            def block_tile(t, _tp=tp):
                tb, th, tw, tc = t.shape
                out = _transformer_block(_tp, t.reshape(tb, th * tw, tc),
                                         jnp.tile(ctx, (tb // b, 1, 1)),
                                         num_heads, head_dim)
                return out.reshape(tb, th, tw, tc)

            y = tiler.tiled_forward(block_tile, y, ts, tile_stride)
        y = y.reshape(b, h * w, c)
    else:
        for tid, tp in enumerate(p["transformer_blocks"]):
            ip = None if ipadapter_kwargs is None else ipadapter_kwargs.get(tid)
            y = _transformer_block(tp, y, ctx, num_heads, head_dim, ipadapter=ip)
    if "proj_out" not in p:  # need_proj_out=False (ref :200-205, SVD)
        return y.reshape(b, h, w, c)
    y = _dense(p["proj_out"], y).reshape(b, h, w, c)
    return y + residual


def _vae_attention_block(p, x, eps=1e-5):
    """VAEAttentionBlock (ref sd_vae_decoder.py:7-43): single-head 512."""
    b, h, w, c = x.shape
    y = _group_norm(p["norm"], x, eps=eps).reshape(b, h * w, c)
    for tp in p["transformer_blocks"]:
        y = _attention(tp, y, None, num_heads=1, head_dim=c)
    return y.reshape(b, h, w, c) + x


# ---------------------------------------------------------------------------
# architecture plans (block descriptor lists == the reference's flat lists)
# ---------------------------------------------------------------------------

# ("res", cin, cout) | ("attn", heads, head_dim, ch) | ("push",) | ("pop",)
# | ("down", ch, padding, extra_padding) | ("up", ch) | ("vae_attn", ch)

SD_UNET_PLAN = (
    [("res", 320, 320), ("attn", 8, 40, 320), ("push",)] * 2
    + [("down", 320, 1, False), ("push",)]
    + [("res", 320, 640), ("attn", 8, 80, 640), ("push",),
       ("res", 640, 640), ("attn", 8, 80, 640), ("push",),
       ("down", 640, 1, False), ("push",)]
    + [("res", 640, 1280), ("attn", 8, 160, 1280), ("push",),
       ("res", 1280, 1280), ("attn", 8, 160, 1280), ("push",),
       ("down", 1280, 1, False), ("push",)]
    + [("res", 1280, 1280), ("push",), ("res", 1280, 1280), ("push",)]
    + [("res", 1280, 1280), ("attn", 8, 160, 1280), ("res", 1280, 1280)]
    + [("pop",), ("res", 2560, 1280), ("pop",), ("res", 2560, 1280),
       ("pop",), ("res", 2560, 1280), ("up", 1280)]
    + [("pop",), ("res", 2560, 1280), ("attn", 8, 160, 1280),
       ("pop",), ("res", 2560, 1280), ("attn", 8, 160, 1280),
       ("pop",), ("res", 1920, 1280), ("attn", 8, 160, 1280), ("up", 1280)]
    + [("pop",), ("res", 1920, 640), ("attn", 8, 80, 640),
       ("pop",), ("res", 1280, 640), ("attn", 8, 80, 640),
       ("pop",), ("res", 960, 640), ("attn", 8, 80, 640), ("up", 640)]
    + [("pop",), ("res", 960, 320), ("attn", 8, 40, 320),
       ("pop",), ("res", 640, 320), ("attn", 8, 40, 320),
       ("pop",), ("res", 640, 320), ("attn", 8, 40, 320)]
)

SD_VAE_ENCODER_PLAN = (
    [("res", 128, 128), ("res", 128, 128), ("down", 128, 0, True),
     ("res", 128, 256), ("res", 256, 256), ("down", 256, 0, True),
     ("res", 256, 512), ("res", 512, 512), ("down", 512, 0, True),
     ("res", 512, 512), ("res", 512, 512),
     ("res", 512, 512), ("vae_attn", 512), ("res", 512, 512)]
)

SD_VAE_DECODER_PLAN = (
    [("res", 512, 512), ("vae_attn", 512), ("res", 512, 512)]
    + [("res", 512, 512)] * 3 + [("up", 512)]
    + [("res", 512, 512)] * 3 + [("up", 512)]
    + [("res", 512, 256), ("res", 256, 256), ("res", 256, 256), ("up", 256)]
    + [("res", 256, 128), ("res", 128, 128), ("res", 128, 128)]
)

VAE_SCALING_FACTOR = 0.18215


def _run_plan(plan, blocks, x, time_emb, text_emb, eps_res=1e-5,
              controlnet_res=None, controlnet_insert_at=None,
              ipadapter_kwargs_list=None, motion=None, tiled=False,
              tile_size=64, tile_stride=32):
    """controlnet_res: channels-last residual list; after executing the plan
    entry at controlnet_insert_at, the last residual is added to the stream
    and the rest elementwise onto the skip stack (ref dancer.py:102-107).
    ipadapter_kwargs_list: {plan_index: {transformer_id: kv-kwargs}}."""
    res_stack = [x] if time_emb is not None else None
    ipadapter_kwargs_list = ipadapter_kwargs_list or {}
    for i, (desc, p) in enumerate(zip(plan, blocks)):
        kind = desc[0]
        if kind == "res":
            x = _resnet_block(p, x, time_emb, eps=eps_res)
        elif kind == "attn":
            x = _attention_block(p, x, time_emb, text_emb, desc[1], desc[2],
                                 ipadapter_kwargs=ipadapter_kwargs_list.get(i),
                                 tiled=tiled, tile_size=tile_size,
                                 tile_stride=tile_stride)
        elif kind == "vae_attn":
            x = _vae_attention_block(p, x)
        elif kind == "push":
            res_stack.append(x)
        elif kind == "pop":
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
        elif kind == "down":
            if desc[3]:  # extra ZeroPad2d((0,1,0,1)) (ref :70-80)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = _conv2d(p["conv"], x, stride=2, padding=0)
            else:
                x = _conv2d(p["conv"], x, stride=2, padding=desc[2])
        elif kind == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = _conv2d(p["conv"], x)
        else:
            raise ValueError(kind)
        if motion is not None and i in motion:  # AnimateDiff (dancer.py 4.2)
            x = motion[i](x)
        if controlnet_res is not None and i == controlnet_insert_at:
            x = x + controlnet_res[-1]
            res_stack = [r + a for r, a in zip(res_stack, controlnet_res[:-1])]
    return x


def sd_unet_forward(params: Params, sample, timestep, encoder_hidden_states,
                    controlnet_res=None, ipadapter_kwargs_list=None,
                    motion=None, tiled=False, tile_size=64, tile_stride=32):
    """SDUNet.forward (ref :324-343). sample: (B, 4, H/8, W/8) NCHW like the
    reference API; returns same layout. controlnet_res: NCHW residual list
    from svi_tpu.models.controlnets (inserted after block 30,
    ref dancer.py:32). tiled: attention-block spatial tiling."""
    x = jnp.moveaxis(sample, 1, -1)
    t = timestep_embedding(jnp.atleast_1d(timestep), 320).astype(x.dtype)
    t = _dense(params["time_embedding"]["2"],
               jax.nn.silu(_dense(params["time_embedding"]["0"], t)))
    x = _conv2d(params["conv_in"], x)
    if controlnet_res is not None:
        controlnet_res = [jnp.moveaxis(r, 1, -1).astype(x.dtype)
                          for r in controlnet_res]
    # VAE-eps deviation note: UNet resnets use eps 1e-5, attn groupnorms 1e-6
    x = _run_plan(SD_UNET_PLAN, params["blocks"], x, t, encoder_hidden_states,
                  controlnet_res=controlnet_res, controlnet_insert_at=30,
                  ipadapter_kwargs_list=ipadapter_kwargs_list, motion=motion,
                  tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-5)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


def sd_vae_encode(params: Params, image, scaling_factor=VAE_SCALING_FACTOR,
                  tiled=False, tile_size=64, tile_stride=32):
    """SDVAEEncoder.forward (ref sd_vae_encoder.py:52-79): (B,3,H,W) [-1,1]
    -> (B,4,H/8,W/8) latents scaled by 0.18215 (deterministic mean branch).
    SDXL reuses the same architecture with scaling 0.13025
    (ref sdxl_vae_encoder.py:4-7). tiled: whole-forward feathered tiling
    at pixel tile_size (ref :41-50)."""
    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                sd_vae_encode(params, jnp.moveaxis(t, -1, 1), scaling_factor),
                1, -1),
            jnp.moveaxis(image, 1, -1), tile_size, tile_stride), -1, 1)
    x = jnp.moveaxis(image, 1, -1)
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD_VAE_ENCODER_PLAN, params["blocks"], x, None, None, eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-6)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    x = _conv2d(params["quant_conv"], x, padding=0)
    x = x[..., :4] * scaling_factor
    return jnp.moveaxis(x, -1, 1)


def sd_vae_decode(params: Params, latents, scaling_factor=VAE_SCALING_FACTOR,
                  tiled=False, tile_size=64, tile_stride=32):
    """SDVAEDecoder.forward (ref sd_vae_decoder.py:90-117). tiled: whole-
    forward feathered tiling at latent tile_size (ref :81-90)."""
    if tiled:
        from . import tiler

        return jnp.moveaxis(tiler.tiled_forward(
            lambda t: jnp.moveaxis(
                sd_vae_decode(params, jnp.moveaxis(t, -1, 1), scaling_factor),
                1, -1),
            jnp.moveaxis(latents, 1, -1), tile_size, tile_stride), -1, 1)
    x = jnp.moveaxis(latents, 1, -1) / scaling_factor
    x = _conv2d(params["post_quant_conv"], x, padding=0)
    x = _conv2d(params["conv_in"], x)
    x = _run_plan(SD_VAE_DECODER_PLAN, params["blocks"], x, None, None, eps_res=1e-6)
    x = _group_norm(params["conv_norm_out"], x, eps=1e-5)
    x = _conv2d(params["conv_out"], jax.nn.silu(x))
    return jnp.moveaxis(x, -1, 1)


def clip_encoder_scan(encoders: Params, embeds, num_heads=12, quick_gelu=True,
                      n_run=None, causal=True):
    """Scan stacked CLIPEncoderLayer params (ref sd_text_encoder.py:5-37):
    pre-LN (optionally causal) self-attention + (quick)GELU MLP. Returns the
    hidden state after running the first `n_run` layers (default: all)."""
    s = embeds.shape[1]
    mask = jnp.triu(jnp.full((s, s), float("-inf"), jnp.float32), 1)[None, None]
    if not causal:
        mask = jnp.zeros((1, 1, s, s), jnp.float32)
    n_layers = encoders["layer_norm1"]["w"].shape[0]
    hd = encoders["attn"]["to_q"]["w"].shape[-1] // num_heads
    n_run = n_layers if n_run is None else n_run

    def layer(x, p):
        h = _attention(p["attn"], _layer_norm(p["layer_norm1"], x),
                       None, num_heads=num_heads, head_dim=hd, mask=mask)
        x = x + h
        y = _dense(p["fc1"], _layer_norm(p["layer_norm2"], x))
        if quick_gelu:
            y = y * jax.nn.sigmoid(1.702 * y.astype(jnp.float32)).astype(y.dtype)
        else:
            y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
        return x + _dense(p["fc2"], y)

    def body(x, xs):
        i, p = xs
        return jnp.where(i < n_run, layer(x, p), x), None

    embeds, _ = jax.lax.scan(body, embeds, (jnp.arange(n_layers), encoders))
    return embeds


def sd_text_encoder_forward(params: Params, input_ids, clip_skip: int = 1):
    """SDTextEncoder.forward (ref sd_text_encoder.py:62-73): token+position
    embeds, causal mask, quickGELU layers (scanned), final LN, clip_skip."""
    embeds = params["token_embedding"][input_ids] + params["position_embeds"][0]
    n_layers = params["encoders"]["layer_norm1"]["w"].shape[0]
    embeds = clip_encoder_scan(params["encoders"], embeds,
                               n_run=n_layers - (clip_skip - 1))
    return _layer_norm(params["final_layer_norm"], embeds)


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming, i.e. each reference module's
# own state_dict — their converters map diffusers/civitai checkpoints to it)
# ---------------------------------------------------------------------------


def _t(a):
    if hasattr(a, "detach"):
        a = a.detach().float().numpy()
    return np.asarray(a)


def _conv_from(sd, prefix):
    return {"w": jnp.asarray(np.transpose(_t(sd[f"{prefix}.weight"]), (2, 3, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _lin_from(sd, prefix, bias=True):
    p = {"w": jnp.asarray(_t(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_t(sd[f"{prefix}.bias"]))
    return p


def _norm_from(sd, prefix):
    return {"w": jnp.asarray(_t(sd[f"{prefix}.weight"])),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def _attn_from(sd, prefix):
    return {
        "to_q": _lin_from(sd, f"{prefix}.to_q"),
        "to_k": _lin_from(sd, f"{prefix}.to_k"),
        "to_v": _lin_from(sd, f"{prefix}.to_v"),
        "to_out": _lin_from(sd, f"{prefix}.to_out"),
    }


def _block_from(sd, i, desc):
    b = f"blocks.{i}"
    kind = desc[0]
    if kind == "res":
        p = {
            "norm1": _norm_from(sd, f"{b}.norm1"), "conv1": _conv_from(sd, f"{b}.conv1"),
            "norm2": _norm_from(sd, f"{b}.norm2"), "conv2": _conv_from(sd, f"{b}.conv2"),
        }
        if f"{b}.time_emb_proj.weight" in sd:
            p["time_emb_proj"] = _lin_from(sd, f"{b}.time_emb_proj")
        if f"{b}.conv_shortcut.weight" in sd:
            p["conv_shortcut"] = _conv_from(sd, f"{b}.conv_shortcut")
        return p
    if kind == "attn":
        blocks = []
        j = 0
        while f"{b}.transformer_blocks.{j}.norm1.weight" in sd:
            t = f"{b}.transformer_blocks.{j}"
            blocks.append({
                "norm1": _norm_from(sd, f"{t}.norm1"),
                "attn1": _attn_from(sd, f"{t}.attn1"),
                "norm2": _norm_from(sd, f"{t}.norm2"),
                "attn2": _attn_from(sd, f"{t}.attn2"),
                "norm3": _norm_from(sd, f"{t}.norm3"),
                "act_fn": _lin_from(sd, f"{t}.act_fn.proj"),
                "ff": _lin_from(sd, f"{t}.ff"),
            })
            j += 1
        p = {
            "norm": _norm_from(sd, f"{b}.norm"),
            "proj_in": _lin_from(sd, f"{b}.proj_in"),
            "transformer_blocks": blocks,
        }
        if f"{b}.proj_out.weight" in sd:  # need_proj_out=False in SVD
            p["proj_out"] = _lin_from(sd, f"{b}.proj_out")
        return p
    if kind == "vae_attn":
        blocks = []
        j = 0
        while f"{b}.transformer_blocks.{j}.to_q.weight" in sd:
            blocks.append(_attn_from(sd, f"{b}.transformer_blocks.{j}"))
            j += 1
        return {"norm": _norm_from(sd, f"{b}.norm"), "transformer_blocks": blocks}
    if kind in ("down", "up"):
        return {"conv": _conv_from(sd, f"{b}.conv")}
    return {}  # push / pop


def sd_unet_params_from_torch(sd: dict) -> Params:
    return {
        "time_embedding": {
            "0": _lin_from(sd, "time_embedding.0"),
            "2": _lin_from(sd, "time_embedding.2"),
        },
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d) for i, d in enumerate(SD_UNET_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }


def sd_vae_encoder_params_from_torch(sd: dict) -> Params:
    return {
        "quant_conv": _conv_from(sd, "quant_conv"),
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d) for i, d in enumerate(SD_VAE_ENCODER_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }


def sd_vae_decoder_params_from_torch(sd: dict) -> Params:
    return {
        "post_quant_conv": _conv_from(sd, "post_quant_conv"),
        "conv_in": _conv_from(sd, "conv_in"),
        "blocks": [_block_from(sd, i, d) for i, d in enumerate(SD_VAE_DECODER_PLAN)],
        "conv_norm_out": _norm_from(sd, "conv_norm_out"),
        "conv_out": _conv_from(sd, "conv_out"),
    }


def sd_text_encoder_params_from_torch(sd: dict) -> Params:
    layers = []
    i = 0
    while f"encoders.{i}.layer_norm1.weight" in sd:
        e = f"encoders.{i}"
        layers.append({
            "layer_norm1": _norm_from(sd, f"{e}.layer_norm1"),
            "attn": _attn_from(sd, f"{e}.attn"),
            "layer_norm2": _norm_from(sd, f"{e}.layer_norm2"),
            "fc1": _lin_from(sd, f"{e}.fc1"),
            "fc2": _lin_from(sd, f"{e}.fc2"),
        })
        i += 1
    return {
        "token_embedding": jnp.asarray(_t(sd["token_embedding.weight"])),
        "position_embeds": jnp.asarray(_t(sd["position_embeds"])),
        "encoders": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_layer_norm": _norm_from(sd, "final_layer_norm"),
    }
