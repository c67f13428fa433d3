"""HunyuanVideo family (double/single-stream video MMDiT + causal 3D VAE).

Behavioral reference: diffsynth/models/hunyuan_video_dit.py
(HunyuanVideoDiT :589-675 — 20 double + 40 single stream blocks at 3072/24
heads, 3-axis RoPE theta=256 over (T, H/2, W/2), SingleTokenRefiner text-in,
and the fixed 71/185 text-token attention partition) and
hunyuan_video_vae_{encoder,decoder}.py (replicate-padded CausalConv3d,
per-frame causal mid-block attention, scaling 0.476986).

TPU-first: double and single blocks are stacked and scanned; the 71/185
partition becomes two flash-attention calls per block (block-diagonal
attention, exactly as the reference computes it); VAE runs channels-last.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from .sd import Params, _dense, _layer_norm, _lin_from, _norm_from, _t
from .sd import timestep_embedding
from .sd3 import _ff, _ln_nowb, _rms


# ---------------------------------------------------------------------------
# RoPE (ref hunyuan_video_dit.py:10-194: axes (16,56,56), theta=256, full grid)
# ---------------------------------------------------------------------------


def prepare_rope_tables(t, h, w, rope_dims=(16, 56, 56), theta=256.0):
    """Pair tables (T*H*W, 64) f32 for latent grid (t, h//2, w//2)."""
    sizes = (t, h, w)
    grids = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in sizes],
                        indexing="ij")
    outs = []
    for g, d in zip(grids, rope_dims):
        freqs = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
        outs.append(np.outer(g.reshape(-1), freqs))
    ang = np.concatenate(outs, axis=1)
    return np.cos(ang), np.sin(ang)


def _apply_rope(x, cos, sin):
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None].astype(jnp.float32)
    s = sin[None, :, None].astype(jnp.float32)
    out = jnp.stack([c * xe - s * xo, s * xe + c * xo], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

TXT_LEN = 256
SPLIT_TOKEN = 71


def _qkv(p, x, num_heads, head_dim):
    b, s, _ = x.shape
    qkv = _dense(p["to_qkv"], x).reshape(b, s, 3, num_heads, head_dim)
    q = _rms(qkv[:, :, 0], p["norm_q"]["w"])
    k = _rms(qkv[:, :, 1], p["norm_k"]["w"])
    return q, k, qkv[:, :, 2]


def _split_attention(q, k, v, split):
    """The reference's fixed partition (ref :462-475 / :537-570): group A =
    [image tokens + first 71 text tokens], group B = last 185 text tokens,
    each attending only within its group."""
    oa = flash_attention(q[:, :split], k[:, :split], v[:, :split])
    ob = flash_attention(q[:, split:], k[:, split:], v[:, split:])
    o = jnp.concatenate([oa, ob], axis=1)
    return o.reshape(o.shape[0], o.shape[1], -1)


def _mod6(p, vec):
    return jnp.split(_dense(p["linear"], jax.nn.silu(vec))[:, None], 6, axis=2)


def _double_block(p, img, txt, vec, cos, sin, num_heads, head_dim):
    """MMDoubleStreamBlock (ref :403-475)."""
    a_shift, a_scale, a_gate, a_shift2, a_scale2, a_gate2 = _mod6(
        p["component_a"]["mod"], vec)
    b_shift, b_scale, b_gate, b_shift2, b_scale2, b_gate2 = _mod6(
        p["component_b"]["mod"], vec)
    na = _ln_nowb(img) * (1 + a_scale) + a_shift
    nb = _ln_nowb(txt) * (1 + b_scale) + b_shift
    qa, ka, va = _qkv(p["component_a"], na, num_heads, head_dim)
    qb, kb, vb = _qkv(p["component_b"], nb, num_heads, head_dim)
    qa = _apply_rope(qa, cos, sin)
    ka = _apply_rope(ka, cos, sin)
    simg = img.shape[1]
    q = jnp.concatenate([qa, qb], axis=1)
    k = jnp.concatenate([ka, kb], axis=1)
    v = jnp.concatenate([va, vb], axis=1)
    o = _split_attention(q, k, v, simg + SPLIT_TOKEN)
    oa, ob = o[:, :simg], o[:, simg:]

    img = img + a_gate * _dense(p["component_a"]["to_out"], oa)
    na = _ln_nowb(img) * (1 + a_scale2) + a_shift2
    img = img + a_gate2 * _ff(p["component_a"]["ff"], na)

    txt = txt + b_gate * _dense(p["component_b"]["to_out"], ob)
    nb = _ln_nowb(txt) * (1 + b_scale2) + b_shift2
    txt = txt + b_gate2 * _ff(p["component_b"]["ff"], nb)
    return img, txt


def _single_block(p, x, vec, cos, sin, num_heads, head_dim):
    """MMSingleStreamBlock (ref :518-570): one modulated norm feeds both the
    attention and the FF; both outputs share the same gate."""
    shift, scale, gate = jnp.split(
        _dense(p["mod"]["linear"], jax.nn.silu(vec))[:, None], 3, axis=2)
    nx = _ln_nowb(x) * (1 + scale) + shift
    q, k, v = _qkv(p, nx, num_heads, head_dim)
    simg = x.shape[1] - TXT_LEN
    q = jnp.concatenate([_apply_rope(q[:, :simg], cos, sin), q[:, simg:]], axis=1)
    k = jnp.concatenate([_apply_rope(k[:, :simg], cos, sin), k[:, simg:]], axis=1)
    o = _split_attention(q, k, v, simg + SPLIT_TOKEN)
    x = x + gate * _dense(p["to_out"], o)
    return x + gate * _ff(p["ff"], nx)


def _refiner_block(p, x, c, mask, num_heads=24):
    """IndividualTokenRefinerBlock (ref :207-240)."""
    emb = _dense(p["adaLN_modulation"], jax.nn.silu(c))
    gate_msa, gate_mlp = jnp.split(emb[:, None], 2, axis=2)
    nx = _layer_norm(p["norm1"], x)
    b, s, d = nx.shape
    hd = d // num_heads
    qkv = _dense(p["self_attn_qkv"], nx).reshape(b, s, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    logits = jnp.where(mask[:, None], logits, float("-inf"))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, s, d)
    x = x + _dense(p["self_attn_proj"], o) * gate_msa
    h = _dense(p["mlp_0"], _layer_norm(p["norm2"], x))
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return x + _dense(p["mlp_2"], h) * gate_mlp


def _token_refiner(p, x, t, mask):
    """SingleTokenRefiner (ref :242-272)."""
    temb = timestep_embedding(jnp.atleast_1d(t), 256)
    temb = _dense(p["t_embedder"]["2"],
                  jax.nn.silu(_dense(p["t_embedder"]["0"],
                                     temb.astype(x.dtype))))
    mf = mask.astype(x.dtype)[:, :, None]
    ctx = (x * mf).sum(axis=1) / mf.sum(axis=1)
    ctx = _dense(p["c_embedder"]["2"],
                 jax.nn.silu(_dense(p["c_embedder"]["0"], ctx)))
    c = temb + ctx
    x = _dense(p["input_embedder"], x)
    m = (mask != 0)
    attn_mask = m[:, :, None] & m[:, None, :]
    attn_mask = attn_mask.at[:, :, 0].set(True)
    for bp in p["blocks"]:
        x = _refiner_block(bp, x, c, attn_mask)
    return x


def hunyuan_video_dit_forward(params: Params, x, t, prompt_emb, text_mask,
                              pooled_prompt_emb, guidance=None,
                              freqs=None):
    """HunyuanVideoDiT.forward (ref :631-675). x (B,16,T,H,W); prompt_emb
    (B,256,4096) LLaVA-llama3 states; pooled (B,768) CLIP; guidance scalar."""
    b, c, tt, h, w = x.shape
    dtype = x.dtype
    if freqs is None:
        freqs = prepare_rope_tables(tt, h // 2, w // 2)
    cos, sin = jnp.asarray(freqs[0]), jnp.asarray(freqs[1])

    vec = timestep_embedding(jnp.atleast_1d(t), 256).astype(dtype)
    vec = _dense(params["time_in"]["2"],
                 jax.nn.silu(_dense(params["time_in"]["0"], vec)))
    vec = vec + _dense(
        params["vector_in"]["2"],
        jax.nn.silu(_dense(params["vector_in"]["0"],
                           pooled_prompt_emb.astype(dtype))))
    if "guidance_in" in params and guidance is not None:
        g = timestep_embedding(jnp.atleast_1d(guidance) * 1000, 256).astype(dtype)
        vec = vec + _dense(params["guidance_in"]["2"],
                           jax.nn.silu(_dense(params["guidance_in"]["0"], g)))

    # img_in: Conv3d k=(1,2,2) stride same == per-frame stride-2 patchify
    xl = x.transpose(0, 2, 3, 4, 1).reshape(b * tt, h, w, c)
    xl = jax.lax.conv_general_dilated(
        xl, params["img_in"]["w"][0].astype(dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["img_in"]["b"].astype(dtype)
    img = xl.reshape(b, tt * (h // 2) * (w // 2), -1)

    txt = _token_refiner(params["txt_in"], prompt_emb, t, text_mask)

    num_heads = 24
    head_dim = img.shape[-1] // num_heads

    def dbody(carry, p):
        img, txt = carry
        img, txt = _double_block(p, img, txt, vec, cos, sin, num_heads, head_dim)
        return (img, txt), None

    (img, txt), _ = jax.lax.scan(dbody, (img, txt), params["double_blocks"])

    xs = jnp.concatenate([img, txt], axis=1)

    def sbody(x_, p):
        return _single_block(p, x_, vec, cos, sin, num_heads, head_dim), None

    xs, _ = jax.lax.scan(sbody, xs, params["single_blocks"])
    img = xs[:, :-TXT_LEN]

    emb = _dense(params["final_layer"]["adaLN_modulation"], jax.nn.silu(vec))
    shift, scale = jnp.split(emb, 2, axis=1)
    img = _ln_nowb(img) * (1 + scale[:, None]) + shift[:, None]
    img = _dense(params["final_layer"]["linear"], img)
    # B (T H W) (C pT pH pW) -> B C T (H 2) (W 2)  (ref :617-619)
    co = img.shape[-1] // 4
    img = img.reshape(b, tt, h // 2, w // 2, co, 2, 2)
    return img.transpose(0, 4, 1, 2, 5, 3, 6).reshape(b, co, tt, h, w)


def _component_p(sd, prefix):
    return {
        "mod": {"linear": _lin_from(sd, f"{prefix}.mod.linear")},
        "to_qkv": _lin_from(sd, f"{prefix}.to_qkv"),
        "norm_q": {"w": jnp.asarray(_t(sd[f"{prefix}.norm_q.weight"]))},
        "norm_k": {"w": jnp.asarray(_t(sd[f"{prefix}.norm_k.weight"]))},
        "to_out": _lin_from(sd, f"{prefix}.to_out"),
        "ff": {"0": _lin_from(sd, f"{prefix}.ff.0"),
               "2": _lin_from(sd, f"{prefix}.ff.2")},
    }


def hunyuan_video_dit_params_from_torch(sd: dict) -> Params:
    n_double = 0
    while f"double_blocks.{n_double}.component_a.mod.linear.weight" in sd:
        n_double += 1
    n_single = 0
    while f"single_blocks.{n_single}.mod.linear.weight" in sd:
        n_single += 1
    n_ref = 0
    while f"txt_in.blocks.{n_ref}.norm1.weight" in sd:
        n_ref += 1
    w = _t(sd["img_in.proj.weight"])  # (D, C, 1, 2, 2)
    params = {
        "img_in": {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
                   "b": jnp.asarray(_t(sd["img_in.proj.bias"]))},
        "txt_in": {
            "input_embedder": _lin_from(sd, "txt_in.input_embedder"),
            "t_embedder": {
                "0": _lin_from(sd, "txt_in.t_embedder.timestep_embedder.0"),
                "2": _lin_from(sd, "txt_in.t_embedder.timestep_embedder.2"),
            },
            "c_embedder": {"0": _lin_from(sd, "txt_in.c_embedder.0"),
                           "2": _lin_from(sd, "txt_in.c_embedder.2")},
            "blocks": [{
                "norm1": _norm_from(sd, f"txt_in.blocks.{i}.norm1"),
                "self_attn_qkv": _lin_from(sd, f"txt_in.blocks.{i}.self_attn_qkv"),
                "self_attn_proj": _lin_from(sd, f"txt_in.blocks.{i}.self_attn_proj"),
                "norm2": _norm_from(sd, f"txt_in.blocks.{i}.norm2"),
                "mlp_0": _lin_from(sd, f"txt_in.blocks.{i}.mlp.0"),
                "mlp_2": _lin_from(sd, f"txt_in.blocks.{i}.mlp.2"),
                "adaLN_modulation": _lin_from(
                    sd, f"txt_in.blocks.{i}.adaLN_modulation.1"),
            } for i in range(n_ref)],
        },
        "time_in": {"0": _lin_from(sd, "time_in.timestep_embedder.0"),
                    "2": _lin_from(sd, "time_in.timestep_embedder.2")},
        "vector_in": {"0": _lin_from(sd, "vector_in.0"),
                      "2": _lin_from(sd, "vector_in.2")},
        "double_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[{"component_a": _component_p(sd, f"double_blocks.{i}.component_a"),
               "component_b": _component_p(sd, f"double_blocks.{i}.component_b")}
              for i in range(n_double)]),
        "single_blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[{"mod": {"linear": _lin_from(sd, f"single_blocks.{i}.mod.linear")},
               "to_qkv": _lin_from(sd, f"single_blocks.{i}.to_qkv"),
               "norm_q": {"w": jnp.asarray(_t(sd[f"single_blocks.{i}.norm_q.weight"]))},
               "norm_k": {"w": jnp.asarray(_t(sd[f"single_blocks.{i}.norm_k.weight"]))},
               "to_out": _lin_from(sd, f"single_blocks.{i}.to_out"),
               "ff": {"0": _lin_from(sd, f"single_blocks.{i}.ff.0"),
                      "2": _lin_from(sd, f"single_blocks.{i}.ff.2")}}
              for i in range(n_single)]),
        "final_layer": {
            "linear": _lin_from(sd, "final_layer.linear"),
            "adaLN_modulation": _lin_from(sd, "final_layer.adaLN_modulation.1"),
        },
    }
    if "guidance_in.timestep_embedder.0.weight" in sd:
        params["guidance_in"] = {
            "0": _lin_from(sd, "guidance_in.timestep_embedder.0"),
            "2": _lin_from(sd, "guidance_in.timestep_embedder.2"),
        }
    return params


# ---------------------------------------------------------------------------
# VAE (replicate-padded causal convs, channels-last (B,T,H,W,C))
# ---------------------------------------------------------------------------

HYV_VAE_SCALING_FACTOR = 0.476986


def _causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv3d (ref hunyuan_video_vae_decoder.py:10-21): replicate pad
    (k-1, 0) in time, (k//2, k//2) spatially."""
    k = p["w"].shape[0]
    if k > 1:
        x = jnp.pad(x, ((0, 0), (k - 1, 0), (k // 2, k // 2),
                        (k // 2, k // 2), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"].astype(x.dtype)


def _gn3d(p, x, groups=32, eps=1e-6):
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 3, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _res3d(p, x):
    h = _causal_conv3d(p["conv1"], jax.nn.silu(_gn3d(p["norm1"], x)))
    h = _causal_conv3d(p["conv2"], jax.nn.silu(_gn3d(p["norm2"], h)))
    if "conv_shortcut" in p:
        x = _causal_conv3d(p["conv_shortcut"], x)
    return x + h


def _mid_attention(p, x):
    """Mid-block attention with per-frame causal mask (ref :117-159, 219-227):
    token i in frame f attends to all tokens of frames <= f."""
    b, t, h, w, c = x.shape
    y = _gn3d(p["group_norm"], x).reshape(b, t * h * w, c)
    q = _dense(p["to_q"], y)[:, :, None]
    k = _dense(p["to_k"], y)[:, :, None]
    v = _dense(p["to_v"], y)[:, :, None]
    frame = jnp.arange(t * h * w) // (h * w)
    mask = frame[:, None] >= frame[None, :]
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (c ** -0.5)
    logits = jnp.where(mask[None, None], logits, float("-inf"))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, t * h * w, c)
    o = _dense(p["to_out"], o)
    return x + o.reshape(b, t, h, w, c)


def _upsample(p, x, factor):
    """UpsampleCausal3D (ref :24-61): nearest, first frame spatial-only."""
    ft, fh, fw = factor
    if x.shape[1] > 1:
        first, rest = x[:, :1], x[:, 1:]
        if ft > 1:
            rest = jnp.repeat(rest, ft, axis=1)
        rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
        first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = jnp.repeat(jnp.repeat(x, fh, axis=2), fw, axis=3)
    return _causal_conv3d(p, x)


def hunyuan_video_vae_decode(params: Params, latents):
    """HunyuanVideoVAEDecoder.forward (ref :369-404). latents (B,16,T,H,W)."""
    x = (latents / HYV_VAE_SCALING_FACTOR).transpose(0, 2, 3, 4, 1)
    x = jnp.einsum("bthwc,cd->bthwd", x,
                   params["post_quant_conv"]["w"][0, 0, 0].astype(x.dtype)) \
        + params["post_quant_conv"]["b"].astype(x.dtype)
    d = params["decoder"]
    x = _causal_conv3d(d["conv_in"], x)
    x = _res3d(d["mid"]["resnets"][0], x)
    x = _mid_attention(d["mid"]["attn"], x)
    x = _res3d(d["mid"]["resnets"][1], x)
    for blk in d["up_blocks"]:
        for rp in blk["resnets"]:
            x = _res3d(rp, x)
        if "upsampler" in blk:
            x = _upsample(blk["upsampler"], x, blk["factor"])
    x = jax.nn.silu(_gn3d(d["conv_norm_out"], x))
    x = _causal_conv3d(d["conv_out"], x)
    return x.transpose(0, 4, 1, 2, 3)


def hunyuan_video_vae_encode(params: Params, video):
    """HunyuanVideoVAEEncoder.forward (ref hunyuan_video_vae_encoder.py:
    167-204). video (B,3,T,H,W) in [-1,1] -> (B,16,(T-1)/4+1,H/8,W/8)."""
    x = video.transpose(0, 2, 3, 4, 1)
    e = params["encoder"]
    x = _causal_conv3d(e["conv_in"], x)
    for blk in e["down_blocks"]:
        for rp in blk["resnets"]:
            x = _res3d(rp, x)
        if "downsampler" in blk:
            x = _causal_conv3d(blk["downsampler"], x, stride=blk["stride"])
    x = _res3d(e["mid"]["resnets"][0], x)
    x = _mid_attention(e["mid"]["attn"], x)
    x = _res3d(e["mid"]["resnets"][1], x)
    x = jax.nn.silu(_gn3d(e["conv_norm_out"], x))
    x = _causal_conv3d(e["conv_out"], x)
    x = jnp.einsum("bthwc,cd->bthwd", x,
                   params["quant_conv"]["w"][0, 0, 0].astype(x.dtype)) \
        + params["quant_conv"]["b"].astype(x.dtype)
    x = x[..., :16] * HYV_VAE_SCALING_FACTOR
    return x.transpose(0, 4, 1, 2, 3)


def _cc3d_p(sd, prefix):
    key = f"{prefix}.conv.weight" if f"{prefix}.conv.weight" in sd \
        else f"{prefix}.weight"
    w = _t(sd[key])
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "b": jnp.asarray(_t(sd[key.replace("weight", "bias")]))}


def _res_p(sd, prefix):
    p = {"norm1": _norm_from(sd, f"{prefix}.norm1"),
         "conv1": _cc3d_p(sd, f"{prefix}.conv1"),
         "norm2": _norm_from(sd, f"{prefix}.norm2"),
         "conv2": _cc3d_p(sd, f"{prefix}.conv2")}
    if f"{prefix}.conv_shortcut.conv.weight" in sd:
        p["conv_shortcut"] = _cc3d_p(sd, f"{prefix}.conv_shortcut")
    return p


def _mid_p(sd, prefix):
    return {
        "resnets": [_res_p(sd, f"{prefix}.resnets.0"),
                    _res_p(sd, f"{prefix}.resnets.1")],
        "attn": {
            "group_norm": _norm_from(sd, f"{prefix}.attentions.0.group_norm"),
            "to_q": _lin_from(sd, f"{prefix}.attentions.0.to_q"),
            "to_k": _lin_from(sd, f"{prefix}.attentions.0.to_k"),
            "to_v": _lin_from(sd, f"{prefix}.attentions.0.to_v"),
            "to_out": _lin_from(sd, f"{prefix}.attentions.0.to_out.0"),
        },
    }


def _conv1_p(sd, prefix):
    w = _t(sd[f"{prefix}.weight"])
    return {"w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "b": jnp.asarray(_t(sd[f"{prefix}.bias"]))}


def hunyuan_video_vae_decoder_params_from_torch(sd: dict) -> Params:
    channels = [128, 256, 512, 512]
    rev = list(reversed(channels))
    ups = []
    for i in range(4):
        blk = f"decoder.up_blocks.{i}"
        resnets = []
        j = 0
        while f"{blk}.resnets.{j}.norm1.weight" in sd:
            resnets.append(_res_p(sd, f"{blk}.resnets.{j}"))
            j += 1
        entry = {"resnets": resnets}
        if f"{blk}.upsamplers.0.conv.conv.weight" in sd:
            entry["upsampler"] = _cc3d_p(sd, f"{blk}.upsamplers.0.conv")
            add_spatial = i < 3
            add_time = i >= 4 - 1 - 2 and i != 3
            entry["factor"] = ((2 if add_time else 1),
                               (2 if add_spatial else 1),
                               (2 if add_spatial else 1))
        ups.append(entry)
    return {
        "post_quant_conv": _conv1_p(sd, "post_quant_conv"),
        "decoder": {
            "conv_in": _cc3d_p(sd, "decoder.conv_in"),
            "mid": _mid_p(sd, "decoder.mid_block"),
            "up_blocks": ups,
            "conv_norm_out": _norm_from(sd, "decoder.conv_norm_out"),
            "conv_out": _cc3d_p(sd, "decoder.conv_out"),
        },
    }


def hunyuan_video_vae_encoder_params_from_torch(sd: dict) -> Params:
    downs = []
    for i in range(4):
        blk = f"encoder.down_blocks.{i}"
        resnets = []
        j = 0
        while f"{blk}.resnets.{j}.norm1.weight" in sd:
            resnets.append(_res_p(sd, f"{blk}.resnets.{j}"))
            j += 1
        entry = {"resnets": resnets}
        if f"{blk}.downsamplers.0.conv.conv.weight" in sd:
            entry["downsampler"] = _cc3d_p(sd, f"{blk}.downsamplers.0.conv")
            add_spatial = i < 3
            add_time = i >= 4 - 1 - 2 and i != 3
            entry["stride"] = ((2 if add_time else 1),
                               (2 if add_spatial else 1),
                               (2 if add_spatial else 1))
        downs.append(entry)
    return {
        "quant_conv": _conv1_p(sd, "quant_conv"),
        "encoder": {
            "conv_in": _cc3d_p(sd, "encoder.conv_in"),
            "down_blocks": downs,
            "mid": _mid_p(sd, "encoder.mid_block"),
            "conv_norm_out": _norm_from(sd, "encoder.conv_norm_out"),
            "conv_out": _cc3d_p(sd, "encoder.conv_out"),
        },
    }
