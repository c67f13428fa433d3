"""Wan 2.1 video diffusion transformer (DiT), TPU-native.

Behavioral reference: diffsynth/models/wan_video_dit.py (WanModel :407,
DiTBlock :321, SelfAttention :210, CrossAttention :245, Head :392,
patchify/unpatchify :473-484, config table :655-712). This is a from-scratch
functional JAX implementation:

  * parameters are a plain pytree; per-block parameters are STACKED along a
    leading `num_layers` axis and the block stack runs as one `lax.scan`
    (single block compilation, scan-friendly for remat and pipelining);
  * patchify/unpatchify are reshapes + a dense matmul (patch kernel == stride,
    so the Conv3d is exactly a linear map per patch) — lands on the MXU;
  * attention is the fused Pallas flash kernel (ops/attention.py);
  * RoPE tables are precomputed per (f, h, w) grid on host (ops/rope.py);
  * activations bf16, norm/softmax statistics f32.

Weight ingestion from the reference's PyTorch layout is in
`params_from_torch_state_dict` (same key names as the civitai/official Wan
checkpoints that diffsynth loads, wan_video_dit.py:655-712).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention, flash_attention_flat
from ..ops.norms import gelu_tanh, layer_norm, modulate, rms_norm
from ..ops.rope import apply_rope, rope_angles_for_grid, sinusoidal_embedding_1d

Params = dict  # nested dict pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    dim: int = 1536
    in_dim: int = 16
    ffn_dim: int = 8960
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 12
    num_layers: int = 30
    has_image_input: bool = False
    enable_multitalk: bool = False
    enable_customtalk: bool = False  # wan_video_dit_talk.py DiTBlock variant
    clip_feature_dim: int = 1280
    text_len: int = 512
    audio_hidden_dim: int = 768
    audio_context_tokens: int = 32
    dtype: Any = jnp.bfloat16
    # int8-MXU SELF-attention forward: "none" | "qk8" | "qk8pv8" (see
    # ops/attention._fwd_kernel_flat_q8). Inference-only — training paths
    # must keep "none". The TPU analog of the reference's SageAttention
    # dispatch (diffsynth/models/attention.py:21-24 import guard, :135-139
    # auto-preference when installed).
    attention_quant: str = "none"

    def __post_init__(self):
        if self.attention_quant not in ("none", "qk8", "qk8pv8"):
            raise ValueError(
                f"attention_quant={self.attention_quant!r}: expected 'none', "
                "'qk8', or 'qk8pv8'"
            )

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# Hash-derived reference configs (wan_video_dit.py:655-712).
WAN_1_3B_T2V = WanDiTConfig()
WAN_14B_T2V = WanDiTConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40)
WAN_14B_I2V = WanDiTConfig(
    dim=5120, in_dim=36, ffn_dim=13824, num_heads=40, num_layers=40, has_image_input=True
)
WAN_14B_I2V_MULTITALK = dataclasses.replace(WAN_14B_I2V, enable_multitalk=True)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _linear(key, fan_in, fan_out, dtype, bias=True):
    kw, kb = jax.random.split(key)
    lim = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jax.random.uniform(kb, (fan_out,), jnp.float32, -lim, lim).astype(dtype)
    return p


def _block_init(key, cfg: WanDiTConfig) -> Params:
    d, f = cfg.dim, cfg.ffn_dim
    keys = jax.random.split(key, 16)
    dt = cfg.dtype
    p = {
        "self_attn": {
            "q": _linear(keys[0], d, d, dt),
            "k": _linear(keys[1], d, d, dt),
            "v": _linear(keys[2], d, d, dt),
            "o": _linear(keys[3], d, d, dt),
            "norm_q": {"w": jnp.ones((d,), dt)},
            "norm_k": {"w": jnp.ones((d,), dt)},
        },
        "cross_attn": {
            "q": _linear(keys[4], d, d, dt),
            "k": _linear(keys[5], d, d, dt),
            "v": _linear(keys[6], d, d, dt),
            "o": _linear(keys[7], d, d, dt),
            "norm_q": {"w": jnp.ones((d,), dt)},
            "norm_k": {"w": jnp.ones((d,), dt)},
        },
        "norm3": {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
        "ffn": {"0": _linear(keys[8], d, f, dt), "2": _linear(keys[9], f, d, dt)},
        "modulation": (jax.random.normal(keys[10], (1, 6, d)) / d**0.5).astype(dt),
    }
    if cfg.has_image_input:
        p["cross_attn"]["k_img"] = _linear(keys[11], d, d, dt)
        p["cross_attn"]["v_img"] = _linear(keys[12], d, d, dt)
        p["cross_attn"]["norm_k_img"] = {"w": jnp.ones((d,), dt)}
    if cfg.enable_multitalk or cfg.enable_customtalk:
        # per-frame audio cross attention (wan_video_dit.py:338-351:
        # SingleStreamMutiAttention with qk_norm=False, qkv_bias=True) +
        # affine WanLayerNorm norm_x
        ad = cfg.audio_hidden_dim
        p["audio_cross_attn"] = {
            "q_linear": _linear(keys[13], d, d, dt),
            "kv_linear": _linear(keys[14], ad, d * 2, dt),
            "proj": _linear(keys[15], d, d, dt),
        }
        p["norm_x"] = {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)}
    if cfg.enable_customtalk:
        # bottleneck FFNs gating context/audio attention inputs
        # (wan_video_dit_talk.py:332-357); their norms are non-affine
        kk = jax.random.split(keys[15], 4)
        p["customtalk_context_pre_ffns"] = {
            "0": _linear(kk[0], d, 128, dt), "2": _linear(kk[1], 128, d, dt),
        }
        p["customtalk_audio_pre_ffns"] = {
            "0": _linear(kk[2], d, 128, dt), "2": _linear(kk[3], 128, d, dt),
        }
    return p


def init_params(key, cfg: WanDiTConfig) -> Params:
    d = cfg.dim
    dt = cfg.dtype
    keys = jax.random.split(key, 12)
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_dim * pt * ph * pw
    params: Params = {
        "patch_embedding": _linear(keys[0], patch_in, d, dt),
        "text_embedding": {
            "0": _linear(keys[1], cfg.text_dim, d, dt),
            "2": _linear(keys[2], d, d, dt),
        },
        "time_embedding": {
            "0": _linear(keys[3], cfg.freq_dim, d, dt),
            "2": _linear(keys[4], d, d, dt),
        },
        "time_projection": {"1": _linear(keys[5], d, d * 6, dt)},
        "head": {
            "head": _linear(keys[6], d, cfg.out_dim * pt * ph * pw, dt),
            "modulation": (jax.random.normal(keys[7], (1, 2, d)) / d**0.5).astype(dt),
        },
        "blocks": jax.vmap(lambda k: _block_init(k, cfg))(
            jax.random.split(keys[8], cfg.num_layers)
        ),
    }
    if cfg.has_image_input:
        cd = cfg.clip_feature_dim
        params["img_emb"] = {
            "norm0": {"w": jnp.ones((cd,), dt), "b": jnp.zeros((cd,), dt)},
            "fc1": _linear(keys[9], cd, cd, dt),
            "fc3": _linear(keys[10], cd, d, dt),
            "norm4": {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
        }
    if cfg.enable_multitalk or cfg.enable_customtalk:
        # AudioProjModel (wan_video_dit.py:52-113): window 5 (first frame) /
        # 8 (latter 4-frame groups) x 12 blocks x 768 ch -> 32 tokens of 768
        ad, ct = cfg.audio_hidden_dim, cfg.audio_context_tokens
        blocks12 = 12
        kk = jax.random.split(keys[11], 4)
        params["audio_proj"] = {
            "proj1": _linear(kk[0], 5 * blocks12 * ad, 512, dt),
            "proj1_vf": _linear(kk[1], 8 * blocks12 * ad, 512, dt),
            "proj2": _linear(kk[2], 512, 512, dt),
            "proj3": _linear(kk[3], 512, ct * ad, dt),
            "norm": {"w": jnp.ones((ad,), dt), "b": jnp.zeros((ad,), dt)},
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _int8_exec(x, w8i, col_scale):
    """Dynamic per-token activation quantization + int8 MXU matmul:
    y = (Qtok(x) @ w8i) · xs · col_scale ≈ x @ (w8i · col_scale).

    The custom VJP makes this trainable (QLoRA against a W8A8/W4A8 base):
    plain AD sees zero gradient through round() and a bogus one through the
    xs = max|x| dynamic scale; the straight-through backward instead uses the
    linearization dx = (g · col_scale) @ w8iᵀ in g's dtype — which also keeps
    the (S, ffn_dim) cotangents bf16 instead of the f32 that the xf cast
    would force (1.69 GB vs 864 MB per temp at 14B/480p/81f)."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w8i, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * xs * col_scale).astype(x.dtype)


def _int8_exec_fwd(x, w8i, col_scale):
    return _int8_exec(x, w8i, col_scale), (w8i, col_scale)


def _int8_exec_bwd(res, g):
    w8i, col_scale = res
    gs = g * col_scale.reshape((1,) * (g.ndim - 1) + (-1,)).astype(g.dtype)
    dx = jax.lax.dot_general(
        gs, w8i.astype(g.dtype), (((g.ndim - 1,), (1,)), ((), ())),
    )
    return dx, None, None


_int8_exec.defvjp(_int8_exec_fwd, _int8_exec_bwd)


def _dense(p: Params, x: jax.Array) -> jax.Array:
    if "w_q4" in p:
        # int4 weight storage: two nibbles per int8 byte packed along the
        # input dim, group-wise scales (INT4_GROUP inputs per group, per
        # output channel). Quarter of bf16 weight memory — what fits the 14B
        # flagship (8.2GB) on one 16GB v5e chip. Dequantized per use; under
        # the block scan only the current block's weights materialize in bf16.
        wq = p["w_q4"]  # (in//2, out) int8, half-split packing
        lo = jnp.right_shift(jnp.left_shift(wq, 4), 4)  # sign-extended low nibble
        hi = jnp.right_shift(wq, 4)  # arithmetic shift: sign-extended high nibble
        # half-split layout: rows [0, in/2) are the low nibbles, [in/2, in)
        # the high nibbles — a pure concat, no interleave relayout
        w8 = jnp.concatenate([lo, hi], axis=0)
        scale = p["scale_q4"]  # (in//G, out)
        g = w8.shape[0] // scale.shape[0]
        if "r_q4" in p:
            # W4A8: requantize the int4 values to per-output-channel int8 on
            # the fly (w8i = round(v · scale_g/s8_c), precomputed ratio r_q4 =
            # scale/smax·127/7 so |v·r| ≤ 127) and run the matmul on the int8
            # MXU against dynamically per-token-quantized activations —
            # ~1.45x the bf16 MXU rate at SVI shapes while keeping the int4
            # HBM footprint that fits the 14B flagship on one v5e chip.
            # Group-scale variation within a channel folds into the int8
            # mantissa (int8 has 127/7 ≈ 18x the levels of int4, so groups
            # within 18x of the channel max keep full int4 resolution).
            r = p["r_q4"]  # (in//G, out) f32: scale/smax * 127/7
            from ..ops import quant_matmul as _qmm

            if (INT4_GROUP == (2 * wq.shape[-2]) // r.shape[-2]
                    and jax.default_backend() == "tpu"
                    and _qmm.supports_unpack_requant(wq, r)):
                # Pallas unpack+requant at copy roofline (the XLA
                # stack/concat unpack relayouts cost ~as much as the matmul
                # itself — see ops/quant_matmul.py); the int8 matmul below
                # then fuses well in XLA (measured 337-378 of 394 TOP/s,
                # faster than a fully-fused Pallas quant-matmul)
                w8i = _qmm.unpack_requant_int4(wq, r)
            else:
                w8i = (
                    jnp.clip(
                        jnp.round(
                            w8.reshape(r.shape[0], g, -1).astype(jnp.float32)
                            * r[:, None, :]
                        ),
                        -127, 127,
                    ).astype(jnp.int8).reshape(w8.shape)
                )
            y = _int8_exec(x, w8i, p["s8_q4"])
            if "b" in p:
                y = y + p["b"].astype(x.dtype)
            return y
        w = (
            w8.reshape(scale.shape[0], g, -1).astype(x.dtype)
            * scale[:, None, :].astype(x.dtype)
        ).reshape(w8.shape)
    elif "w_q8" in p:
        # W8A8: int8 weights (per-output-channel scales) x dynamically
        # per-token-quantized int8 activations on the int8 MXU path — measured
        # 206 TOPS-equiv vs 142 TFLOPS bf16 on v5e (1.45x) at the SVI shapes.
        # Trainable via the _int8_exec straight-through VJP; opt-in via
        # quantize_params_w8a8, the TPU analog of the reference's fp8/Sage
        # acceleration options (test_svi.py:337, wan_video_dit.py:135-140).
        y = _int8_exec(x, p["w_q8"], p["scale8"])
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    elif "w_q" in p:
        # int8 weight storage with per-output-channel scales — the TPU-native
        # analog of the reference's optional fp8 weight storage
        # (test_svi.py:337 / lora.py:88-95); halves weight HBM traffic.
        w = p["w_q"].astype(x.dtype) * p["scale"].astype(x.dtype)
    else:
        w = p["w"].astype(x.dtype)
    y = x @ w
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _dense_lora(p: Params, x: jax.Array, lora, scale: float) -> jax.Array:
    """Dense with an unfused LoRA side path: y = xW + scale·(xA)B.

    Train-time analog of peft's injected adapters (train_svi.py:948-966);
    the low-rank matmuls run in x.dtype on the MXU while master LoRA params
    stay fp32 in the optimizer."""
    y = _dense(p, x)
    if lora is not None:
        a = lora["a"].astype(x.dtype)  # (in, r)
        b = lora["b"].astype(x.dtype)  # (r, out)
        y = y + ((x @ a) @ b) * jnp.asarray(scale, x.dtype)
    return y


def _l(lora, key):
    return None if lora is None else lora.get(key)


def patchify(params: Params, cfg: WanDiTConfig, x: jax.Array):
    """x: (b, c, f, h, w) -> tokens (b, f'*h'*w', dim), grid (f', h', w').

    The Conv3d patch embed (kernel == stride, wan_video_dit.py:429) is a
    per-patch linear map; we extract patches with reshapes ordered to match
    torch Conv3d weight layout (out, in, kt, kh, kw).
    """
    b, c, f, h, w = x.shape
    pt, ph, pw = cfg.patch_size
    fg, hg, wg = f // pt, h // ph, w // pw
    xp = x.reshape(b, c, fg, pt, hg, ph, wg, pw)
    # -> (b, fg, hg, wg, c, pt, ph, pw): feature order (c, kt, kh, kw)
    xp = xp.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, fg * hg * wg, c * pt * ph * pw)
    return _dense(params["patch_embedding"], xp), (fg, hg, wg)


def unpatchify(params: Params, cfg: WanDiTConfig, x: jax.Array, grid) -> jax.Array:
    """tokens (b, S, out_dim*prod(patch)) -> (b, out_dim, f, h, w).

    Reference feature order within a token is (kt, kh, kw, c)
    (wan_video_dit.py:479-484 rearrange '(x y z c)').
    """
    b = x.shape[0]
    fg, hg, wg = grid
    pt, ph, pw = cfg.patch_size
    c = cfg.out_dim
    x = x.reshape(b, fg, hg, wg, pt, ph, pw, c)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # b c fg pt hg ph wg pw
    return x.reshape(b, c, fg * pt, hg * ph, wg * pw)


def _self_attention(p: Params, cfg: WanDiTConfig, x: jax.Array, cos, sin,
                    lora=None, lora_scale: float = 1.0) -> jax.Array:
    # RoPE is fused into the flash kernel on TPU (flat layout, no reshapes /
    # relayouts around the kernel — measured ~9% faster at the SVI shape);
    # the XLA fallback applies the identical interleaved-pair rotation.
    q = rms_norm(_dense_lora(p["q"], x, _l(lora, "q"), lora_scale), p["norm_q"]["w"], eps=cfg.eps)
    k = rms_norm(_dense_lora(p["k"], x, _l(lora, "k"), lora_scale), p["norm_k"]["w"], eps=cfg.eps)
    v = _dense_lora(p["v"], x, _l(lora, "v"), lora_scale)
    quant = None if cfg.attention_quant == "none" else cfg.attention_quant
    o = flash_attention_flat(q, k, v, cfg.head_dim, cos=cos, sin=sin, quant=quant)
    return _dense_lora(p["o"], o, _l(lora, "o"), lora_scale)


def _cross_attention(
    p: Params, cfg: WanDiTConfig, x: jax.Array, ctx: jax.Array, num_img_tokens: int = 257,
    lora=None, lora_scale: float = 1.0,
) -> jax.Array:
    # num_img_tokens: CLIP tokens prepended to the text context (257 for
    # ViT-H/14, wan_video_dit.py:268-269); forward threads the actual count.
    """Text (+image) cross attention (wan_video_dit.py:245-303)."""
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    if cfg.has_image_input:
        img, txt = ctx[:, :num_img_tokens], ctx[:, num_img_tokens:]
    else:
        img, txt = None, ctx
    q = rms_norm(_dense_lora(p["q"], x, _l(lora, "q"), lora_scale), p["norm_q"]["w"], eps=cfg.eps).reshape(b, s, n, hd)
    k = rms_norm(_dense_lora(p["k"], txt, _l(lora, "k"), lora_scale), p["norm_k"]["w"], eps=cfg.eps)
    v = _dense_lora(p["v"], txt, _l(lora, "v"), lora_scale)
    lk = txt.shape[1]
    # save_tag="xattn": the save-attention remat policy keeps only the
    # O(S^2) self-attention residuals; these S x 769 cross-attentions are
    # cheap to recompute, and saving their token-sized outputs too tripled
    # the saved-activation footprint (OOMed the 1.3B save-attn train step).
    o = flash_attention(q, k.reshape(b, lk, n, hd), v.reshape(b, lk, n, hd),
                        save_tag="xattn")
    if img is not None:
        k_img = rms_norm(_dense(p["k_img"], img), p["norm_k_img"]["w"], eps=cfg.eps)
        v_img = _dense(p["v_img"], img)
        li = img.shape[1]
        o = o + flash_attention(q, k_img.reshape(b, li, n, hd),
                                v_img.reshape(b, li, n, hd), save_tag="xattn")
    return _dense_lora(p["o"], o.reshape(b, s, d), _l(lora, "o"), lora_scale)


def dit_block(p: Params, cfg: WanDiTConfig, x, context, t_mod, cos, sin,
              lora=None, lora_scale: float = 1.0, num_img_tokens: int = 257,
              audio_embed=None, num_frames: int = 0, add_condition=None):
    """One DiT block (wan_video_dit.py:354-374), adaLN-modulated; with
    enable_multitalk + audio, per-frame audio cross-attn after text cross-attn
    (ref :361-366)."""
    mod = (p["modulation"].astype(t_mod.dtype) + t_mod)  # (b, 6, d)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        mod[:, i][:, None, :] for i in range(6)
    ]
    input_x = modulate(layer_norm(x, eps=1e-6), shift_msa, scale_msa)
    x = x + gate_msa * _self_attention(
        p["self_attn"], cfg, input_x, cos, sin, lora=_l(lora, "self_attn"), lora_scale=lora_scale
    )
    if cfg.enable_customtalk and audio_embed is not None:
        # customtalk (wan_video_dit_talk.py:358-383): bottleneck FFNs gate the
        # context and audio attention inputs; the block RETURNS its audio
        # attention output, which becomes the next block's add_condition carry
        def _pre_ffn(fp, v):
            return _dense(fp["2"], gelu_tanh(_dense(fp["0"], v)))

        cond_in = add_condition if add_condition is not None else x
        x_in_ctx = x + _pre_ffn(p["customtalk_context_pre_ffns"], layer_norm(cond_in, eps=cfg.eps))
        x_c = _cross_attention(
            p["cross_attn"], cfg,
            layer_norm(x_in_ctx, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
            num_img_tokens=num_img_tokens, lora=_l(lora, "cross_attn"), lora_scale=lora_scale,
        )
        x = x + x_c
        x_in_audio = x + _pre_ffn(p["customtalk_audio_pre_ffns"], layer_norm(x_c, eps=cfg.eps))
        xa = layer_norm(x_in_audio, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
        x_a = _audio_cross_attention(p["audio_cross_attn"], cfg, xa, audio_embed, num_frames)
        x = x + x_a
        input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
        ffn_lora = _l(lora, "ffn")
        h = gelu_tanh(_dense_lora(p["ffn"]["0"], input_x, _l(ffn_lora, "0"), lora_scale))
        ffn = _dense_lora(p["ffn"]["2"], h, _l(ffn_lora, "2"), lora_scale)
        return x + gate_mlp * ffn, x_a
    else:
        x = x + _cross_attention(
            p["cross_attn"], cfg, layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=cfg.eps), context,
            num_img_tokens=num_img_tokens, lora=_l(lora, "cross_attn"), lora_scale=lora_scale,
        )
        if cfg.enable_multitalk and audio_embed is not None:
            xa = layer_norm(x, p["norm_x"]["w"], p["norm_x"]["b"], eps=cfg.eps)
            x = x + _audio_cross_attention(p["audio_cross_attn"], cfg, xa, audio_embed, num_frames)
    input_x = modulate(layer_norm(x, eps=1e-6), shift_mlp, scale_mlp)
    ffn_lora = _l(lora, "ffn")
    h = gelu_tanh(_dense_lora(p["ffn"]["0"], input_x, _l(ffn_lora, "0"), lora_scale))
    ffn = _dense_lora(p["ffn"]["2"], h, _l(ffn_lora, "2"), lora_scale)
    return x + gate_mlp * ffn


def _img_mlp(p: Params, x: jax.Array) -> jax.Array:
    """CLIP-feature MLP (wan_video_dit.py:377-389): LN, Linear, GELU, Linear, LN."""
    x = layer_norm(x, p["norm0"]["w"], p["norm0"]["b"], eps=1e-5)
    x = _dense(p["fc1"], x)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _dense(p["fc3"], x)
    return layer_norm(x, p["norm4"]["w"], p["norm4"]["b"], eps=1e-5)


def audio_proj_forward(params: Params, cfg: WanDiTConfig, audio_first, audio_vf):
    """AudioProjModel.forward (wan_video_dit.py:82-113).

    audio_first: (b, 1, 5, 12, 768); audio_vf: (b, n_t-1, 8, 12, 768)
    -> context tokens (b, n_t, 32, 768)."""
    p = params["audio_proj"]
    dt = cfg.dtype
    b, f1 = audio_first.shape[:2]
    fv = audio_vf.shape[1]
    a = audio_first.astype(dt).reshape(b, f1, -1)
    av = audio_vf.astype(dt).reshape(b, fv, -1)
    a = jax.nn.relu(_dense(p["proj1"], a))
    av = jax.nn.relu(_dense(p["proj1_vf"], av))
    x = jnp.concatenate([a, av], axis=1)  # (b, n_t, 512)
    x = jax.nn.relu(_dense(p["proj2"], x))
    x = _dense(p["proj3"], x).reshape(b, f1 + fv, cfg.audio_context_tokens, cfg.audio_hidden_dim)
    return layer_norm(x, p["norm"]["w"], p["norm"]["b"], eps=1e-5)


def _audio_cross_attention(p: Params, cfg: WanDiTConfig, x, audio, num_frames: int):
    """Per-frame audio cross attention (attention.py SingleStreamAttention
    :282-372, human_num==1 path): video tokens of each latent frame attend to
    that frame's 32 audio tokens."""
    b, S, d = x.shape
    f = num_frames
    s = S // f
    n, hd = cfg.num_heads, cfg.head_dim
    xf = x.reshape(b * f, s, d)
    q = _dense(p["q_linear"], xf).reshape(b * f, s, n, hd)
    na = audio.shape[2]
    kv = _dense(p["kv_linear"], audio.reshape(b * f, na, -1).astype(x.dtype))
    k, v = jnp.split(kv.reshape(b * f, na, 2, n, hd), 2, axis=2)
    k, v = k[:, :, 0], v[:, :, 0]
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b * f, s, d)
    o = _dense(p["proj"], o)
    return o.reshape(b, S, d)


def single_stream_multi_attention(
    p: Params,
    cfg: WanDiTConfig,
    x: jax.Array,
    audio: jax.Array,
    num_frames: int,
    x_ref_attn_map: Optional[jax.Array] = None,
    human_num: int = 1,
    class_range: int = 24,
    class_interval: int = 4,
) -> jax.Array:
    """SingleStreamMutiAttention (ref diffsynth/models/attention.py:373-484):
    multi-speaker per-frame audio cross attention with 1-D RoPE class labels.

    x: (b, N_t*S, dim); audio: (b, N_t, N_a, 768) where the N_a audio tokens
    are the speakers' windows concatenated (first half speaker 1, second half
    speaker 2); x_ref_attn_map: (num_classes, N_t*S) per-token speaker
    affinities from utils.multitalk.get_attn_map_with_target. human_num == 1
    falls back to the plain per-frame path (ref :415-416) — which is all the
    SVI pipelines ever invoke (wan_video_dit.py:365).
    """
    if human_num == 1 or x_ref_attn_map is None:
        return _audio_cross_attention(p, cfg, x, audio, num_frames)

    from ..utils.multitalk import normalize_and_scale, rope_1d

    b, S_total, d = x.shape
    f = num_frames
    s = S_total // f
    n, hd = cfg.num_heads, cfg.head_dim
    rope_h1 = (0, class_interval)
    rope_h2 = (class_range - class_interval, class_range)
    rope_bak = class_range // 2

    xf = x.reshape(b * f, s, d)
    q = _dense(p["q_linear"], xf).reshape(b * f, s, n, hd)

    # per-token 1-D rope positions from the speaker affinity map (ref :431-443)
    m = x_ref_attn_map.astype(jnp.float32)
    human1 = normalize_and_scale(m[0], (m[0].min(), m[0].max()), rope_h1)
    human2 = normalize_and_scale(m[1], (m[1].min(), m[1].max()), rope_h2)
    back = jnp.full((S_total,), float(rope_bak), jnp.float32)
    normalized_map = jnp.stack([human1, human2, back], axis=1)  # (S_total, 3)
    max_indices = jnp.argmax(m, axis=0)  # (S_total,)
    pos = jnp.take_along_axis(normalized_map, max_indices[:, None], axis=1)[:, 0]

    qr = q.reshape(b, f * s, n, hd).transpose(0, 2, 1, 3)  # (b, H, N_t*S, hd)
    qr = rope_1d(qr, pos)
    q = qr.transpose(0, 2, 1, 3).reshape(b * f, s, n, hd)

    na = audio.shape[2]
    kv = _dense(p["kv_linear"], audio.reshape(b * f, na, -1).astype(x.dtype))
    k, v = jnp.split(kv.reshape(b * f, na, 2, n, hd), 2, axis=2)
    k, v = k[:, :, 0], v[:, :, 0]

    # speaker class labels on the audio keys: first half of the tokens carry
    # speaker 1's class center, second half speaker 2's (ref :459-465)
    per_frame = jnp.concatenate([
        jnp.full((na // 2,), (rope_h1[0] + rope_h1[1]) / 2, jnp.float32),
        jnp.full((na - na // 2,), (rope_h2[0] + rope_h2[1]) / 2, jnp.float32),
    ])
    enc_pos = jnp.tile(per_frame, f)
    kr = k.reshape(b, f * na, n, hd).transpose(0, 2, 1, 3)
    kr = rope_1d(kr, enc_pos)
    k = kr.transpose(0, 2, 1, 3).reshape(b * f, na, n, hd)

    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b * f, s, d)
    o = _dense(p["proj"], o)
    return o.reshape(b, S_total, d)


def time_inputs(params: Params, cfg: WanDiTConfig, timestep: jax.Array, dtype):
    """t embedding (b, d) and t_mod (b, 6, d) (wan_video_dit.py:499-501)."""
    emb = sinusoidal_embedding_1d(cfg.freq_dim, timestep).astype(dtype)
    t = _dense(params["time_embedding"]["0"], emb)
    t = jax.nn.silu(t.astype(jnp.float32)).astype(dtype)
    t = _dense(params["time_embedding"]["2"], t)
    tp = jax.nn.silu(t.astype(jnp.float32)).astype(dtype)
    t_mod = _dense(params["time_projection"]["1"], tp).reshape(t.shape[0], 6, cfg.dim)
    return t, t_mod


def head(params: Params, cfg: WanDiTConfig, x: jax.Array, t: jax.Array) -> jax.Array:
    p = params["head"]
    mod = p["modulation"].astype(t.dtype) + t[:, None, :]
    shift, scale = mod[:, 0][:, None, :], mod[:, 1][:, None, :]
    return _dense(p["head"], layer_norm(x, eps=cfg.eps) * (1 + scale) + shift)


def forward_prelude(
    params: Params,
    cfg: WanDiTConfig,
    x: jax.Array,
    timestep: jax.Array,
    context: jax.Array,
    clip_feature: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    add_condition: Optional[jax.Array] = None,
):
    """Everything before the block stack (wan_video_dit.py:499-531): time
    embeddings, text/clip context projection, patchify, pose add_condition.
    Returns (tokens, ctx, t, t_mod, grid)."""
    dtype = cfg.dtype
    x = x.astype(dtype)
    if timestep.ndim == 0:
        timestep = timestep[None]
    t, t_mod = time_inputs(params, cfg, timestep, dtype)

    ctx = _dense(params["text_embedding"]["0"], context.astype(dtype))
    ctx = gelu_tanh(ctx)
    ctx = _dense(params["text_embedding"]["2"], ctx)

    if cfg.has_image_input:
        x = jnp.concatenate([x, y.astype(dtype)], axis=1)
        clip_emb = _img_mlp(params["img_emb"], clip_feature.astype(dtype))
        ctx = jnp.concatenate([clip_emb, ctx], axis=1)

    tokens, grid = patchify(params, cfg, x)
    if add_condition is not None:
        tokens = add_condition.astype(dtype) + tokens
    return tokens, ctx, t, t_mod, grid


def pick_remat_group(num_layers: int) -> int:
    """Divisor of num_layers closest to sqrt(num_layers) (sqrt-remat group)."""
    best = 1
    target = num_layers ** 0.5
    for g in range(1, num_layers + 1):
        if num_layers % g == 0 and abs(g - target) < abs(best - target):
            best = g
    return best


def scan_blocks_remat(body, carry, xs, *, group=None, policy=None):
    """`lax.scan` over the stacked block pytree with optional two-level
    (square-root) rematerialization.

    body(carry, xs_slice) -> carry, with per-block jax.checkpoint already
    applied by the caller when remat is on. Plain scan then makes AD save one
    carry per block (L × (b, S, dim) — 13.4 GB for the 14B at 480p/81f, more
    than the whole chip). With `group`, blocks run as an outer scan over
    L/group groups, each group wrapped in jax.checkpoint: AD saves
    L/group + group carries instead of L, at the cost of one extra forward
    recompute of the stack — the memory/compute trade that fits 14B LoRA
    training activations on a single chip.
    """

    def step(c, x):
        return body(c, x), None

    length = jax.tree.leaves(xs)[0].shape[0]
    if not group or group <= 1 or length % group or length == group:
        carry, _ = jax.lax.scan(step, carry, xs)
        return carry
    xs_g = jax.tree.map(
        lambda a: a.reshape((length // group, group) + a.shape[1:]), xs
    )

    @functools.partial(jax.checkpoint, policy=policy)
    def group_fn(c, xg):
        c, _ = jax.lax.scan(step, c, xg)
        return c

    carry, _ = jax.lax.scan(lambda c, xg: (group_fn(c, xg), None), carry, xs_g)
    return carry


def forward_blocks(params, cfg: WanDiTConfig, tokens, ctx, t_mod, grid, use_remat=False,
                   lora=None, lora_scale: float = 1.0, num_img_tokens: int = 257,
                   audio_embed=None, block_add_condition=None,
                   remat_granularity: Optional[int] = None,
                   save_attention: bool = False,
                   offload_carries: bool = False):
    """The scanned DiT block stack (wan_video_dit.py:547-563). `lora` is an
    optional stacked per-block pytree of unfused adapters (training).
    remat_granularity: blocks per outer checkpoint group (sqrt-remat, see
    scan_blocks_remat); only meaningful with use_remat.
    save_attention: with use_remat, save each block's flash-attention
    out/lse at forward time (checkpoint_name policy) so the backward's
    block recompute rebuilds only the q/k/v projections and skips the
    O(S^2) attention kernel — ~11% faster 1.3B train step for
    +(S x dim) bf16 per block of activation memory (100 MB/block at
    480p/81f; fine for 1.3B's 30 blocks, too much for 14B's 40 x 335 MB).
    offload_carries: with use_remat, SAVE every block's input carry but in
    HOST memory (pinned_host) instead of recomputing it — the TPU analog of
    the reference's torch.utils.checkpoint save_on_cpu
    (wan_video_dit.py:547-561). Trades D2H/H2D DMA of L x (b,S,dim) bf16 per
    step for near-zero activation HBM across the block stack."""
    cos, sin = rope_angles_for_grid(grid, cfg.head_dim)
    customtalk_carry = cfg.enable_customtalk and audio_embed is not None

    def block_fn(tok, bp, lbp, cond=None):
        if use_remat and offload_carries:
            tok = jax.ad_checkpoint.checkpoint_name(tok, "block_carry")
        return dit_block(bp, cfg, tok, ctx, t_mod, cos, sin, lora=lbp,
                         lora_scale=lora_scale, num_img_tokens=num_img_tokens,
                         audio_embed=audio_embed, num_frames=grid[0],
                         add_condition=cond)

    policy = None
    if use_remat and offload_carries:
        policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=(["flash_out", "flash_lse"]
                                      if save_attention else []),
            names_which_can_be_offloaded=["block_carry"],
            offload_src="device", offload_dst="pinned_host")
    elif use_remat and save_attention:
        policy = jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse")
    if use_remat:
        block_fn = jax.checkpoint(block_fn, policy=policy)
    group = remat_granularity if use_remat else None

    if customtalk_carry:
        # add_condition re-binds to each block's audio-attn output
        # (wan_video_dit_talk.py: x, add_condition = block(...))
        cond0 = (block_add_condition if block_add_condition is not None
                 else jnp.zeros_like(tokens))

        def ct_body(carry, xs):
            tok, cond = carry
            if lora is None:
                tok, cond = block_fn(tok, xs, None, cond)
            else:
                tok, cond = block_fn(tok, xs[0], xs[1], cond)
            return (tok, cond)

        xs = params["blocks"] if lora is None else (params["blocks"], lora)
        tokens, _ = scan_blocks_remat(
            ct_body, (tokens, cond0.astype(tokens.dtype)), xs, group=group,
            policy=policy,
        )
        return tokens

    if lora is None:
        def scan_body(tok, bp):
            return block_fn(tok, bp, None)

        tokens = scan_blocks_remat(scan_body, tokens, params["blocks"],
                                   group=group, policy=policy)
    else:
        def scan_body(tok, xs):
            bp, lbp = xs
            return block_fn(tok, bp, lbp)

        tokens = scan_blocks_remat(
            scan_body, tokens, (params["blocks"], lora), group=group,
            policy=policy,
        )
    return tokens


def forward_head(params, cfg: WanDiTConfig, tokens, t, grid):
    """Final modulated head + unpatchify (wan_video_dit.py:565-567)."""
    out = head(params, cfg, tokens, t)
    return unpatchify(params, cfg, out, grid)


def forward(
    params: Params,
    cfg: WanDiTConfig,
    x: jax.Array,
    timestep: jax.Array,
    context: jax.Array,
    clip_feature: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    add_condition: Optional[jax.Array] = None,
    use_remat: bool = False,
    lora=None,
    lora_scale: float = 1.0,
    audio_embed_tuple=None,
    remat_granularity: Optional[int] = None,
    save_attention: bool = False,
    offload_carries: bool = False,
) -> jax.Array:
    """Full DiT forward (wan_video_dit.py:486-567 / svi_video.py:74-137).

    x: (b, 16, f, h, w) latents; timestep: (b,) or scalar; context:
    (b, text_len, text_dim) T5 states; clip_feature: (b, 257, 1280);
    y: (b, 20, f, h, w) conditioning (mask ‖ VAE latent) for I2V;
    add_condition: (b, S, dim) pose tokens (SVI-Dance);
    lora: optional stacked unfused adapters (training);
    audio_embed_tuple: ((b,1,5,12,768), (b,n_t-1,8,12,768)) wav2vec windows
    (SVI-Talk, ref model_fn_wan_talk_video svi_video_talk.py:123-124).
    """
    tokens, ctx, t, t_mod, grid = forward_prelude(
        params, cfg, x, timestep, context, clip_feature, y, add_condition
    )
    n_img = clip_feature.shape[1] if (cfg.has_image_input and clip_feature is not None) else 257
    audio_embed = None
    if (cfg.enable_multitalk or cfg.enable_customtalk) and audio_embed_tuple is not None:
        audio_embed = audio_proj_forward(params, cfg, audio_embed_tuple[0], audio_embed_tuple[1])
    tokens = forward_blocks(
        params, cfg, tokens, ctx, t_mod, grid, use_remat=use_remat,
        lora=lora, lora_scale=lora_scale, num_img_tokens=n_img,
        audio_embed=audio_embed,
        block_add_condition=add_condition if cfg.enable_customtalk else None,
        remat_granularity=remat_granularity,
        save_attention=save_attention,
        offload_carries=offload_carries,
    )
    return forward_head(params, cfg, tokens, t, grid)


# ---------------------------------------------------------------------------
# Torch checkpoint ingestion
# ---------------------------------------------------------------------------


def _t(arr) -> np.ndarray:
    """torch tensor / numpy -> numpy (no torch import requirement here)."""
    if hasattr(arr, "detach"):
        arr = arr.detach().to("cpu")
        if arr.dtype.__str__() == "torch.bfloat16":
            arr = arr.float()
        arr = arr.numpy()
    return np.asarray(arr)


def _lin_from(sd, prefix, dtype) -> Params:
    p = {"w": jnp.asarray(_t(sd[f"{prefix}.weight"]).T, dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_t(sd[f"{prefix}.bias"]), dtype)
    return p


def params_from_torch_state_dict(sd: dict, cfg: WanDiTConfig) -> Params:
    """Convert the reference WanModel state dict (diffsynth key naming,
    wan_video_dit.py converters) into our stacked pytree."""
    dt = cfg.dtype
    pt, ph, pw = cfg.patch_size

    pe_w = _t(sd["patch_embedding.weight"])  # (dim, c, pt, ph, pw)
    pe_w = pe_w.reshape(cfg.dim, -1).T  # (c*pt*ph*pw, dim)
    params: Params = {
        "patch_embedding": {
            "w": jnp.asarray(pe_w, dt),
            "b": jnp.asarray(_t(sd["patch_embedding.bias"]), dt),
        },
        "text_embedding": {
            "0": _lin_from(sd, "text_embedding.0", dt),
            "2": _lin_from(sd, "text_embedding.2", dt),
        },
        "time_embedding": {
            "0": _lin_from(sd, "time_embedding.0", dt),
            "2": _lin_from(sd, "time_embedding.2", dt),
        },
        "time_projection": {"1": _lin_from(sd, "time_projection.1", dt)},
        "head": {
            "head": _lin_from(sd, "head.head", dt),
            "modulation": jnp.asarray(_t(sd["head.modulation"]), dt),
        },
    }
    if cfg.has_image_input:
        params["img_emb"] = {
            "norm0": {
                "w": jnp.asarray(_t(sd["img_emb.proj.0.weight"]), dt),
                "b": jnp.asarray(_t(sd["img_emb.proj.0.bias"]), dt),
            },
            "fc1": _lin_from(sd, "img_emb.proj.1", dt),
            "fc3": _lin_from(sd, "img_emb.proj.3", dt),
            "norm4": {
                "w": jnp.asarray(_t(sd["img_emb.proj.4.weight"]), dt),
                "b": jnp.asarray(_t(sd["img_emb.proj.4.bias"]), dt),
            },
        }

    def block_params(i: int) -> Params:
        b = f"blocks.{i}"
        p = {
            "self_attn": {
                "q": _lin_from(sd, f"{b}.self_attn.q", dt),
                "k": _lin_from(sd, f"{b}.self_attn.k", dt),
                "v": _lin_from(sd, f"{b}.self_attn.v", dt),
                "o": _lin_from(sd, f"{b}.self_attn.o", dt),
                "norm_q": {"w": jnp.asarray(_t(sd[f"{b}.self_attn.norm_q.weight"]), dt)},
                "norm_k": {"w": jnp.asarray(_t(sd[f"{b}.self_attn.norm_k.weight"]), dt)},
            },
            "cross_attn": {
                "q": _lin_from(sd, f"{b}.cross_attn.q", dt),
                "k": _lin_from(sd, f"{b}.cross_attn.k", dt),
                "v": _lin_from(sd, f"{b}.cross_attn.v", dt),
                "o": _lin_from(sd, f"{b}.cross_attn.o", dt),
                "norm_q": {"w": jnp.asarray(_t(sd[f"{b}.cross_attn.norm_q.weight"]), dt)},
                "norm_k": {"w": jnp.asarray(_t(sd[f"{b}.cross_attn.norm_k.weight"]), dt)},
            },
            "norm3": {
                "w": jnp.asarray(_t(sd[f"{b}.norm3.weight"]), dt),
                "b": jnp.asarray(_t(sd[f"{b}.norm3.bias"]), dt),
            },
            "ffn": {
                "0": _lin_from(sd, f"{b}.ffn.0", dt),
                "2": _lin_from(sd, f"{b}.ffn.2", dt),
            },
            "modulation": jnp.asarray(_t(sd[f"{b}.modulation"]), dt),
        }
        if cfg.has_image_input:
            p["cross_attn"]["k_img"] = _lin_from(sd, f"{b}.cross_attn.k_img", dt)
            p["cross_attn"]["v_img"] = _lin_from(sd, f"{b}.cross_attn.v_img", dt)
            p["cross_attn"]["norm_k_img"] = {
                "w": jnp.asarray(_t(sd[f"{b}.cross_attn.norm_k_img.weight"]), dt)
            }
        if cfg.enable_multitalk or cfg.enable_customtalk:
            p["audio_cross_attn"] = {
                "q_linear": _lin_from(sd, f"{b}.audio_cross_attn.q_linear", dt),
                "kv_linear": _lin_from(sd, f"{b}.audio_cross_attn.kv_linear", dt),
                "proj": _lin_from(sd, f"{b}.audio_cross_attn.proj", dt),
            }
            p["norm_x"] = {
                "w": jnp.asarray(_t(sd[f"{b}.norm_x.weight"]), dt),
                "b": jnp.asarray(_t(sd[f"{b}.norm_x.bias"]), dt),
            }
        if cfg.enable_customtalk:
            p["customtalk_context_pre_ffns"] = {
                "0": _lin_from(sd, f"{b}.customtalk_context_pre_ffns.0", dt),
                "2": _lin_from(sd, f"{b}.customtalk_context_pre_ffns.2", dt),
            }
            p["customtalk_audio_pre_ffns"] = {
                "0": _lin_from(sd, f"{b}.customtalk_audio_pre_ffns.0", dt),
                "2": _lin_from(sd, f"{b}.customtalk_audio_pre_ffns.2", dt),
            }
        return p

    if cfg.enable_multitalk or cfg.enable_customtalk:
        params["audio_proj"] = {
            "proj1": _lin_from(sd, "audio_proj.proj1", dt),
            "proj1_vf": _lin_from(sd, "audio_proj.proj1_vf", dt),
            "proj2": _lin_from(sd, "audio_proj.proj2", dt),
            "proj3": _lin_from(sd, "audio_proj.proj3", dt),
            "norm": {
                "w": jnp.asarray(_t(sd["audio_proj.norm.weight"]), dt),
                "b": jnp.asarray(_t(sd["audio_proj.norm.bias"]), dt),
            },
        }

    blocks = [block_params(i) for i in range(cfg.num_layers)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return params


def config_from_state_dict(sd) -> WanDiTConfig:
    """Infer architecture from checkpoint tensor shapes (the TPU-native analog
    of the reference's hash-based detection, wan_video_dit.py:655-712 — we
    inspect structure rather than hashing so unseen fine-tunes still load).

    `sd` maps names to arrays (or anything with .shape). num_heads follows
    Wan's fixed head_dim of 128 when dim divides; tiny test configs fall back
    to head_dim 32."""
    keys = set(sd.keys())
    num_layers = 1 + max(
        int(k.split(".")[1]) for k in keys if k.startswith("blocks.") and k.split(".")[1].isdigit()
    )
    has_image = "blocks.0.cross_attn.k_img.weight" in keys
    customtalk = "blocks.0.customtalk_context_pre_ffns.0.weight" in keys
    multitalk = (not customtalk) and any("audio" in k for k in keys)
    pe = sd["patch_embedding.weight"].shape  # (dim, in_dim, pt, ph, pw)
    dim, in_dim = int(pe[0]), int(pe[1])
    patch = tuple(int(x) for x in pe[2:])
    ffn_dim = int(sd["blocks.0.ffn.0.weight"].shape[0])
    text_dim = int(sd["text_embedding.0.weight"].shape[1])
    freq_dim = int(sd["time_embedding.0.weight"].shape[1])
    head_out = int(sd["head.head.weight"].shape[0])
    out_dim = head_out // (patch[0] * patch[1] * patch[2])
    num_heads = dim // 128 if dim % 128 == 0 else max(1, dim // 32)
    clip_dim = int(sd["img_emb.proj.0.weight"].shape[0]) if has_image else 1280
    return WanDiTConfig(
        dim=dim, in_dim=in_dim, ffn_dim=ffn_dim, out_dim=out_dim, text_dim=text_dim,
        freq_dim=freq_dim, patch_size=patch, num_heads=num_heads, num_layers=num_layers,
        has_image_input=has_image, enable_multitalk=multitalk,
        enable_customtalk=customtalk, clip_feature_dim=clip_dim,
    )


def config_from_state_dict_keys(keys) -> WanDiTConfig:
    """Key-only variant (no shapes): resolves among the known Wan configs."""
    keys = set(keys)
    num_layers = 1 + max(
        int(k.split(".")[1]) for k in keys if k.startswith("blocks.") and k.split(".")[1].isdigit()
    )
    has_image = "blocks.0.cross_attn.k_img.weight" in keys
    multitalk = any("audio" in k for k in keys)
    if num_layers >= 40:
        base = WAN_14B_I2V if has_image else WAN_14B_T2V
    else:
        base = WAN_1_3B_T2V
    return dataclasses.replace(
        base,
        num_layers=num_layers,
        has_image_input=has_image,
        in_dim=36 if has_image else 16,
        enable_multitalk=multitalk,
    )


INT4_GROUP = 128  # inputs per int4 quantization group


def _quantize_leaf_int4(w: np.ndarray, group: int = INT4_GROUP):
    """(in, out) float -> packed (in//2, out) int8 + (in//group, out) f32
    scales. Symmetric per-group: q = clip(round(w/scale), -8, 7),
    scale = groupwise max|w| / 7. HALF-SPLIT packing: byte i holds rows
    (i, i + in//2) as (low, high) nibbles — the unpack is then a pure
    concatenate (no row interleave: the stack+reshape interleave relayout
    measured ~9ms per 26M-param layer on v5e, ~45x the copy roofline), and
    the Pallas W4A8 kernel gets both halves' rows from one packed tile."""
    cin, cout = w.shape
    assert cin % 2 == 0 and cin % group == 0, (cin, group)
    wf = np.asarray(w, np.float32).reshape(cin // group, group, cout)
    scale = np.abs(wf).max(axis=1) / 7.0  # (in//G, out)
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(wf / scale[:, None, :]), -8, 7).astype(np.int8)
    q = q.reshape(cin, cout)
    lo = q[: cin // 2].astype(np.uint8) & 0xF
    hi = (q[cin // 2:].astype(np.uint8) & 0xF) << 4
    packed = (lo | hi).astype(np.int8)
    return packed, scale.astype(np.float32)


def _w4a8_leaves(scale: np.ndarray):
    """Per-output-channel int8 execution scales for W4A8 from the int4 group
    scales. scale: (..., in//G, out). Returns (r, s8): r = scale/smax·127/7
    (so the in-kernel requantized |v·r| ≤ 127), s8 = smax·7/127 (the
    per-channel int8 dequantization scale)."""
    smax = np.maximum(scale.max(axis=-2, keepdims=True), 1e-12)  # (...,1,out)
    r = (scale / smax) * (127.0 / 7.0)
    s8 = (smax[..., 0, :] * (7.0 / 127.0))[..., None, :]  # (...,1,out) broadcast vs tokens
    return r.astype(np.float32), s8.astype(np.float32)


def quantize_params_int4(params: Params, min_size: int = 1 << 16,
                         group: int = INT4_GROUP, w4a8: bool = False) -> Params:
    """Quantize large linear weights to packed int4 with group-wise scales.
    Small tensors (norms, biases, modulations) stay as-is. ~1/4 of bf16 DiT
    weight memory: the single-chip path for the Wan-14B flagship (the
    reference's analog is fp8 weight storage + layer offload,
    test_svi.py:337 / vram_management). Apply after any LoRA fusion.

    w4a8=True additionally stores the per-channel int8 execution scales so
    _dense runs the matmul on the int8 MXU (int4 HBM footprint, ~1.45x the
    bf16 matmul rate) instead of dequantizing to bf16."""

    def quant_leaf_dict(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if (k == "w" and hasattr(v, "ndim") and v.ndim >= 2 and v.size >= min_size
                    and v.shape[-2] % group == 0):
                if v.ndim == 2:
                    packed, scale = _quantize_leaf_int4(np.asarray(v, np.float32), group)
                else:
                    # stacked per-block weights (L, in, out): quantize per layer
                    packs, scales = zip(*(
                        _quantize_leaf_int4(np.asarray(v[i], np.float32), group)
                        for i in range(v.shape[0])
                    ))
                    packed, scale = np.stack(packs), np.stack(scales)
                out["w_q4"] = jnp.asarray(packed)
                out["scale_q4"] = jnp.asarray(scale)
                if w4a8:
                    r, s8 = _w4a8_leaves(scale)
                    out["r_q4"] = jnp.asarray(r)
                    out["s8_q4"] = jnp.asarray(s8)
            elif isinstance(v, dict):
                out[k] = quant_leaf_dict(v)
            else:
                out[k] = v
        return out

    return quant_leaf_dict(params)


def init_params_int4(key, cfg: WanDiTConfig, min_size: int = 1 << 16,
                     group: int = INT4_GROUP, weight_scale: float = 0.02,
                     w4a8: bool = False) -> Params:
    """Random int4-packed params with the exact pytree structure of
    quantize_params_int4(init_params(key, cfg)) — but without ever
    materializing the float weights (14B f32 fits neither chip HBM nor a
    reasonable init budget). For memory/perf benchmarking of the flagship:
    large linears become uniform random nibbles with constant group scales;
    norms stay ones, biases zeros.

    Structure is derived via jax.eval_shape over init_params, so it tracks
    the real init exactly."""
    shapes = jax.eval_shape(lambda k: init_params(k, cfg), key)
    keys = iter(jax.random.split(key, 4096))

    def build(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = build(v)
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(build(e) if isinstance(e, dict) else e for e in v)
            elif k == "w" and v.size >= min_size and v.shape[-2] % group == 0:
                cin = v.shape[-2]
                packed_shape = v.shape[:-2] + (cin // 2, v.shape[-1])
                # pseudo-random bytes via a fused iota hash: jax.random.bits
                # (threefry) materializes 4-byte temporaries per int8 output —
                # ~4x the 8.3GB of packed weights, which OOMs the chip during
                # init. The multiplicative hash fuses straight into the int8
                # buffer; the values only need to be non-degenerate for
                # benchmarking.
                salt = int(jax.random.randint(next(keys), (), 0, 2**31 - 1))

                def _fill(shape=packed_shape, salt=salt):
                    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
                    for d in range(len(shape) - 1):
                        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, shape, d) * jnp.uint32(
                            1000003 + 97 * d
                        )
                    h = idx * jnp.uint32(2654435761) + jnp.uint32(salt)
                    byte = jax.lax.shift_right_logical(h, jnp.uint32(8)) & jnp.uint32(0xFF)
                    return (byte.astype(jnp.int32) - 128).astype(jnp.int8)

                out["w_q4"] = jax.jit(_fill)()
                scale_shape = v.shape[:-2] + (cin // group, v.shape[-1])
                out["scale_q4"] = jnp.full(scale_shape, weight_scale / 7.0, jnp.float32)
                if w4a8:
                    # constant group scales -> r = 127/7 everywhere,
                    # s8 = weight_scale/127 (see _w4a8_leaves)
                    out["r_q4"] = jnp.full(scale_shape, 127.0 / 7.0, jnp.float32)
                    s8_shape = v.shape[:-2] + (1, v.shape[-1])
                    out["s8_q4"] = jnp.full(s8_shape, weight_scale / 127.0, jnp.float32)
            elif k == "b":
                out[k] = jnp.zeros(v.shape, v.dtype)
            elif k == "modulation":
                out[k] = (jax.random.normal(next(keys), v.shape) * weight_scale).astype(v.dtype)
            elif k == "w" and v.ndim >= 2:
                out[k] = (jax.random.normal(next(keys), v.shape) * weight_scale).astype(v.dtype)
            else:  # norm weights and other 1-D leaves
                out[k] = jnp.ones(v.shape, v.dtype)
        return out

    return build(shapes)


def quantized_params_from_torch_state_dict(
        sd: dict, cfg: WanDiTConfig, min_size: int = 1 << 16,
        group: int = INT4_GROUP, w4a8: bool = False) -> Params:
    """Quantize-on-load for the single-chip 14B path: convert the reference
    state dict and pack int4 WITHOUT ever materializing the bf16 parameter
    tree on the accelerator (the 14B bf16 tree is ~28GB, the chip holds
    15.75GB). Staging happens on the host CPU backend; only the packed
    tensors (8.3GB for 14B) are shipped to the default device, one top-level
    subtree at a time so peak device memory never exceeds the final
    footprint. Structurally identical to
    quantize_params_int4(params_from_torch_state_dict(sd, cfg), ...)."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        staged = params_from_torch_state_dict(sd, cfg)
    mode = "int4_w4a8" if w4a8 else "int4"
    return quantize_params_for_inference(staged, mode, min_size=min_size,
                                         group=group, consume=True)


QUANTIZE_MODES = ("int8", "w8a8", "int4", "int4_w4a8")


def quantize_params_for_inference(params: Params, mode: str,
                                  min_size: int = 1 << 16,
                                  group: int = INT4_GROUP,
                                  consume: bool = False) -> Params:
    """Quantize a (possibly host-staged) DiT parameter tree for inference and
    ship it to the default device, one top-level subtree at a time so peak
    device memory never exceeds the quantized footprint. `mode` is one of
    QUANTIZE_MODES (the `--quantize` driver flag / ModelManager(quantize_dit=)
    values): int8 = storage-only int8 weights (bf16 matmuls), w8a8 = int8-MXU
    execution, int4/int4_w4a8 = packed-int4 storage (the single-chip 14B
    path), the latter on the int8 MXU. Apply AFTER any LoRA fusion.
    `consume=True` pops subtrees from `params` to release the staged tree
    incrementally."""
    if mode == "int4":
        fn = lambda p: quantize_params_int4(p, min_size=min_size, group=group)
    elif mode == "int4_w4a8":
        fn = lambda p: quantize_params_int4(p, min_size=min_size, group=group,
                                            w4a8=True)
    elif mode == "w8a8":
        fn = lambda p: quantize_params_w8a8(p, min_size=min_size)
    elif mode == "int8":
        fn = lambda p: quantize_params_int8(p, min_size=min_size)
    else:
        raise ValueError(f"quantize mode {mode!r}; choose from {QUANTIZE_MODES}")
    out: Params = {}
    for key in list(params):
        sub = params.pop(key) if consume else params[key]
        out[key] = jax.device_put(fn({key: sub})[key])
        del sub
    return out


def quantize_params_w8a8(params: Params, min_size: int = 1 << 16) -> Params:
    """Quantize large linear weights to int8 for W8A8 execution (dynamic
    per-token int8 activations at run time — see _dense). ~1.45x faster
    linears on the v5e int8 MXU; trainable via the _int8_exec straight-through VJP."""

    def quant_leaf_dict(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if k == "w" and hasattr(v, "ndim") and v.ndim >= 2 and v.size >= min_size:
                vf = jnp.asarray(v, jnp.float32)
                scale = jnp.max(jnp.abs(vf), axis=-2, keepdims=True) / 127.0
                scale = jnp.maximum(scale, 1e-12)
                out["w_q8"] = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
                out["scale8"] = scale.astype(jnp.float32)
            elif isinstance(v, dict):
                out[k] = quant_leaf_dict(v)
            else:
                out[k] = v
        return out

    return quant_leaf_dict(params)


def quantize_params_int8(params: Params, min_size: int = 1 << 16) -> Params:
    """Quantize large linear weights to int8 with per-output-channel scales
    (symmetric). Small tensors (norms, biases, modulations) stay as-is.
    Roughly halves DiT weight memory; dequantization happens per-use in
    _dense. Apply after any LoRA fusion."""

    def quant_leaf_dict(d):
        if not isinstance(d, dict):
            return d
        out = {}
        for k, v in d.items():
            if k == "w" and hasattr(v, "ndim") and v.ndim >= 2 and v.size >= min_size:
                vf = jnp.asarray(v, jnp.float32)
                scale = jnp.max(jnp.abs(vf), axis=-2, keepdims=True) / 127.0
                scale = jnp.maximum(scale, 1e-12)
                out["w_q"] = jnp.clip(jnp.round(vf / scale), -127, 127).astype(jnp.int8)
                out["scale"] = scale.astype(jnp.float32)
            elif isinstance(v, dict):
                out[k] = quant_leaf_dict(v)
            else:
                out[k] = v
        return out

    return quant_leaf_dict(params)
