"""OmniGen: unified multimodal image generation on a Phi-3 backbone.

Behavioral reference: diffsynth/models/omnigen.py (OmniGenTransformer
:580-790 — SD-VAE latents patchified by PatchEmbedMR into a Phi-3 decoder
sequence [text+ref-image tokens | time token | noise tokens] under a custom
block attention mask, with a DiT FinalLayer head) and
prompters/omnigen_prompter.py (prompt templating, multimodal token
splicing, the collator that builds the block mask / position ids).

The Phi-3 backbone (transformers Phi3Model in the reference) is implemented
here directly: LLaMA-style decoder with packed qkv, LongRoPE ("su") scaled
rotary embeddings, RMSNorm, SwiGLU-packed MLP.

TPU-first: layers are a stacked pytree under `lax.scan`. The reference's
condition KV cache (pipelines/omnigen_image.py OmniGenCache :15-120 — cache
text/ref-image keys once, re-run only the time+noise suffix each step) is
reproduced functionally: the first forward returns per-layer condition
K/V stacks from the scan, later steps consume them as a scan constant.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from .sd import Params, _dense, _lin_from, _t
from .stepvideo import _rms

# OmniGenTransformer config (ref omnigen.py:582-710). The su/LongRoPE
# factors are checkpoint-defined constants from the Phi-3 config; stored as
# tuples so the whole config is hashable (jit-static).
OMNIGEN_ROPE = (
    ("base", 10000.0),
    ("max_position_embeddings", 131072),
    ("original_max_position_embeddings", 4096),
    ("short_factor", (
        1.05, 1.05, 1.05, 1.1, 1.1, 1.1, 1.2500000000000002,
        1.2500000000000002, 1.4000000000000004, 1.4500000000000004,
        1.5500000000000005, 1.8500000000000008, 1.9000000000000008,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.000000000000001, 2.000000000000001,
        2.000000000000001, 2.1000000000000005, 2.1000000000000005, 2.2,
        2.3499999999999996, 2.3499999999999996, 2.3499999999999996,
        2.3499999999999996, 2.3999999999999995, 2.3999999999999995,
        2.6499999999999986, 2.6999999999999984, 2.8999999999999977,
        2.9499999999999975, 3.049999999999997, 3.049999999999997,
        3.049999999999997)),
    ("long_factor", (
        1.0299999713897705, 1.0499999523162842, 1.0499999523162842,
        1.0799999237060547, 1.2299998998641968, 1.2299998998641968,
        1.2999999523162842, 1.4499999284744263, 1.5999999046325684,
        1.6499998569488525, 1.8999998569488525, 2.859999895095825,
        3.68999981880188, 5.419999599456787, 5.489999771118164,
        5.489999771118164, 9.09000015258789, 11.579999923706055,
        15.65999984741211, 15.769999504089355, 15.789999961853027,
        18.360000610351562, 21.989999771118164, 23.079999923706055,
        30.009998321533203, 32.35000228881836, 32.590003967285156,
        35.56000518798828, 39.95000457763672, 53.840003967285156,
        56.20000457763672, 57.95000457763672, 59.29000473022461,
        59.77000427246094, 59.920005798339844, 61.190006256103516,
        61.96000671386719, 62.50000762939453, 63.3700065612793,
        63.48000717163086, 63.48000717163086, 63.66000747680664,
        63.850006103515625, 64.08000946044922, 64.760009765625,
        64.80001068115234, 64.81001281738281, 64.81001281738281)),
)


def longrope_inv_freq(head_dim, seq_len=None, base=10000.0,
                      short_factor=None, long_factor=None,
                      max_position_embeddings=131072,
                      original_max_position_embeddings=4096):
    """transformers _compute_longrope_parameters for Phi-3 "su" scaling:
    inv_freq = 1/(ext_factor * base^(2i/d)); attention scaling
    sqrt(1 + ln(max/orig)/ln(orig))."""
    if short_factor is None:
        return (1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32)
                                / head_dim)), 1.0)
    factor = max_position_embeddings / original_max_position_embeddings
    if factor <= 1.0:
        scaling = 1.0
    else:
        scaling = math.sqrt(1 + math.log(factor)
                            / math.log(original_max_position_embeddings))
    ext = np.asarray(long_factor if seq_len is not None
                     and seq_len > original_max_position_embeddings
                     else short_factor, np.float32)
    inv = 1.0 / (ext * base ** (np.arange(0, head_dim, 2, dtype=np.float32)
                                / head_dim))
    return inv, scaling


def phi3_rope_tables(position_ids, inv_freq, scaling=1.0):
    """Phi3RotaryEmbedding.forward: cos/sin (B, S, head_dim) in f32,
    cat(freqs, freqs) half-rotation layout, scaled by attention_factor."""
    freqs = position_ids[..., None].astype(jnp.float32) \
        * jnp.asarray(inv_freq)[None, None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _rotate_half_apply(x, cos, sin):
    """x (B,S,N,D); cos/sin (B,S,D)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., d // 2:], xf[..., :d // 2]], axis=-1)
    return (xf * cos[:, :, None] + rot * sin[:, :, None]).astype(x.dtype)


def phi3_forward(params: Params, inputs_embeds, attention_mask, position_ids,
                 num_heads, num_kv_heads=None, eps=1e-5, rope_seq_len=None,
                 rope_cfg=OMNIGEN_ROPE, kv_cache=None, cond_len=0):
    """Phi3Transformer.forward (ref omnigen.py:56-190): 3D 0/1 attention
    mask -> additive; final RMSNorm. Returns (hidden, cond_kv) where cond_kv
    stacks each layer's K/V over the first `cond_len` positions (for the
    condition-cache path); None when cond_len == 0."""
    num_kv_heads = num_kv_heads or num_heads
    head_dim = inputs_embeds.shape[-1] // num_heads
    inv, scaling = longrope_inv_freq(head_dim, seq_len=rope_seq_len,
                                     **dict(rope_cfg))
    cos, sin = phi3_rope_tables(position_ids, inv, scaling)
    add_mask = jnp.where(attention_mask > 0, 0.0,
                         -jnp.inf).astype(jnp.float32)[:, None]

    def body(x, args):
        p, cache = args
        b, s, dim = x.shape
        nx = _rms(p["input_layernorm"], x, eps)
        qkv = _dense(p["qkv_proj"], nx)
        nq, nkv = num_heads * head_dim, num_kv_heads * head_dim
        q = qkv[..., :nq].reshape(b, s, num_heads, head_dim)
        k = qkv[..., nq:nq + nkv].reshape(b, s, num_kv_heads, head_dim)
        v = qkv[..., nq + nkv:].reshape(b, s, num_kv_heads, head_dim)
        q = _rotate_half_apply(q, cos, sin)
        k = _rotate_half_apply(k, cos, sin)
        kv_out = (k[:, :cond_len], v[:, :cond_len]) if cond_len else None
        if kv_cache is not None:
            k = jnp.concatenate([cache[0].astype(k.dtype), k], axis=1)
            v = jnp.concatenate([cache[1].astype(v.dtype), v], axis=1)
        per = num_heads // num_kv_heads
        if per > 1:
            k = jnp.repeat(k, per, axis=2)
            v = jnp.repeat(v, per, axis=2)
        logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (head_dim ** -0.5)
        probs = jax.nn.softmax(logits + add_mask, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, s, dim)
        x = x + _dense(p["o_proj"], o)
        nx = _rms(p["post_attention_layernorm"], x, eps)
        h = _dense(p["gate_up_proj"], nx)
        g, u = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        return x + _dense(p["down_proj"], h), kv_out

    if kv_cache is None:
        # scan needs a uniform second arg; zero-length caches concat no-op
        b = inputs_embeds.shape[0]
        nl = jax.tree.leaves(params["layers"])[0].shape[0]
        kv_cache = (
            jnp.zeros((nl, b, 0, num_kv_heads, head_dim), inputs_embeds.dtype),
            jnp.zeros((nl, b, 0, num_kv_heads, head_dim), inputs_embeds.dtype))

    x, cond_kv = jax.lax.scan(body, inputs_embeds,
                              (params["layers"], kv_cache))
    x = _rms(params["norm"], x, eps)
    return x, cond_kv


# ---------------------------------------------------------------------------
# DiT wrappers
# ---------------------------------------------------------------------------


def timestep_embedding_omnigen(t, dim=256):
    """TimestepEmbedder.timestep_embedding (ref :208-227): [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _t_embed(p, t, dtype):
    emb = timestep_embedding_omnigen(t).astype(dtype)
    return _dense(p["2"], jax.nn.silu(_dense(p["0"], emb)))


def get_2d_sincos_pos_embed(embed_dim, grid_size, interpolation_scale=1.0,
                            base_size=1):
    """ref omnigen.py:255-304 (sin|cos halves, h then w)."""
    gh = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) \
        / interpolation_scale
    gw = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) \
        / interpolation_scale
    grid = np.meshgrid(gw, gh)  # w first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

    def axis(pos, dim):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64)
                                / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = axis(grid[0], embed_dim // 2)
    emb_w = axis(grid[1], embed_dim // 2)
    return np.concatenate([emb_h, emb_w], axis=1)


def cropped_pos_embed(pos_embed, height, width, patch_size=2,
                      pos_embed_max_size=192):
    """ref :426-449: center crop of the max-size table."""
    h, w = height // patch_size, width // patch_size
    top = (pos_embed_max_size - h) // 2
    left = (pos_embed_max_size - w) // 2
    table = pos_embed.reshape(pos_embed_max_size, pos_embed_max_size, -1)
    return table[top:top + h, left:left + w].reshape(1, h * w, -1)


def _patch_embed(p, x, patch_size=2):
    """PatchEmbedMR (ref :307-324): Conv2d p=2 s=2, NCHW -> NLC."""
    b, c, h, w = x.shape
    xl = x.transpose(0, 2, 3, 1)
    y = jax.lax.conv_general_dilated(
        xl, p["w"].astype(x.dtype), (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"].astype(x.dtype)
    return y.reshape(b, -1, y.shape[-1])


def omnigen_forward(params: Params, x, timestep, input_ids,
                    input_img_latents, input_image_sizes, attention_mask,
                    position_ids, num_heads=32, num_kv_heads=None,
                    rope_cfg=OMNIGEN_ROPE, kv_cache=None, return_kv=False,
                    patch_size=2, pos_embed_max_size=None):
    """OmniGenTransformer.forward (ref omnigen.py:717-758).

    x (B,4,H,W) noise latents; input_ids (B,L) or None (cached steps);
    input_img_latents: list of (1,4,h,w) reference-image latents;
    input_image_sizes: {batch_idx: [[start,end], ...]} token spans;
    attention_mask (B,S,S) 0/1; position_ids (B,S).
    Returns (latents (B,4,H,W), cond_kv or None)."""
    dtype = x.dtype
    b, _, height, width = x.shape
    pos_table = params["pos_embed"]
    if pos_embed_max_size is None:
        pos_embed_max_size = int(math.isqrt(pos_table.shape[0]))
    tok = _patch_embed(params["x_embedder"], x, patch_size)
    pe = jnp.asarray(cropped_pos_embed(pos_table, height, width, patch_size,
                                       pos_embed_max_size), dtype)
    tok = tok + pe
    num_tokens = tok.shape[1]
    time_token = _t_embed(params["time_token"], jnp.atleast_1d(timestep),
                          dtype)[:, None]

    if input_ids is not None:
        cond = params["embed_tokens"].astype(dtype)[input_ids]
        if input_img_latents:
            sizes = (input_image_sizes.items()
                     if isinstance(input_image_sizes, dict)
                     else input_image_sizes)  # hashable tuple form under jit
            spans = [(b_inx, s0, s1)
                     for b_inx, sp in sorted(sizes)
                     for (s0, s1) in sp]
            for (b_inx, s0, s1), lat in zip(spans, input_img_latents):
                emb = _patch_embed(params["input_x_embedder"],
                                   lat.astype(dtype), patch_size)
                ipe = jnp.asarray(cropped_pos_embed(
                    pos_table, lat.shape[-2], lat.shape[-1], patch_size,
                    pos_embed_max_size), dtype)
                cond = cond.at[b_inx, s0:s1].set((emb + ipe)[0])
        input_emb = jnp.concatenate(
            [cond, jnp.broadcast_to(time_token, (b, 1, cond.shape[-1])),
             tok], axis=1)
        cond_len = cond.shape[1] if return_kv else 0
    else:
        input_emb = jnp.concatenate(
            [jnp.broadcast_to(time_token,
                              (b, 1, tok.shape[-1])), tok], axis=1)
        cond_len = 0

    out, cond_kv = phi3_forward(
        params, input_emb, attention_mask, position_ids, num_heads,
        num_kv_heads, rope_cfg=rope_cfg, kv_cache=kv_cache,
        cond_len=cond_len)

    image_embedding = out[:, -num_tokens:]
    time_emb = _t_embed(params["t_embedder"], jnp.atleast_1d(timestep), dtype)
    shift, scale = jnp.split(
        _dense(params["final_layer"]["adaLN"], jax.nn.silu(time_emb)), 2,
        axis=-1)
    xf = image_embedding.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(dtype)
    y = normed * (1 + scale[:, None]) + shift[:, None]
    y = _dense(params["final_layer"]["linear"], y)

    # unpatchify (ref :413-424)
    hp, wp = height // patch_size, width // patch_size
    c = y.shape[-1] // (patch_size * patch_size)
    y = y.reshape(b, hp, wp, patch_size, patch_size, c)
    latents = y.transpose(0, 5, 1, 3, 2, 4).reshape(b, c, height, width)
    return latents, cond_kv


# ---------------------------------------------------------------------------
# torch state-dict ingestion
# ---------------------------------------------------------------------------


def omnigen_params_from_torch(sd: dict, pos_embed_max_size=192,
                              pe_interpolation=1.0) -> Params:
    def layer(i):
        pre = f"llm.layers.{i}"
        return {
            "input_layernorm": {
                "w": jnp.asarray(_t(sd[f"{pre}.input_layernorm.weight"]))},
            "post_attention_layernorm": {
                "w": jnp.asarray(
                    _t(sd[f"{pre}.post_attention_layernorm.weight"]))},
            "qkv_proj": _lin_from(sd, f"{pre}.self_attn.qkv_proj"),
            "o_proj": _lin_from(sd, f"{pre}.self_attn.o_proj"),
            "gate_up_proj": _lin_from(sd, f"{pre}.mlp.gate_up_proj"),
            "down_proj": _lin_from(sd, f"{pre}.mlp.down_proj"),
        }

    def patch(prefix):
        w = _t(sd[f"{prefix}.proj.weight"])  # (D, C, p, p)
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "b": jnp.asarray(_t(sd[f"{prefix}.proj.bias"]))}

    n = 0
    while f"llm.layers.{n}.input_layernorm.weight" in sd:
        n += 1
    hidden = sd["llm.embed_tokens.weight"].shape[1]
    return {
        "embed_tokens": jnp.asarray(_t(sd["llm.embed_tokens.weight"])),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[layer(i) for i in range(n)]),
        "norm": {"w": jnp.asarray(_t(sd["llm.norm.weight"]))},
        "x_embedder": patch("x_embedder"),
        "input_x_embedder": patch("input_x_embedder"),
        "time_token": {"0": _lin_from(sd, "time_token.mlp.0"),
                       "2": _lin_from(sd, "time_token.mlp.2")},
        "t_embedder": {"0": _lin_from(sd, "t_embedder.mlp.0"),
                       "2": _lin_from(sd, "t_embedder.mlp.2")},
        "final_layer": {
            "adaLN": _lin_from(sd, "final_layer.adaLN_modulation.1"),
            "linear": _lin_from(sd, "final_layer.linear"),
        },
        "pos_embed": (np.asarray(_t(sd["pos_embed"]))[0]
                      if "pos_embed" in sd else
                      get_2d_sincos_pos_embed(
                          hidden, pos_embed_max_size,
                          interpolation_scale=pe_interpolation,
                          base_size=64).astype(np.float32)),
    }
