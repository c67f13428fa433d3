"""StepVideo family: DiT and the Step1 LLM text encoder.

Behavioral reference: diffsynth/models/stepvideo_dit.py (StepVideoModel
:745-905 — 48 blocks of dim 6144, PixArt adaLN-single with per-block
scale_shift_table, 3-axis split RoPE with ch_split [64,32,32] and
half-rotation, per-head RMSNorm on q/k, masked cross-attention onto
[CLIP-proj | LLM-proj] caption tokens) and stepvideo_text_encoder.py
(Step1Model :495-520 — LLaMA-style causal decoder with multi-query/GQA
attention, RMSNorm, SwiGLU FFN; no rotary embedding in the shipped forward).

TPU-first: blocks are stacked pytrees run under `lax.scan`; attention rides
the fused Pallas flash kernel (self-attn is mask-free, ref torch_attn_func
with causal=False); the key-padding cross-attention mask is additive in f32
instead of the reference's per-sample boolean truncation (identical math —
masked keys get -inf logits either way). Patchify with patch_size=1 is a
plain channel matmul on the MXU rather than a Conv2d.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention
from .sd import Params, _dense, _lin_from, _norm_from, _t

STEPVIDEO_ROPE_SPLITS = (64, 32, 32)


def _ln(p, x, eps=1e-5):
    """LayerNorm; p may omit affine ({} => elementwise_affine=False)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "w" in p:
        y = y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _rms(p, x, eps=1e-6):
    """RMSNorm (ref stepvideo_dit.py:20-74): f32 stats, cast back, * weight."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return y.astype(x.dtype) * p["w"].astype(x.dtype)


def _sinusoidal_256(t):
    """Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)
    (ref stepvideo_dit.py:102-145): [cos | sin]."""
    half = 128
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def prepare_stepvideo_rope(f, h, w, splits=STEPVIDEO_ROPE_SPLITS, base=1e4):
    """RoPE3D tables (ref stepvideo_dit.py:361-448): positions are the
    cartesian product of (f, h, w) indices; per split of head_dim, tables are
    cat(freqs, freqs) — half-rotation layout. Returns cos, sin (S, sum(splits))
    f32 numpy."""
    pos = [g.reshape(-1) for g in np.meshgrid(
        np.arange(f), np.arange(h), np.arange(w), indexing="ij")]
    parts = []
    for i, d in enumerate(splits):
        inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float32) / d))
        fr = np.outer(pos[i].astype(np.float32), inv)
        parts.append(np.concatenate([fr, fr], axis=-1))
    ang = np.concatenate(parts, axis=-1)
    return np.cos(ang), np.sin(ang)


def _rope_apply(x, cos, sin, splits=STEPVIDEO_ROPE_SPLITS):
    """x (B,S,N,D); per split: x*cos + rotate_half(x)*sin with half split."""
    xf = x.astype(jnp.float32)
    c = cos[None, :, None].astype(jnp.float32)
    s = sin[None, :, None].astype(jnp.float32)
    outs, o = [], 0
    for d in splits:
        xs = xf[..., o:o + d]
        rot = jnp.concatenate([-xs[..., d // 2:], xs[..., :d // 2]], axis=-1)
        outs.append(xs * c[..., o:o + d] + rot * s[..., o:o + d])
        o += d
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)


def _masked_cross_attention(q, k, v, add_mask):
    """Key-padding masked attention; q (B,S,N,D), add_mask (B,1,1,Sk) f32."""
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (q.shape[-1] ** -0.5)
    probs = jax.nn.softmax(logits + add_mask, axis=-1).astype(q.dtype)
    return jnp.einsum("bnsk,bknd->bsnd", probs, v)


def _stepvideo_block(p, x, ctx, t6, cos, sin, add_mask, num_heads, head_dim):
    """StepVideoTransformerBlock.forward (ref stepvideo_dit.py:625-712)."""
    b, s, dim = x.shape
    mods = p["scale_shift_table"][None].astype(jnp.float32) \
        + t6.reshape(-1, 6, dim).astype(jnp.float32)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
        m.astype(x.dtype) for m in jnp.split(mods, 6, axis=1)]

    nx = _ln(p["norm1"], x) * (1 + scale_msa) + shift_msa
    qkv = _dense(p["attn1"]["wqkv"], nx).reshape(b, s, num_heads, 3 * head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _rms(p["attn1"]["q_norm"], q)
    k = _rms(p["attn1"]["k_norm"], k)
    q = _rope_apply(q, cos, sin)
    k = _rope_apply(k, cos, sin)
    o = flash_attention(q, k, v).reshape(b, s, dim)
    x = x + gate_msa * _dense(p["attn1"]["wo"], o)

    # cross-attention runs on the un-normalized residual stream (ref :699-703)
    sk = ctx.shape[1]
    q = _dense(p["attn2"]["wq"], x).reshape(b, s, num_heads, head_dim)
    kv = _dense(p["attn2"]["wkv"], ctx).reshape(b, sk, num_heads, 2 * head_dim)
    k, v = jnp.split(kv, 2, axis=-1)
    q = _rms(p["attn2"]["q_norm"], q)
    k = _rms(p["attn2"]["k_norm"], k)
    o = _masked_cross_attention(q, k, v, add_mask).reshape(b, s, dim)
    x = x + _dense(p["attn2"]["wo"], o)

    nx = _ln(p["norm2"], x) * (1 + scale_mlp) + shift_mlp
    h = _dense(p["ff"]["0"], nx)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return x + gate_mlp * _dense(p["ff"]["2"], h)


def stepvideo_dit_forward(params: Params, hidden_states, encoder_hidden_states,
                          encoder_attention_mask, timestep,
                          encoder_hidden_states_2=None, rope_tables=None,
                          num_heads=48, head_dim=128):
    """StepVideoModel.forward (ref stepvideo_dit.py:845-925).

    hidden_states (B, F, C, H, W); encoder_hidden_states (B, L, 6144) LLM
    tokens; encoder_hidden_states_2 (B, Lc, 1024) CLIP tokens prepended after
    projection; encoder_attention_mask (B, Lc+L) — 1s over the CLIP part.
    Returns (B, F, C_out, H, W)."""
    x = hidden_states
    b, f, cin, h, w = x.shape
    dtype = x.dtype
    dim = num_heads * head_dim

    # patch_size=1 Conv2d == matmul (ref PatchEmbed :715-743)
    tok = x.transpose(0, 1, 3, 4, 2).reshape(b, f * h * w, cin)
    tok = tok @ params["pos_embed"]["w"].astype(dtype) \
        + params["pos_embed"]["b"].astype(dtype)

    # adaLN-single (ref AdaLayerNormSingle :262-291, rescale x1000)
    te = _sinusoidal_256(jnp.atleast_1d(timestep) * 1000.0)
    te = _dense(params["t_embedder"]["linear_2"],
                jax.nn.silu(_dense(params["t_embedder"]["linear_1"],
                                   te.astype(dtype))))
    t6 = _dense(params["adaln_linear"], jax.nn.silu(te))

    ctx = _ln(params["caption_norm"], encoder_hidden_states, eps=1e-6)
    ctx = _dense(params["caption_projection"]["linear_1"], ctx)
    ctx = jax.nn.gelu(ctx.astype(jnp.float32), approximate=True).astype(dtype)
    ctx = _dense(params["caption_projection"]["linear_2"], ctx)
    if encoder_hidden_states_2 is not None:
        clip = _dense(params["clip_projection"], encoder_hidden_states_2)
        ctx = jnp.concatenate([clip, ctx], axis=1)

    add_mask = jnp.where(encoder_attention_mask[:, None, None] > 0,
                         0.0, -jnp.inf).astype(jnp.float32)

    if rope_tables is None:
        rope_tables = prepare_stepvideo_rope(f, h, w)
    cos, sin = (jnp.asarray(rope_tables[0]), jnp.asarray(rope_tables[1]))

    def body(xc, p):
        return _stepvideo_block(p, xc, ctx, t6, cos, sin, add_mask,
                                num_heads, head_dim), None

    tok, _ = jax.lax.scan(body, tok, params["blocks"])

    # head (ref :905-925): per-frame modulation with the embedded timestep
    emb = jnp.repeat(te, f, axis=0)  # (B*F, dim)
    mods = params["scale_shift_table"][None].astype(jnp.float32) \
        + emb[:, None].astype(jnp.float32)
    shift, scale = [m.astype(dtype) for m in jnp.split(mods, 2, axis=1)]
    tok = tok.reshape(b * f, h * w, dim)
    tok = _ln(params["norm_out"], tok, eps=1e-6) * (1 + scale) + shift
    tok = _dense(params["proj_out"], tok)
    cout = tok.shape[-1]
    return tok.reshape(b, f, h, w, cout).transpose(0, 1, 4, 2, 3)


def _block_p(sd, prefix):
    return {
        "scale_shift_table": jnp.asarray(_t(sd[f"{prefix}.scale_shift_table"])),
        "norm1": _norm_from(sd, f"{prefix}.norm1"),
        "norm2": _norm_from(sd, f"{prefix}.norm2"),
        "attn1": {
            "wqkv": _lin_from(sd, f"{prefix}.attn1.wqkv"),
            "wo": _lin_from(sd, f"{prefix}.attn1.wo"),
            "q_norm": {"w": jnp.asarray(_t(sd[f"{prefix}.attn1.q_norm.weight"]))},
            "k_norm": {"w": jnp.asarray(_t(sd[f"{prefix}.attn1.k_norm.weight"]))},
        },
        "attn2": {
            "wq": _lin_from(sd, f"{prefix}.attn2.wq"),
            "wkv": _lin_from(sd, f"{prefix}.attn2.wkv"),
            "wo": _lin_from(sd, f"{prefix}.attn2.wo"),
            "q_norm": {"w": jnp.asarray(_t(sd[f"{prefix}.attn2.q_norm.weight"]))},
            "k_norm": {"w": jnp.asarray(_t(sd[f"{prefix}.attn2.k_norm.weight"]))},
        },
        "ff": {"0": _lin_from(sd, f"{prefix}.ff.net.0.proj"),
               "2": _lin_from(sd, f"{prefix}.ff.net.2")},
    }


def stepvideo_dit_params_from_torch(sd: dict) -> Params:
    n = 0
    while f"transformer_blocks.{n}.norm1.weight" in sd:
        n += 1
    pw = _t(sd["pos_embed.proj.weight"])  # (D, C, 1, 1)
    params = {
        "pos_embed": {"w": jnp.asarray(pw[:, :, 0, 0].T),
                      "b": jnp.asarray(_t(sd["pos_embed.proj.bias"]))},
        "t_embedder": {
            "linear_1": _lin_from(
                sd, "adaln_single.emb.timestep_embedder.linear_1"),
            "linear_2": _lin_from(
                sd, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "adaln_linear": _lin_from(sd, "adaln_single.linear"),
        "caption_norm": {},  # elementwise_affine=False
        "caption_projection": {
            "linear_1": _lin_from(sd, "caption_projection.linear_1"),
            "linear_2": _lin_from(sd, "caption_projection.linear_2"),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_p(sd, f"transformer_blocks.{i}") for i in range(n)]),
        "norm_out": {},  # elementwise_affine=False
        "scale_shift_table": jnp.asarray(_t(sd["scale_shift_table"])),
        "proj_out": _lin_from(sd, "proj_out"),
    }
    if "clip_projection.weight" in sd:
        params["clip_projection"] = _lin_from(sd, "clip_projection")
    return params


# ---------------------------------------------------------------------------
# Step1 LLM text encoder
# ---------------------------------------------------------------------------


def _step1_block(p, x, causal_mask, num_heads, num_groups, head_dim, eps):
    """TransformerBlock (ref stepvideo_text_encoder.py:408-446): pre-RMSNorm
    attention and SwiGLU FFN residuals. GQA: kv heads are broadcast to query
    heads; attention is causal (ref flash_attn_func :527-535 causal=True; no
    rotary embedding is applied in the shipped forward)."""
    b, s, dim = x.shape
    nx = _rms(p["attention_norm"], x, eps)
    qkv = _dense(p["attention"]["wqkv"], nx)
    q = qkv[..., :dim].reshape(b, s, num_heads, head_dim)
    kv = qkv[..., dim:].reshape(b, s, num_groups, 2 * head_dim)
    k, v = jnp.split(kv, 2, axis=-1)
    per = num_heads // num_groups
    if per > 1:
        # index_select(repeat(...)) pattern == repeat_interleave (ref :339-353)
        k = jnp.repeat(k, per, axis=2)
        v = jnp.repeat(v, per, axis=2)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (head_dim ** -0.5)
    probs = jax.nn.softmax(logits + causal_mask, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, s, dim)
    x = x + _dense(p["attention"]["wo"], o)

    nx = _rms(p["ffn_norm"], x, eps)
    h = _dense(p["feed_forward"]["w1"], nx)
    h1, h2 = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(h1.astype(jnp.float32)).astype(x.dtype) * h2
    return x + _dense(p["feed_forward"]["w2"], h)


def step1_encode(params: Params, input_ids, num_heads, num_groups,
                 eps=1e-5, dtype=jnp.float32):
    """Step1Model.forward (ref stepvideo_text_encoder.py:495-520): embedding
    lookup then causal decoder blocks; returns (B, S, dim) hidden states."""
    emb = params["word_embeddings"].astype(dtype)
    x = emb[input_ids]
    s = x.shape[1]
    head_dim = x.shape[-1] // num_heads
    causal = jnp.where(jnp.arange(s)[:, None] >= jnp.arange(s)[None, :],
                       0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def body(xc, p):
        return _step1_block(p, xc, causal, num_heads, num_groups,
                            head_dim, eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def step1_params_from_torch(sd: dict) -> Params:
    def layer(i):
        pre = f"transformer.layers.{i}"
        return {
            "attention_norm": {
                "w": jnp.asarray(_t(sd[f"{pre}.attention_norm.weight"]))},
            "ffn_norm": {"w": jnp.asarray(_t(sd[f"{pre}.ffn_norm.weight"]))},
            "attention": {"wqkv": _lin_from(sd, f"{pre}.attention.wqkv"),
                          "wo": _lin_from(sd, f"{pre}.attention.wo")},
            "feed_forward": {
                "w1": _lin_from(sd, f"{pre}.feed_forward.w1"),
                "w2": _lin_from(sd, f"{pre}.feed_forward.w2")},
        }

    n = 0
    while f"transformer.layers.{n}.attention_norm.weight" in sd:
        n += 1
    return {
        "word_embeddings": jnp.asarray(
            _t(sd["tok_embeddings.word_embeddings.weight"])),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[layer(i) for i in range(n)]),
    }


def step1_tokenize(texts, tokenizer, max_length=320):
    """Wrapped_StepChatTokenizer.__call__ (ref stepvideo_text_encoder.py
    :481-520): BOS=1/EOS=2/PAD=2 framing, pad-to-max_length, attention mask.
    `tokenizer` is any callable str -> list[int] (e.g. a sentencepiece
    processor's encode_as_ids); host-side preprocessing."""
    if isinstance(texts, str):
        texts = [texts]
    ids, mask = [], []
    if len(texts) == 0:
        texts = [""]
    for text in texts:
        toks = list(tokenizer(text))[: max_length - 2] if text else []
        toks = [1] + toks + [2]
        valid = len(toks)
        ids.append(toks + [2] * (max_length - valid))
        mask.append([1] * valid + [0] * (max_length - valid))
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)
