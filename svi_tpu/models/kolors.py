"""Kolors text encoder (ChatGLM3-6B), TPU-native.

Behavioral reference: diffsynth/models/kolors_text_encoder.py (ChatGLMModel
:991-1103 — GQA decoder: 32 heads of kv_channels=128 with 2 kv groups,
half-head interleaved rotary indexed by per-sample position_ids, RMSNorm,
SwiGLU MLP with no biases except qkv) and prompters/kolors_prompter.py
(KolorsPrompter :304-354 — left-padded 256-token ChatGLM tokenization;
prompt_emb = hidden_states[-clip_skip_2], pooled = last token of the final
pre-norm hidden state).

The Kolors UNet itself is the SDXL UNet with is_kolors extensions
(models/sdxl.py: text_intermediate_proj 4096->2048, 5632-ch add-embeds) and
the Kolors scheduler swap is EnhancedDDIMScheduler(beta_end=0.014,
num_train_timesteps=1100) (ref pipelines/sdxl_image.py:64-68).

TPU-first: blocks are a stacked pytree under `lax.scan` whose per-layer
outputs ARE the hidden-states stack the prompter indexes (no Python-side
collection); attention masks are additive f32.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sd import Params, _dense, _lin_from, _t
from .stepvideo import _rms


def chatglm_rope_cache(seq_len, kv_channels):
    """RotaryEmbedding.forward_impl (ref :387-411): n_elem = kv_channels//2
    frequencies over interleaved pairs; returns cos, sin (S, kv_channels//4)
    f32 numpy (the rotated span is the first half of each head)."""
    n_elem = kv_channels // 2
    theta = 1.0 / (10000.0 ** (np.arange(0, n_elem, 2, dtype=np.float32)
                               / n_elem))
    idx = np.outer(np.arange(seq_len, dtype=np.float32), theta)
    return np.cos(idx), np.sin(idx)


def _apply_rotary(x, cos, sin):
    """apply_rotary_pos_emb (ref :419-437): interleaved pairs over the first
    rot_dim = kv_channels//2 channels, passthrough for the rest.
    x (B,S,N,D); cos/sin (B,S,n_elem//2)."""
    rot = cos.shape[-1] * 2
    xr, xp = x[..., :rot], x[..., rot:]
    xf = xr.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    c = cos[:, :, None].astype(jnp.float32)
    s = sin[:, :, None].astype(jnp.float32)
    out = jnp.stack([xe * c - xo * s, xo * c + xe * s], axis=-1)
    return jnp.concatenate([out.reshape(xr.shape).astype(x.dtype), xp],
                           axis=-1)


def _glm_block(p, x, add_mask, cos, sin, num_heads, num_groups, head_dim,
               eps):
    """GLMBlock (ref :763-835): pre-RMSNorm attention + SwiGLU residuals."""
    b, s, dim = x.shape
    nx = _rms(p["input_layernorm"], x, eps)
    qkv = _dense(p["query_key_value"], nx)
    # flat [q | k(all groups) | v(all groups)] split (ref :637-653)
    nq, nkv = num_heads * head_dim, num_groups * head_dim
    q = qkv[..., :nq].reshape(b, s, num_heads, head_dim)
    k = qkv[..., nq:nq + nkv].reshape(b, s, num_groups, head_dim)
    v = qkv[..., nq + nkv:].reshape(b, s, num_groups, head_dim)
    q = _apply_rotary(q, cos, sin)
    k = _apply_rotary(k, cos, sin)
    per = num_heads // num_groups
    if per > 1:  # expand() semantics (ref :681-698): group-major broadcast
        k = jnp.repeat(k, per, axis=2)
        v = jnp.repeat(v, per, axis=2)
    logits = jnp.einsum("bsnd,bknd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (head_dim ** -0.5)
    probs = jax.nn.softmax(logits + add_mask, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnsk,bknd->bsnd", probs, v).reshape(b, s, dim)
    x = x + _dense(p["dense"], o)

    nx = _rms(p["post_attention_layernorm"], x, eps)
    h = _dense(p["dense_h_to_4h"], nx)
    h1, h2 = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(h1.astype(jnp.float32)).astype(x.dtype) * h2
    return x + _dense(p["dense_4h_to_h"], h)


def chatglm_encode(params: Params, input_ids, attention_mask=None,
                   position_ids=None, num_heads=32, num_groups=2,
                   kv_channels=128, eps=1e-5, dtype=jnp.float32):
    """ChatGLMModel.forward (ref :1044-1103) for text encoding.

    Returns (final_normed, hidden_states) where hidden_states stacks the
    num_layers+1 pre-final-norm states (ref GLMTransformer output_hidden_
    states :866-917): index 0 is the embedding, -1 the last block output.
    All (B, S, H)."""
    b, s = input_ids.shape
    x = params["word_embeddings"].astype(dtype)[input_ids]

    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(s), (b, s))
    # per-sample position lookup (ref :1084-1088); positions are < s by the
    # left-padded tokenizer layout, so a length-s cache always covers them
    cos_t, sin_t = chatglm_rope_cache(s, kv_channels)
    cos = jnp.asarray(cos_t)[position_ids]
    sin = jnp.asarray(sin_t)[position_ids]

    # combined causal+padding mask (ref get_masks :935-951): attend where
    # (causal AND key-valid) OR query-invalid (left padding)
    causal = jnp.arange(s)[:, None] >= jnp.arange(s)[None, :]
    if attention_mask is None:
        attend = jnp.broadcast_to(causal, (b, s, s))
    else:
        pad = attention_mask.astype(bool)
        attend = (causal[None] & pad[:, None, :]) | (~pad[:, :, None])
    add_mask = jnp.where(attend, 0.0, -jnp.inf).astype(jnp.float32)[:, None]

    head_dim = kv_channels

    def body(xc, p):
        y = _glm_block(p, xc, add_mask, cos, sin, num_heads, num_groups,
                       head_dim, eps)
        return y, y

    x_final, ys = jax.lax.scan(body, x, params["layers"])
    hidden_states = jnp.concatenate([x[None], ys], axis=0)
    final = _rms(params["final_layernorm"], x_final, eps)
    return final, hidden_states


def kolors_encode_prompt(params: Params, input_ids, attention_mask=None,
                         position_ids=None, clip_skip_2=2, **kw):
    """KolorsPrompter.encode_prompt (ref kolors_prompter.py:321-354):
    (pooled_prompt_emb (B,H), prompt_emb (B,S,H))."""
    _, hs = chatglm_encode(params, input_ids, attention_mask, position_ids,
                           **kw)
    prompt_emb = hs[-clip_skip_2]
    pooled = hs[-1][:, -1]
    return pooled, prompt_emb


def kolors_tokenize(texts, tokenizer, max_length=256):
    """ChatGLMTokenizer framing (ref kolors_prompter.py:94-303): prefix
    tokens [gMASK] sop, LEFT padding with <unk>, position_ids zero over the
    pad. `tokenizer` is a kolors SPTokenizer-like object exposing
    encode(str) -> ids and special token ids via a dict."""
    if isinstance(texts, str):
        texts = [texts]
    gmask, sop, pad_id = (tokenizer.special_tokens["[gMASK]"],
                          tokenizer.special_tokens["sop"],
                          tokenizer.pad_id)
    ids, mask, pos = [], [], []
    for text in texts:
        toks = [gmask, sop] + list(tokenizer.encode(text))
        toks = toks[:max_length]
        d = max_length - len(toks)
        ids.append([pad_id] * d + toks)
        mask.append([0] * d + [1] * len(toks))
        pos.append([0] * d + list(range(len(toks))))
    return (np.asarray(ids, np.int32), np.asarray(mask, np.int32),
            np.asarray(pos, np.int32))


def chatglm_params_from_torch(sd: dict) -> Params:
    def layer(i):
        pre = f"encoder.layers.{i}"
        return {
            "input_layernorm": {
                "w": jnp.asarray(_t(sd[f"{pre}.input_layernorm.weight"]))},
            "post_attention_layernorm": {
                "w": jnp.asarray(
                    _t(sd[f"{pre}.post_attention_layernorm.weight"]))},
            "query_key_value": _lin_from(
                sd, f"{pre}.self_attention.query_key_value"),
            "dense": _lin_from(sd, f"{pre}.self_attention.dense"),
            "dense_h_to_4h": _lin_from(sd, f"{pre}.mlp.dense_h_to_4h"),
            "dense_4h_to_h": _lin_from(sd, f"{pre}.mlp.dense_4h_to_h"),
        }

    n = 0
    while f"encoder.layers.{n}.input_layernorm.weight" in sd:
        n += 1
    return {
        "word_embeddings": jnp.asarray(
            _t(sd["embedding.word_embeddings.weight"])),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[layer(i) for i in range(n)]),
        "final_layernorm": {
            "w": jnp.asarray(_t(sd["encoder.final_layernorm.weight"]))},
    }
