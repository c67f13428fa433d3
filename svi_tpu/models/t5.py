"""umT5-XXL text encoder (Wan's T5), TPU-native.

Behavioral reference: diffsynth/models/wan_video_text_encoder.py
(WanTextEncoder :209, T5SelfAttention :113, T5Attention :38,
T5RelativeEmbedding :147, T5FeedForward :92, T5LayerNorm :22).

Wan's config: vocab 256384, dim 4096, ffn 10240, 64 heads, 24 layers,
32 relative-position buckets, per-layer (non-shared) position embeddings,
NO attention scaling (ref :80-82), gated tanh-GELU FFN.

Per-block parameters are stacked and run under one `lax.scan`; the relative
position bucket matrix is a compile-time constant per sequence length, so each
layer's bias is a single embedding gather.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import t5_layer_norm

Params = dict


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim_attn // self.num_heads


UMT5_XXL = T5Config()


@functools.lru_cache(maxsize=8)
def relative_position_buckets(seq_len: int, num_buckets: int = 32, max_dist: int = 128):
    """Bidirectional T5 bucket matrix (ref :171-190), (L, L) int32 numpy."""
    rel_pos = np.arange(seq_len)[None, :] - np.arange(seq_len)[:, None]
    nb = num_buckets // 2
    rel_buckets = (rel_pos > 0).astype(np.int64) * nb
    rel_pos = np.abs(rel_pos)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        rel_large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact) / math.log(max_dist / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    rel_buckets += np.where(rel_pos < max_exact, rel_pos, rel_large)
    # return numpy: this function is lru_cached and may be called inside a
    # trace — caching a traced jnp constant would leak tracers across traces.
    return rel_buckets.astype(np.int32)


def _gelu_erfless(x):
    """The reference's hand-rolled tanh GELU (text_encoder.py:15-19)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def _block(p: Params, cfg: T5Config, x: jax.Array, bias: jax.Array) -> jax.Array:
    """One T5SelfAttention block (ref :139-144). bias: (1, H, L, L) f32
    (relative position bias + attention mask, already combined)."""
    b, L, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim

    # pos bias for this layer: per-block embedding (ref :136-137, :159-169)
    pos = p["pos_embedding"]["table"]  # (num_buckets, heads) — gathered outside? no:
    # bias passed in is mask-only; add per-layer relative bias here
    y = t5_layer_norm(x, p["norm1"]["w"])
    q = (y @ p["attn"]["q"].astype(y.dtype)).reshape(b, L, n, hd)
    k = (y @ p["attn"]["k"].astype(y.dtype)).reshape(b, L, n, hd)
    v = (y @ p["attn"]["v"].astype(y.dtype)).reshape(b, L, n, hd)
    # NO scaling (ref :80-82); softmax in f32
    logits = jnp.einsum("bind,bjnd->bnij", q, k, preferred_element_type=jnp.float32)
    buckets = relative_position_buckets(L, cfg.num_buckets, cfg.max_dist)
    rel = pos[buckets]  # (L, L, heads) f32
    logits = logits + jnp.transpose(rel, (2, 0, 1))[None].astype(jnp.float32) + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bnij,bjnd->bind", probs, v).reshape(b, L, n * hd)
    x = x + attn @ p["attn"]["o"].astype(attn.dtype)

    y = t5_layer_norm(x, p["norm2"]["w"])
    gate = _gelu_erfless(y @ p["ffn"]["gate"].astype(y.dtype))
    h = (y @ p["ffn"]["fc1"].astype(y.dtype)) * gate
    x = x + h @ p["ffn"]["fc2"].astype(h.dtype)
    return x


def forward(params: Params, cfg: T5Config, ids: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """ids: (b, L) int32; mask: (b, L) 1/0. Returns (b, L, dim) states
    (ref WanTextEncoder.forward :245-254)."""
    x = params["token_embedding"][ids].astype(cfg.dtype)
    b, L = ids.shape
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :] == 0, jnp.float32(-3.4e38 * 0.7), 0.0)
    else:
        bias = jnp.zeros((b, 1, 1, L), jnp.float32)

    def body(x, block_params):
        return _block(block_params, cfg, x, bias), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(x, params["norm"]["w"])


def encode_prompt_states(params, cfg, ids, mask) -> jax.Array:
    """WanPrompter.encode_prompt semantics (wan_prompter.py:99-109): run the
    encoder, then zero embeddings past each sequence's true length."""
    emb = forward(params, cfg, ids, mask)
    seq_lens = jnp.sum((mask > 0).astype(jnp.int32), axis=1)  # (b,)
    pos = jnp.arange(ids.shape[1])[None, :, None]
    return jnp.where(pos < seq_lens[:, None, None], emb, 0)


# ---------------------------------------------------------------------------
# Init / torch ingestion
# ---------------------------------------------------------------------------


def init_params(key, cfg: T5Config) -> Params:
    """Same init distributions as the reference (text_encoder.py:192-206)."""
    keys = jax.random.split(key, 8)
    dt = cfg.dtype

    def block_init(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), dt)},
            "norm2": {"w": jnp.ones((cfg.dim,), dt)},
            "attn": {
                "q": (jax.random.normal(ks[0], (cfg.dim, cfg.dim_attn)) * (cfg.dim * cfg.dim_attn) ** -0.5).astype(dt),
                "k": (jax.random.normal(ks[1], (cfg.dim, cfg.dim_attn)) * cfg.dim**-0.5).astype(dt),
                "v": (jax.random.normal(ks[2], (cfg.dim, cfg.dim_attn)) * cfg.dim**-0.5).astype(dt),
                "o": (jax.random.normal(ks[3], (cfg.dim_attn, cfg.dim)) * (cfg.num_heads * cfg.dim_attn) ** -0.5).astype(dt),
            },
            "ffn": {
                "gate": (jax.random.normal(ks[4], (cfg.dim, cfg.dim_ffn)) * cfg.dim**-0.5).astype(dt),
                "fc1": (jax.random.normal(ks[5], (cfg.dim, cfg.dim_ffn)) * cfg.dim**-0.5).astype(dt),
                "fc2": (jax.random.normal(ks[6], (cfg.dim_ffn, cfg.dim)) * cfg.dim_ffn**-0.5).astype(dt),
            },
            "pos_embedding": {
                "table": (jax.random.normal(ks[7], (cfg.num_buckets, cfg.num_heads))
                          * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5).astype(jnp.float32)
            },
        }

    return {
        "token_embedding": (jax.random.normal(keys[0], (cfg.vocab, cfg.dim))).astype(dt),
        "blocks": jax.vmap(block_init)(jax.random.split(keys[1], cfg.num_layers)),
        "norm": {"w": jnp.ones((cfg.dim,), dt)},
    }


def config_from_state_dict(sd, dtype=jnp.bfloat16) -> T5Config:
    """Infer T5 architecture from checkpoint tensor shapes."""
    vocab, dim = sd["token_embedding.weight"].shape
    num_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.") and k.split(".")[1].isdigit()
    )
    dim_attn = sd["blocks.0.attn.q.weight"].shape[0]
    dim_ffn = sd["blocks.0.ffn.fc1.weight"].shape[0]
    num_buckets, num_heads = sd["blocks.0.pos_embedding.embedding.weight"].shape
    return T5Config(
        vocab=int(vocab), dim=int(dim), dim_attn=int(dim_attn), dim_ffn=int(dim_ffn),
        num_heads=int(num_heads), num_layers=int(num_layers), num_buckets=int(num_buckets),
        dtype=dtype,
    )


def _t(arr):
    if hasattr(arr, "detach"):
        arr = arr.detach().to("cpu")
        if str(arr.dtype) == "torch.bfloat16":
            arr = arr.float()
        arr = arr.numpy()
    return np.asarray(arr)


def params_from_torch_state_dict(sd: dict, cfg: T5Config) -> Params:
    dt = cfg.dtype

    def lin(name):
        return jnp.asarray(_t(sd[name]).T, dt)

    def block(i):
        b = f"blocks.{i}"
        return {
            "norm1": {"w": jnp.asarray(_t(sd[f"{b}.norm1.weight"]), dt)},
            "norm2": {"w": jnp.asarray(_t(sd[f"{b}.norm2.weight"]), dt)},
            "attn": {
                "q": lin(f"{b}.attn.q.weight"),
                "k": lin(f"{b}.attn.k.weight"),
                "v": lin(f"{b}.attn.v.weight"),
                "o": lin(f"{b}.attn.o.weight"),
            },
            "ffn": {
                "gate": lin(f"{b}.ffn.gate.0.weight"),
                "fc1": lin(f"{b}.ffn.fc1.weight"),
                "fc2": lin(f"{b}.ffn.fc2.weight"),
            },
            "pos_embedding": {
                "table": jnp.asarray(_t(sd[f"{b}.pos_embedding.embedding.weight"]), jnp.float32)
            },
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": jnp.asarray(_t(sd["token_embedding.weight"]), dt),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.asarray(_t(sd["norm.weight"]), dt)},
    }
