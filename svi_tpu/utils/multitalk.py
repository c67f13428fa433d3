"""Multi-speaker (MultiTalk) utilities, TPU-native.

Behavioral reference: diffsynth/utils/multitalk_utils.py —
  * reference-attention maps (:79-143): per-token affinity of video tokens to
    each speaker's face region in the first frame, computed from the
    self-attention q/k;
  * 1-D RoPE with speaker class labels (:146-190), used by
    SingleStreamMutiAttention (diffsynth/models/attention.py:373-446) to bind
    each video token's audio attention to the speaker it belongs to;
  * adaptive projected guidance (:315-354): CFG update decomposition into
    components parallel/orthogonal to the conditional prediction;
  * SP token/frame split helper (:48-65).

The SVI pipelines themselves always run the single-speaker shortcut
(wan_video_dit.py:365 hardcodes human_num=1) — these are the inherited
MultiTalk capabilities, implemented for full component parity and exposed via
wan_dit.single_stream_multi_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def split_token_counts_and_frame_ids(T: int, token_frame: int, world_size: int, rank: int):
    """Sequence-parallel split bookkeeping (ref :48-65): token counts per
    frame and the frame ids present in `rank`'s contiguous token slice."""
    S = T * token_frame
    split_sizes = [S // world_size + (1 if i < S % world_size else 0) for i in range(world_size)]
    start = sum(split_sizes[:rank])
    end = start + split_sizes[rank]
    counts = [0] * T
    for idx in range(start, end):
        counts[idx // token_frame] += 1
    counts_filtered, frame_ids = [], []
    for t, c in enumerate(counts):
        if c > 0:
            counts_filtered.append(c)
            frame_ids.append(t)
    return counts_filtered, frame_ids


def normalize_and_scale(column, source_range, target_range, epsilon=1e-8):
    """Affine rescale of `column` from source_range to target_range (ref :68-75)."""
    source_min, source_max = source_range
    new_min, new_max = target_range
    normalized = (column - source_min) / (source_max - source_min + epsilon)
    return normalized * (new_max - new_min) + new_min


def calculate_x_ref_attn_map(visual_q, ref_k, ref_target_masks, mode="mean"):
    """Per-class reference attention map (ref :79-116).

    visual_q: (B, S, H, D); ref_k: (B, S_ref, H, D);
    ref_target_masks: (C, S_ref) 0/1 face-region masks.
    Returns (C*B, S) — the mean (over ref tokens in the mask, then heads)
    softmax attention of each video token onto each speaker's region.
    """
    scale = 1.0 / visual_q.shape[-1] ** 0.5
    q = (visual_q.astype(jnp.float32) * scale).transpose(0, 2, 1, 3)  # B H S D
    k = ref_k.astype(jnp.float32).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhsd,bhrd->bhsr", q, k)
    probs = jax.nn.softmax(attn, axis=-1)  # B H S R
    masks = ref_target_masks.astype(jnp.float32)  # C R
    # sum over masked ref tokens / mask size -> (C, B, H, S)
    per_class = jnp.einsum("bhsr,cr->cbhs", probs, masks) / jnp.sum(
        masks, axis=-1
    )[:, None, None, None]
    if mode == "mean":
        out = per_class.mean(axis=2)  # C B S
    elif mode == "max":
        out = per_class.max(axis=2)
    else:
        raise ValueError(mode)
    c, b, s = out.shape
    return out.reshape(c * b, s)


def get_attn_map_with_target(visual_q, ref_k, grid, ref_target_masks, split_num=2):
    """Ref :119-143: the reference splits heads into `split_num` chunks purely
    to bound CUDA memory, then averages — mathematically the plain mean over
    heads, which is what we compute (XLA fuses the full einsum)."""
    f, h, w = grid
    x_seqlens = h * w
    return calculate_x_ref_attn_map(visual_q, ref_k[:, :x_seqlens], ref_target_masks)


def rope_1d(x: jax.Array, pos: jax.Array, theta: float = 10000.0) -> jax.Array:
    """1-D rotary embedding (ref RotaryPositionalEmbedding1D :153-190).

    x: (B, H, S, D); pos: (S,) float positions (possibly fractional class
    labels). Interleaved-pair rotation with the angle duplicated per pair
    (freqs repeated '... n -> ... (n r)').
    """
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2)[: d // 2].astype(jnp.float32) / d))
    ang = pos.astype(jnp.float32)[:, None] * freqs[None, :]  # (S, D/2)
    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)[None, None]  # (1,1,S,D)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)[None, None]
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], d // 2, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cos + rot * sin).astype(x.dtype)


class MomentumBuffer:
    """Running CFG-difference average (ref :315-322)."""

    def __init__(self, momentum: float):
        self.momentum = momentum
        self.running_average = 0

    def update(self, update_value):
        self.running_average = update_value + self.momentum * self.running_average


def project(v0: jax.Array, v1: jax.Array):
    """Split v0 into components parallel/orthogonal to v1 over (C,T,H,W)
    (ref :324-333). The reference computes in float64; TPUs have no f64
    datapath, so this runs in f32 — the guidance decomposition is insensitive
    at that precision (parity-tested to 1e-5)."""
    dtype = v0.dtype
    v0d = v0.astype(jnp.float32)
    v1d = v1.astype(jnp.float32)
    axes = tuple(range(v1d.ndim - 4, v1d.ndim))
    v1n = v1d / jnp.maximum(jnp.sqrt(jnp.sum(v1d * v1d, axis=axes, keepdims=True)), 1e-12)
    v0_parallel = jnp.sum(v0d * v1n, axis=axes, keepdims=True) * v1n
    v0_orthogonal = v0d - v0_parallel
    return v0_parallel.astype(dtype), v0_orthogonal.astype(dtype)


def adaptive_projected_guidance(
    diff: jax.Array,
    pred_cond: jax.Array,
    momentum_buffer: MomentumBuffer | None = None,
    eta: float = 0.0,
    norm_threshold: float = 55.0,
):
    """APG (ref :336-354): rescale the CFG difference to a norm budget, then
    keep only its component orthogonal to the conditional prediction (plus
    eta of the parallel one)."""
    if momentum_buffer is not None:
        momentum_buffer.update(diff)
        diff = momentum_buffer.running_average
    if norm_threshold > 0:
        axes = tuple(range(diff.ndim - 4, diff.ndim))
        diff_norm = jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2, axis=axes, keepdims=True))
        scale_factor = jnp.minimum(1.0, norm_threshold / jnp.maximum(diff_norm, 1e-12))
        diff = diff * scale_factor.astype(diff.dtype)
    diff_parallel, diff_orthogonal = project(diff, pred_cond)
    return diff_orthogonal + eta * diff_parallel
