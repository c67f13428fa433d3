"""3D rotary position embeddings for video DiT tokens.

Behavioral reference: diffsynth/models/wan_video_dit.py:154-183
(sinusoidal_embedding_1d, precompute_freqs_cis{,_3d}, rope_apply).

The reference stores complex64 tables built in float64 and rotates interleaved
(even, odd) pairs via complex multiply. Here we precompute per-axis angle
tables in float64 on host (numpy), materialize per-grid cos/sin in float32,
and rotate pairs with real arithmetic — TPU-friendly (no complex dtype) and
fusable by XLA into the surrounding attention projections.

Pair layout matches the reference exactly: head_dim D is split into
(D - 2*(D//3), D//3, D//3) real dims for the (frame, height, width) axes, and
within each axis the rotation applies to adjacent pairs (x[2i], x[2i+1]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _axis_angles(dim: int, end: int, theta: float) -> np.ndarray:
    """Angle table for one axis: (end, dim//2) float64.

    Matches precompute_freqs_cis (wan_video_dit.py:169-175): freqs computed on
    even indices 0,2,..,dim-2 scaled by 1/dim.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    return np.outer(np.arange(end, dtype=np.float64), freqs)


@functools.lru_cache(maxsize=8)
def _angles_3d(head_dim: int, end: int, theta: float):
    f_dim = head_dim - 2 * (head_dim // 3)
    hw_dim = head_dim // 3
    return (
        _axis_angles(f_dim, end, theta),
        _axis_angles(hw_dim, end, theta),
        _axis_angles(hw_dim, end, theta),
    )


@functools.lru_cache(maxsize=32)
def rope_angles_for_grid(
    grid: tuple[int, int, int], head_dim: int, end: int = 1024, theta: float = 10000.0
):
    """cos/sin tables for a (f, h, w) token grid.

    Returns (cos, sin), each (f*h*w, head_dim//2) float32, row-major over
    (f, h, w) exactly like the reference's freqs assembly
    (wan_video_dit.py:527-531).
    """
    f, h, w = grid
    fa, ha, wa = _angles_3d(head_dim, end, theta)
    ang = np.concatenate(
        [
            np.broadcast_to(fa[:f, None, None, :], (f, h, w, fa.shape[1])),
            np.broadcast_to(ha[None, :h, None, :], (f, h, w, ha.shape[1])),
            np.broadcast_to(wa[None, None, :w, :], (f, h, w, wa.shape[1])),
        ],
        axis=-1,
    ).reshape(f * h * w, head_dim // 2)
    # numpy outputs: this function is lru_cached and may be called inside a
    # trace — caching traced jnp constants would leak tracers across traces.
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs. x: (B, S, N, D); cos/sin: (S, D//2).

    Equivalent to rope_apply (wan_video_dit.py:178-183) with complex multiply
    (a+ib)(cosθ+isinθ). Computation in float32, result cast back to x.dtype.
    """
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    si = sin[None, :, None, :]
    or_ = xr * c - xi * si
    oi = xr * si + xi * c
    out = jnp.stack([or_, oi], axis=-1).reshape(b, s, n, d)
    return out.astype(x.dtype)


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """Time-step embedding (ref: wan_video_dit.py:154-158): [cos | sin] halves."""
    pos = position.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.power(jnp.float32(10000.0), -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)
