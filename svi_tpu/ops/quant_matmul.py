"""Int4 unpack/requantization Pallas kernel for the W4A8 linear path.

Measured context (v5e, M=32k K=N=5120, bf16 x): XLA already runs the
W8A8 dynamic-activation int8 matmul well — 7.6 ms (226 TF/s-equiv) vs
10.7 ms for the bf16 matmul. What XLA does badly is the int4 nibble
unpack + per-channel requantization feeding that matmul: as XLA ops it
costs ~9 ms of relayout traffic (the whole W4A8 linear lands at 13-16 ms,
i.e. SLOWER than bf16). Fully-fused Pallas quant-matmuls were tried and
measured slower than XLA's own int8 matmul (8.9 vs 7.6 ms) — XLA's MXU
scheduling wins once operands are int8 — so the production shape is:

    w8 = unpack_requant_int4(w_packed, r)   # this kernel, ~copy roofline
    y  = XLA dynamic-act int8 matmul (wan_dit._dense W8A8 math)

Packing layout (wan_dit._quantize_leaf_int4): HALF-SPLIT — packed byte i
holds unpacked rows (i, i + K/2) as (low, high) nibbles, so each output
half is a contiguous nibble extract with no row interleave.

`r` is the per-group requantization ratio scale_g/smax_c * 127/7
(wan_dit._w4a8_leaves); output int8 values live on the per-channel s8 grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_kernel(w_ref, r_ref, o_ref, *, rows_per_block):
    h = pl.program_id(0)   # 0: low nibbles (rows [0, K/2)), 1: high
    # Mosaic has no i8 vector shifts — extract nibbles in i32
    wp = w_ref[:].astype(jnp.int32)
    w4 = jnp.where(
        h == 0,
        jnp.right_shift(jnp.left_shift(wp, 28), 28),  # sign-extended low
        jnp.right_shift(wp, 4),  # arithmetic shift of the sign-extended byte
    )
    # r arrives pre-blocked (1, rows_per_block, bn) via its BlockSpec —
    # Mosaic can't dynamically slice the sublane dim at non-8-multiples,
    # so the group ratios are 3D-reshaped outside and block-indexed here
    r = r_ref[0]
    g = w4.shape[0] // rows_per_block
    w = (w4.reshape(rows_per_block, g, -1).astype(jnp.float32)
         * r[:, None, :])
    o_ref[:] = jnp.clip(jnp.round(w), -127, 127).astype(jnp.int8).reshape(
        w4.shape)


def _pick(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def unpack_requant_int4(w_packed, r, interpret: bool = False):
    """(K//2, N) half-split-packed int4 + (K//128, N) f32 ratios ->
    (K, N) int8 on the per-channel s8 grid (multiply the int32 matmul
    result by s8 afterwards)."""
    Kh, N = w_packed.shape
    bk = _pick(Kh, (1024, 512, 256, 128))
    bn = _pick(N, (512, 256, 128))
    if bk is None or bn is None:
        raise ValueError(f"K={2 * Kh}/N={N} not tileable for unpack_requant")
    rpb = bk // 128  # r rows per block
    steps = Kh // bk
    r3 = r.reshape(2 * steps, rpb, N)
    return pl.pallas_call(
        functools.partial(_unpack_kernel, rows_per_block=rpb),
        grid=(2, steps, N // bn),
        in_specs=[
            pl.BlockSpec((bk, bn), lambda h, k, j: (k, j)),
            pl.BlockSpec((1, rpb, bn), lambda h, k, j: (h * steps + k, 0, j)),
        ],
        out_specs=pl.BlockSpec((bk, bn), lambda h, k, j: (h * steps + k, j)),
        out_shape=jax.ShapeDtypeStruct((2 * Kh, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(w_packed, r3)


def supports_unpack_requant(w_packed, r) -> bool:
    Kh, N = w_packed.shape[-2], w_packed.shape[-1]
    return (w_packed.ndim == 2 and Kh % 128 == 0
            and _pick(N, (512, 256, 128)) is not None
            and r.shape[-2] * 128 == 2 * Kh)
