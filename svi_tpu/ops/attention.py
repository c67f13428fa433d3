"""Fused flash attention for TPU (Pallas) with a chunked XLA fallback.

This is the TPU-native replacement for the reference's flash-attn/SageAttention
/xformers dispatch (diffsynth/models/wan_video_dit.py:116-147 and
diffsynth/models/attention.py:233-279). Full bidirectional attention (the Wan
DiT is non-causal); padded key positions are masked via a `kv_len` scalar so
callers can pad sequence lengths up to block multiples without changing
results.

Design notes (measured on TPU v5e at the SVI shape b2 n12 s32760 d128):

  * FLAT LAYOUT: the kernel reads Q/K/V in their natural projection layout
    (B, S, N·D) with each head addressed as a 128-lane block — the
    (B,S,N,D)->(B,N,S,D) relayouts of the classic layout cost ~4.4 ms per
    tensor per layer at this shape and are gone entirely.
  * exp2 softmax: log2(e) is folded into the Q scale and the online softmax
    runs on exp2 (the VPU's native exponent path) — ~3% kernel time.
  * optional FUSED 3D-RoPE: cos/sin tables stream into VMEM alongside K/Q
    blocks and the interleaved pair rotation happens in-register (two lane
    rolls + parity select; mosaic has no rev/strided-slice), removing the
    separate XLA rope pass (~6.5 ms/tensor/layer) and its HBM round trip.

API: `flash_attention(q, k, v, kv_len=None, scale=None)` with tensors in
(B, S, N, D) layout ("b s n d"), matching the reference's flash-attn call
convention; `flash_attention_rope(q, k, v, cos, sin, ...)` additionally
applies interleaved-pair RoPE to q/k inside the kernel. Softmax statistics
are kept in float32; the matmuls run on the MXU with float32 accumulation.

Both ops are differentiable: forward is the Pallas kernel on TPU (or a
lax.scan-chunked XLA implementation elsewhere); backward recomputes attention
blockwise from the saved logsumexp (flash-attention backward), so memory stays
O(S·D) instead of O(S²). The RoPE rotation is orthogonal, so its backward is
the inverse rotation (cos, -sin) applied to dq/dk — exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Pallas forward kernel — flat (B, S, N*D) layout, exp2 softmax, optional rope
# ---------------------------------------------------------------------------


def _rope_in_kernel(x, cosE, sinE, head_dim):
    """Interleaved pair rotation on a (rows, head_dim) f32 block.

    cosE/sinE are pair-expanded full-width tables (rows, head_dim) with the
    alternating pair-swap sign baked into sinE: out = x*cosE + swap_pairs(x)*
    sinE, where swap_pairs([a,b,...]) = [b,a,...]. swap_pairs is two circular
    lane rolls + a parity select (mosaic lowers no rev / strided lane slice).
    """
    rl = pltpu.roll(x, head_dim - 1, 1)  # rl[l] = x[l+1] (circular)
    rr = pltpu.roll(x, 1, 1)  # rr[l] = x[l-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xs = jnp.where(lane % 2 == 0, rl, rr)
    return x * cosE + xs * sinE


def _fwd_kernel_flat(
    kv_len_ref, q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
    o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, block_k, masked, fuse_rope, head_dim, nsub,
):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if fuse_rope:
        q = _rope_in_kernel(q, cq_ref[:], sq_ref[:], head_dim)
        k = _rope_in_kernel(k, ck_ref[:], sk_ref[:], head_dim)
    # exp2 softmax: fold log2(e) into the scale, use the VPU's native exp2
    q = q * (scale * _LOG2E)
    if masked:
        kv_len = kv_len_ref[0]

    # DECOUPLED SUB-BLOCKS (measured +13% at the SVI 14B shape, 150->170
    # TF/s of the 194.5 TF/s matmul-only roof for this blocking): the k
    # block is processed as `nsub` independent online-softmax steps whose QK
    # matmuls are ALL issued before any softmax math, and whose exp2 for
    # sub-block t depends only on s_t — so the VPU's softmax of sub-block t
    # overlaps the MXU computing s_{t+1} / pv_{t-1}. A COUPLED split (one
    # max over the whole block) measures ~14% slower because exp2 of the
    # first half then waits on the last half's matmul.
    h = block_k // nsub
    ss = [
        jax.lax.dot_general(q, k[t * h:(t + 1) * h], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for t in range(nsub)
    ]

    first = j == 0
    m = m_scr[:, :1]  # (bq, 1)
    l = l_scr[:, :1]
    acc = acc_scr[:]
    for t in range(nsub):
        m_t = jnp.maximum(m, jnp.max(ss[t], axis=-1, keepdims=True))
        if masked:
            # Mask padded keys by folding a (1, h) row penalty INTO the exp
            # input (fuses with the m subtraction — no extra VPU pass,
            # bit-identical output). The max is taken over UNMASKED s, which
            # is a valid upper bound: it cancels in out = acc/l, and
            # lse = m + log(l) is m-independent too.
            col = (j * block_k + t * h
                   + jax.lax.broadcasted_iota(jnp.int32, (1, h), 1))
            penalty = jnp.where(col < kv_len, 0.0, _NEG_INF).astype(jnp.float32)
            p_t = jnp.exp2(ss[t] - m_t + penalty)
        else:
            p_t = jnp.exp2(ss[t] - m_t)
        alpha_t = jnp.exp2(m - m_t)
        l = alpha_t * l + jnp.sum(p_t, axis=-1, keepdims=True)
        pv_t = jax.lax.dot_general(
            p_t.astype(v_ref.dtype), v_ref[0, t * h:(t + 1) * h],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if t == 0:
            # scr is uninitialized at j == 0; the where discards it exactly
            acc = jnp.where(first, 0.0, acc * alpha_t) + pv_t
        else:
            acc = acc * alpha_t + pv_t
        m = m_t
    acc_scr[:] = acc
    m_scr[:, :1] = m
    l_scr[:, :1] = l

    @pl.when(j == nk - 1)
    def _():
        lf = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(lf, 1e-30)).astype(o_ref.dtype)
        # lse in base-e for the XLA backward: m/log2e + log(l)
        lse_ref[0, 0] = m_scr[:, :1] / _LOG2E + jnp.log(jnp.maximum(lf, 1e-30))


def _flash_fwd_pallas_flat(
    q, k, v, cosE, sinE, kv_len, scale, block_q, block_k, head_dim, fuse_rope,
    nsub=1,
):
    """q,k,v: (B, S, N*D) flat, padded to block multiples. cosE/sinE:
    pair-expanded (S_pad, head_dim) f32 tables (ignored unless fuse_rope).
    nsub: decoupled sub-block count (see _fwd_kernel_flat).
    Returns (out flat, lse (B, N, Sq, 1))."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim
    nq, nk = sq // block_q, sk // block_k
    grid = (b, n, nq, nk)
    masked = True if isinstance(kv_len, jax.Array) else kv_len < sk
    kv_len_arr = jnp.asarray(kv_len, dtype=jnp.int32).reshape(1)

    if fuse_rope:
        q_tab_spec = pl.BlockSpec((block_q, head_dim), lambda b_, n_, i, j, *r: (i, 0))
        k_tab_spec = pl.BlockSpec((block_k, head_dim), lambda b_, n_, i, j, *r: (j, 0))
    else:
        # unused dummy tables: one tiny pinned block, never read by the kernel
        q_tab_spec = k_tab_spec = pl.BlockSpec(
            (8, head_dim), lambda b_, n_, i, j, *r: (0, 0)
        )
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_flat, scale=scale, block_k=block_k, masked=masked,
            fuse_rope=fuse_rope, head_dim=head_dim, nsub=nsub,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j, *r: (b_, i, n_)),
                pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, i, j, *r: (b_, j, n_)),
                pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, i, j, *r: (b_, j, n_)),
                q_tab_spec,
                q_tab_spec,
                k_tab_spec,
                k_tab_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j, *r: (b_, i, n_)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b_, n_, i, j, *r: (b_, n_, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, nd), q.dtype),
            jax.ShapeDtypeStruct((b, n, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # blocks + f32 rope tables + double buffering + the (bq, bk) f32
            # score tiles of the sub-block pipeline peak well over the 16MB
            # default scoped-vmem budget; the v5e has 128MB of physical VMEM
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(kv_len_arr, q, k, v, cosE, sinE, cosE, sinE)
    return out, lse[..., 0]


def _expand_rope_tables(cos, sin, head_dim, pad_to):
    """(S, D/2) pair tables -> (pad_to, D) expanded tables for the kernel.

    cosE[:, 2i] = cosE[:, 2i+1] = cos_i; sinE[:, 2i] = -sin_i,
    sinE[:, 2i+1] = +sin_i (pair-swap sign baked in)."""
    cos = jnp.asarray(cos, jnp.float32)
    sin = jnp.asarray(sin, jnp.float32)
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), head_dim // 2)
    cosE = jnp.repeat(cos, 2, axis=-1)
    sinE = jnp.repeat(sin, 2, axis=-1) * sign
    s = cos.shape[0]
    if pad_to != s:
        cosE = jnp.pad(cosE, ((0, pad_to - s), (0, 0)), constant_values=1.0)
        sinE = jnp.pad(sinE, ((0, pad_to - s), (0, 0)))
    return cosE, sinE


# ---------------------------------------------------------------------------
# Quantized forward kernel (int8 QK on the int8 MXU, optional int8 PV)
#
# SageAttention-class scheme (arXiv 2410.02367) re-derived for the TPU:
#   * Q: per-token int8, roped and quantized at the XLA level. int8's native
#     tile is (32, 128) vs f32's (8, 128), so producing int8 INSIDE the
#     kernel forces a Mosaic relayout per grid step (measured: in-kernel q
#     quantization ran the whole kernel at 78 TF/s vs 177 bf16); quantizing
#     in XLA hands the kernel ready-tiled int8 operands. The per-token
#     scales ride along as a (b, n, sq, 1) array — the same lse layout the
#     forward already emits, and one Mosaic will block at (1, 1, bq, 1);
#   * K: pre-roped, mean-centered and int8-quantized at the XLA level with
#     ONE scale per (batch, head) — centering by any per-row-constant vector
#     leaves softmax(qk^T) exactly invariant (q·c is constant per row) while
#     shrinking the quantization range against K's channel outliers. Halves
#     K HBM traffic into the kernel as a side effect.
#   * P·V (mode "qk8pv8"): p is produced DIRECTLY in 127-scaled units by
#     folding log2(127) into the exp2 argument (zero extra VPU passes), then
#     rounded to int8; V is int8 with per-(batch, head, channel) scales. The
#     V scale is constant across k-blocks so it commutes with the whole
#     accumulation: the kernel emits out in v8 channel units and XLA applies
#     the (b, 1, n·d) scale as one fused multiply afterwards (Mosaic can't
#     block a (b, n, d) array at (1, 1, d) anyway). l accumulates the same
#     127-scaled p, so that scale cancels in out = acc / l.
#   * the int32 scores are rescaled by ONE per-row vector (q-scale · k-scale
#     · softmax scale · log2e), and the running max is taken on the int32
#     tile (scales are positive, so max commutes with the rescale).
#
# The exactness contract: softmax weights differ from the bf16 kernel only by
# int8 quantization noise; the saved lse corresponds to the CENTERED logits
# (off by q·mean·scale per row), so quant modes are inference-only — the
# training paths keep the bf16 kernel.
#
# MEASURED STATUS (v5e, jax 0.9.0 / libtpu 0.0.34, s=32760 n=40 d=128): the
# kernel is numerically excellent (max err ~5e-3 vs the bf16 kernel) but NOT
# faster — 80 TF/s vs the bf16 kernel's 177. Isolation experiments:
#   * swapping ONLY the QK dot to in-kernel bf16-dequant ran 147 TF/s, so
#     ~all of the loss is the int8 dot itself: Mosaic does not lower
#     int8xint8->int32 dot_general at the v5e's 394 TOP/s int8-MXU rate
#     (XLA-level int8 matmuls do hit 337-378 TOP/s, see ops/quant_matmul.py);
#   * a natural-layout variant (K pre-transposed, contraction (1,0)) hung
#     the remote Mosaic compile >27 min and was abandoned.
# Kept (tested, correct) as the ready path for a toolchain where Mosaic
# gains native int8-MXU dots; NOT wired into any default config — the bf16
# kernel at 90% of peak is the production path. See docs/PERFORMANCE.md
# "int8 attention" for the full writeup.
# ---------------------------------------------------------------------------

_LOG2_127 = 6.9886846867721655  # log2(127)


def _fwd_kernel_flat_q8(
    kv_len_ref, kscale_ref, q8_ref, qs_ref, k8_ref, v_ref,
    o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, block_k, masked, nsub, pv8,
):
    b_ = pl.program_id(0)
    n_ = pl.program_id(1)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q8 = q8_ref[0]  # (bq, head_dim) int8, roped+quantized in XLA
    qs = qs_ref[0, 0]  # (bq, 1) f32 per-token scales
    kscale = kscale_ref[b_, n_]
    c_row = qs * (kscale * scale * _LOG2E)  # (bq, 1), >= 0
    if masked:
        kv_len = kv_len_ref[0]

    h = block_k // nsub
    ss = [
        jax.lax.dot_general(q8, k8_ref[0, t * h:(t + 1) * h],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
        for t in range(nsub)
    ]
    first = j == 0
    m = m_scr[:, :1]
    l = l_scr[:, :1]
    acc = acc_scr[:]
    p_shift = _LOG2_127 if pv8 else 0.0
    for t in range(nsub):
        # max commutes with the positive per-row rescale: reduce on int32
        m_t = jnp.maximum(
            m, jnp.max(ss[t], axis=-1, keepdims=True).astype(jnp.float32) * c_row
        )
        sf = ss[t].astype(jnp.float32) * c_row
        if masked:
            col = (j * block_k + t * h
                   + jax.lax.broadcasted_iota(jnp.int32, (1, h), 1))
            penalty = jnp.where(col < kv_len, 0.0, _NEG_INF).astype(jnp.float32)
            p_t = jnp.exp2(sf - m_t + (penalty + p_shift))
        else:
            p_t = jnp.exp2(sf - m_t + p_shift)
        alpha_t = jnp.exp2(m - m_t)
        if pv8:
            pq = jnp.round(p_t).astype(jnp.int8)  # p in [0, 127] by the shift
            pv_t = jax.lax.dot_general(
                pq, v_ref[0, t * h:(t + 1) * h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # v8 channel units; XLA scales afterwards
        else:
            pv_t = jax.lax.dot_general(
                p_t.astype(v_ref.dtype), v_ref[0, t * h:(t + 1) * h],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
        # l accumulates the SAME 127-scaled p as the numerator: cancels in o
        l = alpha_t * l + jnp.sum(p_t, axis=-1, keepdims=True)
        if t == 0:
            acc = jnp.where(first, 0.0, acc * alpha_t) + pv_t
        else:
            acc = acc * alpha_t + pv_t
        m = m_t
    acc_scr[:] = acc
    m_scr[:, :1] = m
    l_scr[:, :1] = l

    @pl.when(j == nk - 1)
    def _():
        lf = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(lf, 1e-30)).astype(o_ref.dtype)
        # lse of the CENTERED logits; the 127 shift backs out of log(l)
        lse_ref[0, 0] = (m_scr[:, :1] / _LOG2E
                         + jnp.log(jnp.maximum(lf, 1e-30))
                         - (p_shift / _LOG2E))


def _quant_prep_xla(q, k, v, cos, sin, use_rope, head_dim, pv8):
    """XLA-side prep for the quantized kernel: rope Q and K (once, instead of
    per-q-block in-kernel), quantize Q per token (scales returned in the
    (b, n, sq, 1) layout Mosaic can block at (1, 1, bq, 1)), center K per
    (batch, head, channel) over tokens (softmax-invariant) and quantize it
    with one scale per (batch, head); with pv8, quantize V per
    (batch, head, channel). Quantizing out here hands the kernel ready-tiled
    int8 operands — int8's (32, 128) native tile makes in-kernel f32->int8
    conversion a per-step Mosaic relayout."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim
    q4 = q.reshape(b, sq, n, head_dim)
    k4 = k.reshape(b, sk, n, head_dim)
    if use_rope:
        q4 = _apply_rope_xla(q4, cos, sin)
        k4 = _apply_rope_xla(k4, cos, sin)
    q4 = q4.astype(jnp.float32)
    qs = jnp.max(jnp.abs(q4), axis=3, keepdims=True) / 127.0 + 1e-12  # (b,sq,n,1)
    q8 = jnp.round(q4 / qs).astype(jnp.int8).reshape(b, sq, nd)
    qs = qs.transpose(0, 2, 1, 3)  # (b, n, sq, 1)
    k4 = k4.astype(jnp.float32)
    k4 = k4 - jnp.mean(k4, axis=1, keepdims=True)
    kmax = jnp.max(jnp.abs(k4), axis=(1, 3)) / 127.0 + 1e-12  # (b, n)
    k8 = jnp.round(k4 / kmax[:, None, :, None]).astype(jnp.int8).reshape(b, sk, nd)
    if pv8:
        v4 = v.reshape(b, sk, n, head_dim).astype(jnp.float32)
        vss = jnp.max(jnp.abs(v4), axis=1) / 127.0 + 1e-12  # (b, n, head_dim)
        v8 = jnp.round(v4 / vss[:, None]).astype(jnp.int8).reshape(b, sk, nd)
        return q8, qs, k8, kmax, v8, vss
    return q8, qs, k8, kmax, None, None


def _flash_fwd_pallas_flat_q8(
    q8, qs, k8, v, kscale, vss, kv_len, scale, block_q, block_k,
    head_dim, nsub, pv8, out_dtype,
):
    """Quantized forward: q8 (B,S,N·D) int8 pre-roped with per-token scales
    qs (B,N,S,1) f32, k8 (B,S,N·D) int8 pre-roped/centered, kscale (B,N)
    f32, v bf16 or — with pv8 — int8 alongside vss (B,N,D) f32 channel
    scales (applied to the output by XLA)."""
    b, sq, nd = q8.shape
    sk = k8.shape[1]
    n = nd // head_dim
    nq, nk = sq // block_q, sk // block_k
    grid = (b, n, nq, nk)
    masked = True if isinstance(kv_len, jax.Array) else kv_len < sk
    kv_len_arr = jnp.asarray(kv_len, dtype=jnp.int32).reshape(1)
    kscale = jnp.asarray(kscale, jnp.float32)

    k_spec = pl.BlockSpec((1, block_k, head_dim),
                          lambda b_, n_, i, j, *r: (b_, j, n_))
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_flat_q8, scale=scale, block_k=block_k, masked=masked,
            nsub=nsub, pv8=pv8,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j, *r: (b_, i, n_)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b_, n_, i, j, *r: (b_, n_, i, 0)),
                k_spec,
                pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, i, j, *r: (b_, j, n_)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j, *r: (b_, i, n_)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b_, n_, i, j, *r: (b_, n_, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, nd), out_dtype),
            jax.ShapeDtypeStruct((b, n, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(kv_len_arr, kscale, q8, qs, k8, v)
    if pv8:
        # out left the kernel in v8 channel units; one fused elementwise pass
        out = (out.astype(jnp.float32) * vss.reshape(b, 1, nd)).astype(out_dtype)
    return out, lse[..., 0]


# ---------------------------------------------------------------------------
# Legacy (B, N, S, D) kernel — kept for the ring-attention path (with_lse)
# ---------------------------------------------------------------------------


def _fwd_kernel(
    kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale, block_k, masked,
):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0].astype(jnp.float32) * (scale * _LOG2E)  # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)

    m_prev = m_scr[:, :1]  # (bq, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    if masked:
        kv_len = kv_len_ref[0]
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        penalty = jnp.where(col < kv_len, 0.0, _NEG_INF).astype(jnp.float32)
        p = jnp.exp2(s - m_new + penalty)
    else:
        p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_scr[:] = pv

    @pl.when(j > 0)
    def _():
        acc_scr[:] = acc_scr[:] * alpha + pv

    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] / _LOG2E + jnp.log(jnp.maximum(l_scr[:, :1], 1e-30))


def _flash_fwd_pallas(q, k, v, kv_len, scale, block_q, block_k):
    """q,k,v: (B, N, S, D) padded to block multiples. Returns out, lse."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // block_q, sk // block_k
    grid = (b, n, nq, nk)
    # static ints can skip masking when no padding; traced kv_len always masks
    masked = True if isinstance(kv_len, jax.Array) else kv_len < sk

    kv_len_arr = jnp.asarray(kv_len, dtype=jnp.int32).reshape(1)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, masked=masked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, n_, i, j, *refs: (b_, n_, i, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, n_, i, j, *refs: (b_, n_, j, 0)),
                pl.BlockSpec((1, 1, block_k, d), lambda b_, n_, i, j, *refs: (b_, n_, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d), lambda b_, n_, i, j, *refs: (b_, n_, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b_, n_, i, j, *refs: (b_, n_, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, n, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(kv_len_arr, q, k, v)
    return out, lse[..., 0]


# ---------------------------------------------------------------------------
# Pallas backward kernels (flat layout, optional fused rope)
#
def _choose_blocks_bwd(sq: int, sk: int, d: int):
    """(block_q, block_k, nsub_dq, nsub_dkv) for the flat backward kernels.
    Round-3 defaults (bq=512, bk=1024, no sub-block decoupling); retuned by
    scripts/sweep_attention_bwd_blocks.py on TPU v5e at the SVI train shape.
    Sub-block counts require 128-lane-aligned sub-blocks."""
    block_q = 512 if sq >= 512 else _ceil_to(max(sq, 8), 128)
    block_k = 1024 if sk >= 1024 else _ceil_to(max(sk, 128), 128)
    return block_q, block_k, 1, 1


# Classic flash-attention backward split into a dQ kernel (iterates KV blocks
# per Q block) and a dKV kernel (iterates Q blocks per KV block), both
# recomputing p from the saved logsumexp. No masking is needed: q/k/v/g are
# zero-padded to block multiples, which makes every padded row/column's
# contribution exactly zero (ds = p·(0-0), dq += ds·0), and padded outputs
# are sliced off. RoPE is re-applied in-kernel to the saved (un-rotated) q/k;
# output gradients rotate back with the inverse rotation (negated sin table).
# ---------------------------------------------------------------------------


def _bwd_dq_kernel_flat(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, cq_ref, sq_ref, ck_ref, sk_ref,
    dq_ref, acc_scr, *, scale, fuse_rope, head_dim, nsub,
):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if fuse_rope:
        q = _rope_in_kernel(q, cq_ref[:], sq_ref[:], head_dim)
        k = _rope_in_kernel(k, ck_ref[:], sk_ref[:], head_dim)
    g = g_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # lse/delta live as (B, N, 1, Sq) rows — q positions in lanes, so the
    # score tile is computed TRANSPOSED (bk, bq) and the row vector
    # broadcasts without any lane->sublane relayout (a (…, Sq, 1) layout
    # pads the trailing singleton to 128 lanes: 128x the HBM footprint)
    lse = lse_ref[0, 0]  # (1, bq)
    delta = delta_ref[0, 0]  # (1, bq)

    # DECOUPLED SUB-BLOCKS (same pattern as the forward): the k block is
    # split into `nsub` independent sub-blocks whose s/dp matmuls are ALL
    # issued before any exp2 — the VPU's exp2/ds of sub-block t overlaps
    # the MXU computing the dq accumulation of t-1 / the matmuls of t+1.
    # There is no online-softmax dependency here (p recomputes from the
    # saved lse), so the split is exact.
    h = k.shape[0] // nsub
    ss = [
        jax.lax.dot_general(k[t * h:(t + 1) * h], q, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
        for t in range(nsub)
    ]
    dps = [
        jax.lax.dot_general(v[t * h:(t + 1) * h], g, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for t in range(nsub)
    ]
    acc = acc_scr[:]
    for t in range(nsub):
        p_t = jnp.exp2((ss[t] - lse) * _LOG2E)
        ds_t = p_t * (dps[t] - delta)
        acc = acc + jax.lax.dot_general(
            ds_t, k[t * h:(t + 1) * h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
    acc_scr[:] = acc

    @pl.when(j == nk - 1)
    def _():
        dq = acc_scr[:]
        if fuse_rope:
            # grad through the (orthogonal) rotation = inverse rotation
            dq = _rope_in_kernel(dq, cq_ref[:], -sq_ref[:], head_dim)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel_flat(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, cq_ref, sq_ref, ck_ref, sk_ref,
    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, fuse_rope, head_dim, nsub,
):
    i = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if fuse_rope:
        q = _rope_in_kernel(q, cq_ref[:], sq_ref[:], head_dim)
        k = _rope_in_kernel(k, ck_ref[:], sk_ref[:], head_dim)
    g = g_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (1, bq) — see the dq kernel's layout note
    delta = delta_ref[0, 0]  # (1, bq)

    # decoupled sub-blocks along the q direction (lse/delta slice on the
    # 128-aligned lane axis); all s/dp matmuls issued before any exp2 —
    # see the dq kernel's scheduling note
    h = q.shape[0] // nsub
    ss = [
        jax.lax.dot_general(k, q[t * h:(t + 1) * h], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
        for t in range(nsub)
    ]
    dps = [
        jax.lax.dot_general(v, g[t * h:(t + 1) * h], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for t in range(nsub)
    ]
    dk_acc = dk_scr[:]
    dv_acc = dv_scr[:]
    for t in range(nsub):
        p_t = jnp.exp2((ss[t] - lse[:, t * h:(t + 1) * h]) * _LOG2E)
        ds_t = p_t * (dps[t] - delta[:, t * h:(t + 1) * h])
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, q[t * h:(t + 1) * h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, g[t * h:(t + 1) * h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_scr[:] = dk_acc
    dv_scr[:] = dv_acc

    @pl.when(i == nq - 1)
    def _():
        dk = dk_scr[:]
        if fuse_rope:
            dk = _rope_in_kernel(dk, ck_ref[:], -sk_ref[:], head_dim)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# One-pass fused backward: the split dQ/dKV design executes 7 matmul-units
# per (q block, kv block) pair (both kernels recompute s and dp), i.e. 1.4x
# the canonical 5. This kernel grids over KV blocks only and keeps the FULL
# q/g/lse/delta rows (plus the f32 dq accumulator) VMEM-resident per
# (batch, head), walking q chunks in an in-kernel fori_loop — so s/dp are
# computed once and all five gradients come out of one pass. RoPE is NOT
# fused here: q/k are pre-rotated (and dq/dk inverse-rotated) at the XLA
# level, whose cost is two elementwise passes — noise against the O(S^2)
# kernel. VMEM residency is ~(2+2+4)*S*D bytes per (b, n), so the caller
# gates on sequence length (_onepass_bwd_ok).
# ---------------------------------------------------------------------------


def _bwd_onepass_kernel_flat(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale, block_q, head_dim, unroll=1,
):
    j = pl.program_id(2)
    first = j == 0
    k = k_ref[0].astype(jnp.float32)   # (bk, d)
    v = v_ref[0].astype(jnp.float32)
    nq = lse_ref.shape[2]

    def body(i, carry):
        dk_acc, dv_acc = carry
        rows = pl.ds(i * block_q, block_q)
        qc = q_ref[0, rows, :].astype(jnp.float32)   # (bq, d)
        gc = g_ref[0, rows, :].astype(jnp.float32)
        # lse/delta blocks are (1, 1, nq, bq): q chunks live as SUBLANES so
        # chunk i is a supported sublane slice (a lane slice of a flat
        # (1, Sq) row trips Mosaic's lane-relayout)
        lse = lse_ref[0, 0, pl.ds(i, 1), :]          # (1, bq)
        dl = delta_ref[0, 0, pl.ds(i, 1), :]
        # score tiles TRANSPOSED (bk, bq) so the lse/delta rows broadcast
        # over sublanes (see the split kernels' layout note); both matmuls
        # issue before the exp2 so VPU softmax overlaps the MXU
        s_t = jax.lax.dot_general(k, qc, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale
        dp_t = jax.lax.dot_general(v, gc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_t = jnp.exp2((s_t - lse) * _LOG2E)
        ds_t = p_t * (dp_t - dl)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t, gc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_c = jax.lax.dot_general(
            ds_t, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, d)
        # dq accumulates ACROSS kv blocks directly in the pinned f32 output
        # block; at j == 0 the select discards the uninitialized buffer
        prev = dq_ref[0, rows, :]
        dq_ref[0, rows, :] = jnp.where(first, dq_c, prev + dq_c)
        return dk_acc, dv_acc

    z = jnp.zeros((k.shape[0], head_dim), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, nq, body, (z, z), unroll=unroll)
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_onepass_pallas_flat(q, k, v, g, lse, delta, scale,
                                   block_q, block_k, head_dim, unroll=None):
    """One-pass backward. q/g: (B, Sq, N*D) flat zero-padded to block_q
    multiples (RoPE already applied if any); k/v likewise to block_k;
    lse/delta (B, N, Sq/block_q, block_q) f32. Returns (dq_f32, dk, dv).
    unroll: fori_loop unroll — Mosaic supports only 1 or full (=nq). Full
    unroll overlaps chunk t's VPU softmax with t±1's matmuls and measures
    +1.8% (175.3 → 178.4 TF/s at the train shape) but balloons the Mosaic
    compile from ~4 min to >22 min for the 1.3B train step, so the default
    stays 1 (sweepable via scripts/sweep_attention_bwd_blocks.py --unroll)."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim
    nq = sq // block_q
    if unroll is None:
        unroll = 1

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_onepass_kernel_flat, scale=scale,
                          block_q=block_q, head_dim=head_dim, unroll=unroll),
        grid=(b, n, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, head_dim), lambda b_, n_, j: (b_, 0, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j: (b_, j, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j: (b_, j, n_)),
            pl.BlockSpec((1, sq, head_dim), lambda b_, n_, j: (b_, 0, n_)),
            pl.BlockSpec((1, 1, nq, block_q), lambda b_, n_, j: (b_, n_, 0, 0)),
            pl.BlockSpec((1, 1, nq, block_q), lambda b_, n_, j: (b_, n_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, sq, head_dim), lambda b_, n_, j: (b_, 0, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j: (b_, j, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j: (b_, j, n_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, nd), jnp.float32),
            jax.ShapeDtypeStruct((b, sk, nd), k.dtype),
            jax.ShapeDtypeStruct((b, sk, nd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # full-row q/g (bf16) + f32 dq + score tiles + double buffering
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


def _onepass_bwd_ok(sq_p: int, sk: int, head_dim: int) -> bool:
    """Gate for the one-pass backward: full q/g/dq rows for one (b, n) must
    fit VMEM ((2+2+4)*Sq*D bytes resident + ~32MB of score tiles within the
    100MB budget), and the sequence must be long enough for the resident-row
    design to pay off. Covers the SVI flagship (S=32760: 33.5MB resident);
    longer sequences fall back to the split kernels."""
    if head_dim != 128:
        return False
    resident = 8 * sq_p * head_dim  # q/g bf16 + dq f32
    return sq_p >= 4096 and sk >= 4096 and resident <= 36 * 1024 * 1024


def _choose_blocks_bwd_onepass(sq_p: int, sk: int):
    """(block_q_inner, block_k) for the one-pass backward. Swept on TPU v5e
    at the SVI train shape (s=32760, d=128) by
    scripts/sweep_attention_bwd_blocks.py --onepass: 1024/2048 = 175.3 TF/s
    canonical (vs 173.0 at 1024/1024, 171.3 at 512/2048, 170.4 at 512/1024;
    2048-wide q chunks and 4096-wide k blocks exceed VMEM). The split-kernel
    baseline at the same shape is 126.7 canonical — 1.38x."""
    block_k = 2048 if sk >= 2048 else _ceil_to(max(sk, 128), 128)
    block_q = 1024 if sq_p >= 1024 else _ceil_to(max(sq_p, 8), 128)
    return block_q, block_k


def _flash_bwd_pallas_flat(q, k, v, g, lse, delta, cosE, sinE, scale,
                           block_q, block_k, head_dim, fuse_rope,
                           nsub_dq=1, nsub_dkv=1):
    """All flat (B, S, N*D), zero-padded to block multiples; lse/delta
    (B, N, 1, Sq) rows (q positions in lanes). Returns (dq, dk, dv) flat.
    nsub_dq splits the dQ kernel's k block / nsub_dkv the dKV kernel's q
    block into decoupled sub-blocks (see the kernel scheduling notes)."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim

    if fuse_rope:
        q_tab = lambda which: pl.BlockSpec((block_q, head_dim), lambda b_, n_, i, j: (i, 0))
        k_tab = lambda which: pl.BlockSpec((block_k, head_dim), lambda b_, n_, i, j: (j, 0))
    else:
        q_tab = k_tab = lambda which: pl.BlockSpec((8, head_dim), lambda b_, n_, i, j: (0, 0))

    common = dict(scale=scale, fuse_rope=fuse_rope, head_dim=head_dim)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_flat, nsub=nsub_dq, **common),
        grid=(b, n, sq // block_q, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j: (b_, i, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, i, j: (b_, j, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, i, j: (b_, j, n_)),
            pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j: (b_, i, n_)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, i, j: (b_, n_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, i, j: (b_, n_, 0, i)),
            q_tab("c"), q_tab("s"), k_tab("c"), k_tab("s"),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, i, j: (b_, i, n_)),
        out_shape=jax.ShapeDtypeStruct((b, sq, nd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        compiler_params=cparams,
    )(q, k, v, g, lse, delta, cosE, sinE, cosE, sinE)

    # dKV: same grid family with the reduction over Q blocks innermost
    if fuse_rope:
        q_tab2 = lambda: pl.BlockSpec((block_q, head_dim), lambda b_, n_, j, i: (i, 0))
        k_tab2 = lambda: pl.BlockSpec((block_k, head_dim), lambda b_, n_, j, i: (j, 0))
    else:
        q_tab2 = k_tab2 = lambda: pl.BlockSpec((8, head_dim), lambda b_, n_, j, i: (0, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_flat, nsub=nsub_dkv, **common),
        grid=(b, n, sk // block_k, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, j, i: (b_, i, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j, i: (b_, j, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j, i: (b_, j, n_)),
            pl.BlockSpec((1, block_q, head_dim), lambda b_, n_, j, i: (b_, i, n_)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, j, i: (b_, n_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, j, i: (b_, n_, 0, i)),
            q_tab2(), q_tab2(), k_tab2(), k_tab2(),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j, i: (b_, j, n_)),
            pl.BlockSpec((1, block_k, head_dim), lambda b_, n_, j, i: (b_, j, n_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, nd), k.dtype),
            jax.ShapeDtypeStruct((b, sk, nd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, head_dim), jnp.float32),
            pltpu.VMEM((block_k, head_dim), jnp.float32),
        ],
        compiler_params=cparams,
    )(q, k, v, g, lse, delta, cosE, sinE, cosE, sinE)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Chunked XLA implementation (CPU fallback + backward recompute)
# ---------------------------------------------------------------------------


def _flash_fwd_xla(q, k, v, kv_len, scale, block_k):
    """Scan over key blocks; same online-softmax math as the kernel.

    q,k,v: (B, N, S, D) padded to block multiples; returns (out, lse).
    """
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nk = sk // block_k
    qf = q.astype(jnp.float32) * scale
    kb = k.reshape(b, n, nk, block_k, d)
    vb = v.reshape(b, n, nk, block_k, d)

    def body(carry, blk):
        m, l, acc = carry
        kj, vj, j = blk
        s = jnp.einsum("bnqd,bnkd->bnqk", qf, kj.astype(jnp.float32))
        col = j * block_k + jnp.arange(block_k)
        s = jnp.where(col[None, None, None, :] < kv_len, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("bnqk,bnkd->bnqd", p, vj.astype(jnp.float32))
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, n, sq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, n, sq, 1), jnp.float32)
    a0 = jnp.zeros((b, n, sq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, a0),
        (jnp.moveaxis(kb, 2, 0), jnp.moveaxis(vb, 2, 0), jnp.arange(nk)),
    )
    out = (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
    lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]
    return out, lse


def _flash_bwd_xla(q, k, v, out, lse, g, kv_len, scale, block_k):
    """Blockwise flash-attention backward (recompute from lse). All (B,N,S,D)."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    nk = sk // block_k
    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    # D_i = rowsum(dO * O)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)  # (b,n,sq,1)

    kb = jnp.moveaxis(k.reshape(b, n, nk, block_k, d), 2, 0)
    vb = jnp.moveaxis(v.reshape(b, n, nk, block_k, d), 2, 0)

    def body(dq, blk):
        kj, vj, j = blk
        kjf = kj.astype(jnp.float32)
        s = jnp.einsum("bnqd,bnkd->bnqk", qf, kjf) * scale
        col = j * block_k + jnp.arange(block_k)
        s = jnp.where(col[None, None, None, :] < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse[..., None])  # (b,n,sq,bk)
        dp = jnp.einsum("bnqd,bnkd->bnqk", gf, vj.astype(jnp.float32))
        ds = p * (dp - delta)
        dq = dq + jnp.einsum("bnqk,bnkd->bnqd", ds, kjf) * scale
        dkj = jnp.einsum("bnqk,bnqd->bnkd", ds, qf) * scale
        dvj = jnp.einsum("bnqk,bnqd->bnkd", p, gf)
        return dq, (dkj, dvj)

    dq0 = jnp.zeros((b, n, sq, d), jnp.float32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(body, dq0, (kb, vb, jnp.arange(nk)))
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(b, n, sk, d)
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(b, n, sk, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# Differentiable core (flat layout, optional fused rope)
# ---------------------------------------------------------------------------


def _choose_blocks(sq: int, sk: int, d: int):
    """Block sizes for the legacy (B,N,S,D) kernel and the XLA fallback
    (bq=1024, bk=2048 tuned on TPU v5e at 32k tokens / head_dim 128); larger
    head dims (e.g. the VAE's single 384-wide head, f32) scale blocks down
    to stay inside the VMEM budget."""
    if d <= 128:
        bq_max, bk_max = 1024, 2048
    elif d <= 256:
        bq_max, bk_max = 512, 1024
    else:
        bq_max, bk_max = 256, 512
    block_q = bq_max if sq >= bq_max else _ceil_to(max(sq, 8), 128)
    block_k = bk_max if sk >= bk_max else _ceil_to(max(sk, 128), 128)
    return block_q, block_k


def _choose_blocks_flat(sq: int, sk: int, d: int):
    """(block_q, block_k, nsub) for the flat forward kernel. Tuned on TPU
    v5e at the SVI 14B shape (n40 s32760 d128), dispatch-amortized chained
    timing (scripts/sweep_attention_blocks.py, round 4): bq=2048/bk=4096
    with 4 decoupled sub-blocks = 177.7 TF/s (rope-fused) vs 168.5 at
    nsub=2 and 150.3 for bq=1024/bk=2048/nsub=1; nsub=8 collapses to 140
    (per-sub softmax bookkeeping dominates), bq=4096 and bk=8192 exceed
    VMEM (matmul-only roof at this blocking: 194.5; hardware peak 197).
    nsub>1 needs 128-lane-aligned sub-blocks; prefer 1024-wide sub-blocks,
    falling back to 2 sub-blocks, then 1."""
    if d <= 128:
        bq_max, bk_max = 2048, 4096
    elif d <= 256:
        bq_max, bk_max = 512, 1024
    else:
        bq_max, bk_max = 256, 512
    block_q = bq_max if sq >= bq_max else _ceil_to(max(sq, 8), 128)
    block_k = bk_max if sk >= bk_max else _ceil_to(max(sk, 128), 128)
    if block_k % 1024 == 0 and block_k >= 4096:
        nsub = block_k // 1024
    elif block_k % 256 == 0 and block_k >= 512:
        nsub = 2
    else:
        nsub = 1
    return block_q, block_k, nsub


def _apply_rope_xla(x4, cos, sin, inverse=False):
    """Interleaved-pair rotation at the XLA level. x4: (B,S,N,D);
    cos/sin: (S, D/2). inverse=True rotates by -theta (rope backward)."""
    b, s, n, d = x4.shape
    xf = x4.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c = jnp.asarray(cos, jnp.float32)[None, :, None, :]
    si = jnp.asarray(sin, jnp.float32)[None, :, None, :]
    if inverse:
        si = -si
    or_ = xr * c - xi * si
    oi = xr * si + xi * c
    out = jnp.stack([or_, oi], axis=-1).reshape(b, s, n, d)
    return out.astype(x4.dtype)


# The differentiable core is layered so REMAT POLICIES can skip the forward
# kernel during block recompute: the raw forward's (out, lse) are
# stop_gradient-ed, tagged with jax.ad_checkpoint.checkpoint_name, and fed
# INTO a custom_vjp whose fwd is the identity on `out` and whose bwd is the
# flash backward. Without remat this is exactly the classic custom_vjp
# (identical residuals, zero overhead). Under
# jax.checkpoint(..., policy=save_only_these_names('flash_out','flash_lse'))
# the tagged values are saved at forward time, so the backward's block
# recompute rebuilds only the cheap q/k/v projections and skips the O(S^2)
# attention kernel entirely — 2 of the 9 executed matmul-units per
# rematted block backward (see wan_dit.forward_blocks(save_attention=True)).


def _flash_core_flat(q, k, v, cos, sin, kv_len, scale, use_pallas, use_rope,
                     head_dim, quant=None, save_tag="flash"):
    # the raw forward runs on stop_gradient-ed inputs so it carries no
    # tangents at all (pallas_call has no JVP rule); gradients flow solely
    # through _attn_with_saved's custom bwd.
    # save_tag names the checkpoint_name tags ("<tag>_out"/"<tag>_lse") so a
    # remat policy can save SOME attention sites and not others — the
    # save-attention recipe keeps only the O(S^2) self-attention
    # ("flash_*"); cross-attention ("xattn_*", S x 769) is cheap to
    # recompute and saving it OOMs the 1.3B train step (3 saved token-sized
    # tensors/block instead of 1: +5.7 GB, measured 15.86G > 15.75G HBM).
    out, res = _flash_core_flat_fwd(
        jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
        jax.lax.stop_gradient(v), jax.lax.stop_gradient(cos),
        jax.lax.stop_gradient(sin), kv_len, scale, use_pallas, use_rope,
        head_dim, quant,
    )
    lse = res[-1]
    out_sg = checkpoint_name(out, f"{save_tag}_out")
    lse_sg = checkpoint_name(lse, f"{save_tag}_lse")
    return _attn_with_saved(q, k, v, cos, sin, out_sg, lse_sg, kv_len, scale,
                            use_pallas, use_rope, head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _attn_with_saved(q, k, v, cos, sin, out, lse, kv_len, scale, use_pallas,
                     use_rope, head_dim):
    return out


def _attn_with_saved_fwd(q, k, v, cos, sin, out, lse, kv_len, scale,
                         use_pallas, use_rope, head_dim):
    return out, (q, k, v, cos, sin, out, lse)


def _attn_with_saved_bwd(kv_len, scale, use_pallas, use_rope, head_dim, res, g):
    dq, dk, dv, zc, zs = _flash_core_flat_bwd(
        kv_len, scale, use_pallas, use_rope, head_dim, res, g
    )
    _, _, _, _, _, out, lse = res
    # out/lse arrive through stop_gradient — their cotangents are dropped
    return dq, dk, dv, zc, zs, jnp.zeros_like(out), jnp.zeros_like(lse)


def _flash_core_flat_fwd(q, k, v, cos, sin, kv_len, scale, use_pallas,
                         use_rope, head_dim, quant=None):
    """q,k,v: (B, S, N*D) flat. quant: None | 'qk8' | 'qk8pv8' — int8-MXU
    forward (inference-only; silently ignored off-TPU and on the legacy
    non-flat path)."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim
    block_q, block_k, nsub = _choose_blocks_flat(sq, sk, head_dim)
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)

    # the flat layout addresses each head as a lane block, which mosaic
    # requires to be a multiple of 128 lanes (or the whole array) — head dims
    # like CLIP's 80 route through the legacy (B,N,S,D) kernel instead
    flat_ok = head_dim % 128 == 0 or n == 1
    if use_pallas and not flat_ok:
        block_q, block_k = _choose_blocks(sq, sk, head_dim)
        sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
        q4 = q.reshape(b, sq, n, head_dim)
        k4 = k.reshape(b, sk, n, head_dim)
        v4 = v.reshape(b, sk, n, head_dim)
        if use_rope:
            q4 = _apply_rope_xla(q4, cos, sin)
            k4 = _apply_rope_xla(k4, cos, sin)
        qt = jnp.swapaxes(q4, 1, 2)
        kt = jnp.swapaxes(k4, 1, 2)
        vt = jnp.swapaxes(v4, 1, 2)
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else qt
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else kt
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else vt
        out_t, lse = _flash_fwd_pallas(qt, kt, vt, kv_len, scale, block_q, block_k)
        out = jnp.swapaxes(out_t[:, :, :sq], 1, 2).reshape(b, sq, nd)
        lse = lse[:, :, :sq]
        return out, (q, k, v, cos, sin, out, lse)

    if quant not in (None, "qk8", "qk8pv8"):
        raise ValueError(
            f"quant={quant!r}: expected None, 'qk8', or 'qk8pv8'"
        )
    if use_pallas:
        if quant:
            pv8 = quant == "qk8pv8"
            q8, qs, k8, kscale, v8, vss = _quant_prep_xla(
                q, k, v, cos, sin, use_rope, head_dim, pv8)
            v_in = v8 if pv8 else v
            if sq_p != sq:
                q8 = jnp.pad(q8, ((0, 0), (0, sq_p - sq), (0, 0)))
                qs = jnp.pad(qs, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
            if sk_p != sk:
                k8 = jnp.pad(k8, ((0, 0), (0, sk_p - sk), (0, 0)))
                v_in = jnp.pad(v_in, ((0, 0), (0, sk_p - sk), (0, 0)))
            out, lse = _flash_fwd_pallas_flat_q8(
                q8, qs, k8, v_in, kscale, vss, kv_len, scale,
                block_q, block_k, head_dim, nsub, pv8, q.dtype,
            )
        else:
            qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
            if use_rope:
                # one table serves both q (block_q-indexed) and k (block_k-indexed)
                tab_pad = _ceil_to(max(sq_p, sk_p), max(block_q, block_k))
                cosE, sinE = _expand_rope_tables(cos, sin, head_dim, tab_pad)
            else:
                cosE = sinE = jnp.zeros((8, head_dim), jnp.float32)
            kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
            vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v
            out, lse = _flash_fwd_pallas_flat(
                qp, kp, vp, cosE, sinE, kv_len, scale, block_q, block_k,
                head_dim, use_rope, nsub=nsub,
            )
        out = out[:, :sq]
        lse = lse[:, :, :sq]
    else:
        # XLA fallback: keep the smaller legacy block_k — its scan body
        # materializes a (B, N, Sq, block_k) f32 score tile, so the flat
        # kernel's larger blocks would double that allocation
        _, block_k = _choose_blocks(sq, sk, head_dim)
        sk_p = _ceil_to(sk, block_k)
        q4 = q.reshape(b, sq, n, head_dim)
        k4 = k.reshape(b, sk, n, head_dim)
        v4 = v.reshape(b, sk, n, head_dim)
        if use_rope:
            q4 = _apply_rope_xla(q4, cos, sin)
            k4 = _apply_rope_xla(k4, cos, sin)
        qt = jnp.swapaxes(q4, 1, 2)
        kt = jnp.swapaxes(k4, 1, 2)
        vt = jnp.swapaxes(v4, 1, 2)
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else kt
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else vt
        out_t, lse = _flash_fwd_xla(qt, kt, vt, kv_len, scale, block_k)
        out = jnp.swapaxes(out_t, 1, 2).reshape(b, sq, nd)
    return out, (q, k, v, cos, sin, out, lse)


def _flash_core_flat_bwd(kv_len, scale, use_pallas, use_rope, head_dim, res, g):
    q, k, v, cos, sin, out, lse = res
    b, sq, nd = q.shape
    sk = k.shape[1]
    n = nd // head_dim

    # Pallas backward (dQ + dKV kernels). Requires zero-padded-only masking
    # (kv_len == sk): padded rows/cols then contribute exactly zero, so the
    # kernels skip masking entirely. kv_len < sk (SP shards) falls back to
    # the XLA backward.
    flat_ok = head_dim % 128 == 0 or n == 1
    if use_pallas and flat_ok and kv_len == sk and _onepass_bwd_ok(
            _ceil_to(sq, 1024), sk, head_dim):
        # one-pass fused backward (5 matmul-units vs the split kernels' 7);
        # RoPE handled at the XLA level around the kernel
        if use_rope:
            q = _apply_rope_xla(
                q.reshape(b, sq, n, head_dim), cos, sin).reshape(b, sq, nd)
            k = _apply_rope_xla(
                k.reshape(b, sk, n, head_dim), cos, sin).reshape(b, sk, nd)
        block_q, block_k = _choose_blocks_bwd_onepass(_ceil_to(sq, 1024), sk)
        sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
        qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
        gp = jnp.pad(g, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else g
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v
        delta = jnp.einsum(
            "bsnd,bsnd->bns",
            g.reshape(b, sq, n, head_dim), out.reshape(b, sq, n, head_dim),
            preferred_element_type=jnp.float32,
        )
        lse_p = lse
        if sq_p != sq:
            delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
            lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)))
        nq = sq_p // block_q
        dq32, dk, dv = _flash_bwd_onepass_pallas_flat(
            qp, kp, vp, gp, lse_p.reshape(b, n, nq, block_q),
            delta.reshape(b, n, nq, block_q), scale, block_q, block_k,
            head_dim,
        )
        dq = dq32[:, :sq].astype(q.dtype)
        dk, dv = dk[:, :sk], dv[:, :sk]
        if use_rope:
            dq = _apply_rope_xla(
                dq.reshape(b, sq, n, head_dim), cos, sin,
                inverse=True).reshape(b, sq, nd)
            dk = _apply_rope_xla(
                dk.reshape(b, sk, n, head_dim), cos, sin,
                inverse=True).reshape(b, sk, nd)
        zc = jnp.zeros_like(jnp.asarray(cos, jnp.float32))
        zs = jnp.zeros_like(jnp.asarray(sin, jnp.float32))
        return dq, dk, dv, zc, zs
    if use_pallas and flat_ok and kv_len == sk:
        block_q, block_k, nsub_dq, nsub_dkv = _choose_blocks_bwd(sq, sk, head_dim)
        sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
        qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
        gp = jnp.pad(g, ((0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else g
        kp = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
        vp = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v
        # delta = rowsum(dO ∘ O) per head, f32-accumulated WITHOUT
        # materializing f32 copies of g/out (each is (S, N·D) — 670 MB at
        # 14B/480p/81f and XLA emits them as real copies before a transpose)
        delta = jnp.einsum(
            "bsnd,bsnd->bns",
            g.reshape(b, sq, n, head_dim), out.reshape(b, sq, n, head_dim),
            preferred_element_type=jnp.float32,
        )  # (B, N, Sq)
        lse_p = lse
        if sq_p != sq:
            delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
            lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)))
        if use_rope:
            tab_pad = _ceil_to(max(sq_p, sk_p), max(block_q, block_k))
            cosE, sinE = _expand_rope_tables(cos, sin, head_dim, tab_pad)
        else:
            cosE = sinE = jnp.zeros((8, head_dim), jnp.float32)
        dq, dk, dv = _flash_bwd_pallas_flat(
            qp, kp, vp, gp, lse_p[:, :, None, :], delta[:, :, None, :],
            cosE, sinE, scale, block_q, block_k, head_dim, use_rope,
            nsub_dq=nsub_dq, nsub_dkv=nsub_dkv,
        )
        zc = jnp.zeros_like(jnp.asarray(cos, jnp.float32))
        zs = jnp.zeros_like(jnp.asarray(sin, jnp.float32))
        return dq[:, :sq], dk[:, :sk], dv[:, :sk], zc, zs
    q4 = q.reshape(b, sq, n, head_dim)
    k4 = k.reshape(b, sk, n, head_dim)
    v4 = v.reshape(b, sk, n, head_dim)
    if use_rope:
        q4 = _apply_rope_xla(q4, cos, sin)
        k4 = _apply_rope_xla(k4, cos, sin)
    qt = jnp.swapaxes(q4, 1, 2)
    kt = jnp.swapaxes(k4, 1, 2)
    vt = jnp.swapaxes(v4, 1, 2)
    gt = jnp.swapaxes(g.reshape(b, sq, n, head_dim), 1, 2)
    out_t = jnp.swapaxes(out.reshape(b, sq, n, head_dim), 1, 2)
    _, block_k = _choose_blocks(sq, sk, head_dim)
    sk_p = _ceil_to(sk, block_k)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else kt
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else vt
    dq, dk, dv = _flash_bwd_xla(qt, kt, vt, out_t, lse, gt, kv_len, scale, block_k)
    dk = dk[:, :, :sk]
    dv = dv[:, :, :sk]
    dq4 = jnp.swapaxes(dq, 1, 2)
    dk4 = jnp.swapaxes(dk, 1, 2)
    dv4 = jnp.swapaxes(dv, 1, 2)
    if use_rope:
        # rotation is orthogonal: grad through rope = inverse rotation
        dq4 = _apply_rope_xla(dq4, cos, sin, inverse=True)
        dk4 = _apply_rope_xla(dk4, cos, sin, inverse=True)
    zc = jnp.zeros_like(jnp.asarray(cos, jnp.float32))
    zs = jnp.zeros_like(jnp.asarray(sin, jnp.float32))
    return (
        dq4.reshape(b, sq, nd), dk4.reshape(b, sk, nd), dv4.reshape(b, sk, nd), zc, zs
    )


_attn_with_saved.defvjp(_attn_with_saved_fwd, _attn_with_saved_bwd)


# ---------------------------------------------------------------------------
# Public ops
# ---------------------------------------------------------------------------


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    scale: Optional[float] = None,
    force_xla: bool = False,
    save_tag: str = "flash",
) -> jax.Array:
    """Full (non-causal) attention. q: (B, Sq, N, D); k, v: (B, Sk, N, D).

    kv_len masks keys at positions >= kv_len (defaults to Sk); use it when the
    caller pre-pads the key sequence. Returns (B, Sq, N, D) in q.dtype.
    save_tag: checkpoint_name prefix for the out/lse residuals (see
    _flash_core_flat) — pass a non-"flash" tag at sites a save-attention
    remat policy should NOT save (e.g. cheap cross-attention).
    """
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4
    b, sq, n, d = q.shape
    sk = k.shape[1]
    if kv_len is None:
        kv_len = sk
    if scale is None:
        scale = d ** -0.5
    use_pallas = (not force_xla) and jax.default_backend() == "tpu"
    dummy = jnp.zeros((1, max(1, d // 2)), jnp.float32)
    out = _flash_core_flat(
        q.reshape(b, sq, n * d), k.reshape(b, sk, n * d), v.reshape(b, sk, n * d),
        dummy, dummy, int(kv_len), float(scale), use_pallas, False, d,
        save_tag=save_tag,
    )
    return out.reshape(b, sq, n, d)


def flash_attention_rope(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    kv_len: Optional[int] = None,
    scale: Optional[float] = None,
    force_xla: bool = False,
) -> jax.Array:
    """Self-attention with interleaved-pair 3D RoPE fused into the kernel.

    q, k, v: (B, S, N, D) — q and k NOT yet rotated; cos/sin: (S, D/2) pair
    tables from ops.rope.rope_angles_for_grid. Equivalent to
    flash_attention(apply_rope(q), apply_rope(k), v) but ~9% faster end to
    end at the SVI shape (no separate rope pass, no layout changes).
    """
    assert q.ndim == 4 and q.shape == k.shape == v.shape
    b, s, n, d = q.shape
    assert cos.shape[0] >= s, f"rope table {cos.shape} shorter than seq {s}"
    if kv_len is None:
        kv_len = s
    if scale is None:
        scale = d ** -0.5
    use_pallas = (not force_xla) and jax.default_backend() == "tpu"
    cos = jnp.asarray(cos, jnp.float32)[:s]
    sin = jnp.asarray(sin, jnp.float32)[:s]
    out = _flash_core_flat(
        q.reshape(b, s, n * d), k.reshape(b, s, n * d), v.reshape(b, s, n * d),
        cos, sin, int(kv_len), float(scale), use_pallas, True, d,
    )
    return out.reshape(b, s, n, d)


def flash_attention_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    head_dim: int,
    cos: Optional[jax.Array] = None,
    sin: Optional[jax.Array] = None,
    kv_len: Optional[int] = None,
    scale: Optional[float] = None,
    force_xla: bool = False,
    quant: Optional[str] = None,
) -> jax.Array:
    """Flat-layout entry: q,k,v (B, S, N·head_dim) straight from the qkv
    projections, optional fused rope — zero reshapes/relayouts end to end.

    quant: None | 'qk8' | 'qk8pv8' — run the forward on the int8 MXU
    (SageAttention-class per-token Q / per-head centered K, optionally int8
    PV). INFERENCE-ONLY: the saved lse corresponds to the centered logits, so
    do not differentiate through a quantized forward. Ignored off-TPU."""
    b, sq, nd = q.shape
    sk = k.shape[1]
    if kv_len is None:
        kv_len = sk
    if scale is None:
        scale = head_dim ** -0.5
    use_pallas = (not force_xla) and jax.default_backend() == "tpu"
    use_rope = cos is not None
    if use_rope:
        cos = jnp.asarray(cos, jnp.float32)[:sq]
        sin = jnp.asarray(sin, jnp.float32)[:sq]
    else:
        cos = sin = jnp.zeros((1, max(1, head_dim // 2)), jnp.float32)
    return _flash_core_flat(
        q, k, v, cos, sin, int(kv_len), float(scale), use_pallas, use_rope,
        head_dim, quant=quant if use_pallas else None,
    )


def flash_attention_with_lse(q, k, v, kv_len=None, scale=None, force_xla=False):
    """Forward-only flash attention returning (out, lse) — for ring attention
    / cross-chip softmax merging. Layout (B, N, S, D). kv_len may be a TRACED
    scalar (masking is then always enabled)."""
    b, n, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = sk
    use_pallas = (not force_xla) and jax.default_backend() == "tpu"
    block_q, block_k = _choose_blocks(sq, sk, d)
    sq_p, sk_p = _ceil_to(sq, block_q), _ceil_to(sk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))) if sq_p != sq else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))) if sk_p != sk else v
    if use_pallas:
        out, lse = _flash_fwd_pallas(qp, kp, vp, kv_len, float(scale), block_q, block_k)
    else:
        out, lse = _flash_fwd_xla(qp, kp, vp, kv_len, float(scale), block_k)
    return out[:, :, :sq], lse[:, :, :sq]


def attention_bnsd(
    q: jax.Array, k: jax.Array, v: jax.Array,
    kv_len: Optional[int] = None, scale: Optional[float] = None,
    force_xla: bool = False,
) -> jax.Array:
    """Same op with (B, N, S, D) layout."""
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    return jnp.swapaxes(
        flash_attention(qt, kt, vt, kv_len=kv_len, scale=scale, force_xla=force_xla), 1, 2
    )
