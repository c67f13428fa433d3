"""Flash attention op: XLA-chunked path vs dense softmax reference, VJP check.

The Pallas TPU kernel itself is exercised on real hardware by bench.py and
__graft_entry__; here (CPU) we validate the identical math via the chunked
XLA path and pallas interpret mode on tiny shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svi_tpu.ops.attention import flash_attention


def dense_reference(q, k, v, scale=None):
    b, sq, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bqnd,bknd->bnqk", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", p, vf)


def rand_qkv(rng, b, sq, sk, n, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((b, sq, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, n, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, n, d)), dtype)
    return q, k, v


def test_self_attention_matches_dense():
    rng = np.random.default_rng(0)
    q, k, v = rand_qkv(rng, 2, 200, 200, 3, 64)
    out = flash_attention(q, k, v)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_cross_attention_rect_and_padding():
    rng = np.random.default_rng(1)
    q, k, v = rand_qkv(rng, 1, 300, 769, 2, 64)
    out = flash_attention(q, k, v)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kv_len_masking():
    rng = np.random.default_rng(2)
    q, k, v = rand_qkv(rng, 1, 64, 512, 2, 32)
    kv_len = 100
    out = flash_attention(q, k, v, kv_len=kv_len)
    ref = dense_reference(q, k[:, :kv_len], v[:, :kv_len])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_bf16_runs_and_is_close():
    rng = np.random.default_rng(3)
    q, k, v = rand_qkv(rng, 1, 256, 256, 2, 64, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = dense_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_gradients_match_dense():
    rng = np.random.default_rng(4)
    q, k, v = rand_qkv(rng, 1, 96, 160, 2, 32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(dense_reference(q, k, v)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode on tiny shapes."""
    from jax.experimental.pallas import tpu as pltpu
    from svi_tpu.ops import attention as attn_mod

    rng = np.random.default_rng(5)
    q, k, v = rand_qkv(rng, 1, 256, 256, 2, 64)
    qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out, lse = attn_mod._flash_fwd_pallas(qt, kt, vt, 256, 64 ** -0.5, 128, 128)
    ref = dense_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("block_k,nsub", [(256, 2), (512, 4)])
def test_flat_kernel_interpret_mode_nsub_masked_rope(block_k, nsub):
    """The production flat kernel (decoupled sub-block pipeline, nsub=2 and
    the 14B-shape default nsub=4) in interpreter mode: masked tail + fused
    RoPE vs a rotated dense reference."""
    from jax.experimental.pallas import tpu as pltpu
    from svi_tpu.ops import attention as attn_mod
    from svi_tpu.ops.rope import apply_rope, rope_angles_for_grid

    rng = np.random.default_rng(6)
    b, s, n, d = 1, 448, 2, 128  # pads to 512 -> masked; 128-aligned sub-blocks
    q, k, v = rand_qkv(rng, b, s, s, n, d)
    cos, sin = rope_angles_for_grid((7, 8, 8), d)  # 448 tokens
    ref = dense_reference(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)

    qf = q.reshape(b, s, n * d)
    kf = k.reshape(b, s, n * d)
    vf = v.reshape(b, s, n * d)
    block_q = 256
    pad = 512 - s
    qp = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
    cosE, sinE = attn_mod._expand_rope_tables(cos, sin, d, 512)
    with pltpu.force_tpu_interpret_mode():
        out, lse = attn_mod._flash_fwd_pallas_flat(
            qp, kp, vp, cosE, sinE, s, d ** -0.5, block_q, block_k, d,
            fuse_rope=True, nsub=nsub,
        )
    np.testing.assert_allclose(
        np.asarray(out[:, :s].reshape(b, s, n, d)), np.asarray(ref),
        rtol=2e-5, atol=2e-5,
    )
    # lse parity against log-sum-exp of the rotated logits
    qr = apply_rope(q, cos, sin).astype(jnp.float32)
    kr = apply_rope(k, cos, sin).astype(jnp.float32)
    logits = jnp.einsum("bqnd,bknd->bnqk", qr, kr) * (d ** -0.5)
    lse_ref = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lse[:, :, :s]), np.asarray(lse_ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("block_q,block_k,nsub_dq,nsub_dkv,fuse_rope", [
    (128, 128, 1, 1, False),   # round-3 single-tile path
    (256, 256, 2, 2, False),   # decoupled 128-wide sub-blocks
    (256, 256, 2, 2, True),    # sub-blocks + fused RoPE (production path)
])
def test_flat_bwd_kernels_interpret_mode(block_q, block_k, nsub_dq, nsub_dkv,
                                         fuse_rope):
    """The Pallas backward kernels (dq + dkv) in interpreter mode vs
    jax.grad of the dense reference (no padding: kv_len == sk)."""
    from jax.experimental.pallas import tpu as pltpu
    from svi_tpu.ops import attention as attn_mod
    from svi_tpu.ops.rope import apply_rope, rope_angles_for_grid

    rng = np.random.default_rng(7)
    b, s, n, d = 1, 256, 2, 128
    q, k, v = rand_qkv(rng, b, s, s, n, d)
    g4 = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    scale = d ** -0.5
    if fuse_rope:
        cos, sin = rope_angles_for_grid((4, 8, 8), d)  # 256 tokens

        def loss(q_, k_, v_):
            return jnp.sum(dense_reference(
                apply_rope(q_, cos, sin), apply_rope(k_, cos, sin), v_) * g4)
    else:
        def loss(q_, k_, v_):
            return jnp.sum(dense_reference(q_, k_, v_) * g4)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    qf, kf, vf, gf = (t.reshape(b, s, n * d) for t in (q, k, v, g4))
    if fuse_rope:
        qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        cosE, sinE = attn_mod._expand_rope_tables(cos, sin, d, s)
    else:
        qr, kr = q, k
        cosE = sinE = jnp.zeros((8, d), jnp.float32)
    out = dense_reference(qr, kr, v)
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", qr.astype(jnp.float32), kr.astype(jnp.float32)) * scale
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (b, n, s)
    delta = jnp.einsum("bsnd,bsnd->bns", g4, out)
    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv = attn_mod._flash_bwd_pallas_flat(
            qf, kf, vf, gf, lse[:, :, None, :], delta[:, :, None, :],
            cosE, sinE, scale, block_q, block_k, d, fuse_rope=fuse_rope,
            nsub_dq=nsub_dq, nsub_dkv=nsub_dkv,
        )
    np.testing.assert_allclose(np.asarray(dq.reshape(b, s, n, d)),
                               np.asarray(dq_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk.reshape(b, s, n, d)),
                               np.asarray(dk_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv.reshape(b, s, n, d)),
                               np.asarray(dv_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("block_q,block_k,pad_q", [
    (128, 128, 0),    # exact blocks
    (64, 256, 64),    # padded q rows + rectangular blocking
])
def test_onepass_bwd_kernel_interpret_mode(block_q, block_k, pad_q):
    """The one-pass fused backward kernel in interpreter mode vs jax.grad
    of the dense reference (kv_len == sk; zero-padded q rows)."""
    from jax.experimental.pallas import tpu as pltpu
    from svi_tpu.ops import attention as attn_mod

    rng = np.random.default_rng(11)
    b, s, n, d = 2, 256, 2, 128
    q, k, v = rand_qkv(rng, b, s, s, n, d)
    g4 = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    scale = d ** -0.5

    def loss(q_, k_, v_):
        return jnp.sum(dense_reference(q_, k_, v_) * g4)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    out = dense_reference(q, k, v)
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (b, n, s)
    delta = jnp.einsum("bsnd,bsnd->bns", g4, out)
    sp = s + pad_q
    qf = jnp.pad(q.reshape(b, s, n * d), ((0, 0), (0, pad_q), (0, 0)))
    gf = jnp.pad(g4.reshape(b, s, n * d), ((0, 0), (0, pad_q), (0, 0)))
    kf, vf = (t.reshape(b, s, n * d) for t in (k, v))
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_q)))
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_q)))
    nq = sp // block_q
    with pltpu.force_tpu_interpret_mode():
        dq32, dk, dv = attn_mod._flash_bwd_onepass_pallas_flat(
            qf, kf, vf, gf, lse_p.reshape(b, n, nq, block_q),
            delta_p.reshape(b, n, nq, block_q), scale, block_q, block_k, d,
        )
    np.testing.assert_allclose(np.asarray(dq32[:, :s].reshape(b, s, n, d)),
                               np.asarray(dq_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk.reshape(b, s, n, d)),
                               np.asarray(dk_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv.reshape(b, s, n, d)),
                               np.asarray(dv_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("quant", ["qk8", "qk8pv8"])
def test_quant_kernel_interpret_mode(quant):
    """The int8-MXU forward kernel (SageAttention-class: per-token int8 Q,
    per-(b,head) centered int8 K, optional 127-scaled int8 PV) in interpreter
    mode vs the rotated dense reference. K gets a constant bias to exercise
    the softmax-invariant mean-centering. Error bounds are int8 quantization
    noise — an order looser than the bf16 kernel's."""
    from jax.experimental.pallas import tpu as pltpu
    from svi_tpu.ops import attention as attn_mod
    from svi_tpu.ops.rope import apply_rope, rope_angles_for_grid

    rng = np.random.default_rng(6)
    b, s, n, d = 1, 448, 2, 128  # pads to 512 -> masked tail
    q, k, v = rand_qkv(rng, b, s, s, n, d)
    k = k + 0.7  # biased K channels: the centering must absorb this exactly
    cos, sin = rope_angles_for_grid((7, 8, 8), d)
    ref = np.asarray(dense_reference(
        apply_rope(q, cos, sin), apply_rope(k, cos, sin), v))

    qf, kf, vf = (t.reshape(b, s, n * d) for t in (q, k, v))
    block_q, block_k, nsub = 256, 512, 4
    pad = 512 - s
    pv8 = quant == "qk8pv8"
    q8, qs, k8, kscale, v8, vss = attn_mod._quant_prep_xla(
        qf, kf, vf, cos, sin, True, d, pv8)
    v_in = v8 if pv8 else vf
    q8p = jnp.pad(q8, ((0, 0), (0, pad), (0, 0)))
    qsp = jnp.pad(qs, ((0, 0), (0, 0), (0, pad), (0, 0)))
    k8p = jnp.pad(k8, ((0, 0), (0, pad), (0, 0)))
    v_inp = jnp.pad(v_in, ((0, 0), (0, pad), (0, 0)))
    with pltpu.force_tpu_interpret_mode():
        out, lse = attn_mod._flash_fwd_pallas_flat_q8(
            q8p, qsp, k8p, v_inp, kscale, vss, s, d ** -0.5,
            block_q, block_k, d, nsub, pv8, qf.dtype)
    o = np.asarray(out[:, :s].reshape(b, s, n, d))
    err = np.abs(o - ref)
    tol = 0.012 if quant == "qk8" else 0.03
    assert err.max() < tol, (quant, err.max())
    assert err.mean() < tol / 8, (quant, err.mean())
    # softmax weights sum to one either way: the row means must agree tightly
    np.testing.assert_allclose(o.mean(axis=-1), ref.mean(axis=-1), atol=6e-3)


def test_quant_prep_centering_is_softmax_invariant():
    """_quant_prep_xla subtracts a per-(b,head,channel) constant from K; in
    exact arithmetic softmax(q·k^T) is unchanged. Verify on the XLA side by
    undoing the quantization (dequantized centered K vs raw K through dense
    softmax)."""
    rng = np.random.default_rng(3)
    b, s, n, d = 1, 64, 2, 128
    q, k, v = rand_qkv(rng, b, s, s, n, d)
    k = k + 1.3
    from svi_tpu.ops import attention as attn_mod

    _, _, k8, kscale, _, _ = attn_mod._quant_prep_xla(
        q.reshape(b, s, n * d), k.reshape(b, s, n * d),
        v.reshape(b, s, n * d), None, None, False, d, False)
    kdq = (k8.reshape(b, s, n, d).astype(jnp.float32)
           * kscale[:, None, :, None])
    ref = np.asarray(dense_reference(q, k, v))
    got = np.asarray(dense_reference(q, kdq, v))
    # only int8 rounding noise of K remains
    assert np.abs(got - ref).max() < 0.015
