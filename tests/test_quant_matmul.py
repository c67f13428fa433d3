"""Int4 unpack/requant Pallas kernel (interpret mode on the CPU mesh):
bit parity vs the XLA unpack + requant math in wan_dit._dense."""

import numpy as np

import jax.numpy as jnp

from svi_tpu.models import wan_dit
from svi_tpu.ops import quant_matmul as qm


def _xla_unpack_requant(wq, r):
    lo = jnp.right_shift(jnp.left_shift(wq, 4), 4)
    hi = jnp.right_shift(wq, 4)
    w8 = jnp.concatenate([lo, hi], axis=0)
    g = w8.shape[0] // r.shape[0]
    return np.asarray(jnp.clip(
        jnp.round(w8.reshape(r.shape[0], g, -1).astype(jnp.float32)
                  * r[:, None, :]),
        -127, 127).astype(jnp.int8).reshape(w8.shape))


def test_unpack_requant_bit_parity():
    rng = np.random.default_rng(0)
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    w[: k // 2] *= 3.0  # non-trivial group-scale variation
    q = wan_dit.quantize_params_int4({"w": jnp.asarray(w)}, min_size=1,
                                     group=wan_dit.INT4_GROUP, w4a8=True)
    assert qm.supports_unpack_requant(q["w_q4"], q["r_q4"])
    got = np.asarray(qm.unpack_requant_int4(q["w_q4"], q["r_q4"],
                                            interpret=True))
    ref = _xla_unpack_requant(q["w_q4"], q["r_q4"])
    np.testing.assert_array_equal(got, ref)


def test_unpack_requant_matmul_matches_w4a8_dense():
    """End math: unpack-kernel + XLA int8 dot reproduces the _dense W4A8
    output (same per-row activation quantization on both sides)."""
    import jax

    rng = np.random.default_rng(1)
    m, k, n = 24, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    q = wan_dit.quantize_params_int4({"w": jnp.asarray(w)}, min_size=1,
                                     group=wan_dit.INT4_GROUP, w4a8=True)
    y_dense = np.asarray(wan_dit._dense(q, x))  # cpu backend -> XLA branch

    w8i = qm.unpack_requant_int4(q["w_q4"], q["r_q4"], interpret=True)
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    yk = jax.lax.dot_general(xq, w8i, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    yk = np.asarray((yk.astype(jnp.float32) * xs * q["s8_q4"]))
    np.testing.assert_allclose(yk, y_dense, rtol=1e-5, atol=1e-6)


def test_supports_gate():
    rng = np.random.default_rng(2)
    wq = jnp.asarray(rng.integers(-128, 127, (128, 128)), jnp.int8)
    r = jnp.ones((2, 128), jnp.float32)
    assert qm.supports_unpack_requant(wq, r)
    assert not qm.supports_unpack_requant(wq, jnp.ones((4, 128)))  # group!=128
    assert not qm.supports_unpack_requant(
        jnp.asarray(rng.integers(-128, 127, (96, 128)), jnp.int8),
        jnp.ones((2, 128), jnp.float32))  # Kh not 128-divisible
