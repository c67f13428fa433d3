"""Flash attention op: XLA-chunked path vs dense softmax reference, VJP check.

The Pallas TPU kernel itself is exercised on real hardware by bench.py and
__graft_entry__; here (CPU) we validate the identical math via the chunked
XLA path and pallas interpret mode on tiny shapes.
"""

import numpy as np
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
