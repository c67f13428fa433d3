"""Tensor-parallel DiT: sharded weights, psum-combined matmuls vs single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svi_tpu.models import wan_dit
from svi_tpu.parallel.mesh import make_mesh
from svi_tpu.parallel.tensor_parallel import forward_tp, shard_dit_params_tp

TINY = wan_dit.WanDiTConfig(
    dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
    num_heads=8, num_layers=2, dtype=jnp.float32,  # 8 heads -> up to 8-way TP
)


def make_inputs(b=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, 16, 3, 8, 12)), jnp.float32)
    t = jnp.full((b,), 400.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 9, 48)), jnp.float32)
    return x, t, ctx


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (1, 2)])
def test_forward_tp_matches_single_device(mesh_shape):
    data, tp = mesh_shape
    mesh = make_mesh(data=data, sp=tp, devices=jax.devices()[: data * tp])
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    x, t, ctx = make_inputs(b=data)
    ref = wan_dit.forward(params, TINY, x, t, ctx)
    sharded = shard_dit_params_tp(params, TINY, mesh)
    out = jax.jit(lambda p, x, t, c: forward_tp(p, TINY, x, t, c, mesh=mesh))(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_forward_tp_i2v():
    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        num_heads=8, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    mesh = make_mesh(data=1, sp=8)
    params = wan_dit.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 20, 3, 8, 12)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((1, 257, 40)), jnp.float32)
    t = jnp.full((1,), 100.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 9, 48)), jnp.float32)
    ref = wan_dit.forward(params, cfg, x, t, ctx, clip_feature=clip, y=y)
    sharded = shard_dit_params_tp(params, cfg, mesh)
    out = jax.jit(
        lambda p, x, t, c, cf, y_: forward_tp(p, cfg, x, t, c, clip_feature=cf, y=y_, mesh=mesh)
    )(sharded, x, t, ctx, clip, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_param_memory_actually_sharded():
    """Each device's addressable shard of block weights is 1/n of the total."""
    mesh = make_mesh(data=1, sp=8)
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    sharded = shard_dit_params_tp(params, TINY, mesh)
    w = sharded["blocks"]["ffn"]["0"]["w"]  # (L, d, f) sharded on axis 2
    shard_shape = w.addressable_shards[0].data.shape
    assert shard_shape == (TINY.num_layers, TINY.dim, TINY.ffn_dim // 8)


def test_forward_tp_w8a8_quantized():
    """W8A8 int8 execution under tensor parallelism: column-parallel sites
    are bit-identical to single-chip W8A8 (the per-token activation scale is
    computed over the replicated input features); row-parallel sites
    quantize each shard's activation slice with its own per-token max, so
    TP output is compared against the FLOAT forward at the same quant
    tolerance as single-chip W8A8 (test_wan_dit.py::
    test_w8a8_quantized_forward_close)."""
    mesh = make_mesh(data=1, sp=8)
    params = wan_dit.init_params(jax.random.PRNGKey(3), TINY)
    qparams = wan_dit.quantize_params_w8a8(params, min_size=1024)
    x, t, ctx = make_inputs(b=1, seed=3)

    ref = np.asarray(wan_dit.forward(params, TINY, x, t, ctx))
    ref_q = np.asarray(wan_dit.forward(qparams, TINY, x, t, ctx))
    sharded = shard_dit_params_tp(qparams, TINY, mesh)
    # the blocks must actually hold int8 leaves, sharded
    w = sharded["blocks"]["ffn"]["0"]["w_q8"]
    assert w.dtype == jnp.int8
    assert w.addressable_shards[0].data.shape == (
        TINY.num_layers, TINY.dim, TINY.ffn_dim // 8)
    out = np.asarray(jax.jit(
        lambda p, x_, t_, c: forward_tp(p, TINY, x_, t_, c, mesh=mesh)
    )(sharded, x, t, ctx))

    rel_float = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel_float < 0.08, f"TP w8a8 vs float rel err {rel_float}"
    # TP-vs-single-chip quantized drift is bounded by the row-site activation
    # requantization alone — much smaller than the quant noise itself
    rel_q = np.abs(out - ref_q).mean() / (np.abs(ref_q).mean() + 1e-8)
    assert rel_q < 0.05, f"TP w8a8 vs single-chip w8a8 rel err {rel_q}"


def test_forward_tp_int8_storage_quantized():
    """int8 storage-only quantization (bf16 matmuls after per-channel
    dequant) under TP: dequantization is deterministic, so TP matches the
    single-device quantized forward to reduction-order tolerance."""
    mesh = make_mesh(data=1, sp=4, devices=jax.devices()[:4])
    params = wan_dit.init_params(jax.random.PRNGKey(4), TINY)
    qparams = wan_dit.quantize_params_int8(params, min_size=1024)
    x, t, ctx = make_inputs(b=1, seed=4)

    ref_q = np.asarray(wan_dit.forward(qparams, TINY, x, t, ctx))
    sharded = shard_dit_params_tp(qparams, TINY, mesh)
    out = np.asarray(jax.jit(
        lambda p, x_, t_, c: forward_tp(p, TINY, x_, t_, c, mesh=mesh)
    )(sharded, x, t, ctx))
    np.testing.assert_allclose(out, ref_q, rtol=3e-4, atol=3e-4)


def test_forward_tp_int4_row_sharding_rejected():
    """Packed int4 cannot be row-sharded (half-split nibble layout breaks the
    contiguous activation slice); shard_dit_params_tp must say so."""
    mesh = make_mesh(data=1, sp=2, devices=jax.devices()[:2])
    params = wan_dit.init_params(jax.random.PRNGKey(5), TINY)
    qparams = wan_dit.quantize_params_int4(params, min_size=1024)
    with pytest.raises(ValueError, match="row-sharded"):
        shard_dit_params_tp(qparams, TINY, mesh)
