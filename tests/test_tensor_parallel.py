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
