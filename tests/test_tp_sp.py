"""2D tensor x sequence parallel DiT forward vs single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svi_tpu.models import wan_dit
from svi_tpu.parallel.tp_sp import forward_tpsp, make_mesh3, shard_dit_params_tpsp

TINY = wan_dit.WanDiTConfig(
    dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
    num_heads=8, num_layers=2, dtype=jnp.float32,
)


def make_inputs(b=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, 16, 3, 8, 12)), jnp.float32)
    t = jnp.full((b,), 300.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 9, 48)), jnp.float32)
    return x, t, ctx


@pytest.mark.parametrize("mesh_shape,ring", [
    ((1, 2, 4), False), ((1, 4, 2), False), ((2, 2, 2), False), ((1, 2, 4), True),
])
def test_forward_tpsp_matches_single_device(mesh_shape, ring):
    data, tp, sp = mesh_shape
    mesh = make_mesh3(data=data, tp=tp, sp=sp)
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    x, t, ctx = make_inputs(b=data)
    ref = wan_dit.forward(params, TINY, x, t, ctx)
    sharded = shard_dit_params_tpsp(params, TINY, mesh)
    out = jax.jit(
        lambda p, x, t, c: forward_tpsp(p, TINY, x, t, c, mesh=mesh, ring=ring)
    )(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_forward_tpsp_i2v():
    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        num_heads=8, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    mesh = make_mesh3(data=1, tp=2, sp=4)
    params = wan_dit.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 20, 3, 8, 12)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((1, 257, 40)), jnp.float32)
    t = jnp.full((1,), 64.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 9, 48)), jnp.float32)
    ref = wan_dit.forward(params, cfg, x, t, ctx, clip_feature=clip, y=y)
    sharded = shard_dit_params_tpsp(params, cfg, mesh)
    out = jax.jit(
        lambda p, x, t, c, cf, y_: forward_tpsp(
            p, cfg, x, t, c, clip_feature=cf, y=y_, mesh=mesh
        )
    )(sharded, x, t, ctx, clip, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_forward_tpsp_w8a8_quantized():
    """W8A8 int8 execution under the 2D TP x SP mesh: quantized leaves shard
    on the tp axis, sequence shards on sp; output stays within single-chip
    W8A8 quant tolerance of the float forward."""
    mesh = make_mesh3(data=1, tp=2, sp=4)
    params = wan_dit.init_params(jax.random.PRNGKey(6), TINY)
    qparams = wan_dit.quantize_params_w8a8(params, min_size=1024)
    x, t, ctx = make_inputs(b=1, seed=6)
    ref = np.asarray(wan_dit.forward(params, TINY, x, t, ctx))
    sharded = shard_dit_params_tpsp(qparams, TINY, mesh)
    assert sharded["blocks"]["ffn"]["0"]["w_q8"].dtype == jnp.int8
    out = np.asarray(jax.jit(
        lambda p, x_, t_, c: forward_tpsp(p, TINY, x_, t_, c, mesh=mesh)
    )(sharded, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.08, f"TPxSP w8a8 vs float rel err {rel}"
