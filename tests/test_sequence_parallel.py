"""Sequence-parallel DiT forward on the virtual 8-device CPU mesh vs single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svi_tpu.models import wan_dit
from svi_tpu.parallel.mesh import make_mesh
from svi_tpu.parallel.sequence_parallel import forward_sp
from svi_tpu.training import lora as lora_mod

TINY = wan_dit.WanDiTConfig(
    dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
    num_heads=2, num_layers=2, dtype=jnp.float32,
)


def make_inputs(b=1, f=3, h=8, w=12, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, 16, f, h, w)), jnp.float32)
    t = jnp.full((b,), 217.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 9, 48)), jnp.float32)
    return x, t, ctx


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (1, 4)])
def test_forward_sp_matches_single_device(mesh_shape):
    data, sp = mesh_shape
    ndev = data * sp
    mesh = make_mesh(data=data, sp=sp, devices=jax.devices()[:ndev])
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    b = data  # batch shards over data
    x, t, ctx = make_inputs(b=b)
    # token count 3*4*6 = 72: not divisible by 8 -> exercises padding+masking
    ref = wan_dit.forward(params, TINY, x, t, ctx)
    sp_fn = jax.jit(
        lambda p, x, t, c: forward_sp(p, TINY, x, t, c, mesh=mesh)
    )
    out = sp_fn(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_forward_sp_with_lora_matches():
    mesh = make_mesh(data=1, sp=8)
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    lora = lora_mod.init_lora_params(jax.random.PRNGKey(1), TINY, rank=4)
    lora = jax.tree.map(lambda v: v + 0.02, lora)
    x, t, ctx = make_inputs()
    ref = wan_dit.forward(params, TINY, x, t, ctx, lora=lora, lora_scale=0.5)
    out = jax.jit(
        lambda p, x, t, c, l: forward_sp(p, TINY, x, t, c, mesh=mesh, lora=l, lora_scale=0.5)
    )(params, x, t, ctx, lora)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_forward_sp_i2v_branch():
    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    mesh = make_mesh(data=2, sp=4)
    params = wan_dit.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, 16, 3, 8, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 20, 3, 8, 12)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((b, 257, 40)), jnp.float32)
    t = jnp.full((b,), 512.0, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, 9, 48)), jnp.float32)
    ref = wan_dit.forward(params, cfg, x, t, ctx, clip_feature=clip, y=y)
    out = jax.jit(
        lambda p, x, t, c, cf, y_: forward_sp(p, cfg, x, t, c, clip_feature=cf, y=y_, mesh=mesh)
    )(params, x, t, ctx, clip, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_ring_attention_matches_all_gather(mesh_shape):
    """Ring attention (ppermute rotation + lse merge) == all-gather KV == single device."""
    data, sp = mesh_shape
    mesh = make_mesh(data=data, sp=sp, devices=jax.devices()[: data * sp])
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    x, t, ctx = make_inputs(b=data)
    ref = wan_dit.forward(params, TINY, x, t, ctx)
    out_ring = jax.jit(
        lambda p, x, t, c: forward_sp(p, TINY, x, t, c, mesh=mesh, ring=True)
    )(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(ref), rtol=3e-4, atol=3e-4)
