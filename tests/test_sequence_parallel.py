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


def test_pipeline_usp_denoise_matches_single_device():
    """SVIVideoPipeline(use_usp): the denoise step runs sequence-parallel over
    the mesh and matches single-device output."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from tests_pipeline_helpers import tiny_pipeline_models

    from PIL import Image

    from svi_tpu.pipelines.svi_video import SVIVideoPipeline
    from svi_tpu.parallel.mesh import make_sp_mesh

    models = tiny_pipeline_models(z=4)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)

    def run(usp):
        pipe = SVIVideoPipeline(torch_dtype=jnp.float32)
        pipe.dit, pipe.vae, pipe.image_encoder = models
        if usp:
            pipe.sp_mesh = make_sp_mesh()
            pipe.use_unified_sequence_parallel = True
        return pipe(
            input_image=img, random_ref_frame=np.array(img), seed=3,
            height=64, width=64, num_frames=9, cfg_scale=5.0,
            num_inference_steps=2, tiled=False,
            prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5, ref_pad_num=-1,
        )

    ref_frames = run(False)
    usp_frames = run(True)
    for a, b in zip(ref_frames, usp_frames):
        diff = np.abs(np.asarray(a, np.int16) - np.asarray(b, np.int16))
        assert diff.max() <= 2, f"USP output differs by {diff.max()}"
