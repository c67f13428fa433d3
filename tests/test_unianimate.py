"""UniAnimate pipeline family: golden parity for the auxiliary embedding
stacks and the context-window scheduler, plus tiny-model e2e runs of all
three pipelines (ref diffsynth/pipelines/wan_video.py:411-1583)."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax
import jax.numpy as jnp

from svi_tpu.models import unianimate
from svi_tpu.pipelines import wan_video as wv

ref_wv = load_ref_module("diffsynth.pipelines.wan_video")


def test_context_scheduler_golden():
    for step in (0, 3, 17):
        for frames, size, overlap in [(30, 21, 4), (12, 4, 1), (6, 8, 2)]:
            ours = list(wv.context_scheduler(step, 31, frames, context_size=size,
                                             context_stride=1, context_overlap=overlap))
            ref = list(ref_wv.context_scheduler(step, 31, frames, context_size=size,
                                                context_stride=1, context_overlap=overlap))
            assert ours == ref, (step, frames, size, overlap)
    assert wv.ordered_halving(12345) == ref_wv.ordered_halving(12345)


def _torch_stack_2d(channels, layers):
    mods = []
    for i, (k, s, p) in enumerate(layers):
        mods.append(torch.nn.Conv2d(channels[i], channels[i + 1], k, stride=s, padding=p))
        if i < len(layers) - 1:
            mods.append(torch.nn.SiLU())
    return torch.nn.Sequential(*mods)


def _torch_stack_3d(channels, layers):
    mods = []
    for i, (k, s, p) in enumerate(layers):
        mods.append(torch.nn.Conv3d(channels[i], channels[i + 1], k, stride=s, padding=p))
        if i < len(layers) - 1:
            mods.append(torch.nn.SiLU())
    return torch.nn.Sequential(*mods)


def test_randomref_embedding_parity():
    torch.manual_seed(0)
    tm = _torch_stack_2d(unianimate.RANDOMREF_CHANNELS, unianimate.RANDOMREF_LAYERS).eval()
    params = unianimate.randomref_from_torch(tm.state_dict())
    rng = np.random.default_rng(1)
    pose = rng.integers(0, 255, (1, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(pose).permute(0, 3, 1, 2) / 255.0).unsqueeze(2).numpy()
    ours = np.asarray(unianimate.randomref_forward(params, jnp.asarray(pose)))
    assert ours.shape == ref.shape == (1, 20, 1, 4, 6)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_learn_in_and_inpaint_parity():
    torch.manual_seed(1)
    tm = _torch_stack_3d(unianimate.LEARN_IN_CHANNELS, unianimate.LEARN_IN_LAYERS).eval()
    params = unianimate.learn_in_from_torch(tm.state_dict())
    rng = np.random.default_rng(2)
    mv = rng.standard_normal((1, 4, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tin = torch.tensor(mv)
        tin = torch.cat([tin[:, :, :1].repeat(1, 1, 3, 1, 1), tin], dim=2)
        ref = tm(tin).numpy()
    ours = np.asarray(unianimate.learn_in_forward(params, jnp.asarray(mv)))
    assert ours.shape == ref.shape == (1, 16, 3, 4, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    tm2 = _torch_stack_3d(unianimate.INPAINT_CHANNELS, unianimate.INPAINT_LAYERS).eval()
    params2 = unianimate.inpaint_from_torch(tm2.state_dict())
    lat = rng.standard_normal((1, 16, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref2 = tm2(torch.tensor(lat)).numpy()
    ours2 = np.asarray(unianimate.inpaint_forward(params2, jnp.asarray(lat)))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-4, atol=1e-5)


def _tiny_unianimate_pipe(cls):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tests_pipeline_helpers import tiny_pipeline_models

    from svi_tpu.models import pose_embedding

    (dit, vae, clip) = tiny_pipeline_models(z=4)
    pipe = cls(torch_dtype=jnp.float32)
    pipe.dit, pipe.vae, pipe.image_encoder = dit, vae, clip
    pipe.dwpose_embedding = pose_embedding.init_params(jax.random.PRNGKey(3), dit[1].dim)
    pipe.randomref_embedding_pose = unianimate.init_randomref(jax.random.PRNGKey(4))
    return pipe


def _randomref_tiny(pipe):
    """Tiny DiT has y with 4+z=8 channels, not 20 — rebuild the last conv."""
    import math

    last = pipe.randomref_embedding_pose[-1]
    cin = last["w"].shape[-2]
    k1 = jax.random.PRNGKey(5)
    lim = 1.0 / math.sqrt(cin * 9)
    pipe.randomref_embedding_pose[-1] = {
        "w": jax.random.uniform(k1, (3, 3, cin, 8), jnp.float32, -lim, lim),
        "b": jnp.zeros((8,), jnp.float32),
    }


def test_unianimate_pipeline_e2e():
    from PIL import Image

    pipe = _tiny_unianimate_pipe(wv.WanUniAnimateVideoPipeline)
    _randomref_tiny(pipe)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    pose = rng.integers(0, 255, (3, 9, 64, 64)).astype(np.float32)
    ref_pose = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    frames = pipe(
        input_image=img, dwpose_data=pose, random_ref_dwpose=ref_pose,
        seed=1, height=64, width=64, num_frames=9, cfg_scale=5.0,
        num_inference_steps=2, tiled=False,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5,
    )
    assert len(frames) == 9 and frames[0].size == (64, 64)


def test_unianimate_long_pipeline_e2e():
    from PIL import Image

    pipe = _tiny_unianimate_pipe(wv.WanUniAnimateLongVideoPipeline)
    _randomref_tiny(pipe)
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    # 21 frames -> 6 latent frames, windows of 3 with overlap 1
    pose = rng.integers(0, 255, (3, 21, 64, 64)).astype(np.float32)
    ref_pose = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    frames = pipe(
        input_image=img, dwpose_data=pose, random_ref_dwpose=ref_pose,
        seed=2, height=64, width=64, num_frames=21, cfg_scale=5.0,
        num_inference_steps=2, tiled=False, context_size=3, context_overlap=1,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5,
    )
    assert len(frames) == 21


def test_replace_anyone_pipeline_e2e():
    from PIL import Image

    pipe = _tiny_unianimate_pipe(wv.WanRepalceAnyoneVideoPipeline)
    _randomref_tiny(pipe)
    pipe.learn_in_embedding = unianimate.init_learn_in(jax.random.PRNGKey(6))
    # learn_in emits 16 latent channels; tiny DiT latents have z=4
    pipe.learn_in_embedding[-1]["w"] = pipe.learn_in_embedding[-1]["w"][..., :4]
    pipe.learn_in_embedding[-1]["b"] = pipe.learn_in_embedding[-1]["b"][:4]
    pipe.inpaint_embedding = unianimate.init_inpaint(jax.random.PRNGKey(7))
    pipe.inpaint_embedding[0]["w"] = pipe.inpaint_embedding[0]["w"][..., :4, :]
    pipe.inpaint_embedding[-1]["w"] = pipe.inpaint_embedding[-1]["w"][..., :4]
    pipe.inpaint_embedding[-1]["b"] = pipe.inpaint_embedding[-1]["b"][:4]

    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    pose = rng.integers(0, 255, (3, 9, 64, 64)).astype(np.float32)
    ref_pose = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    batch = {
        "video": rng.uniform(-1, 1, (3, 9, 64, 64)).astype(np.float32),
        "segmentation_data": (rng.random((9, 64, 64)) > 0.7).astype(np.float32) * 255,
    }
    frames = pipe(
        input_image=img, dwpose_data=pose, random_ref_dwpose=ref_pose, batch=batch,
        seed=3, height=64, width=64, num_frames=9, cfg_scale=5.0,
        num_inference_steps=2, tiled=False,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5,
    )
    assert len(frames) == 9
