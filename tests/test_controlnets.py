"""ControlNet golden parity: SDControlNet / SDXLControlNetUnion residual
stacks vs the reference, and full UNet+ControlNet inference vs the
reference's lets_dance loop (pipelines/dancer.py)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import controlnets as cn
from svi_tpu.models import sd as sd_models
from svi_tpu.models import sdxl as sdxl_models

from reference_loader import load_ref_module, load_reference_package


def _randn_state(module, seed, scale=0.04):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


@pytest.fixture(scope="module")
def sd_cn_pair():
    ref = load_ref_module("diffsynth.models.sd_controlnet")
    model = ref.SDControlNet().eval()
    state = _randn_state(model, 0)
    return model, cn.sd_controlnet_params_from_torch(state)


def test_sd_controlnet_parity(sd_cn_pair):
    model, params = sd_cn_pair
    torch.manual_seed(1)
    sample = torch.randn(2, 4, 16, 24)
    timestep = torch.tensor(801.0)
    text = torch.randn(2, 77, 768) * 0.3
    cond = torch.randn(2, 3, 128, 192) * 0.5
    with torch.no_grad():
        ref_res = model(sample, timestep, text, cond)
    ours = cn.sd_controlnet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), jnp.asarray(cond.numpy()))
    assert len(ours) == len(ref_res) == 13
    for o, r in zip(ours, ref_res):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=3e-3,
                                   atol=3e-3)


def test_sd_unet_with_controlnet_matches_lets_dance(sd_cn_pair):
    cn_model, cn_params = sd_cn_pair
    ref_unet_mod = load_ref_module("diffsynth.models.sd_unet")
    unet = ref_unet_mod.SDUNet().eval()
    unet_state = _randn_state(unet, 2, scale=0.05)
    unet_params = sd_models.sd_unet_params_from_torch(unet_state)

    # make pipelines.dancer importable with the pieces it references
    load_reference_package()
    models_pkg = sys.modules["diffsynth.models"]
    models_pkg.SDUNet = ref_unet_mod.SDUNet
    models_pkg.SDXLUNet = object
    models_pkg.SDMotionModel = type("SDMotionModel", (), {})
    models_pkg.SDXLMotionModel = type("SDXLMotionModel", (), {})
    dancer = load_ref_module("diffsynth.pipelines.dancer")

    scale = 0.8

    class _Manager:
        def __call__(self, sample, timestep, text, frames, **kwargs):
            with torch.no_grad():
                res = cn_model(sample, timestep, text, frames[0])
            return [r * scale for r in res]

    torch.manual_seed(3)
    sample = torch.randn(1, 4, 16, 24)
    timestep = torch.tensor([441.0])
    text = torch.randn(1, 77, 768) * 0.3
    frames = torch.randn(1, 1, 3, 128, 192) * 0.5
    with torch.no_grad():
        ref_out = dancer.lets_dance(
            unet, controlnet=_Manager(), sample=sample, timestep=timestep,
            encoder_hidden_states=text, controlnet_frames=frames,
            device="cpu").numpy()

    res = cn.sd_controlnet_forward(
        cn_params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), jnp.asarray(frames[0].numpy()))
    res = [r * scale for r in res]
    ours = np.asarray(sd_models.sd_unet_forward(
        unet_params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), controlnet_res=res))
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-3)


def test_sdxl_controlnet_parity():
    ref = load_ref_module("diffsynth.models.sdxl_controlnet")
    model = ref.SDXLControlNetUnion().eval()
    state = _randn_state(model, 4, scale=0.02)
    params = cn.sdxl_controlnet_params_from_torch(state)

    torch.manual_seed(5)
    sample = torch.randn(1, 4, 16, 24)
    timestep = torch.tensor(501.0)
    text = torch.randn(1, 77, 2048) * 0.2
    cond = torch.randn(1, 3, 128, 192) * 0.5
    add_time_id = torch.tensor([128.0, 192, 0, 0, 128, 192])
    add_text = torch.randn(1, 1280) * 0.2
    with torch.no_grad():
        ref_res = model(sample, timestep, text, cond, "canny", add_time_id,
                        add_text)
    ours = cn.sdxl_controlnet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), jnp.asarray(cond.numpy()), "canny",
        jnp.asarray(add_time_id.numpy()), jnp.asarray(add_text.numpy()))
    assert len(ours) == len(ref_res) == 10
    for o, r in zip(ours, ref_res):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=3e-3,
                                   atol=3e-3)
