"""AnimateDiff motion module golden parity via the reference lets_dance loop."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import motion as mo
from svi_tpu.models import sd as sd_models

from reference_loader import load_ref_module, load_reference_package


def _randn_state(module, seed, scale=0.05):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


def test_sd_motion_lets_dance_parity():
    unet_mod = load_ref_module("diffsynth.models.sd_unet")
    motion_mod = load_ref_module("diffsynth.models.sd_motion")
    unet = unet_mod.SDUNet().eval()
    unet_params = sd_models.sd_unet_params_from_torch(_randn_state(unet, 0))
    mm = motion_mod.SDMotionModel().eval()
    mm_params = mo.motion_params_from_torch(_randn_state(mm, 1))

    load_reference_package()
    models_pkg = sys.modules["diffsynth.models"]
    models_pkg.SDUNet = unet_mod.SDUNet
    models_pkg.SDXLUNet = object
    models_pkg.SDMotionModel = motion_mod.SDMotionModel
    models_pkg.SDXLMotionModel = type("SDXLMotionModel", (), {})
    dancer = load_ref_module("diffsynth.pipelines.dancer")

    torch.manual_seed(2)
    frames = 4  # frames ride the batch axis (AnimateDiff)
    sample = torch.randn(frames, 4, 8, 8)
    timestep = torch.tensor([515.0])
    text = torch.randn(1, 77, 768) * 0.3
    with torch.no_grad():
        ref_out = dancer.lets_dance(
            unet, motion_modules=mm, sample=sample, timestep=timestep,
            encoder_hidden_states=text.repeat(frames, 1, 1),
            unet_batch_size=frames, device="cpu").numpy()

    hooks = mo.motion_hooks(mm_params, batch_size=1)
    ours = np.asarray(sd_models.sd_unet_forward(
        unet_params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), motion=hooks))
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-3)


def test_denoise_long_video_blend_matches_reference():
    """Window blending math vs a direct port of lets_dance_with_long_video."""
    from svi_tpu.pipelines.sd_video import denoise_long_video

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(11, 4, 2, 2)).astype(np.float32)
    preds = {}

    def run_window(lo, hi):
        key = (lo, hi)
        if key not in preds:
            preds[key] = rng.normal(size=(hi - lo, 4, 2, 2)).astype(np.float32)
        return preds[key]

    ours = denoise_long_video(run_window, latents, window=4, stride=2)

    # direct loop port (ref sd_video.py:33-63)
    out = [(np.zeros((4, 2, 2), np.float32), 0.0) for _ in range(11)]
    for lo in range(0, 11, 2):
        hi = min(lo + 4, 11)
        batch = preds[(lo, hi)]
        for i in range(lo, hi):
            bias = max(1 - abs(i - (lo + hi - 1) / 2) / ((hi - lo - 1 + 1e-2) / 2), 1e-2)
            h, num = out[i]
            out[i] = (h * (num / (num + bias)) + batch[i - lo] * (bias / (num + bias)),
                      num + bias)
        if hi == 11:
            break
    ref = np.stack([h for h, _ in out])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
