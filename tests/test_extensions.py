"""Golden parity: ESRGAN RRDBNet + RIFE IFNet vs the reference extensions."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax
import jax.numpy as jnp

from svi_tpu.extensions import esrgan as esrgan_mod
from svi_tpu.extensions import rife as rife_mod

ref_esr = load_ref_module("diffsynth.extensions.ESRGAN.__init__")
ref_rife = load_ref_module("diffsynth.extensions.RIFE.__init__")


def test_rrdbnet_parity():
    torch.manual_seed(0)
    cfg = esrgan_mod.RRDBNetConfig(num_feat=16, num_block=2, num_grow_ch=8)
    tm = ref_esr.RRDBNet(num_feat=16, num_block=2, num_grow_ch=8).eval()
    params = esrgan_mod.params_from_torch_state_dict(tm.state_dict(), cfg)
    rng = np.random.default_rng(1)
    x = rng.random((1, 16, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(esrgan_mod.esrgan_forward(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 64, 96, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_esrgan_upscale_wrapper():
    from PIL import Image

    cfg = esrgan_mod.RRDBNetConfig(num_feat=8, num_block=1, num_grow_ch=4)
    params = esrgan_mod.init_params(jax.random.PRNGKey(0), cfg)
    up = esrgan_mod.ESRGAN(params, cfg)
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (16, 16, 3), dtype=np.uint8))
    out = up.upscale(img)
    assert out.size == (64, 64)
    outs = up.upscale([img, img], batch_size=1)
    assert len(outs) == 2


def test_rife_warp_matches_grid_sample():
    rng = np.random.default_rng(2)
    x = rng.random((2, 8, 12, 3)).astype(np.float32)
    flow = (rng.random((2, 8, 12, 2)).astype(np.float32) - 0.5) * 4
    ours = np.asarray(rife_mod.warp(jnp.asarray(x), jnp.asarray(flow)))
    with torch.no_grad():
        ref = ref_rife.warp(
            torch.tensor(x).permute(0, 3, 1, 2),
            torch.tensor(flow).permute(0, 3, 1, 2),
            device="cpu",
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ifnet_parity():
    torch.manual_seed(3)
    tm = ref_rife.IFNet().eval()
    params = rife_mod.params_from_torch_state_dict(tm.state_dict())
    rng = np.random.default_rng(4)
    x = rng.random((1, 64, 64, 6)).astype(np.float32)
    with torch.no_grad():
        flow_ref, mask_ref, merged_ref = tm(torch.tensor(x).permute(0, 3, 1, 2))
    flow, mask, merged = rife_mod.ifnet_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(merged[2]),
        merged_ref[2].permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mask), mask_ref.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(flow[2]),
        flow_ref[2].permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=5e-4,
    )


def test_rife_interpolate_and_smooth():
    from PIL import Image

    params = rife_mod.init_params(jax.random.PRNGKey(1))
    interp = rife_mod.RIFEInterpolater(params)
    rng = np.random.default_rng(5)
    frames = [Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
              for _ in range(3)]
    out = interp.interpolate(frames, num_iter=1)
    assert len(out) == 5 and out[0].size == (32, 32)
    smoother = rife_mod.RIFESmoother(params)
    out2 = smoother(frames)
    assert len(out2) == 3
