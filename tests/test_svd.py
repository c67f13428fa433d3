"""SVD golden parity vs the reference torch modules (full architectures at
tiny spatial sizes; the UNet is ~1.5B so the forward runs at 8x8 latent)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import svd

from reference_loader import load_ref_module


def _randn_state(module, seed, scale=0.04):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


def test_positional_ids():
    ref = load_ref_module("diffsynth.models.svd_unet")
    pid = ref.PositionalID()
    for n in (5, 25, 30, 80):
        np.testing.assert_array_equal(svd.positional_ids(n),
                                      pid(n).numpy())


@pytest.mark.slow
def test_svd_unet_parity():
    ref = load_ref_module("diffsynth.models.svd_unet")
    model = ref.SVDUNet().eval()
    state = _randn_state(model, 0, scale=0.03)
    params = svd.svd_unet_params_from_torch(state)

    torch.manual_seed(1)
    frames = 3
    sample = torch.randn(frames, 8, 8, 8) * 0.5
    timestep = 444.0
    image_emb = torch.randn(1, 1024) * 0.3
    add_time_id = torch.tensor([6.0, 127.0, 0.02])
    with torch.no_grad():
        ref_out = model(sample, timestep, image_emb, add_time_id).numpy()
    ours = np.asarray(svd.svd_unet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray([timestep]),
        jnp.asarray(image_emb.numpy()), jnp.asarray(add_time_id.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=4e-3, atol=4e-3)


def test_svd_vae_decoder_parity():
    ref = load_ref_module("diffsynth.models.svd_vae_decoder")
    dec = ref.SVDVAEDecoder().eval()
    state = _randn_state(dec, 2, scale=0.05)
    params = svd.svd_vae_decoder_params_from_torch(state)

    torch.manual_seed(3)
    latents = torch.randn(4, 3, 8, 8)  # (C, T, H, W)
    with torch.no_grad():
        ref_out = dec(latents).numpy()
    ours = np.asarray(svd.svd_vae_decode(params, jnp.asarray(latents.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=4e-3, atol=4e-3)
