"""SDXL family golden parity vs the reference torch modules."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import sdxl

from reference_loader import load_ref_module


def _randn_load(module, seed):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    module.load_state_dict(state)
    return dict(state)


@pytest.mark.slow
def test_sdxl_unet_parity():
    ref = load_ref_module("diffsynth.models.sdxl_unet")
    model = ref.SDXLUNet().eval()
    state = _randn_load(model, 0)
    params = sdxl.sdxl_unet_params_from_torch(state)

    torch.manual_seed(1)
    sample = torch.randn(1, 4, 8, 12)
    timestep = torch.tensor([333.0])
    text = torch.randn(1, 77, 2048)
    add_time_id = torch.tensor([64.0, 96.0, 0.0, 0.0, 64.0, 96.0])
    add_text = torch.randn(1, 1280)
    with torch.no_grad():
        ref_out = model(sample, timestep, text, add_time_id, add_text).numpy()
    ours = np.asarray(sdxl.sdxl_unet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), jnp.asarray(add_time_id.numpy()),
        jnp.asarray(add_text.numpy())))
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_sdxl_text_encoders_parity():
    ref = load_ref_module("diffsynth.models.sdxl_text_encoder")
    te1 = ref.SDXLTextEncoder(num_encoder_layers=3).eval()
    p1 = sdxl.sdxl_text_encoder_params_from_torch(_randn_load(te1, 2))
    te2 = ref.SDXLTextEncoder2(num_encoder_layers=4).eval()
    p2 = sdxl.sdxl_text_encoder_2_params_from_torch(_randn_load(te2, 3))

    ids = torch.randint(0, 49408, (2, 77))
    with torch.no_grad():
        ref1 = te1(ids, clip_skip=1).numpy()
        ref_pooled, ref_hidden = te2(ids, clip_skip=2)
    ours1 = np.asarray(sdxl.sdxl_text_encoder_forward(p1, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(ours1, ref1, rtol=2e-4, atol=2e-4)
    pooled, hidden = sdxl.sdxl_text_encoder_2_forward(p2, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_sdxl_vae_scaling():
    """SDXL VAE = SD VAE with scaling 0.13025 (ref sdxl_vae_*.py)."""
    from svi_tpu.models import sd as sd_models

    dec_mod = load_ref_module("diffsynth.models.sdxl_vae_decoder")
    dec = dec_mod.SDXLVAEDecoder().eval()
    params = sd_models.sd_vae_decoder_params_from_torch(_randn_load(dec, 4))
    torch.manual_seed(5)
    lat = torch.randn(1, 4, 4, 4)
    with torch.no_grad():
        ref_img = dec(lat).numpy()
    img = np.asarray(sdxl.sdxl_vae_decode(params, jnp.asarray(lat.numpy())))
    np.testing.assert_allclose(img, ref_img, rtol=2e-3, atol=2e-3)


def test_sdxl_pipeline_smoke():
    from svi_tpu.pipelines.sdxl_image import SDXLImagePipeline

    ref = load_ref_module("diffsynth.models.sdxl_unet")
    # tiny UNet stand-in isn't possible (fixed arch); reuse real arch but
    # only exercise two denoise steps at 64x64 via precomputed embeddings
    model = ref.SDXLUNet().eval()
    params = sdxl.sdxl_unet_params_from_torch(_randn_load(model, 6))
    dec_mod = load_ref_module("diffsynth.models.sdxl_vae_decoder")
    from svi_tpu.models import sd as sd_models

    dec = dec_mod.SDXLVAEDecoder().eval()
    dec_params = sd_models.sd_vae_decoder_params_from_torch(_randn_load(dec, 7))

    pipe = SDXLImagePipeline(params, vae_decoder_params=dec_params)
    rng = np.random.default_rng(0)
    posi = (jnp.asarray(rng.normal(size=(1, 1280)), jnp.float32),
            jnp.asarray(rng.normal(size=(1, 77, 2048)), jnp.float32))
    nega = (posi[0] * 0, posi[1] * 0)
    img = pipe("", height=64, width=64, num_inference_steps=2, seed=0,
               prompt_emb_posi=posi, prompt_emb_nega=nega)
    assert img.size == (64, 64)
