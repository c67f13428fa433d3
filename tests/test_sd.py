"""SD 1.5 family golden parity: our JAX models vs the reference torch modules
(full-size architectures, small spatial inputs / truncated layer stacks where
the full stack is too slow for CI)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import sd

from reference_loader import load_ref_module


def _randn_like_sd(module, seed):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    module.load_state_dict(state)
    return {k: v for k, v in state.items()}


@pytest.fixture(scope="module")
def ref_unet():
    return load_ref_module("diffsynth.models.sd_unet")


def test_timestep_embedding_matches():
    ref = load_ref_module("diffsynth.models.sd_unet")
    ts = ref.Timesteps(320)
    t = torch.tensor([0.0, 1.0, 500.0, 999.0])
    ours = np.asarray(sd.timestep_embedding(jnp.asarray(t.numpy()), 320))
    np.testing.assert_allclose(ours, ts(t).numpy(), rtol=2e-4, atol=2e-4)


def test_sd_unet_parity(ref_unet):
    model = ref_unet.SDUNet().eval()
    state = _randn_like_sd(model, 0)
    params = sd.sd_unet_params_from_torch(state)

    torch.manual_seed(1)
    sample = torch.randn(2, 4, 16, 24)
    timestep = torch.tensor([501.0])
    text = torch.randn(1, 77, 768)
    with torch.no_grad():
        ref_out = model(sample, timestep, text.repeat(2, 1, 1)).numpy()
    ours = np.asarray(sd.sd_unet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)


def test_sd_text_encoder_parity():
    ref = load_ref_module("diffsynth.models.sd_text_encoder")
    model = ref.SDTextEncoder(num_encoder_layers=4).eval()
    state = _randn_like_sd(model, 2)
    params = sd.sd_text_encoder_params_from_torch(state)

    ids = torch.randint(0, 49408, (2, 77))
    for clip_skip in (1, 2):
        with torch.no_grad():
            ref_out = model(ids, clip_skip=clip_skip).numpy()
        ours = np.asarray(sd.sd_text_encoder_forward(
            params, jnp.asarray(ids.numpy()), clip_skip=clip_skip))
        np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_sd_vae_roundtrip_parity():
    enc_mod = load_ref_module("diffsynth.models.sd_vae_encoder")
    dec_mod = load_ref_module("diffsynth.models.sd_vae_decoder")
    enc = enc_mod.SDVAEEncoder().eval()
    dec = dec_mod.SDVAEDecoder().eval()
    enc_state = _randn_like_sd(enc, 3)
    dec_state = _randn_like_sd(dec, 4)
    enc_params = sd.sd_vae_encoder_params_from_torch(enc_state)
    dec_params = sd.sd_vae_decoder_params_from_torch(dec_state)

    torch.manual_seed(5)
    image = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref_lat = enc(image).numpy()
        ref_img = dec(torch.from_numpy(ref_lat)).numpy()
    lat = np.asarray(sd.sd_vae_encode(enc_params, jnp.asarray(image.numpy())))
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-3)
    img = np.asarray(sd.sd_vae_decode(dec_params, jnp.asarray(lat)))
    np.testing.assert_allclose(img, ref_img, rtol=2e-3, atol=2e-3)


def test_sd_pipeline_smoke():
    """End-to-end t2i with random tiny-ish weights: shape + determinism."""
    from svi_tpu.pipelines.sd_image import SDImagePipeline

    ref_unet = load_ref_module("diffsynth.models.sd_unet")
    model = ref_unet.SDUNet().eval()
    state = _randn_like_sd(model, 6)
    params = sd.sd_unet_params_from_torch(state)

    dec_mod = load_ref_module("diffsynth.models.sd_vae_decoder")
    dec = dec_mod.SDVAEDecoder().eval()
    dec_params = sd.sd_vae_decoder_params_from_torch(_randn_like_sd(dec, 7))

    pipe = SDImagePipeline(params, vae_decoder_params=dec_params)
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(1, 77, 768)), jnp.float32)
    img = pipe("", height=64, width=64, num_inference_steps=2, seed=0,
               prompt_emb_posi=emb, prompt_emb_nega=emb * 0)
    assert img.size == (64, 64)
    img2 = pipe("", height=64, width=64, num_inference_steps=2, seed=0,
                prompt_emb_posi=emb, prompt_emb_nega=emb * 0)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
