"""SD3 family golden parity vs the reference torch modules (reduced-depth
DiT configs — the constructor exposes embed_dim/num_layers — full-size VAE)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.models import sd3

from reference_loader import load_ref_module


def _randn_load(module, seed):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    module.load_state_dict(state)
    return dict(state)


@pytest.mark.parametrize("use_rms_norm,num_dual_blocks", [(False, 0), (True, 2)])
def test_sd3_dit_parity(use_rms_norm, num_dual_blocks):
    """SD3-medium shape (no rms, no dual) and SD3.5-large shape (rms+dual)."""
    ref = load_ref_module("diffsynth.models.sd3_dit")
    model = ref.SD3DiT(embed_dim=256, num_layers=4, use_rms_norm=use_rms_norm,
                       num_dual_blocks=num_dual_blocks,
                       pos_embed_max_size=16).eval()
    state = _randn_load(model, num_dual_blocks)
    params = sd3.sd3_dit_params_from_torch(state, num_dual_blocks=num_dual_blocks)

    torch.manual_seed(1)
    latents = torch.randn(2, 16, 16, 24)
    timestep = torch.tensor([441.0])
    prompt_emb = torch.randn(2, 90, 4096)
    pooled = torch.randn(2, 2048)
    with torch.no_grad():
        ref_out = model(latents, timestep, prompt_emb, pooled).numpy()
    ours = np.asarray(sd3.sd3_dit_forward(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(prompt_emb.numpy()), jnp.asarray(pooled.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_sd3_text_encoder_1_parity():
    ref = load_ref_module("diffsynth.models.sd3_text_encoder")
    te = ref.SD3TextEncoder1().eval()
    # shrink to 4 layers for speed: rebuild with fewer encoders
    te.encoders = te.encoders[:4]
    state = _randn_load(te, 3)
    from svi_tpu.models import sd as sd_models

    params = sd_models.sd_text_encoder_params_from_torch(state)
    ids = torch.randint(0, 49408, (2, 77))
    with torch.no_grad():
        ref_pooled, ref_hidden = te(ids, clip_skip=2)
    pooled, hidden = sd3.sd3_text_encoder_1_forward(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_sd3_vae_roundtrip_parity():
    enc_mod = load_ref_module("diffsynth.models.sd3_vae_encoder")
    dec_mod = load_ref_module("diffsynth.models.sd3_vae_decoder")
    enc = enc_mod.SD3VAEEncoder().eval()
    dec = dec_mod.SD3VAEDecoder().eval()
    enc_params = sd3.sd3_vae_encoder_params_from_torch(_randn_load(enc, 4))
    dec_params = sd3.sd3_vae_decoder_params_from_torch(_randn_load(dec, 5))

    torch.manual_seed(6)
    image = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref_lat = enc(image).numpy()
        ref_img = dec(torch.from_numpy(ref_lat)).numpy()
    lat = np.asarray(sd3.sd3_vae_encode(enc_params, jnp.asarray(image.numpy())))
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-3)
    img = np.asarray(sd3.sd3_vae_decode(dec_params, jnp.asarray(lat)))
    np.testing.assert_allclose(img, ref_img, rtol=2e-3, atol=2e-3)
