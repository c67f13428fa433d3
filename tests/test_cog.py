"""CogVideoX golden parity vs the reference torch modules (DiT truncated to
2 blocks on the meta device; VAE full-size at tiny resolution)."""

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import cog

from reference_loader import load_ref_module


def _randn_state(module, seed, scale=0.03):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


def test_cog_rope_tables():
    ref = load_ref_module("diffsynth.models.cog_dit")
    utils = load_ref_module("diffsynth.models.utils")
    with utils.init_weights_on_device(torch.device("meta")):
        model = ref.CogDiT()
    cos_ref, sin_ref = model.prepare_rotary_positional_embeddings(
        16, 24, 3, device="cpu")
    cos, sin = cog.prepare_rope_tables(16, 24, 3)
    np.testing.assert_allclose(np.repeat(cos, 2, axis=1), cos_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.repeat(sin, 2, axis=1), sin_ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_cog_dit_parity():
    ref = load_ref_module("diffsynth.models.cog_dit")
    utils = load_ref_module("diffsynth.models.utils")
    with utils.init_weights_on_device(torch.device("meta")):
        model = ref.CogDiT()
    model.blocks = torch.nn.ModuleList(list(model.blocks[:2]))
    model = model.to_empty(device="cpu").eval()
    state = _randn_state(model, 0, scale=0.02)
    params = cog.cog_dit_params_from_torch(state)

    torch.manual_seed(1)
    latents = torch.randn(1, 16, 2, 16, 24) * 0.5
    timestep = torch.tensor([250.0])
    prompt_emb = torch.randn(1, 16, 4096) * 0.1
    with torch.no_grad():
        ref_out = model(latents, timestep, prompt_emb).numpy()
    ours = np.asarray(cog.cog_dit_forward(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(prompt_emb.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_cog_vae_roundtrip_parity():
    mod = load_ref_module("diffsynth.models.cog_vae")
    enc = mod.CogVAEEncoder().eval()
    dec = mod.CogVAEDecoder().eval()
    enc_state = _randn_state(enc, 2, scale=0.05)
    dec_state = _randn_state(dec, 3, scale=0.05)
    enc_params = cog.cog_vae_encoder_params_from_torch(enc_state)
    dec_params = cog.cog_vae_decoder_params_from_torch(dec_state)

    torch.manual_seed(4)
    video = torch.randn(1, 3, 9, 32, 32)  # odd leading frame path
    with torch.no_grad():
        ref_lat = enc.encode_small_video(video).numpy()
        ref_out = dec.decode_small_video(torch.from_numpy(ref_lat)).numpy()
    lat = np.asarray(cog.cog_vae_encode_video(enc_params,
                                              jnp.asarray(video.numpy())))
    assert lat.shape == ref_lat.shape
    np.testing.assert_allclose(lat, ref_lat, rtol=3e-3, atol=3e-3)
    out = np.asarray(cog.cog_vae_decode_video(dec_params, jnp.asarray(lat)))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=3e-3, atol=3e-3)
