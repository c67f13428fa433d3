"""FLUX.1 family golden parity vs the reference torch modules.

FluxDiT's constructor hardcodes the 12B configuration, so the torch reference
is built on the meta device (its own init_weights_on_device helper) and
truncated to 2 joint + 2 single blocks before materialization."""

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import flux

from reference_loader import load_ref_module


def _materialize_truncated_flux(n_joint=2, n_single=2, seed=0):
    ref = load_ref_module("diffsynth.models.flux_dit")
    utils = load_ref_module("diffsynth.models.utils")
    with utils.init_weights_on_device(torch.device("meta")):
        model = ref.FluxDiT()
    model.blocks = torch.nn.ModuleList(list(model.blocks[:n_joint]))
    model.single_blocks = torch.nn.ModuleList(list(model.single_blocks[:n_single]))
    model = model.to_empty(device="cpu").eval()
    torch.manual_seed(seed)
    state = model.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.02
    model.load_state_dict(state)
    return ref, model, dict(state)


def test_flux_rope_tables():
    ref = load_ref_module("diffsynth.models.flux_dit")
    rope = ref.RoPEEmbedding(3072, 10000, [16, 56, 56])
    ids = torch.tensor([[[0.0, 0, 0], [0, 1, 0], [0, 2, 3], [0, 5, 7]]])
    freqs = rope(ids)  # (1, 1, S, 64, 2, 2): [[cos, -sin], [sin, cos]]
    cos, sin = flux.flux_rope_tables(jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(cos), freqs[:, 0, :, :, 0, 0].numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), freqs[:, 0, :, :, 1, 0].numpy(),
                               rtol=1e-5, atol=1e-5)


def test_flux_dit_parity():
    _, model, state = _materialize_truncated_flux()
    params = flux.flux_dit_params_from_torch(state)

    torch.manual_seed(1)
    latents = torch.randn(1, 16, 16, 24) * 0.5
    timestep = torch.tensor([800.0])
    prompt_emb = torch.randn(1, 32, 4096) * 0.1
    pooled = torch.randn(1, 768) * 0.1
    guidance = torch.tensor([3.5])
    with torch.no_grad():
        ref_out = model(latents, timestep, prompt_emb, pooled, guidance,
                        text_ids=torch.zeros(1, 32, 3)).numpy()
    ours = np.asarray(flux.flux_dit_forward(
        params, jnp.asarray(latents.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(prompt_emb.numpy()), jnp.asarray(pooled.numpy()),
        guidance=jnp.asarray(guidance.numpy())))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_flux_dit_no_guidance_embedder():
    ref = load_ref_module("diffsynth.models.flux_dit")
    utils = load_ref_module("diffsynth.models.utils")
    with utils.init_weights_on_device(torch.device("meta")):
        model = ref.FluxDiT(disable_guidance_embedder=True)
    model.blocks = torch.nn.ModuleList(list(model.blocks[:1]))
    model.single_blocks = torch.nn.ModuleList(list(model.single_blocks[:1]))
    model = model.to_empty(device="cpu").eval()
    torch.manual_seed(2)
    state = model.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.02
    model.load_state_dict(state)
    params = flux.flux_dit_params_from_torch(dict(state))
    assert "guidance_embedder" not in params

    latents = torch.randn(1, 16, 8, 8) * 0.5
    prompt_emb = torch.randn(1, 16, 4096) * 0.1
    pooled = torch.randn(1, 768) * 0.1
    with torch.no_grad():
        ref_out = model(latents, torch.tensor([100.0]), prompt_emb, pooled,
                        None, text_ids=torch.zeros(1, 16, 3)).numpy()
    ours = np.asarray(flux.flux_dit_forward(
        params, jnp.asarray(latents.numpy()), jnp.asarray([100.0]),
        jnp.asarray(prompt_emb.numpy()), jnp.asarray(pooled.numpy())))
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_flux_vae_roundtrip_parity():
    enc_mod = load_ref_module("diffsynth.models.flux_vae")
    enc = enc_mod.FluxVAEEncoder().eval()
    dec = enc_mod.FluxVAEDecoder().eval()
    torch.manual_seed(3)
    est = enc.state_dict()
    for k in est:
        est[k] = torch.randn_like(est[k]) * 0.05
    enc.load_state_dict(est)
    dst = dec.state_dict()
    for k in dst:
        dst[k] = torch.randn_like(dst[k]) * 0.05
    dec.load_state_dict(dst)
    enc_params = flux.flux_vae_encoder_params_from_torch(dict(est))
    dec_params = flux.flux_vae_decoder_params_from_torch(dict(dst))

    torch.manual_seed(4)
    image = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref_lat = enc(image).numpy()
        ref_img = dec(torch.from_numpy(ref_lat)).numpy()
    lat = np.asarray(flux.flux_vae_encode(enc_params, jnp.asarray(image.numpy())))
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-3)
    img = np.asarray(flux.flux_vae_decode(dec_params, jnp.asarray(lat)))
    np.testing.assert_allclose(img, ref_img, rtol=2e-3, atol=2e-3)
