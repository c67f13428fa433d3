"""IP-Adapter + CLIP vision tower golden parity vs the reference."""

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import ipadapter as ipa
from svi_tpu.models import sd as sd_models

from reference_loader import load_ref_module


def _randn_state(module, seed, scale=0.04):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


def test_clip_image_encoder_parity():
    ref = load_ref_module("diffsynth.models.svd_image_encoder")
    model = ref.SVDImageEncoder(num_encoder_layers=3).eval()
    state = _randn_state(model, 0)
    params = ipa.clip_image_encoder_params_from_torch(state)

    torch.manual_seed(1)
    pixels = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref_out = model(pixels).numpy()
    ours = np.asarray(ipa.clip_image_encoder_forward(
        params, jnp.asarray(pixels.numpy())))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_sd_ipadapter_unet_parity():
    """SDIpAdapter kv dict + UNet injection vs the reference block loop."""
    ip_mod = load_ref_module("diffsynth.models.sd_ipadapter")
    adapter = ip_mod.SDIpAdapter().eval()
    state = _randn_state(adapter, 2)
    params = ipa.ipadapter_params_from_torch(state)

    unet_mod = load_ref_module("diffsynth.models.sd_unet")
    unet = unet_mod.SDUNet().eval()
    unet_state = _randn_state(unet, 3, scale=0.05)
    unet_params = sd_models.sd_unet_params_from_torch(unet_state)

    torch.manual_seed(4)
    image_emb = torch.randn(1, 1024) * 0.3
    sample = torch.randn(1, 4, 16, 16)
    timestep = torch.tensor([301.0])
    text = torch.randn(1, 77, 768) * 0.3
    with torch.no_grad():
        ip_kv = adapter(image_emb, scale=0.7)
        # reference injection path: AttentionBlock(ipadapter_kwargs_list=...)
        t_emb = unet.time_embedding(unet.time_proj(timestep))
        h = unet.conv_in(sample)
        res_stack = [h]
        for block_id, block in enumerate(unet.blocks):
            h, t_emb, text_, res_stack = block(
                h, t_emb, text, res_stack,
                ipadapter_kwargs_list=ip_kv.get(block_id, {}))
        h = unet.conv_norm_out(h)
        h = unet.conv_act(h)
        ref_out = unet.conv_out(h).numpy()

    kv = ipa.sd_ipadapter_kv(params, jnp.asarray(image_emb.numpy()), scale=0.7)
    ours = np.asarray(sd_models.sd_unet_forward(
        unet_params, jnp.asarray(sample.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(text.numpy()), ipadapter_kwargs_list=kv))
    np.testing.assert_allclose(ours, ref_out, rtol=5e-3, atol=5e-3)
