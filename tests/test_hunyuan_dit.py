"""HunyuanDiT golden parity vs the reference torch module (reduced layer
counts — the constructor exposes num_layers_down/up — full hidden dim)."""

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import hunyuan_dit as hy

from reference_loader import load_ref_module


def test_calc_rope_matches_image_size_manager():
    pipe_mod = load_ref_module("diffsynth.pipelines.hunyuan_image")
    mgr = pipe_mod.ImageSizeManager()
    for h, w in [(512, 512), (768, 1280)]:
        ref_cos, ref_sin = mgr.calc_rope(h, w)
        cos, sin = hy.calc_rope(h, w)
        # reference tables are pair-repeated; ours are per-pair
        np.testing.assert_allclose(np.repeat(cos, 2, axis=1),
                                   ref_cos.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.repeat(sin, 2, axis=1),
                                   ref_sin.numpy(), rtol=1e-5, atol=1e-5)


def test_hunyuan_dit_parity():
    ref = load_ref_module("diffsynth.models.hunyuan_dit")
    model = ref.HunyuanDiT(num_layers_down=4, num_layers_up=2).eval()
    torch.manual_seed(0)
    state = model.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.03
    model.load_state_dict(state)
    params = hy.hunyuan_dit_params_from_torch(dict(state))

    torch.manual_seed(1)
    latents = torch.randn(2, 4, 16, 16)
    text_emb = torch.randn(2, 77, 1024) * 0.3
    text_emb_t5 = torch.randn(2, 256, 2048) * 0.3
    mask = torch.ones(2, 77, dtype=torch.long)
    mask[:, 40:] = 0
    mask_t5 = torch.ones(2, 256, dtype=torch.long)
    mask_t5[:, 100:] = 0
    timestep = torch.tensor([391.0, 391.0])
    size_emb = torch.tensor([[128.0, 128, 128, 128, 0, 0]] * 2)
    cos, sin = hy.calc_rope(128, 128)
    freqs_t = (torch.from_numpy(np.repeat(cos, 2, axis=1)),
               torch.from_numpy(np.repeat(sin, 2, axis=1)))
    with torch.no_grad():
        ref_out = model(latents, text_emb, text_emb_t5, mask, mask_t5,
                        timestep, size_emb, freqs_t).numpy()
    ours = np.asarray(hy.hunyuan_dit_forward(
        params, jnp.asarray(latents.numpy()), jnp.asarray(text_emb.numpy()),
        jnp.asarray(text_emb_t5.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(mask_t5.numpy()), jnp.asarray(timestep.numpy()),
        jnp.asarray(size_emb.numpy()), (cos, sin), num_layers_down=4))
    assert ours.shape == ref_out.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)
