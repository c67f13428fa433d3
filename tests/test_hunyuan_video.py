"""HunyuanVideo golden parity vs the reference torch modules.

The reference IndividualTokenRefinerBlock hardcodes device="cuda" for its
adaLN linear (hunyuan_video_dit.py:231-234); tests patch torch.nn.Linear to
ignore the device kwarg on this CPU-only box."""

import contextlib

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import hunyuan_video as hv

from reference_loader import load_ref_module


@contextlib.contextmanager
def _cpu_linear():
    orig = torch.nn.Linear.__init__

    def patched(self, in_features, out_features, bias=True, device=None,
                dtype=None):
        orig(self, in_features, out_features, bias=bias, device=None,
             dtype=None)

    torch.nn.Linear.__init__ = patched
    try:
        yield
    finally:
        torch.nn.Linear.__init__ = orig


def _randn_state(module, seed, scale=0.02):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * scale
    module.load_state_dict(state)
    return dict(state)


def test_hyv_rope_tables():
    ref = load_ref_module("diffsynth.models.hunyuan_video_dit")
    lat = torch.zeros(1, 16, 3, 8, 12)
    cos_ref, sin_ref = ref.HunyuanVideoRope(lat)
    cos, sin = hv.prepare_rope_tables(3, 4, 6)
    np.testing.assert_allclose(np.repeat(cos, 2, axis=1), cos_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.repeat(sin, 2, axis=1), sin_ref.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_hyv_dit_parity():
    ref = load_ref_module("diffsynth.models.hunyuan_video_dit")
    with _cpu_linear():
        model = ref.HunyuanVideoDiT(num_double_blocks=2,
                                    num_single_blocks=2).float().eval()
    state = _randn_state(model, 0)
    params = hv.hunyuan_video_dit_params_from_torch(state)

    torch.manual_seed(1)
    x = torch.randn(1, 16, 3, 8, 12) * 0.5
    t = torch.tensor([700.0])
    prompt_emb = torch.randn(1, 256, 4096) * 0.1
    text_mask = torch.ones(1, 256, dtype=torch.long)
    text_mask[:, 100:] = 0
    pooled = torch.randn(1, 768) * 0.1
    guidance = torch.tensor([6.0])
    freqs = ref.HunyuanVideoRope(x)
    with torch.no_grad():
        ref_out = model(x, t, prompt_emb, text_mask, pooled,
                        freqs_cos=freqs[0], freqs_sin=freqs[1],
                        guidance=guidance).numpy()
    cos, sin = hv.prepare_rope_tables(3, 4, 6)
    ours = np.asarray(hv.hunyuan_video_dit_forward(
        params, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(prompt_emb.numpy()), jnp.asarray(text_mask.numpy()),
        jnp.asarray(pooled.numpy()), guidance=jnp.asarray(guidance.numpy()),
        freqs=(cos, sin)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=3e-3)


def test_hyv_vae_roundtrip_parity():
    enc_mod = load_ref_module("diffsynth.models.hunyuan_video_vae_encoder")
    dec_mod = load_ref_module("diffsynth.models.hunyuan_video_vae_decoder")
    enc = enc_mod.HunyuanVideoVAEEncoder().eval()
    dec = dec_mod.HunyuanVideoVAEDecoder().eval()
    enc_state = _randn_state(enc, 2, scale=0.05)
    dec_state = _randn_state(dec, 3, scale=0.05)
    enc_params = hv.hunyuan_video_vae_encoder_params_from_torch(enc_state)
    dec_params = hv.hunyuan_video_vae_decoder_params_from_torch(dec_state)

    torch.manual_seed(4)
    video = torch.randn(1, 3, 5, 32, 32)
    with torch.no_grad():
        ref_lat = enc(video).numpy()
        ref_out = dec.decoder(dec.post_quant_conv(
            torch.from_numpy(ref_lat) / dec.scaling_factor)).numpy()
    lat = np.asarray(hv.hunyuan_video_vae_encode(enc_params,
                                                 jnp.asarray(video.numpy())))
    assert lat.shape == ref_lat.shape
    np.testing.assert_allclose(lat, ref_lat, rtol=3e-3, atol=3e-3)
    out = np.asarray(hv.hunyuan_video_vae_decode(dec_params, jnp.asarray(lat)))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=3e-3, atol=3e-3)
