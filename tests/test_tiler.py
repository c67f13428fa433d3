"""Golden parity for svi_tpu.models.tiler vs the reference TileWorker family.

Reference: diffsynth/models/tiler.py. Our tensors are channels-last; the
reference is NCHW/NCTHW — tests transpose at the boundary.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

from svi_tpu.models import tiler

ref_tiler = load_ref_module("diffsynth.models.tiler")


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


class TestTileWorker:
    @pytest.mark.parametrize("hw,ts,st", [((16, 16), 8, 4), ((24, 16), 8, 8)])
    def test_identity_forward(self, hw, ts, st):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, *hw, 3)).astype(np.float32)

        ours = tiler.tiled_forward(lambda t: t * 2.0 + 1.0, jnp.asarray(x), ts, st)

        ref = ref_tiler.TileWorker().tiled_forward(
            lambda t: t * 2.0 + 1.0, _nchw(x), ts, st,
            tile_device="cpu", tile_dtype=torch.float32)
        np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_conv_like_forward_mixes_within_tile(self):
        """A non-pointwise per-tile forward: blend weights must match."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)

        def fwd_nhwc(t):
            return jnp.flip(t, axis=1) + t.mean(axis=(1, 2), keepdims=True)

        def fwd_nchw(t):
            return torch.flip(t, dims=[2]) + t.mean(dim=(2, 3), keepdim=True)

        ours = tiler.tiled_forward(fwd_nhwc, jnp.asarray(x), 8, 4)
        ref = ref_tiler.TileWorker().tiled_forward(
            fwd_nchw, _nchw(x), 8, 4, tile_device="cpu", tile_dtype=torch.float32)
        np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_io_scale(self):
        """forward_fn halving resolution (VAE-encoder-like): fold geometry
        scales per ref tiler.py:96-102."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)

        ours = tiler.tiled_forward(
            lambda t: t[:, ::2, ::2, :] * 3.0, jnp.asarray(x), 8, 4)
        ref = ref_tiler.TileWorker().tiled_forward(
            lambda t: t[:, :, ::2, ::2] * 3.0, _nchw(x), 8, 4,
            tile_device="cpu", tile_dtype=torch.float32)
        np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_tile_batching_invariance(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)).astype(np.float32))
        a = tiler.tiled_forward(lambda t: t ** 2, x, 8, 8, tile_batch_size=1)
        b = tiler.tiled_forward(lambda t: t ** 2, x, 8, 8, tile_batch_size=4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


class TestFastTileWorker:
    @pytest.mark.parametrize("hw,ts,st", [((16, 16), 8, 4), ((20, 14), 8, 6)])
    def test_parity(self, hw, ts, st):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
        xj = jnp.asarray(x)
        xt = _nchw(x)

        ours = tiler.fast_tiled_forward(
            lambda hl, hr, wl, wr: xj[:, hl:hr, wl:wr, :] * 2.0 - 0.5,
            xj, ts, st)
        ref = ref_tiler.FastTileWorker().tiled_forward(
            lambda hl, hr, wl, wr: xt[:, :, hl:hr, wl:wr] * 2.0 - 0.5,
            xt, ts, st, tile_device="cpu", tile_dtype=torch.float32)
        np.testing.assert_allclose(np.asarray(ours), _nhwc(ref), rtol=1e-5, atol=1e-5)


class TestTileWorker2Dto3D:
    @pytest.mark.parametrize("scales", [(1, 1, 1, 1), (2, 2, 2, 2)])
    def test_parity(self, scales):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 3, 12, 16, 4)).astype(np.float32)  # B,T,H,W,C
        s_c, s_t, s_h, s_w = scales

        def fwd_ours(t):  # (B,T,h,w,C) -> scaled
            y = jnp.repeat(jnp.repeat(jnp.repeat(jnp.repeat(
                t, s_t, axis=1), s_h, axis=2), s_w, axis=3), s_c, axis=4)
            return y * 1.5

        def fwd_ref(t):  # (B,C,T,h,w) -> scaled
            y = t.repeat_interleave(s_c, dim=1).repeat_interleave(
                s_t, dim=2).repeat_interleave(s_h, dim=3).repeat_interleave(s_w, dim=4)
            return y * 1.5

        ours = tiler.tiled_forward_2dto3d(fwd_ours, jnp.asarray(x),
                                          (8, 8), (4, 4), scales=scales)
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = ref_tiler.TileWorker2Dto3D().tiled_forward(
            fwd_ref, xt, (8, 8), (4, 4),
            tile_device="cpu", tile_dtype=torch.float32,
            computation_device="cpu", computation_dtype=torch.float32,
            scales=list(scales))
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 3, 4, 1).numpy(),
            rtol=1e-5, atol=1e-5)


def _randn_like_sd(module, seed):
    torch.manual_seed(seed)
    state = module.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    module.load_state_dict(state)
    return {k: v for k, v in state.items()}


def test_sd_vae_tiled_golden_parity():
    """Tiled VAE encode/decode bit-matches the reference tiled path
    (ref sd_vae_encoder.py:41-50 / sd_vae_decoder.py:81-90)."""
    from svi_tpu.models import sd

    enc_mod = load_ref_module("diffsynth.models.sd_vae_encoder")
    dec_mod = load_ref_module("diffsynth.models.sd_vae_decoder")
    enc = enc_mod.SDVAEEncoder().eval()
    dec = dec_mod.SDVAEDecoder().eval()
    enc_params = sd.sd_vae_encoder_params_from_torch(_randn_like_sd(enc, 13))
    dec_params = sd.sd_vae_decoder_params_from_torch(_randn_like_sd(dec, 14))

    torch.manual_seed(15)
    image = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        ref_lat = enc(image, tiled=True, tile_size=64, tile_stride=32).numpy()
    lat = np.asarray(sd.sd_vae_encode(enc_params, jnp.asarray(image.numpy()),
                                      tiled=True, tile_size=64, tile_stride=32))
    np.testing.assert_allclose(lat, ref_lat, rtol=2e-3, atol=2e-3)

    latents = torch.randn(1, 4, 24, 24) * 0.2
    with torch.no_grad():
        ref_img = dec(latents, tiled=True, tile_size=16, tile_stride=8).numpy()
    img = np.asarray(sd.sd_vae_decode(dec_params, jnp.asarray(latents.numpy()),
                                      tiled=True, tile_size=16, tile_stride=8))
    np.testing.assert_allclose(img, ref_img, rtol=2e-3, atol=2e-3)


def test_sd_unet_tiled_golden_parity():
    """Tiled attention-block path vs reference SDUNet(tiled=True)
    (ref sd_unet.py:172-190)."""
    from svi_tpu.models import sd

    unet_mod = load_ref_module("diffsynth.models.sd_unet")
    unet = unet_mod.SDUNet().eval()
    params = sd.sd_unet_params_from_torch(_randn_like_sd(unet, 16))

    torch.manual_seed(17)
    sample = torch.randn(1, 4, 16, 16)
    timestep = torch.tensor([500])
    ctx = torch.randn(1, 77, 768) * 0.1
    with torch.no_grad():
        ref = unet(sample, timestep, ctx, tiled=True, tile_size=8,
                   tile_stride=8).numpy()
    ours = np.asarray(sd.sd_unet_forward(
        params, jnp.asarray(sample.numpy()), jnp.asarray([500.0]),
        jnp.asarray(ctx.numpy()), tiled=True, tile_size=8, tile_stride=8))
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)
