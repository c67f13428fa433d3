"""Golden-parity: JAX causal 3D VAE vs the reference torch VideoVAE_ (tiny cfg)."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import wan_vae

ref_vae = load_ref_module("diffsynth.models.wan_video_vae")

Z = 4
CFG = wan_vae.WanVAEConfig(dim=16, z_dim=Z, dtype=jnp.float32)


def build_pair(seed=0):
    torch.manual_seed(seed)
    tm = ref_vae.VideoVAE_(dim=16, z_dim=Z).eval()
    params = wan_vae.params_from_torch_state_dict(tm.state_dict(), CFG)
    rng = np.random.default_rng(seed)
    mean = rng.standard_normal(Z).astype(np.float32) * 0.3
    std = (rng.random(Z).astype(np.float32) + 0.5)
    scale = [torch.tensor(mean), torch.tensor(1.0 / std)]
    return tm, params, mean, std, scale


def test_encode_parity():
    tm, params, mean, std, scale = build_pair(0)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 3, 9, 32, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm.encode(torch.tensor(video), scale).numpy()
    ours = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std))
    assert ours.shape == ref.shape == (1, Z, 3, 4, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_decode_parity():
    tm, params, mean, std, scale = build_pair(2)
    rng = np.random.default_rng(3)
    lat = rng.standard_normal((1, Z, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tm.decode(torch.tensor(lat), scale).clamp_(-1, 1).numpy()
    ours = np.asarray(wan_vae.decode(params, CFG, jnp.asarray(lat), mean=mean, std=std))
    assert ours.shape == ref.shape == (1, 3, 9, 32, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_single_frame():
    tm, params, mean, std, scale = build_pair(4)
    rng = np.random.default_rng(5)
    video = rng.standard_normal((1, 3, 1, 32, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tm.encode(torch.tensor(video), scale).numpy()
    ours = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)
    with torch.no_grad():
        ref_v = tm.decode(torch.tensor(ref), scale).clamp_(-1, 1).numpy()
    ours_v = np.asarray(wan_vae.decode(params, CFG, jnp.asarray(ref), mean=mean, std=std))
    np.testing.assert_allclose(ours_v, ref_v, rtol=1e-3, atol=2e-4)


def test_tiled_decode_matches_reference_tiled():
    """Tile split, feathered masks, and blending match the reference exactly
    (tiled-vs-untiled divergence is inherent to the algorithm at tiny scale,
    so we compare tiled-vs-tiled)."""
    tm, params, mean, std, scale = build_pair(6)
    rng = np.random.default_rng(7)
    lat = rng.standard_normal((1, Z, 2, 8, 8)).astype(np.float32) * 0.5

    wrap = ref_vae.WanVideoVAE.__new__(ref_vae.WanVideoVAE)
    torch.nn.Module.__init__(wrap)
    wrap.model = tm
    wrap.upsampling_factor = 8
    wrap.scale = scale
    with torch.no_grad():
        ref = wrap.tiled_decode(torch.tensor(lat), "cpu", (6, 6), (4, 4)).numpy()
    ours = np.asarray(
        wan_vae.tiled_decode(
            params, CFG, jnp.asarray(lat), tile_size=(6, 6), tile_stride=(4, 4), mean=mean, std=std,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_tiled_encode():
    """Single covering tile == untiled exactly; multi-tile stays close.
    (The reference's tiled_encode hardcodes 16 latent channels so it cannot
    run at the tiny test width; mask/blend parity is covered by the tiled
    decode test, which shares the implementation.)"""
    _, params, mean, std, _ = build_pair(8)
    rng = np.random.default_rng(9)
    video = rng.standard_normal((1, 3, 5, 64, 64)).astype(np.float32) * 0.5
    full = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std))
    one_tile = np.asarray(
        wan_vae.tiled_encode(
            params, CFG, jnp.asarray(video), tile_size=(64, 64), tile_stride=(64, 64),
            mean=mean, std=std,
        )
    )
    np.testing.assert_allclose(one_tile, full, rtol=1e-5, atol=1e-5)
    multi = np.asarray(
        wan_vae.tiled_encode(
            params, CFG, jnp.asarray(video), tile_size=(48, 48), tile_stride=(32, 32),
            mean=mean, std=std,
        )
    )
    assert multi.shape == full.shape
    assert np.abs(multi - full).mean() < 0.2


def test_wan_full_vae_shapes():
    """Full-size Wan VAE config builds and roundtrips tiny spatial input."""
    import jax

    params = wan_vae.init_params(jax.random.PRNGKey(0), wan_vae.WAN_VAE)
    video = jnp.zeros((1, 3, 5, 64, 64), jnp.float32)
    lat = wan_vae.encode(params, wan_vae.WAN_VAE, video)
    assert lat.shape == (1, 16, 2, 8, 8)
    out = wan_vae.decode(params, wan_vae.WAN_VAE, lat)
    assert out.shape == (1, 3, 5, 64, 64)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(4.0 / max(mse, 1e-12))  # signal range [-1, 1] -> peak 2


def test_mixed_precision_decode_psnr_gate():
    """bf16-interior decode (f32 accumulation/norms/head) must stay within
    PSNR > 40 dB of the f32 reference path — the gate for vae_dtype=bf16
    (reference FAQ.md:27 warns full-bf16 VAE accumulates artifacts; our bf16
    is storage-only, so the fidelity bar is strict)."""
    _, params, mean, std, _ = build_pair(10)
    rng = np.random.default_rng(11)
    lat = rng.standard_normal((1, Z, 3, 8, 8)).astype(np.float32)
    f32 = np.asarray(wan_vae.decode(params, CFG, jnp.asarray(lat), mean=mean, std=std))
    bf16 = np.asarray(
        wan_vae.decode(params, CFG, jnp.asarray(lat), mean=mean, std=std,
                       compute_dtype=jnp.bfloat16)
    )
    assert bf16.dtype == np.float32  # head + clamp stay f32
    psnr = _psnr(bf16, f32)
    assert psnr > 40.0, f"bf16 decode PSNR {psnr:.1f} dB < 40"


def test_mixed_precision_encode_close():
    """bf16-interior encode stays close to f32 latents (relative scale)."""
    _, params, mean, std, _ = build_pair(12)
    rng = np.random.default_rng(13)
    video = rng.standard_normal((1, 3, 9, 32, 32)).astype(np.float32) * 0.5
    f32 = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std))
    bf16 = np.asarray(
        wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std,
                       compute_dtype=jnp.bfloat16)
    )
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() < 0.05 * scale


def test_time_chunked_decode_encode_match_framewise():
    """Temporal chunking (time_chunk>1) is bit-equivalent to the reference's
    per-frame/4-frame streaming — causal conv caches make the windows
    identical."""
    _, params, mean, std, _ = build_pair(14)
    rng = np.random.default_rng(15)
    lat = rng.standard_normal((1, Z, 5, 8, 8)).astype(np.float32)
    ref = np.asarray(wan_vae.decode(params, CFG, jnp.asarray(lat), mean=mean, std=std,
                                    time_chunk=1))
    for c in (2, 4):
        out = np.asarray(wan_vae.decode(params, CFG, jnp.asarray(lat), mean=mean, std=std,
                                        time_chunk=c))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    video = rng.standard_normal((1, 3, 17, 32, 32)).astype(np.float32) * 0.5
    ref_e = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std,
                                      time_chunk=1))
    for c in (2, 4):
        out = np.asarray(wan_vae.encode(params, CFG, jnp.asarray(video), mean=mean, std=std,
                                        time_chunk=c))
        np.testing.assert_allclose(out, ref_e, rtol=1e-5, atol=1e-6)
