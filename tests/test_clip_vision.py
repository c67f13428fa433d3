"""Golden-parity: CLIP ViT vision tower vs reference VisionTransformer (tiny)."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import clip_vision

ref_img = load_ref_module("diffsynth.models.wan_video_image_encoder")

TINY = dict(image_size=28, patch_size=14, dim=32, mlp_ratio=2, num_heads=2, num_layers=3)


def build_pair(seed=0, activation="gelu"):
    torch.manual_seed(seed)
    tm = ref_img.VisionTransformer(
        image_size=TINY["image_size"], patch_size=TINY["patch_size"], dim=TINY["dim"],
        mlp_ratio=TINY["mlp_ratio"], out_dim=16, num_heads=TINY["num_heads"],
        num_layers=TINY["num_layers"], pool_type="token", pre_norm=True,
        activation=activation,
    ).eval()
    cfg = clip_vision.ClipVisionConfig(dtype=jnp.float32, activation=activation, **TINY)
    params = clip_vision.params_from_torch_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


def test_tokens_parity_31block():
    tm, cfg, params = build_pair(0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), use_31_block=True).numpy()
    ours = np.asarray(clip_vision.forward_tokens(params, cfg, jnp.asarray(x), use_31_block=True))
    assert ours.shape == ref.shape  # (2, 5, 32): cls + 4 patches
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_tokens_parity_quick_gelu():
    tm, cfg, params = build_pair(1, activation="quick_gelu")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), use_31_block=True).numpy()
    ours = np.asarray(clip_vision.forward_tokens(params, cfg, jnp.asarray(x), use_31_block=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_bicubic_resize_matches_torch():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 3, 37, 53)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(img), size=(28, 28), mode="bicubic", align_corners=False
    ).numpy()
    ours = np.asarray(clip_vision.resize_bicubic(jnp.asarray(img), (28, 28)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_encode_image_pipeline():
    """End-to-end encode_image semantics vs a torch re-enactment of
    WanImageEncoder.encode_image (ref :864-880) on the tiny ViT."""
    tm, cfg, params = build_pair(3)
    rng = np.random.default_rng(3)
    frame = rng.uniform(-1, 1, (1, 3, 40, 64)).astype(np.float32)

    ft = torch.nn.functional.interpolate(
        torch.tensor(frame), size=(28, 28), mode="bicubic", align_corners=False
    )
    ft = ft.mul(0.5).add(0.5)
    mean = torch.tensor(clip_vision.CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(clip_vision.CLIP_STD).view(1, 3, 1, 1)
    ft = (ft - mean) / std
    with torch.no_grad():
        ref = tm(ft, use_31_block=True).numpy()

    ours = np.asarray(clip_vision.encode_image(params, cfg, jnp.asarray(frame)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
