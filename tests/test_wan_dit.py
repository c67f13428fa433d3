"""Golden-parity: JAX Wan DiT forward vs the reference torch WanModel (tiny config)."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import wan_dit

ref_dit = load_ref_module("diffsynth.models.wan_video_dit")

TINY = dict(
    dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=2, num_layers=2,
)


def build_pair(has_image_input: bool, seed: int = 0):
    torch.manual_seed(seed)
    kw = dict(TINY, in_dim=36 if has_image_input else 16)
    tm = ref_dit.WanModel(has_image_input=has_image_input, **kw).eval()
    cfg = wan_dit.WanDiTConfig(
        has_image_input=has_image_input, dtype=jnp.float32,
        **{k: v for k, v in kw.items() if k != "eps"},
    )
    params = wan_dit.params_from_torch_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


@pytest.mark.parametrize("has_image_input", [False, True])
def test_forward_parity(has_image_input):
    tm, cfg, params = build_pair(has_image_input)
    rng = np.random.default_rng(0)
    b, f, h, w = 1, 3, 8, 12
    x = rng.standard_normal((b, 16, f, h, w)).astype(np.float32)
    t = np.array([314.0], dtype=np.float32)
    ctx = rng.standard_normal((b, 20, TINY["text_dim"])).astype(np.float32)
    kwargs_t, kwargs_j = {}, {}
    if has_image_input:
        clip = rng.standard_normal((b, 257, 1280)).astype(np.float32)
        y = rng.standard_normal((b, 20, f, h, w)).astype(np.float32)
        kwargs_t = dict(clip_feature=torch.tensor(clip), y=torch.tensor(y))
        kwargs_j = dict(clip_feature=jnp.asarray(clip), y=jnp.asarray(y))

    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx), **kwargs_t).numpy()
    ours = np.asarray(
        wan_dit.forward(params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), **kwargs_j)
    )
    assert ours.shape == ref.shape == (b, 16, f, h, w)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_forward_parity_add_condition():
    tm, cfg, params = build_pair(False, seed=1)
    rng = np.random.default_rng(1)
    b, f, h, w = 1, 2, 4, 6
    s = f * (h // 2) * (w // 2)
    x = rng.standard_normal((b, 16, f, h, w)).astype(np.float32)
    t = np.array([77.0], dtype=np.float32)
    ctx = rng.standard_normal((b, 11, TINY["text_dim"])).astype(np.float32)
    cond = rng.standard_normal((b, s, TINY["dim"])).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            torch.tensor(x), torch.tensor(t), torch.tensor(ctx), add_condition=torch.tensor(cond)
        ).numpy()
    ours = np.asarray(
        wan_dit.forward(
            params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            add_condition=jnp.asarray(cond),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_config_from_state_dict_keys():
    tm, _, _ = build_pair(True)
    cfg = wan_dit.config_from_state_dict_keys(tm.state_dict().keys())
    assert cfg.has_image_input and cfg.in_dim == 36 and cfg.num_layers == 2


def test_remat_matches():
    tm, cfg, params = build_pair(False, seed=2)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 2, 4, 4)).astype(np.float32)
    t = np.array([10.0], dtype=np.float32)
    ctx = rng.standard_normal((1, 5, TINY["text_dim"])).astype(np.float32)
    a = wan_dit.forward(params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    b = wan_dit.forward(params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), use_remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_int8_quantized_forward_close():
    """int8 weight storage: output stays close to bf16-weights forward, and
    the stored bytes roughly halve."""
    import jax

    tm, cfg, params = build_pair(False, seed=5)
    qparams = wan_dit.quantize_params_int8(params, min_size=1024)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    t = jnp.asarray([321.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, TINY["text_dim"])), jnp.float32)
    ref = np.asarray(wan_dit.forward(params, cfg, x, t, ctx))
    out = np.asarray(wan_dit.forward(qparams, cfg, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, f"int8 relative error {rel}"

    def nbytes(p):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(p))

    assert nbytes(qparams) < 0.45 * nbytes(params)  # f32 weights -> int8+scales
