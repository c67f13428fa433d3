"""Golden-parity: RoPE tables/application, time embedding, norms vs reference."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.ops import rope as jrope
from svi_tpu.ops import norms as jnorms

ref_dit = load_ref_module("diffsynth.models.wan_video_dit")


def test_sinusoidal_embedding():
    dim = 256
    pos = np.array([0.0, 1.0, 57.3, 999.0], dtype=np.float32)
    ref = ref_dit.sinusoidal_embedding_1d(dim, torch.tensor(pos)).numpy()
    ours = np.asarray(jrope.sinusoidal_embedding_1d(dim, jnp.asarray(pos)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rope_apply_matches_reference():
    # head_dim must split into even per-axis parts (as 128 does for the real
    # model: 44+42+42); 64 does not (22+21+21), so use 32 (12+10+10) here.
    head_dim, num_heads = 32, 2
    f, h, w = 3, 4, 5
    s = f * h * w
    b = 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, s, num_heads * head_dim)).astype(np.float32)

    # reference: assemble freqs per grid then rope_apply
    freqs_cis = ref_dit.precompute_freqs_cis_3d(head_dim)
    freqs = torch.cat(
        [
            freqs_cis[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
            freqs_cis[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
            freqs_cis[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
        ],
        dim=-1,
    ).reshape(s, 1, -1)
    ref = ref_dit.rope_apply(torch.tensor(x), freqs, num_heads).numpy()

    cos, sin = jrope.rope_angles_for_grid((f, h, w), head_dim)
    xj = jnp.asarray(x).reshape(b, s, num_heads, head_dim)
    ours = np.asarray(jrope.apply_rope(xj, cos, sin)).reshape(b, s, num_heads * head_dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rms_norm():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 32)).astype(np.float32)
    wgt = rng.standard_normal(32).astype(np.float32)
    m = ref_dit.RMSNorm(32)
    with torch.no_grad():
        m.weight.copy_(torch.tensor(wgt))
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    ours = np.asarray(jnorms.rms_norm(jnp.asarray(x), jnp.asarray(wgt), eps=1e-5))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_layer_norm_no_affine():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 48)).astype(np.float32)
    ln = torch.nn.LayerNorm(48, eps=1e-6, elementwise_affine=False)
    with torch.no_grad():
        ref = ln(torch.tensor(x)).numpy()
    ours = np.asarray(jnorms.layer_norm(jnp.asarray(x), eps=1e-6))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_affine():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    wgt = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    ln = torch.nn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.tensor(wgt))
        ln.bias.copy_(torch.tensor(bias))
    with torch.no_grad():
        ref = ln(torch.tensor(x)).numpy()
    ours = np.asarray(jnorms.layer_norm(jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(bias), eps=1e-6))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gelu_tanh():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ref = torch.nn.functional.gelu(torch.tensor(x), approximate="tanh").numpy()
    ours = np.asarray(jnorms.gelu_tanh(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_vae_channel_rms_norm():
    ref_vae = load_ref_module("diffsynth.models.wan_video_vae")
    rng = np.random.default_rng(4)
    c = 24
    x = rng.standard_normal((2, c, 3, 5, 5)).astype(np.float32)
    gamma = rng.standard_normal((c, 1, 1, 1)).astype(np.float32)
    m = ref_vae.RMS_norm(c, images=False)
    with torch.no_grad():
        m.gamma.copy_(torch.tensor(gamma))
    with torch.no_grad():
        ref = m(torch.tensor(x)).numpy()
    ours = np.asarray(
        jnorms.channel_rms_norm(jnp.asarray(x), jnp.asarray(gamma)[None], channel_axis=1)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
