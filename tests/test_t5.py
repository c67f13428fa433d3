"""Golden-parity: JAX umT5 encoder vs reference WanTextEncoder (tiny config)."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import t5

ref_t5 = load_ref_module("diffsynth.models.wan_video_text_encoder")

TINY = dict(vocab=100, dim=64, dim_attn=64, dim_ffn=128, num_heads=4, num_layers=3, num_buckets=32)


def build_pair(seed=0):
    torch.manual_seed(seed)
    tm = ref_t5.WanTextEncoder(shared_pos=False, dropout=0.0, **TINY).eval()
    cfg = t5.T5Config(dtype=jnp.float32, **TINY)
    params = t5.params_from_torch_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


def test_forward_parity_with_mask():
    tm, cfg, params = build_pair(0)
    rng = np.random.default_rng(0)
    b, L = 2, 16
    ids = rng.integers(0, TINY["vocab"], (b, L)).astype(np.int32)
    mask = np.ones((b, L), np.int32)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = tm(torch.tensor(ids, dtype=torch.long), torch.tensor(mask)).numpy()
    ours = np.asarray(t5.forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_forward_parity_no_mask():
    tm, cfg, params = build_pair(1)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY["vocab"], (1, 12)).astype(np.int32)
    with torch.no_grad():
        ref = tm(torch.tensor(ids, dtype=torch.long), None).numpy()
    ours = np.asarray(t5.forward(params, cfg, jnp.asarray(ids), None))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_encode_prompt_zeroing():
    """encode_prompt zeroes embeddings past the true length (wan_prompter.py:107-108)."""
    _, cfg, params = build_pair(2)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, TINY["vocab"], (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[0, 7:] = 0
    out = np.asarray(t5.encode_prompt_states(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    assert np.all(out[0, 7:] == 0)
    assert np.any(out[0, :7] != 0)
    assert np.any(out[1, 15:] != 0)


def test_relative_buckets_match_reference():
    ref_emb = ref_t5.T5RelativeEmbedding(32, 4, bidirectional=True)
    rel_pos = torch.arange(20).unsqueeze(0) - torch.arange(20).unsqueeze(1)
    ref_buckets = ref_emb._relative_position_bucket(rel_pos).numpy()
    ours = np.asarray(t5.relative_position_buckets(20, 32, 128))
    np.testing.assert_array_equal(ours, ref_buckets)
