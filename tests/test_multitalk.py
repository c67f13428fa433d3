"""Golden parity: multi-speaker (MultiTalk) machinery vs the reference —
SingleStreamMutiAttention with 1-D RoPE class labels
(diffsynth/models/attention.py:373-484), reference-attention maps and
adaptive projected guidance (diffsynth/utils/multitalk_utils.py)."""

import numpy as np
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import wan_dit
from svi_tpu.utils import multitalk as mt

ref_mt = load_ref_module("diffsynth.utils.multitalk_utils")
ref_attn = load_ref_module("diffsynth.models.attention")


ref_mt.torch_gc = lambda: None  # reference calls torch.cuda.empty_cache()


def _no_compile(fn):
    return getattr(fn, "_torchdynamo_orig_callable", fn)


def test_rope_1d_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, 12, 16)).astype(np.float32)
    pos = (rng.random(12) * 24).astype(np.float32)
    rope = ref_mt.RotaryPositionalEmbedding1D(16)
    with torch.no_grad():
        ref = rope(torch.tensor(x), torch.tensor(pos)).numpy()
    ours = np.asarray(mt.rope_1d(jnp.asarray(x), jnp.asarray(pos)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_normalize_and_scale_and_split_parity():
    rng = np.random.default_rng(1)
    col = rng.random(20).astype(np.float32)
    ref = ref_mt.normalize_and_scale(torch.tensor(col), (0.1, 0.9), (0.0, 4.0)).numpy()
    ours = np.asarray(mt.normalize_and_scale(jnp.asarray(col), (0.1, 0.9), (0.0, 4.0)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    for rank in range(4):
        assert mt.split_token_counts_and_frame_ids(5, 7, 4, rank) == \
            ref_mt.split_token_counts_and_frame_ids(5, 7, 4, rank)


def test_x_ref_attn_map_parity():
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 24, 4, 16
    grid = (2, 3, 4)  # x_seqlens = 12
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    masks = (rng.random((2, 12)) < 0.4).astype(np.float32)
    masks[:, 0] = 1.0  # keep masks non-empty
    calc = _no_compile(ref_mt.calculate_x_ref_attn_map)
    with torch.no_grad():
        # replicate get_attn_map_with_target's head-split-and-average
        refq, refk = torch.tensor(q), torch.tensor(k[:, :12])
        acc = torch.zeros(2, S)
        for i in range(2):
            acc += calc(refq[:, :, 2 * i:2 * i + 2], refk[:, :, 2 * i:2 * i + 2],
                        torch.tensor(masks))
        ref = (acc / 2).numpy()
    ours = np.asarray(
        mt.get_attn_map_with_target(jnp.asarray(q), jnp.asarray(k), grid, jnp.asarray(masks))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_single_stream_multi_attention_parity():
    torch.manual_seed(3)
    dim, heads, ad = 32, 2, 24
    N_t, hw, N_a = 3, 8, 8
    tm = ref_attn.SingleStreamMutiAttention(
        dim=dim, encoder_hidden_states_dim=ad, num_heads=heads, qkv_bias=True,
        qk_norm=False, norm_layer=torch.nn.LayerNorm, class_range=24, class_interval=4,
    ).eval()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, N_t * hw, dim)).astype(np.float32)
    audio = rng.standard_normal((1, N_t, N_a, ad)).astype(np.float32)
    attn_map = (rng.random((2, N_t * hw)) * 0.1).astype(np.float32)

    with torch.no_grad():
        # reference takes encoder states with a leading squeeze(0) dim and
        # per-frame batch: (1, N_t, N_a, C) -> squeeze -> (N_t, N_a, C)
        ref = tm(
            torch.tensor(x), torch.tensor(audio),
            shape=(N_t, 2, 4), x_ref_attn_map=torch.tensor(attn_map), human_num=2,
        ).numpy()

    p = {
        "q_linear": {"w": jnp.asarray(tm.q_linear.weight.detach().numpy().T),
                     "b": jnp.asarray(tm.q_linear.bias.detach().numpy())},
        "kv_linear": {"w": jnp.asarray(tm.kv_linear.weight.detach().numpy().T),
                      "b": jnp.asarray(tm.kv_linear.bias.detach().numpy())},
        "proj": {"w": jnp.asarray(tm.proj.weight.detach().numpy().T),
                 "b": jnp.asarray(tm.proj.bias.detach().numpy())},
    }
    cfg = wan_dit.WanDiTConfig(dim=dim, num_heads=heads, audio_hidden_dim=ad,
                               dtype=jnp.float32)
    ours = np.asarray(wan_dit.single_stream_multi_attention(
        p, cfg, jnp.asarray(x), jnp.asarray(audio), N_t,
        x_ref_attn_map=jnp.asarray(attn_map), human_num=2,
    ))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_adaptive_projected_guidance_parity():
    rng = np.random.default_rng(4)
    diff = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32) * 30
    cond = rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32)

    ref_buf = ref_mt.MomentumBuffer(momentum=-0.5)
    our_buf = mt.MomentumBuffer(momentum=-0.5)
    with torch.no_grad():
        for _ in range(2):  # exercise the momentum update twice
            ref = ref_mt.adaptive_projected_guidance(
                torch.tensor(diff), torch.tensor(cond),
                momentum_buffer=ref_buf, eta=0.1, norm_threshold=55.0,
            ).numpy()
    for _ in range(2):
        ours = np.asarray(mt.adaptive_projected_guidance(
            jnp.asarray(diff), jnp.asarray(cond),
            momentum_buffer=our_buf, eta=0.1, norm_threshold=55.0,
        ))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
