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


def test_sqrt_remat_matches_forward_and_grads():
    """Two-level (sqrt) remat must be numerically identical to per-block
    remat in both the forward and the backward (it only changes what AD
    saves vs recomputes)."""
    import jax

    assert wan_dit.pick_remat_group(40) == 5  # 14B: 40 layers -> groups of 5
    assert wan_dit.pick_remat_group(30) == 5  # 1.3B: 30 layers -> groups of 5

    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=2, num_layers=4, dtype=jnp.float32,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 4)), jnp.float32)
    t = jnp.asarray([10.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32)

    def run(granularity):
        return wan_dit.forward(params, cfg, x, t, ctx, use_remat=True,
                               remat_granularity=granularity)

    base = np.asarray(run(None))
    np.testing.assert_allclose(np.asarray(run(2)), base, rtol=1e-6, atol=1e-6)
    # granularity == num_layers degenerates to the plain scan
    np.testing.assert_allclose(np.asarray(run(4)), base, rtol=1e-6, atol=1e-6)

    def loss(granularity):
        def f(p):
            return jnp.sum(wan_dit.forward(p, cfg, x, t, ctx, use_remat=True,
                                           remat_granularity=granularity) ** 2)
        return jax.grad(f)(params)

    g1, g2 = loss(None), loss(2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_quantized_dense_straight_through_grads():
    """The int8-MXU execution paths (W8A8, W4A8) are trainable: the custom
    VJP routes dx through the dequantized linearization instead of the
    zero-gradient round() — dx must track the bf16 dense's dx."""
    import jax

    rng = np.random.default_rng(11)
    wf = rng.standard_normal((512, 768)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((32, 512)), jnp.float32)
    tree = {"blk": {"q": {"w": jnp.asarray(wf)}}}

    def dx_of(p):
        return jax.grad(
            lambda x: jnp.sum(wan_dit._dense(p, x).astype(jnp.float32) ** 2)
        )(x).astype(jnp.float32)

    g_ref = dx_of({"w": jnp.asarray(wf)})
    variants = {
        "w8a8": wan_dit.quantize_params_w8a8(tree, min_size=1024)["blk"]["q"],
        "int4": wan_dit.quantize_params_int4(tree, min_size=1024)["blk"]["q"],
        "w4a8": wan_dit.quantize_params_int4(tree, min_size=1024,
                                             w4a8=True)["blk"]["q"],
    }
    for name, p in variants.items():
        g = dx_of(p)
        rel = float(np.abs(g - g_ref).mean() / (np.abs(g_ref).mean() + 1e-9))
        assert rel < 0.12, (name, rel)
        assert np.abs(g).mean() > 0.1 * np.abs(g_ref).mean(), name  # not ~zero


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


def test_int4_pack_roundtrip():
    """Packed int4 dequant (the _dense unpack) reproduces the quantized
    values exactly, and |deq - w| <= scale/2 per group."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.04
    packed, scale = wan_dit._quantize_leaf_int4(w, group=16)
    assert packed.shape == (32, 48) and scale.shape == (4, 48)
    # unpack exactly as _dense does (half-split: concat lo rows then hi rows)
    wq = jnp.asarray(packed)
    lo = jnp.right_shift(jnp.left_shift(wq, 4), 4)
    hi = jnp.right_shift(wq, 4)
    w8 = np.asarray(jnp.concatenate([lo, hi], axis=0))
    expect_q = np.clip(np.round(w.reshape(4, 16, 48) / scale[:, None, :]), -8, 7)
    np.testing.assert_array_equal(w8.reshape(4, 16, 48), expect_q)
    deq = w8.reshape(4, 16, 48) * scale[:, None, :]
    assert np.abs(deq - w.reshape(4, 16, 48)).max() <= scale.max() / 2 + 1e-7


def test_int4_quantized_forward_close():
    """int4 weight storage (the 14B single-chip path): forward stays close to
    the float forward and the stored bytes are ~1/4 of f32-int8 comparison."""
    import jax

    tm, cfg, params = build_pair(False, seed=6)
    qparams = wan_dit.quantize_params_int4(params, min_size=1024, group=16)

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    t = jnp.asarray([321.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, TINY["text_dim"])), jnp.float32)
    ref = np.asarray(wan_dit.forward(params, cfg, x, t, ctx))
    out = np.asarray(wan_dit.forward(qparams, cfg, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.12, f"int4 relative error {rel}"

    def nbytes(p):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(p))

    assert nbytes(qparams) < 0.25 * nbytes(params)


def test_init_params_int4_structure_and_forward():
    """init_params_int4 mirrors quantize_params_int4(init_params(...))'s
    pytree structure (14B bench init without f32 materialization) and the
    forward runs finite."""
    import jax

    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, dtype=jnp.float32,
    )
    ref_q = wan_dit.quantize_params_int4(
        wan_dit.init_params(jax.random.PRNGKey(0), cfg), min_size=1024, group=16
    )
    rand_q = wan_dit.init_params_int4(jax.random.PRNGKey(0), cfg, min_size=1024, group=16)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref_q)}
    rand_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(rand_q)}
    assert ref_paths == rand_paths
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    out = wan_dit.forward(rand_q, cfg, x, jnp.asarray([100.0]),
                          jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_w8a8_quantized_forward_close():
    """W8A8 (int8 weights x dynamic per-token int8 activations): forward stays
    close to the float forward — the opt-in production acceleration."""
    tm, cfg, params = build_pair(False, seed=9)
    qparams = wan_dit.quantize_params_w8a8(params, min_size=1024)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    t = jnp.asarray([321.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, TINY["text_dim"])), jnp.float32)
    ref = np.asarray(wan_dit.forward(params, cfg, x, t, ctx))
    out = np.asarray(wan_dit.forward(qparams, cfg, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.08, f"w8a8 relative error {rel}"


def test_w4a8_quantized_forward_close():
    """W4A8 (packed int4 weights requantized per-channel to int8 in-kernel x
    dynamic int8 activations — the 14B single-chip int8-MXU path): forward
    stays close both to the float forward and to the int4-bf16-dequant
    forward (the extra int8 rounding must be a second-order effect)."""
    tm, cfg, params = build_pair(False, seed=11)
    q4 = wan_dit.quantize_params_int4(params, min_size=1024, group=16)
    q48 = wan_dit.quantize_params_int4(params, min_size=1024, group=16, w4a8=True)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    t = jnp.asarray([321.0])
    ctx = jnp.asarray(rng.standard_normal((1, 5, TINY["text_dim"])), jnp.float32)
    ref = np.asarray(wan_dit.forward(params, cfg, x, t, ctx))
    out4 = np.asarray(wan_dit.forward(q4, cfg, x, t, ctx))
    out48 = np.asarray(wan_dit.forward(q48, cfg, x, t, ctx))
    rel = np.abs(out48 - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.13, f"w4a8 relative error vs float {rel}"
    rel4 = np.abs(out48 - out4).mean() / (np.abs(out4).mean() + 1e-8)
    assert rel4 < 0.06, f"w4a8 drift vs int4-bf16 dequant {rel4}"


def test_init_params_int4_w4a8_structure():
    """init_params_int4(w4a8=True) mirrors quantize_params_int4(..., w4a8=True)
    structurally and the W4A8 forward runs finite."""
    import jax

    cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, dtype=jnp.float32,
    )
    ref_q = wan_dit.quantize_params_int4(
        wan_dit.init_params(jax.random.PRNGKey(0), cfg), min_size=1024,
        group=16, w4a8=True,
    )
    rand_q = wan_dit.init_params_int4(jax.random.PRNGKey(0), cfg, min_size=1024,
                                      group=16, w4a8=True)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(ref_q)}
    rand_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(rand_q)}
    assert ref_paths == rand_paths
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 6)), jnp.float32)
    out = wan_dit.forward(rand_q, cfg, x, jnp.asarray([100.0]),
                          jnp.asarray(rng.standard_normal((1, 5, 48)), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_quantized_load_matches_post_quantization():
    """quantized_params_from_torch_state_dict (the 14B quantize-on-load path
    that never stages bf16 on the accelerator) produces bit-identical leaves
    to quantizing after a full load, for both int4 and W4A8."""
    import jax

    torch.manual_seed(13)
    kw = dict(TINY, in_dim=16)
    tm = ref_dit.WanModel(has_image_input=False, **kw).eval()
    cfg = wan_dit.WanDiTConfig(has_image_input=False, dtype=jnp.float32,
                               **{k: v for k, v in kw.items() if k != "eps"})
    sd = tm.state_dict()
    for w4a8 in (False, True):
        ref_q = wan_dit.quantize_params_int4(
            wan_dit.params_from_torch_state_dict(sd, cfg),
            min_size=1024, group=16, w4a8=w4a8)
        got_q = wan_dit.quantized_params_from_torch_state_dict(
            sd, cfg, min_size=1024, group=16, w4a8=w4a8)
        ref_leaves = jax.tree_util.tree_leaves_with_path(ref_q)
        got_leaves = dict(jax.tree_util.tree_leaves_with_path(got_q))
        assert len(ref_leaves) == len(got_leaves)
        for path, leaf in ref_leaves:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(got_leaves[path]),
                                          err_msg=str(path))
