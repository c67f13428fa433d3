"""FastBlend: the vectorized JAX kernels vs direct numpy loop ports of the
reference CUDA kernels (cupy isn't installed, so the loop semantics of
cupy_kernels.py are re-expressed in numpy here), plus end-to-end smoothing."""

import numpy as np

import jax.numpy as jnp

from svi_tpu.extensions import fastblend as fb


def _np_remap(source_pad, nnf, patch_size, pad):
    """Direct loop port of remapping_kernel (cupy_kernels.py:3-43)."""
    b, h, w, _ = nnf.shape[0], nnf.shape[1], nnf.shape[2], None
    c = source_pad.shape[-1]
    r = (patch_size - 1) // 2
    out = np.zeros((b, h + 2 * pad, w + 2 * pad, c), np.float32)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                num = 0
                acc = np.zeros(c, np.float32)
                for px in range(max(-x, -r), min(h - 1 - x, r) + 1):
                    for py in range(max(-y, -r), min(w - 1 - y, r) + 1):
                        x_ = nnf[bi, x + px, y + py, 0] - px
                        y_ = nnf[bi, x + px, y + py, 1] - py
                        if x_ < 0 or y_ < 0 or x_ >= h or y_ >= w:
                            continue
                        num += 1
                        acc += source_pad[bi, x_ + pad, y_ + pad]
                out[bi, x + pad, y + pad] = acc / max(num, 1)
    return out


def _np_patch_error(source_pad, nnf, target_pad, patch_size, pad):
    """Direct loop port of patch_error_kernel (cupy_kernels.py:46-79)."""
    b, h, w = nnf.shape[:3]
    r = (patch_size - 1) // 2
    err = np.zeros((b, h, w), np.float32)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                x_, y_ = nnf[bi, x, y]
                d = (target_pad[bi, x + pad - r:x + pad + r + 1, y + pad - r:y + pad + r + 1]
                     - source_pad[bi, x_ + pad - r:x_ + pad + r + 1, y_ + pad - r:y_ + pad + r + 1])
                err[bi, x, y] = np.sum(d * d)
    return err


def _rand_setup(seed=0, b=2, h=9, w=11, c=3, patch=3, pad=3):
    rng = np.random.default_rng(seed)
    src = rng.random((b, h + 2 * pad, w + 2 * pad, c)).astype(np.float32)
    tgt = rng.random((b, h + 2 * pad, w + 2 * pad, c)).astype(np.float32)
    nnf = np.stack([
        rng.integers(0, h, (b, h, w)), rng.integers(0, w, (b, h, w))
    ], axis=-1).astype(np.int32)
    return src, tgt, nnf, patch, pad


def test_remap_kernel_parity():
    src, _, nnf, patch, pad = _rand_setup()
    ref = _np_remap(src, nnf, patch, pad)
    ours = np.asarray(fb.apply_nnf_to_image(jnp.asarray(src), jnp.asarray(nnf), patch, pad))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_patch_error_kernel_parity():
    src, tgt, nnf, patch, pad = _rand_setup(1)
    ref = _np_patch_error(src, nnf, tgt, patch, pad)
    ours = np.asarray(fb.patch_error(jnp.asarray(src), jnp.asarray(nnf),
                                     jnp.asarray(tgt), patch, pad))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pairwise_patch_error_parity():
    src_a, src_b, nnf_a, patch, pad = _rand_setup(2)
    _, _, nnf_b, _, _ = _rand_setup(3)
    # pairwise = patch_error with the two gathered patches compared directly:
    # emulate with the loop port by gathering b's patch as the 'target'
    b, h, w = nnf_a.shape[:3]
    r = (patch - 1) // 2
    ref = np.zeros((b, h, w), np.float32)
    for bi in range(b):
        for x in range(h):
            for y in range(w):
                xa, ya = nnf_a[bi, x, y]
                xb, yb = nnf_b[bi, x, y]
                d = (src_a[bi, xa + pad - r:xa + pad + r + 1, ya + pad - r:ya + pad + r + 1]
                     - src_b[bi, xb + pad - r:xb + pad + r + 1, yb + pad - r:yb + pad + r + 1])
                ref[bi, x, y] = np.sum(d * d)
    ours = np.asarray(fb.pairwise_patch_error(
        jnp.asarray(src_a), jnp.asarray(nnf_a), jnp.asarray(src_b),
        jnp.asarray(nnf_b), patch, pad))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_tree_query_covers_interval():
    tm = fb.TableManager()
    for l, rbound in [(0, 7), (3, 12), (5, 5), (0, 0), (2, 31)]:
        nodes = tm.tree_query(l, rbound)
        covered = []
        for idx, level in nodes:
            covered.extend(range(idx - (1 << level) + 1, idx + 1))
        assert sorted(covered) == list(range(l, rbound + 1)), (l, rbound, nodes)


def test_identity_match_recovers_style():
    """With guide == style and identity init, PatchMatch should keep the NNF
    near identity and the remapped style near the original."""
    rng = np.random.default_rng(4)
    h = w = 48
    frames = [rng.random((h, w, 3)).astype(np.float32) * 255 for _ in range(3)]
    engine = fb.PyramidPatchMatcher(h, w, 3, minimum_patch_size=5, num_iter=2)
    nnf, remapped = engine.estimate_nnf(
        np.stack(frames[:1]), np.stack(frames[:1]), np.stack(frames[:1])
    )
    err = np.abs(remapped[0] - frames[0]).mean()
    assert err < 20.0, err  # remap averages patches; identity keeps it close


def test_fastblend_smoother_end_to_end():
    from PIL import Image

    rng = np.random.default_rng(5)
    base = rng.random((48, 48, 3)) * 255
    frames = [Image.fromarray(np.clip(base + rng.normal(0, 6, base.shape), 0, 255)
                              .astype(np.uint8)) for _ in range(4)]
    smoother = fb.FastBlendSmoother(batch_size=4, window_size=2, ebsynth_config={
        "minimum_patch_size": 5, "num_iter": 2, "guide_weight": 10.0,
        "initialize": "identity", "tracking_window_size": 0,
    })
    out = smoother(frames, original_frames=frames)
    assert len(out) == 4 and out[0].size == (48, 48)
    # blending reduces frame-to-frame flicker
    def flicker(fr):
        arr = np.stack([np.asarray(f, np.float64) for f in fr])
        return np.abs(np.diff(arr, axis=0)).mean()
    assert flicker(out) < flicker(frames)
