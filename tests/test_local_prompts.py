"""Regional (local) prompting: merge_latents / control_noise /
extend_prompt golden parity vs the reference BasePipeline (base.py:67-104),
and the SD pipeline integration path.
"""

import numpy as np
import torch
from PIL import Image

from reference_loader import load_ref_module

from svi_tpu.pipelines import base as pbase


class _RefPipe:
    """Instantiate the reference BasePipeline far enough for merge math."""

    def __new__(cls):
        mod = load_ref_module("diffsynth.pipelines.base")
        pipe = mod.BasePipeline.__new__(mod.BasePipeline)
        pipe.device = "cpu"
        pipe.torch_dtype = torch.float32
        return pipe


def _mask(h, w, box):
    m = np.zeros((h, w, 3), np.uint8)
    y0, y1, x0, x1 = box
    m[y0:y1, x0:x1] = 255
    return Image.fromarray(m)


def test_merge_latents_golden():
    rng = np.random.default_rng(0)
    value = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
    locals_ = [rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
               for _ in range(2)]
    masks = [_mask(256, 256, (0, 128, 0, 256)),
             _mask(256, 256, (64, 192, 64, 192))]
    scales = [2.0, 10.0]

    ours = pbase.merge_latents(value, locals_, masks, scales)

    ref_pipe = _RefPipe()
    ref = ref_pipe.merge_latents(
        torch.from_numpy(value.copy()),
        [torch.from_numpy(x) for x in locals_], masks, scales).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_merge_latents_identity_without_masks():
    x = np.ones((1, 4, 8, 8), np.float32) * 3.5
    np.testing.assert_array_equal(pbase.merge_latents(x, [], [], []), x)


def test_control_noise_via_local_prompts_calls():
    calls = []

    def cb(emb, special=None):
        calls.append((emb, special))
        return np.full((1, 4, 16, 16), float(emb), np.float32)

    mask = _mask(128, 128, (0, 128, 0, 64))
    out = pbase.control_noise_via_local_prompts(
        1.0, [2.0], [mask], [100.0], cb)
    assert [c[0] for c in calls] == [1.0, 2.0]
    # masked local (scale 100) pulls everything toward 2; the left (masked)
    # side more than the right (the sigma-10 feather blurs a 16px latent
    # heavily, so both sides sit near 2)
    assert 1.0 < out[0, 0, 8, 14] < out[0, 0, 8, 1] <= 2.0

    # special kwargs propagate (ref base.py:83-90)
    calls.clear()
    pbase.control_noise_via_local_prompts(
        1.0, [2.0, 3.0], [mask, mask], [1.0, 1.0], cb,
        special_kwargs={"g": 1}, special_local_kwargs_list=[{"l": 1},
                                                            {"l": 2}])
    assert calls == [(1.0, {"g": 1}), (2.0, {"l": 1}), (3.0, {"l": 2})]


def test_extend_prompt_merges_omost_regions():
    class FakePrompter:
        def extend_prompt(self, prompt):
            return {"prompt": prompt + " hi", "prompts": ["a cat"],
                    "masks": ["M"]}

    prompt, lp, masks, scales = pbase.extend_prompt(
        FakePrompter(), "scene", ["user region"], ["U"], [5.0])
    assert prompt == "scene hi"
    assert lp == ["user region", "a cat"]
    assert masks == ["U", "M"]
    assert scales == [5.0, 100.0]

    # prompters without extenders (e.g. FluxPrompter) pass through
    prompt, lp, masks, scales = pbase.extend_prompt(
        object(), "scene", None, None, None)
    assert (prompt, lp, masks, scales) == ("scene", [], [], [])


def test_sd_pipeline_local_prompts_smoke():
    """End-to-end regional prompting through SDImagePipeline with random
    weights: runs, deterministic, and differs from the global-only result."""
    from svi_tpu.pipelines.sd_image import SDImagePipeline

    import jax.numpy as jnp

    from svi_tpu.models import sd as sd_models

    ref = load_ref_module("diffsynth.models.sd_unet")
    dec_mod = load_ref_module("diffsynth.models.sd_vae_decoder")
    torch.manual_seed(0)
    model = ref.SDUNet().eval()
    st = model.state_dict()
    for k in st:
        st[k] = torch.randn_like(st[k]) * 0.05
    params = sd_models.sd_unet_params_from_torch(st)
    dec = dec_mod.SDVAEDecoder().eval()
    std = dec.state_dict()
    for k in std:
        std[k] = torch.randn_like(std[k]) * 0.05
    dec_params = sd_models.sd_vae_decoder_params_from_torch(std)

    pipe = SDImagePipeline(params, vae_decoder_params=dec_params)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(1, 77, 768)), jnp.float32)
    emb_local = jnp.asarray(rng.normal(size=(1, 77, 768)), jnp.float32)
    kwargs = dict(height=64, width=64, num_inference_steps=2, seed=0,
                  prompt_emb_posi=emb, prompt_emb_nega=emb * 0)
    img_global = np.asarray(pipe("", **kwargs))

    pipe.encode_prompt = lambda p, clip_skip=1, positive=True: emb_local
    img_local = np.asarray(pipe(
        "", local_prompts=["left thing"], masks=[_mask(64, 64, (0, 64, 0, 32))],
        mask_scales=[100.0], **kwargs))
    assert img_local.shape == img_global.shape
    assert np.abs(img_local.astype(int) - img_global.astype(int)).max() > 0
