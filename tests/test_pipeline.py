"""Integration: SVIVideoPipeline end-to-end on tiny models (CPU), clip loop,
conditioning mask layout vs the reference math, TeaCache path."""

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from svi_tpu.models import clip_vision, wan_dit, wan_vae
from svi_tpu.pipelines.svi_video import SVIVideoPipeline, TeaCache

Z = 4  # tiny VAE latent channels
H = W = 64
NF = 9  # frames per clip (1+4k)


def tiny_pipeline(seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    vae_cfg = wan_vae.WanVAEConfig(dim=16, z_dim=Z, dtype=jnp.float32)
    vae_params = wan_vae.init_params(k1, vae_cfg)
    dit_cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=Z + 4 + Z, ffn_dim=128, out_dim=Z, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    dit_params = wan_dit.init_params(k2, dit_cfg)
    clip_cfg = clip_vision.ClipVisionConfig(
        image_size=28, patch_size=14, dim=40, mlp_ratio=2, num_heads=2, num_layers=2,
        dtype=jnp.float32,
    )
    clip_params = clip_vision.init_params(k3, clip_cfg)

    pipe = SVIVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit = (dit_params, dit_cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (clip_params, clip_cfg)
    return pipe


def rand_image(seed, h=H, w=W):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


CTX = np.random.default_rng(99).standard_normal((1, 12, 48)).astype(np.float32)


def run_clip(pipe, input_image, ref_frame, seed, **kw):
    return pipe(
        input_image=input_image,
        random_ref_frame=np.array(ref_frame),
        seed=seed,
        height=H, width=W, num_frames=NF,
        cfg_scale=5.0, num_inference_steps=3,
        tiled=False,
        prompt_emb_posi=CTX, prompt_emb_nega=CTX * 0.5,
        ref_pad_num=-1,
        **kw,
    )


def test_single_clip_shapes_and_finite():
    pipe = tiny_pipeline()
    frames = run_clip(pipe, rand_image(0), rand_image(1), seed=7)
    assert len(frames) == NF
    assert frames[0].size == (W, H)
    arr = np.array(frames[0])
    assert arr.dtype == np.uint8


def test_clip_loop_motion_frame_recycling():
    """The infinite-video outer loop (test_svi.py:424-476): condition clip k+1
    on the last num_motion_frames frames of clip k."""
    pipe = tiny_pipeline()
    anchor = rand_image(1)
    num_motion_frames = 4
    video = run_clip(pipe, rand_image(0), anchor, seed=0)
    motion = video[-num_motion_frames:]
    video2 = run_clip(pipe, motion, anchor, seed=13)
    assert len(video2) == NF
    full = video[:-num_motion_frames] + video2
    assert len(full) == NF + NF - num_motion_frames


def test_mask_layout_matches_reference_math():
    """Replicates svi_video.py:319-326 in torch and checks our y mask channels."""
    pipe = tiny_pipeline()
    num_frames, ncond = NF, 2
    emb = pipe.encode_images_adaptive(
        [rand_image(2), rand_image(3)], rand_image(4), num_frames, H, W,
        ref_pad_cfg=True, ref_pad_num=0,
    )
    y = np.asarray(emb["y"], np.float32)
    assert y.shape == (1, 4 + Z, (num_frames - 1) // 4 + 1, H // 8, W // 8)

    msk = torch.ones(1, num_frames, H // 8, W // 8)
    msk[:, ncond:] = 0  # ref_pad_cfg branch
    msk = torch.concat([torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1), msk[:, 1:]], dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, H // 8, W // 8)
    msk = msk.transpose(1, 2)[0]
    np.testing.assert_array_equal(y[0, :4], msk.numpy())

    # default branch: only frame 0 marked
    emb2 = pipe.encode_images_adaptive(
        [rand_image(2)], rand_image(4), num_frames, H, W, ref_pad_cfg=False, ref_pad_num=-1,
    )
    y2 = np.asarray(emb2["y"], np.float32)
    msk = torch.ones(1, num_frames, H // 8, W // 8)
    msk[:, 1:] = 0
    msk = torch.concat([torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1), msk[:, 1:]], dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, H // 8, W // 8)
    msk = msk.transpose(1, 2)[0]
    np.testing.assert_array_equal(y2[0, :4], msk.numpy())


def test_ref_pad_variants():
    pipe = tiny_pipeline()
    for ref_pad_num in (0, 2, -1):
        emb = pipe.encode_images_adaptive(
            [rand_image(5)], rand_image(6), NF, H, W, ref_pad_num=ref_pad_num,
        )
        assert emb["y"].shape[1] == 4 + Z


def test_teacache_path_runs():
    pipe = tiny_pipeline()
    frames = run_clip(
        pipe, rand_image(0), rand_image(1), seed=3,
        tea_cache_l1_thresh=1e9, tea_cache_model_id="Wan2.1-T2V-1.3B",
    )
    assert len(frames) == NF


class _RefTeaCache:
    """Inline replica of the reference TeaCache.check (svi_video.py:44-64),
    used as golden logic (importing the reference pipeline module pulls in its
    whole package tree)."""

    def __init__(self, n, thresh, coeffs):
        self.n, self.thresh, self.coeffs = n, thresh, coeffs
        self.step = 0
        self.acc = 0.0
        self.prev = None

    def check(self, t_mod):
        modulated = torch.tensor(t_mod).clone()
        if self.step == 0 or self.step == self.n - 1:
            should_calc = True
            self.acc = 0.0
        else:
            rescale = np.poly1d(self.coeffs)
            self.acc += rescale(
                ((modulated - self.prev).abs().mean() / self.prev.abs().mean()).item()
            )
            if self.acc < self.thresh:
                should_calc = False
            else:
                should_calc = True
                self.acc = 0.0
        self.prev = modulated
        self.step += 1
        if self.step == self.n:
            self.step = 0
        return not should_calc


def test_teacache_decision_parity():
    """TeaCache.check decisions match the reference logic step-for-step."""
    rng = np.random.default_rng(0)
    n = 10
    ours = TeaCache(n, rel_l1_thresh=0.05, model_id="Wan2.1-T2V-1.3B")
    theirs = _RefTeaCache(n, 0.05, TeaCache.COEFFICIENTS["Wan2.1-T2V-1.3B"])
    decisions = []
    for i in range(n):
        t_mod = rng.standard_normal((1, 6, 8)).astype(np.float32) * (1 + i * 0.01)
        x = rng.standard_normal((1, 4, 8)).astype(np.float32)
        skip_ours = ours.check(jnp.asarray(x), jnp.asarray(t_mod))
        skip_theirs = theirs.check(t_mod)
        assert skip_ours == skip_theirs, f"step {i}"
        decisions.append(skip_ours)
        if not skip_ours:
            ours.store(jnp.asarray(x) * 2)
    assert decisions[0] is False and decisions[-1] is False  # endpoints always compute
    assert any(decisions), "threshold 0.05 should skip at least one step"


def test_seeded_noise_matches_reference():
    """generate_noise is bit-identical to torch.randn on a seeded CPU gen."""
    from svi_tpu.pipelines import base

    ref = torch.randn(
        (1, 4, 3, 8, 8), generator=torch.Generator("cpu").manual_seed(42),
        dtype=torch.float32,
    ).numpy()
    ours = base.generate_noise((1, 4, 3, 8, 8), seed=42)
    np.testing.assert_array_equal(ours, ref)


def test_wan_video_pipeline_t2v_and_i2v():
    """Upstream WanVideoPipeline: T2V (no image) and I2V (ref_pad_num=0)."""
    from svi_tpu.pipelines.wan_video import WanVideoPipeline
    from svi_tpu.models import wan_dit, wan_vae

    import jax

    key = jax.random.PRNGKey(0)
    vae_cfg = wan_vae.WanVAEConfig(dim=16, z_dim=Z, dtype=jnp.float32)
    vae_params = wan_vae.init_params(key, vae_cfg)
    t2v_cfg = wan_dit.WanDiTConfig(
        dim=64, in_dim=Z, ffn_dim=128, out_dim=Z, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=False, dtype=jnp.float32,
    )
    pipe = WanVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit = (wan_dit.init_params(key, t2v_cfg), t2v_cfg)
    pipe.vae = (vae_params, vae_cfg)
    frames = pipe(
        seed=1, height=H, width=W, num_frames=NF, cfg_scale=5.0,
        num_inference_steps=2, tiled=False,
        prompt_emb_posi=CTX, prompt_emb_nega=CTX * 0.5,
    )
    assert len(frames) == NF

    # I2V through the same pipeline with image conditioning
    pipe2 = tiny_pipeline()
    wan = WanVideoPipeline(torch_dtype=jnp.float32)
    wan.dit, wan.vae, wan.image_encoder = pipe2.dit, pipe2.vae, pipe2.image_encoder
    frames = wan(
        input_image=rand_image(0), seed=1, height=H, width=W, num_frames=NF,
        cfg_scale=5.0, num_inference_steps=2, tiled=False,
        prompt_emb_posi=CTX, prompt_emb_nega=CTX * 0.5,
    )
    assert len(frames) == NF


def test_gradio_demo_core_generator(tmp_path):
    """The UI-free generation core of the gradio demo streams cumulative mp4s."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gradio_demo as gd

    pipe = tiny_pipeline()
    demo = gd.SVIGradioDemo(dit_root="unused", output_dir=str(tmp_path), mode="shot")
    demo.pipe = pipe

    # tiny models need precomputed prompt embeddings — wrap the pipeline
    # (instance-level __call__ patches are ignored by the call syntax)
    class _CtxPipe:
        def __call__(self, *a, **kw):
            kw.pop("prompt", None)
            kw.pop("negative_prompt", None)
            kw["prompt_emb_posi"] = CTX
            kw["prompt_emb_nega"] = CTX * 0.5
            return pipe(*a, **kw)

    demo.pipe = _CtxPipe()

    img = rand_image(3)
    outputs = list(demo.generate_video(
        np.array(img), "a cat\na dog", num_clips=2, num_steps=2, seed=5, num_frames=NF,
    ))
    # one (status, cumulative_path) per clip + the final "done" update
    # (streaming parity with ref gradio_demo.py:283-373)
    assert len(outputs) == 3
    status, path = outputs[-1]
    assert os.path.exists(path)
    from svi_tpu.utils.video import load_video_frames

    assert len(load_video_frames(path)) == NF + NF - 1  # shot mode: 1 motion frame


def test_gradio_demo_mode_switch_and_preview_wrapper(tmp_path):
    """UI-free mode management + the preview wrapper (ref gradio_demo.py
    switch_model_mode :57-75, generate_video_with_preview :882-1010):
    switching invalidates the pipeline, demo content follows the mode, and
    the wrapper validates inputs then streams (path, status_html) pairs."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import gradio_demo as gd

    demo = gd.SVIGradioDemo(dit_root="unused", output_dir=str(tmp_path), mode="film")
    demo.pipe = object()  # pretend initialized
    msg = demo.switch_model_mode("shot")
    assert "SVI-Shot" in msg and demo.mode == "shot"
    assert demo.pipe is None  # switch must force re-init (different LoRA)
    assert "nope" in demo.switch_model_mode("nope")

    # demo content resolves from the repo-owned toy assets (repo root cwd)
    old = os.getcwd()
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    try:
        img, prompts = demo.get_demo_content_for_mode("film")
        assert img is not None and prompts
    finally:
        os.chdir(old)

    # wrapper validation: uninitialized / no image / no prompts
    demo.pipe = None
    out = list(demo.generate_video_with_preview(None, "x", "", 1, 1, 5.0, 0))
    assert out[0][0] is None and "Initialize" in out[0][1]
    demo.pipe = object()
    out = list(demo.generate_video_with_preview(None, "x", "", 1, 1, 5.0, 0))
    assert "image" in out[0][1]
    out = list(demo.generate_video_with_preview(np.zeros((8, 8, 3), np.uint8),
                                                "  ", "", 1, 1, 5.0, 0))
    assert "prompt" in out[0][1]

    # streaming: wrapper passes through per-clip updates from the core
    pipe = tiny_pipeline()

    class _CtxPipe:
        def __call__(self, *a, **kw):
            kw.pop("prompt", None)
            kw.pop("negative_prompt", None)
            kw["prompt_emb_posi"] = CTX
            kw["prompt_emb_nega"] = CTX * 0.5
            return pipe(*a, **kw)

    demo.pipe = _CtxPipe()
    outs = list(demo.generate_video_with_preview(
        np.array(rand_image(3)), "a cat", NEG_STR := "bad", 1, 2, 5.0, -1))
    # starting status + 1 clip + final "done"
    assert len(outs) == 3
    assert outs[0][0] is None and "Starting" in outs[0][1]
    assert outs[1][0] and os.path.exists(outs[1][0])
    assert "done" in outs[-1][1]


def test_use_first_aug_changes_vae_condition_only():
    """use_first_aug (ref base.py:30-42) is real: the augmented path changes
    the VAE condition pixels; the default path is bit-identical across calls;
    the CLIP input is never augmented (ref svi_video.py:326 vs :331-334)."""
    import numpy as np
    from PIL import Image

    from svi_tpu.pipelines import base

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))

    a = base.preprocess_image(img)
    b = base.preprocess_image(img)
    np.testing.assert_array_equal(a, b)  # default path: bit-identical

    changed = False
    for seed in range(5):  # augmentation is stochastic; some draw must differ
        aug = base.preprocess_image(img, use_aug=True, rng=np.random.default_rng(seed))
        assert aug.shape == a.shape
        if not np.array_equal(aug, a):
            changed = True
    assert changed, "augmentation never changed the image"
