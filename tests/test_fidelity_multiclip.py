"""Multi-clip fidelity: OUR 3-clip motion-frame-recycling loop vs the
REFERENCE torch pipelines on shared tiny weights — the actual SVI mechanism
(reference test_svi.py:424-483: after each clip the last num_motion_frames
frames become the next clip's input_image while the anchor random_ref_frame
stays fixed), certified per clip for all three variants (shot, dance, talk).

Complements test_fidelity_psnr.py (single clip, shot only). CLIP and the
prompter are stubbed with IDENTICAL constants on both sides (each is
separately golden-parity-tested); everything else — seeded noise, scheduler,
conditioning mask/padding math, CFG (batched on our side, sequential on the
reference's), causal VAE decode, uint8 conversion, and the pixel-space
motion-frame handoff — runs through both full pipelines, three clips deep.
"""

import types

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax
import jax.numpy as jnp

from svi_tpu.models import pose_embedding, wan_dit, wan_vae
from svi_tpu.utils.fidelity import clip_psnr

ref_svi = load_ref_module("diffsynth.pipelines.svi_video")
ref_svi_dance = load_ref_module("diffsynth.pipelines.svi_video_dance")
ref_svi_talk = load_ref_module("diffsynth.pipelines.svi_video_talk")
ref_dit_mod = load_ref_module("diffsynth.models.wan_video_dit")
ref_vae_mod = load_ref_module("diffsynth.models.wan_video_vae")

Z = 16  # the reference hardcodes 16 latent channels (svi_video.py:464)
CLIP_DIM = 1280
H = W = 64
NF = 9
STEPS = 2
NUM_CLIPS = 3
MOTION = 2  # num_motion_frames: exercises the list-of-frames input path
DIM = 64

TINY_DIT = dict(
    dim=DIM, in_dim=Z + 4 + Z, ffn_dim=128, out_dim=Z, text_dim=48,
    freq_dim=32, eps=1e-6, patch_size=(1, 2, 2), num_heads=2, num_layers=2,
)


class _ClipStub(torch.nn.Module):
    def __init__(self, ctx):
        super().__init__()
        self._p = torch.nn.Parameter(torch.zeros(1))
        self.ctx = torch.tensor(ctx)

    def encode_image(self, images):
        return self.ctx.clone()


def _make_shared():
    """Tiny torch DiT+VAE + stub conditioning shared by both sides."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    vae_t = ref_vae_mod.VideoVAE_(dim=16, z_dim=Z).eval()
    clip_ctx = rng.standard_normal((1, 257, CLIP_DIM)).astype(np.float32)
    ctx_pos = rng.standard_normal((1, 7, 48)).astype(np.float32)
    ctx_neg = rng.standard_normal((1, 7, 48)).astype(np.float32)
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    anchor = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    return vae_t, clip_ctx, ctx_pos, ctx_neg, img, anchor


def _wire_ref_pipeline(pipe, dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg):
    pipe.dit = dit_t
    wrap = ref_vae_mod.WanVideoVAE.__new__(ref_vae_mod.WanVideoVAE)
    torch.nn.Module.__init__(wrap)
    wrap.model = vae_t
    wrap.upsampling_factor = 8
    wrap.mean = torch.tensor(wan_vae.LATENT_MEAN)
    wrap.std = torch.tensor(wan_vae.LATENT_STD)
    wrap.scale = [wrap.mean, 1.0 / wrap.std]
    pipe.vae = wrap
    pipe.image_encoder = _ClipStub(clip_ctx)
    pipe.encode_prompt = lambda prompt, positive=True: {
        "context": torch.tensor(ctx_pos if positive else ctx_neg)
    }
    return pipe


def _wire_our_pipeline(pipe, dit_t, vae_t, clip_ctx, monkeypatch, **cfg_extra):
    from svi_tpu.models import clip_vision

    dit_cfg = wan_dit.config_from_state_dict(
        {k: v.numpy() for k, v in dit_t.state_dict().items()}
    )
    dit_cfg = wan_dit.WanDiTConfig(
        **{**dit_cfg.__dict__, "num_heads": 2, "dtype": jnp.float32,
           "clip_feature_dim": CLIP_DIM, **cfg_extra}
    )
    dit_params = wan_dit.params_from_torch_state_dict(dit_t.state_dict(), dit_cfg)
    vae_cfg = wan_vae.WanVAEConfig(dim=16, z_dim=Z, dtype=jnp.float32)
    vae_params = wan_vae.params_from_torch_state_dict(vae_t.state_dict(), vae_cfg)
    monkeypatch.setattr(
        clip_vision, "encode_image", lambda p, cfg, f: jnp.asarray(clip_ctx)
    )
    pipe.dit = (dit_params, dit_cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (None, None)
    return pipe


def _recycle_loop(run_clip, img):
    """The reference driver's multi-clip loop (test_svi.py:378-383, 460-476):
    clip 1 from the input image, then the last MOTION frames feed the next
    clip. Returns the list of per-clip frame lists."""
    motion = img  # single image for clip 1 (repeat_first_clip=False, :382)
    clips = []
    for chunk in range(NUM_CLIPS):
        video = run_clip(motion, seed=chunk)
        clips.append(video)
        motion = video[-MOTION:]
    return clips


def _assert_per_clip_psnr(our_clips, ref_clips, label):
    for i, (ours, ref) in enumerate(zip(our_clips, ref_clips)):
        assert len(ours) == len(ref) == NF
        score = clip_psnr(ours, ref)
        print(f"{label} clip {i + 1}/{NUM_CLIPS} PSNR: {score:.1f} dB")
        # BASELINE north star is >35 dB on real weights; identical tiny
        # weights in f32 must clear it with margin EVEN after three clips of
        # recycled motion frames (errors compound through the handoff)
        assert score > 35.0, f"{label} clip {i + 1} PSNR {score:.1f} dB"


def test_multiclip_shot_psnr_vs_reference(monkeypatch):
    vae_t, clip_ctx, ctx_pos, ctx_neg, img, anchor = _make_shared()
    dit_t = ref_dit_mod.WanModel(has_image_input=True, **TINY_DIT).eval()

    ref_pipe = _wire_ref_pipeline(
        ref_svi.SVIVideoPipeline(device="cpu", torch_dtype=torch.float32),
        dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg)
    args_ns = types.SimpleNamespace(ref_pad_cfg=False, ref_pad_num=-1)

    def ref_clip(motion, seed):
        with torch.no_grad():
            return ref_pipe(
                prompt="p", negative_prompt="n", input_image=motion,
                random_ref_frame=torch.tensor(anchor), seed=seed,
                height=H, width=W, num_frames=NF, cfg_scale={"text": 5.0},
                num_inference_steps=STEPS, tiled=False, args=args_ns,
            )

    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    pipe = _wire_our_pipeline(SVIVideoPipeline(torch_dtype=jnp.float32),
                              dit_t, vae_t, clip_ctx, monkeypatch)

    def our_clip(motion, seed):
        return pipe(
            input_image=motion, random_ref_frame=anchor, seed=seed,
            height=H, width=W, num_frames=NF, cfg_scale=5.0,
            num_inference_steps=STEPS, tiled=False,
            prompt_emb_posi=ctx_pos, prompt_emb_nega=ctx_neg, ref_pad_num=-1,
        )

    ref_clips = _recycle_loop(ref_clip, img)
    our_clips = _recycle_loop(our_clip, img)
    _assert_per_clip_psnr(our_clips, ref_clips, "shot")


def test_multiclip_dance_psnr_vs_reference(monkeypatch):
    vae_t, clip_ctx, ctx_pos, ctx_neg, img, anchor = _make_shared()
    dit_t = ref_dit_mod.WanModel(has_image_input=True, **TINY_DIT).eval()
    rng = np.random.default_rng(5)
    # rolling pose stream: each clip slices its own window (driver behavior)
    pose_stream = rng.integers(
        0, 255, (3, NUM_CLIPS * NF, H, W)).astype(np.float32)

    torch.manual_seed(4)
    from test_variants import build_ref_dwpose

    dwpose_t = build_ref_dwpose(dim=DIM).eval()

    ref_pipe = _wire_ref_pipeline(
        ref_svi_dance.SVIDanceVideoPipeline(device="cpu", torch_dtype=torch.float32),
        dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg)
    ref_pipe.dwpose_embedding = dwpose_t
    args_ns = types.SimpleNamespace(ref_pad_cfg=False, ref_pad_num=-1)

    state = {"chunk": 0}

    def pose_window():
        c = state["chunk"]
        return pose_stream[:, c * NF:(c + 1) * NF]

    def ref_clip(motion, seed):
        with torch.no_grad():
            out = ref_pipe(
                prompt="p", negative_prompt="n", input_image=motion,
                random_ref_frame=torch.tensor(anchor), seed=seed,
                height=H, width=W, num_frames=NF, cfg_scale={"text": 2.0},
                num_inference_steps=STEPS, tiled=False, args=args_ns,
                humanpose_data=torch.tensor(pose_window()), cond_wo_pose=True,
            )
        state["chunk"] += 1
        return out

    from svi_tpu.pipelines.svi_video_dance import SVIDanceVideoPipeline

    pipe = _wire_our_pipeline(SVIDanceVideoPipeline(torch_dtype=jnp.float32),
                              dit_t, vae_t, clip_ctx, monkeypatch)
    pipe.dwpose_embedding = pose_embedding.params_from_torch_state_dict(
        {f"dwpose_embedding.{k}": v for k, v in dwpose_t.state_dict().items()}
    )

    def our_clip(motion, seed):
        out = pipe(
            input_image=motion, random_ref_frame=anchor, seed=seed,
            height=H, width=W, num_frames=NF, cfg_scale=2.0,
            num_inference_steps=STEPS, tiled=False,
            prompt_emb_posi=ctx_pos, prompt_emb_nega=ctx_neg, ref_pad_num=-1,
            humanpose_data=pose_window(), cond_wo_pose=True,
        )
        state["chunk"] += 1
        return out

    ref_clips = _recycle_loop(ref_clip, img)
    state["chunk"] = 0
    our_clips = _recycle_loop(our_clip, img)
    _assert_per_clip_psnr(our_clips, ref_clips, "dance")


def test_multiclip_talk_psnr_vs_reference(monkeypatch):
    vae_t, clip_ctx, ctx_pos, ctx_neg, img, anchor = _make_shared()
    torch.manual_seed(2)
    dit_t = ref_dit_mod.WanModel(
        has_image_input=True, enable_multitalk=True, **TINY_DIT).eval()
    rng = np.random.default_rng(6)
    # whole-file wav2vec embedding; each clip slices a window at its start
    # index (driver math: start advances by NF - MOTION per clip)
    audio_embed_full = rng.standard_normal(
        (NUM_CLIPS * NF + 8, 12, 768)).astype(np.float32)

    from svi_tpu.utils import audio as audio_utils

    state = {"chunk": 0}

    def window():
        start = state["chunk"] * (NF - MOTION)
        return audio_utils.slice_audio_windows(audio_embed_full, NF, start)

    ref_pipe = _wire_ref_pipeline(
        ref_svi_talk.SVITalkVideoPipeline(device="cpu", torch_dtype=torch.float32),
        dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg)
    ref_pipe.get_audio_embedding = (
        lambda path, nf, audio_start_idx=0: torch.tensor(window())
    )
    args_ns = types.SimpleNamespace(ref_pad_cfg=False, ref_pad_num=-1)

    def ref_clip(motion, seed):
        with torch.no_grad():
            out = ref_pipe(
                prompt="p", negative_prompt="n", input_image=motion,
                random_ref_frame=torch.tensor(anchor), seed=seed,
                height=H, width=W, num_frames=NF,
                cfg_scale={"text": 2.0, "audio": 2.0},
                num_inference_steps=STEPS, tiled=False, args=args_ns,
                audio_path="stub.wav",
            )
        state["chunk"] += 1
        return out

    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline

    pipe = _wire_our_pipeline(SVITalkVideoPipeline(torch_dtype=jnp.float32),
                              dit_t, vae_t, clip_ctx, monkeypatch)

    def our_clip(motion, seed):
        out = pipe(
            input_image=motion, random_ref_frame=anchor, seed=seed,
            height=H, width=W, num_frames=NF,
            cfg_scale=dict(text=2.0, audio=2.0),
            num_inference_steps=STEPS, tiled=False,
            prompt_emb_posi=ctx_pos, prompt_emb_nega=ctx_neg, ref_pad_num=-1,
            audio_embed=window(),
        )
        state["chunk"] += 1
        return out

    ref_clips = _recycle_loop(ref_clip, img)
    state["chunk"] = 0
    our_clips = _recycle_loop(our_clip, img)
    _assert_per_clip_psnr(our_clips, ref_clips, "talk")


def test_multiclip_teacache_drift_bounded(monkeypatch):
    """TeaCache-on (never-skip threshold) must be numerically inert across
    the full 3-clip recycling loop: the split prelude/blocks/head path and
    the fused forward must agree to fp tolerance — certified at the pixel
    level (PSNR) rather than one-forward allclose."""
    vae_t, clip_ctx, ctx_pos, ctx_neg, img, anchor = _make_shared()
    dit_t = ref_dit_mod.WanModel(has_image_input=True, **TINY_DIT).eval()

    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    pipe = _wire_our_pipeline(SVIVideoPipeline(torch_dtype=jnp.float32),
                              dit_t, vae_t, clip_ctx, monkeypatch)

    def run(thresh):
        def our_clip(motion, seed):
            return pipe(
                input_image=motion, random_ref_frame=anchor, seed=seed,
                height=H, width=W, num_frames=NF, cfg_scale=5.0,
                num_inference_steps=STEPS, tiled=False,
                prompt_emb_posi=ctx_pos, prompt_emb_nega=ctx_neg,
                ref_pad_num=-1, tea_cache_l1_thresh=thresh,
                tea_cache_model_id="Wan2.1-I2V-14B-720P" if thresh is not None else "",
            )
        return _recycle_loop(our_clip, img)

    off = run(None)
    on = run(-1e9)  # never skip: pure path-equivalence check
    for i, (a, b) in enumerate(zip(off, on)):
        score = clip_psnr(a, b)
        print(f"teacache drift clip {i + 1}: {score:.1f} dB")
        assert score > 50.0, f"teacache-on drift too large: {score:.1f} dB"
