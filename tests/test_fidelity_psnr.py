"""End-to-end fidelity harness: OUR pipeline vs the REFERENCE torch pipeline
on shared tiny weights — the in-repo measurement path for the BASELINE
"PSNR > 35 vs reference clips" target (usable as-is once real checkpoints
arrive: convert, generate with both, score with utils.fidelity.clip_psnr).

CLIP and the T5 prompter are stubbed with IDENTICAL constants on both sides
(each is separately golden-parity-tested); everything else — seeded noise,
scheduler, conditioning mask/padding math, DiT denoise loop with CFG, causal
VAE decode, uint8 conversion — runs through both full pipelines.
"""

import types

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import wan_dit, wan_vae
from svi_tpu.utils.fidelity import clip_psnr, psnr

ref_svi = load_ref_module("diffsynth.pipelines.svi_video")
ref_dit_mod = load_ref_module("diffsynth.models.wan_video_dit")
ref_vae_mod = load_ref_module("diffsynth.models.wan_video_vae")

Z = 16  # the reference hardcodes 16 latent channels (svi_video.py:464)
CLIP_DIM = 1280  # WanModel hardcodes the ViT-H feature width (wan_video_dit.py MLP)
H = W = 64
NF = 9
STEPS = 4
SEED = 7


class _ClipStub(torch.nn.Module):
    def __init__(self, ctx):
        super().__init__()
        self._p = torch.nn.Parameter(torch.zeros(1))
        self.ctx = torch.tensor(ctx)

    def encode_image(self, images):
        return self.ctx.clone()


def _build_reference_pipeline(dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg):
    pipe = ref_svi.SVIVideoPipeline(device="cpu", torch_dtype=torch.float32)
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


def test_pipeline_psnr_vs_reference(monkeypatch):
    torch.manual_seed(0)
    dit_t = ref_dit_mod.WanModel(
        has_image_input=True, dim=64, in_dim=Z + 4 + Z, ffn_dim=128, out_dim=Z,
        text_dim=48, freq_dim=32, eps=1e-6, patch_size=(1, 2, 2), num_heads=2,
        num_layers=2,
    ).eval()
    vae_t = ref_vae_mod.VideoVAE_(dim=16, z_dim=Z).eval()

    rng = np.random.default_rng(0)
    clip_ctx = rng.standard_normal((1, 257, CLIP_DIM)).astype(np.float32)
    ctx_pos = rng.standard_normal((1, 7, 48)).astype(np.float32)
    ctx_neg = rng.standard_normal((1, 7, 48)).astype(np.float32)

    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    anchor = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)

    # ---- reference run ----
    ref_pipe = _build_reference_pipeline(dit_t, vae_t, clip_ctx, ctx_pos, ctx_neg)
    args_ns = types.SimpleNamespace(ref_pad_cfg=False, ref_pad_num=-1)
    with torch.no_grad():
        ref_frames = ref_pipe(
            prompt="p", negative_prompt="n", input_image=img,
            random_ref_frame=torch.tensor(anchor), seed=SEED,
            height=H, width=W, num_frames=NF,
            cfg_scale={"text": 5.0},  # ref passes a dict (test_svi.py:465)
            num_inference_steps=STEPS, tiled=False, args=args_ns,
        )

    # ---- our run (same weights) ----
    from svi_tpu.models import clip_vision
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    dit_cfg = wan_dit.config_from_state_dict(
        {k: v.numpy() for k, v in dit_t.state_dict().items()}
    )
    dit_cfg = wan_dit.WanDiTConfig(
        **{**dit_cfg.__dict__, "num_heads": 2, "dtype": jnp.float32,
           "clip_feature_dim": CLIP_DIM}
    )
    dit_params = wan_dit.params_from_torch_state_dict(dit_t.state_dict(), dit_cfg)
    vae_cfg = wan_vae.WanVAEConfig(dim=16, z_dim=Z, dtype=jnp.float32)
    vae_params = wan_vae.params_from_torch_state_dict(vae_t.state_dict(), vae_cfg)

    monkeypatch.setattr(
        clip_vision, "encode_image", lambda p, cfg, f: jnp.asarray(clip_ctx)
    )
    pipe = SVIVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit = (dit_params, dit_cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (None, None)
    ours = pipe(
        input_image=img, random_ref_frame=anchor, seed=SEED,
        height=H, width=W, num_frames=NF, cfg_scale=5.0,
        num_inference_steps=STEPS, tiled=False,
        prompt_emb_posi=ctx_pos, prompt_emb_nega=ctx_neg, ref_pad_num=-1,
    )

    assert len(ours) == len(ref_frames) == NF
    score = clip_psnr(ours, ref_frames)
    print(f"\npipeline-vs-reference PSNR: {score:.1f} dB")
    # BASELINE target is >35 dB on real weights; identical tiny weights in
    # f32 must clear it with a wide margin
    assert score > 35.0, f"pipeline PSNR vs reference {score:.1f} dB"


def test_psnr_util():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.float64)
    assert psnr(a, a) > 100
    b = a + rng.normal(0, 2.0, a.shape)
    val = psnr(a, b, peak=255.0)
    assert 35 < val < 50
