"""Hardware smoke: full SVIVideoPipeline clip loop on the real TPU.

Run after any kernel/pipeline change: `python scripts/smoke_e2e.py` (~3 min
warm cache, ~13 min cold).

Real 1.3B DiT architecture (dim 1536, 30 layers) with random weights, real
causal VAE, 2 clips at 192x320/9 frames/2 steps with motion-frame recycling
and TeaCache ON for clip 2, mp4 written via AsyncVideoSaver — the production
driver path end to end after the round-5 attention save_tag change.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import svi_tpu
from svi_tpu.models import wan_dit, wan_vae, clip_vision
from svi_tpu.pipelines.svi_video import SVIVideoPipeline

svi_tpu.enable_compilation_cache()
assert jax.default_backend() == "tpu"
t_start = time.time()

rng = np.random.default_rng(0)
H, W, NF, STEPS, MOTION = 192, 320, 9, 2, 2

dit_cfg = wan_dit.WanDiTConfig(
    dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12,
    num_layers=30, has_image_input=True, dtype=jnp.bfloat16,
)
dit_params = wan_dit.init_params(jax.random.PRNGKey(0), dit_cfg)
vae_cfg = wan_vae.WanVAEConfig(dtype=jnp.float32)
vae_params = wan_vae.init_params(jax.random.PRNGKey(1), vae_cfg)

pipe = SVIVideoPipeline()
pipe.dit = (dit_params, dit_cfg)
pipe.vae = (vae_params, vae_cfg)
pipe.image_encoder = (None, None)

ctx_pos = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)
ctx_neg = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)
pipe.encode_prompt = lambda prompt, positive=True: {
    "context": ctx_pos if positive else ctx_neg
}
clip_ctx = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)
clip_vision.encode_image = lambda p, cfg, f: clip_ctx

from PIL import Image

img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
anchor = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))

from svi_tpu.utils.video import AsyncVideoSaver, save_video

out_dir = os.environ.get("SMOKE_OUT", "/tmp/svi_smoke_out")
os.makedirs(out_dir, exist_ok=True)
saver = AsyncVideoSaver()
motion = img
all_frames = []
for clip in range(2):
    t0 = time.time()
    video = pipe(
        prompt="a cat walking in the park",
        negative_prompt="static",
        input_image=motion,
        random_ref_frame=anchor,
        seed=clip,
        height=H, width=W, num_frames=NF,
        cfg_scale=5.0, num_inference_steps=STEPS,
        ref_pad_num=-1, tiled=False,
        tea_cache_l1_thresh=(0.3 if clip == 1 else None),
        tea_cache_model_id="Wan2.1-T2V-1.3B",
    )
    print(f"clip {clip + 1}: {len(video)} frames in {time.time() - t0:.1f}s",
          flush=True)
    assert len(video) == NF
    assert video[0].size == (W, H)
    all_frames.extend(video if clip == 0 else video[MOTION:])
    motion = video[-MOTION:]
    snap = list(all_frames)
    saver.submit(lambda s=snap: save_video(s, os.path.join(out_dir, "video.mp4"), fps=16))
saver.close()

from svi_tpu.utils.video import load_video_frames

frames = load_video_frames(os.path.join(out_dir, "video.mp4"))
assert len(frames) == NF + NF - MOTION, f"mp4 has {len(frames)} frames"
px = np.stack([np.asarray(f, np.float32) for f in frames])
assert np.isfinite(px).all() and px.std() > 1.0
print(f"SMOKE OK: {len(frames)} frames in mp4, {time.time() - t_start:.0f}s total",
      flush=True)
