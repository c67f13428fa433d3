"""Pre-seed the persistent XLA/Mosaic compilation cache for a deployment.

The r04 bench measured a 305 s cold compile of the 1.3B denoise step after
the flash-kernel rework (BENCH_r03: 36 s) — the decoupled-sub-block Pallas
kernels cost minutes of Mosaic compile the first time a given (shape, kernel)
pair is seen, and any kernel change invalidates the persistent cache
(~/.cache/jax_svi). Run this once per deployment/upgrade so production
drivers (scripts/test_svi*.py) start from a warm cache.

The persistent cache is keyed by whole-executable HLO, so this script
compiles the SAME executables the drivers build: it constructs a real
SVIVideoPipeline (random weights — compiled artifacts are keyed by HLO, not
weight values, so the cache carries over to real checkpoints) and runs one
2-step clip at the requested spec. That covers the conditioning encode, the
batched-CFG denoise step (and the TeaCache split prelude/blocks/head when
--teacache), and the tiled VAE decode — i.e. everything `test_svi.py`
compiles. --train additionally compiles the 1.3B LoRA train step (the
trainer jits `make_train_step` directly, so that IS the trainer's
executable). The dance/talk drivers add a pose / audio branch on top; their
first run still compiles only that delta.

Usage:
  python scripts/warm_compile.py --size 1.3B --height 480 --width 832 --frames 81
  python scripts/warm_compile.py --size 14B            # W4A8 flagship step
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["1.3B", "14B"], default="1.3B")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--teacache", action="store_true",
                    help="also compile the TeaCache split prelude/blocks/head")
    ap.add_argument("--train", action="store_true",
                    help="also compile the LoRA train step (1.3B only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.models import clip_vision, wan_dit, wan_vae
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    svi_tpu.enable_compilation_cache()

    H, W, NF = args.height, args.width, args.frames
    rng = np.random.default_rng(0)

    if args.size == "14B":
        cfg = wan_dit.WAN_14B_I2V
        params = wan_dit.init_params_int4(jax.random.PRNGKey(0), cfg, w4a8=True)
    else:
        cfg = wan_dit.WanDiTConfig(  # 1.3B-I2V, the bench/driver config
            dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12,
            num_layers=30, has_image_input=True, dtype=jnp.bfloat16,
        )
        params = wan_dit.init_params(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    vae_cfg = wan_vae.WanVAEConfig(dtype=jnp.float32)
    vae_params = wan_vae.init_params(jax.random.PRNGKey(1), vae_cfg)

    pipe = SVIVideoPipeline()
    pipe.dit = (params, cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (None, None)
    # prompter/CLIP stubs: their outputs' SHAPES are all the denoise/decode
    # executables see, and shapes are fixed (512 text tokens, 257 CLIP tokens)
    ctx = jnp.asarray(rng.standard_normal((1, 512, cfg.text_dim)), jnp.bfloat16)
    pipe.encode_prompt = lambda prompt, positive=True: {"context": ctx}
    clip_ctx = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)
    clip_vision.encode_image = lambda p, c, f: clip_ctx

    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    anchor = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))

    t0 = time.perf_counter()
    video = pipe(
        prompt="warm", negative_prompt="cold",
        input_image=img, random_ref_frame=anchor, seed=0,
        height=H, width=W, num_frames=NF,
        cfg_scale=5.0, num_inference_steps=2, ref_pad_num=-1,
        tea_cache_l1_thresh=(0.3 if args.teacache else None),
        tea_cache_model_id=("Wan2.1-T2V-1.3B" if args.size == "1.3B"
                            else "Wan2.1-I2V-14B-480P"),
    )
    assert len(video) == NF
    print(f"{args.size} clip (encode + CFG denoise + tiled VAE decode"
          f"{' + teacache' if args.teacache else ''}): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    if args.train and args.size == "1.3B":
        from svi_tpu.schedulers import flow_match as fm
        from svi_tpu.training import TrainerConfig, lora as lora_mod
        from svi_tpu.training import trainer as trainer_mod

        LT = (NF - 1) // 4 + 1
        tc = TrainerConfig(lora_rank=128, lora_alpha=128.0)
        schedule = fm.make_schedule(1000, shift=5.0, sigma_min=0.0,
                                    extra_one_step=True, training=True)
        trainable = {"lora": lora_mod.init_lora_params(
            jax.random.PRNGKey(1), cfg, rank=128)}
        optimizer = trainer_mod.make_optimizer(tc)
        opt_state = optimizer.init(trainable)
        step = trainer_mod.make_train_step(
            cfg, schedule, optimizer, lora_scale=1.0, use_remat=True, mesh=None)
        fhw = (LT, H // 8, W // 8)
        batch = {
            "latents": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
            "noise_w_error": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
            "latents_w_error": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
            "timestep": jnp.asarray([500.0], jnp.float32),
            "timestep_id": jnp.asarray([500], jnp.int32),
            "context": ctx.astype(jnp.float32),
            "clip_feature": clip_ctx,
            "y": jnp.asarray(rng.standard_normal((1, 20, *fhw)), jnp.float32),
        }
        t0 = time.perf_counter()
        trainable, opt_state, m = step(trainable, opt_state, params, batch)
        _ = float(m["loss"])
        print(f"train step compile: {time.perf_counter() - t0:.1f}s", flush=True)

    print("cache warm:", os.path.expanduser("~/.cache/jax_svi"), flush=True)


if __name__ == "__main__":
    main()
