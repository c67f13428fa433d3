"""Pre-seed the persistent XLA/Mosaic compilation cache for a deployment.

The r04 bench measured a 305 s cold compile of the 1.3B denoise step after
the flash-kernel rework (BENCH_r03: 36 s) — the decoupled-sub-block Pallas
kernels cost minutes of Mosaic compile the first time a given (shape, kernel)
pair is seen, and any kernel change invalidates the persistent cache
(~/.cache/jax_svi). Run this once per deployment/upgrade so production
drivers (scripts/test_svi*.py) start from a warm cache: it jits the denoise
step (batched-CFG and no-CFG), the VAE decode, and the train step at the
requested spec with RANDOM weights — compiled artifacts are keyed by HLO,
not by weight values, so the cache carries over to real checkpoints.

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
    ap.add_argument("--train", action="store_true",
                    help="also compile the LoRA train step (1.3B only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.models import wan_dit

    svi_tpu.enable_compilation_cache()

    H, W, NF = args.height, args.width, args.frames
    LT = (NF - 1) // 4 + 1
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

    x = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
    t = jnp.asarray([500.0], jnp.float32)
    y1 = jnp.asarray(rng.standard_normal((1, 20, LT, H // 8, W // 8)), jnp.bfloat16)
    clip1 = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.bfloat16)
    ctx1 = jnp.asarray(rng.standard_normal((1, 512, cfg.text_dim)), jnp.bfloat16)

    def _sync(v):
        _ = np.asarray(jax.tree.leaves(v)[0].ravel()[0])

    for b, label in ((2, "batched-CFG"), (1, "no-CFG")):
        xb = jnp.concatenate([x] * b, axis=0)
        fwd = jax.jit(lambda p, x_, t_, c, cl, y_: wan_dit.forward(
            p, cfg, x_, t_, c, clip_feature=cl, y=y_))
        t0 = time.perf_counter()
        _sync(fwd(params, xb, t,
                  jnp.concatenate([ctx1] * b, axis=0),
                  jnp.concatenate([clip1] * b, axis=0),
                  jnp.concatenate([y1] * b, axis=0)))
        print(f"{args.size} forward b={b} ({label}): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    if args.train and args.size == "1.3B":
        from svi_tpu.schedulers import flow_match as fm
        from svi_tpu.training import TrainerConfig, lora as lora_mod
        from svi_tpu.training import trainer as trainer_mod

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
            "context": ctx1.astype(jnp.float32),
            "clip_feature": clip1.astype(jnp.float32),
            "y": y1.astype(jnp.float32),
        }
        t0 = time.perf_counter()
        trainable, opt_state, m = step(trainable, opt_state, params, batch)
        _ = float(m["loss"])
        print(f"train step compile: {time.perf_counter() - t0:.1f}s", flush=True)

    print("cache warm:", os.path.expanduser("~/.cache/jax_svi"), flush=True)


if __name__ == "__main__":
    main()
