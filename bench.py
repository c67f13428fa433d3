"""SVI-TPU benchmark: one full SVI clip at the flagship spec on one chip.

Measures the production per-clip pipeline — conditioning encode (CLIP + VAE,
fp32), 50-step CFG-batched bf16 DiT denoise, causal VAE decode — at 480x832,
81 frames (BASELINE.md per-clip spec), using the Wan 1.3B-dim I2V architecture
(the largest that fits a single 16GB v5e in bf16; the 14B flagship needs the
multi-chip sequence/tensor sharding path or int8 weights — tracked for later
rounds).

Denoise time is measured over N_MEASURE steps after warmup and scaled to 50
(each step is identical work); encode/decode are measured directly.

vs_baseline: the reference publishes no A100 wall-clock for this config; we
compare against an A100-80G estimate for the same workload — total FLOPs at
50% sustained bf16 utilization (312 TFLOPS peak, flash-attn-2-class
efficiency) + the measured-equivalent VAE cost. vs_baseline > 1 means faster
than the A100 estimate. Prints ONE json line.
"""

import json
import time

import numpy as np


def main():
    import jax

    import svi_tpu

    svi_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from svi_tpu.models import wan_dit, wan_vae, clip_vision
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    assert jax.default_backend() == "tpu", f"bench must run on TPU, got {jax.default_backend()}"

    H, W, NF, STEPS = 480, 832, 81, 50
    LT = (NF - 1) // 4 + 1

    dit_cfg = wan_dit.WanDiTConfig(
        dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12, num_layers=30,
        has_image_input=True, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dit_params = wan_dit.init_params(k1, dit_cfg)
    vae_cfg = wan_vae.WAN_VAE
    vae_params = wan_vae.init_params(k2, vae_cfg)
    clip_cfg = clip_vision.VIT_H_14
    clip_params = clip_vision.init_params(k3, clip_cfg)

    pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
    pipe.dit = (dit_params, dit_cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (clip_params, clip_cfg)

    rng = np.random.default_rng(0)
    from PIL import Image

    ref_img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    ctx_pos = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)
    ctx_neg = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)

    # --- conditioning encode (CLIP fp32 + VAE fp32 encode) ---
    t0 = time.perf_counter()
    image_emb = pipe.encode_images_adaptive([ref_img], ref_img, NF, H, W, ref_pad_num=-1)
    jax.block_until_ready(image_emb["y"])
    _ = np.asarray(image_emb["y"][0, 0, 0, 0, 0])  # force full sync (axon tunnel)
    t_encode_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    image_emb = pipe.encode_images_adaptive([ref_img], ref_img, NF, H, W, ref_pad_num=-1)
    _ = np.asarray(image_emb["y"][0, 0, 0, 0, 0])
    t_encode = time.perf_counter() - t0

    # --- denoise steps (batched CFG: one b=2 forward per step; the pipeline
    # dispatches per step — measured equal to a fused fori-loop) ---
    pipe.scheduler.set_timesteps(STEPS, shift=5.0)
    latents = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
    step_fn = pipe._denoise_step_fn()
    sigmas = np.asarray(pipe.scheduler.sigmas, np.float32)
    timesteps = np.asarray(pipe.scheduler.timesteps, np.float32)
    ctx2 = jnp.concatenate([ctx_pos, ctx_neg], axis=0)

    def one_step(lat, i):
        return step_fn(
            dit_params, lat, jnp.asarray([timesteps[i]]), sigmas[i], sigmas[i + 1],
            ctx2, image_emb["clip_feature"], image_emb["y"], np.float32(5.0), None,
        )

    t0 = time.perf_counter()
    latents = one_step(latents, 0)
    _ = np.asarray(latents[0, 0, 0, 0, 0])
    t_step_compile = time.perf_counter() - t0

    N_MEASURE = 4
    t0 = time.perf_counter()
    for i in range(1, 1 + N_MEASURE):
        latents = one_step(latents, i)
    _ = np.asarray(latents[0, 0, 0, 0, 0])
    t_step = (time.perf_counter() - t0) / N_MEASURE

    # --- VAE decode ---
    t0 = time.perf_counter()
    frames = pipe.decode_video(latents, tiled=False)
    _ = np.asarray(frames[0, 0, 0, 0, 0])
    t_decode_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    frames = pipe.decode_video(latents, tiled=False)
    _ = np.asarray(frames[0, 0, 0, 0, 0])
    t_decode = time.perf_counter() - t0

    clip_seconds = t_encode + STEPS * t_step + t_decode
    fps_per_chip = NF / clip_seconds
    # 1 minute of 24fps video with 1 motion frame of overlap: 80 new frames/clip
    clips_per_min_video = (60 * 24) / (NF - 1)
    min_per_min_video = clip_seconds * clips_per_min_video / 60

    # --- A100-80G estimate for the same workload ---
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    S = LT * (H // 16) * (W // 16)
    flops_fwd = 2 * n_params * S + dit_cfg.num_layers * 4 * S * S * dit_cfg.dim
    total_flops = STEPS * 2 * flops_fwd  # CFG pair
    a100_denoise = total_flops / (312e12 * 0.5)
    a100_vae = (t_encode + t_decode)  # assume parity on the conv VAE
    a100_clip_seconds = a100_denoise + a100_vae
    vs_baseline = a100_clip_seconds / clip_seconds

    result = {
        "metric": "frames_per_sec_per_chip_svi_clip_1.3B_480p_81f_50steps_cfg",
        "value": round(fps_per_chip, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "clip_seconds": round(clip_seconds, 2),
            "denoise_step_seconds": round(t_step, 3),
            "cond_encode_seconds": round(t_encode, 2),
            "vae_decode_seconds": round(t_decode, 2),
            "min_per_1min_video": round(min_per_min_video, 2),
            "compile_seconds": round(t_encode_compile + t_step_compile + t_decode_compile, 1),
            "baseline": "A100-80G estimate: same FLOPs at 50% bf16 util + measured VAE cost",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
