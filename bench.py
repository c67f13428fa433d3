"""SVI-TPU benchmark: one full SVI clip at the flagship spec on one chip.

HEADLINE (BASELINE.json metric): the Wan-14B-I2V flagship — 480x832, 81
frames, 50 denoise steps, CFG — running single-chip with packed-int4 weights
executed on the int8 MXU (W4A8, wan_dit.quantize_params_int4(w4a8=True)).
This is the config BASELINE.md defines the frames/s/chip metric on
(ref test_svi.py:316-338, README.md:80: Wan2.1-I2V-14B-480P on one A100-80G).

`detail` additionally reports, with the same conditioning-encode/VAE-decode
costs (those are model-size independent):

  * wan_1_3B — the round-1/round-2 continuity metric: exact-bf16 1.3B-dim
    denoise, plus the opt-in W8A8 int8-linears variant;
  * flagship_14b_bf16 — the 14B int4-storage path dequantizing to bf16
    (round-2 methodology) for cross-round comparison;
  * train_step_seconds — one Error-Recycling LoRA train step (rank 128,
    remat, XLA flash backward) on the 1.3B config at the same resolution.

Denoise time is measured over a few steps after warmup and scaled to 50
(each step is identical work); encode/decode are measured directly.

vs_baseline: the reference publishes no A100 wall-clock for this config; we
compare against an A100-80G estimate for the same workload — total FLOPs at
50% sustained bf16 utilization (312 TFLOPS peak, flash-attn-2-class
efficiency) + the measured-equivalent VAE cost. vs_baseline > 1 means faster
than the A100 estimate. Prints ONE json line; every section failure is
recorded in `detail` instead of killing the run.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _retry_compile(fn, tries=3, wait_s=20, label=""):
    """First executions compile through the axon remote-compile helper, which
    500s transiently (BENCH_r03 note; recurred in BENCH_r04's save-attention
    section where the single retry wasn't enough). Retry with a pause so a
    busy helper subprocess gets a fresh chance; re-raise only after `tries`
    consecutive failures — at that point the failure is treated as real.

    ONLY compile-channel errors are retried: the step functions donate their
    trainable/opt_state buffers, so an execution-time failure (donation
    already consummated) must not be re-invoked on deleted arrays — a retry
    would mask the real error behind 'Array has been deleted'. A compile
    failure happens before any donation, so retrying it is safe."""
    retriable = ("remote_compile", "tpu_compile_helper", "compile")
    for i in range(tries):
        try:
            return fn()
        except Exception as ex:  # noqa: BLE001
            msg = f"{type(ex).__name__}: {str(ex)[:160]}"
            if i == tries - 1 or not any(s in str(ex) for s in retriable):
                raise
            _log(f"compile attempt {i + 1}/{tries} {label} failed: {msg}")
            time.sleep(wait_s)


def _wait_for_tpu(jax, jnp, tries=6, wait_s=45):
    """The chip is shared through the axon tunnel: a stale process holding
    HBM turns every allocation into RESOURCE_EXHAUSTED (this killed
    BENCH_r02). Probe with a small allocation and wait for the chip to
    free up instead of dying on the first try."""
    for i in range(tries):
        try:
            x = jnp.zeros((256, 256), jnp.bfloat16)
            jax.block_until_ready(x)
            del x
            return
        except Exception as ex:  # noqa: BLE001
            _log(f"TPU probe {i + 1}/{tries} failed: {type(ex).__name__}: {ex}")
            if i == tries - 1:
                raise
            time.sleep(wait_s)


def main(result_fd=None):
    import jax

    import svi_tpu

    svi_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from svi_tpu.models import wan_dit, wan_vae, clip_vision
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    assert jax.default_backend() == "tpu", f"bench must run on TPU, got {jax.default_backend()}"
    _wait_for_tpu(jax, jnp)

    H, W, NF, STEPS = 480, 832, 81, 50
    LT = (NF - 1) // 4 + 1
    errors = {}

    dit_cfg = wan_dit.WanDiTConfig(
        dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12, num_layers=30,
        has_image_input=True, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dit_params = wan_dit.init_params(k1, dit_cfg)
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    vae_cfg = wan_vae.WAN_VAE
    vae_params = wan_vae.init_params(k2, vae_cfg)
    clip_cfg = clip_vision.VIT_H_14
    clip_params = clip_vision.init_params(k3, clip_cfg)

    pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
    pipe.dit = (dit_params, dit_cfg)
    pipe.vae = (vae_params, vae_cfg)
    pipe.image_encoder = (clip_params, clip_cfg)
    pipe.vae_dtype = jnp.bfloat16  # mixed-precision VAE (PSNR-gated, test_wan_vae.py)

    rng = np.random.default_rng(0)
    from PIL import Image

    ref_img = Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    ctx_pos = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)
    ctx_neg = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)

    # --- conditioning encode (CLIP fp32 + VAE bf16-interior encode) ---
    t0 = time.perf_counter()
    image_emb = pipe.encode_images_adaptive([ref_img], ref_img, NF, H, W, ref_pad_num=-1)
    jax.block_until_ready(image_emb["y"])
    _ = np.asarray(image_emb["y"][0, 0, 0, 0, 0])  # force full sync (axon tunnel)
    t_encode_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    image_emb = pipe.encode_images_adaptive([ref_img], ref_img, NF, H, W, ref_pad_num=-1)
    _ = np.asarray(image_emb["y"][0, 0, 0, 0, 0])
    t_encode = time.perf_counter() - t0
    _log(f"encode {t_encode:.2f}s (compile {t_encode_compile:.1f}s)")

    pipe.scheduler.set_timesteps(STEPS, shift=5.0)
    sigmas = np.asarray(pipe.scheduler.sigmas, np.float32)
    timesteps = np.asarray(pipe.scheduler.timesteps, np.float32)
    ctx2 = jnp.concatenate([ctx_pos, ctx_neg], axis=0)

    # --- 1.3B exact-bf16 denoise (rounds-1/2 continuity metric) ---
    t_step = None
    try:
        latents = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
        step_fn = pipe._denoise_step_fn()

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
        _log(f"1.3B bf16 step {t_step:.3f}s")
    except Exception as ex:  # noqa: BLE001
        errors["wan_1_3B"] = f"{type(ex).__name__}: {ex}"[:200]
        latents = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)

    # --- W8A8 int8-linears production option (same 1.3B model) ---
    int8_detail = {}
    try:
        q8 = wan_dit.quantize_params_w8a8(dit_params)
        pipe8 = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
        pipe8.dit = (q8, dit_cfg)
        pipe8.scheduler.set_timesteps(STEPS, shift=5.0)
        step8 = pipe8._denoise_step_fn()
        lat8 = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)

        def one8(lat, i):
            return step8(
                q8, lat, jnp.asarray([timesteps[i]]), sigmas[i], sigmas[i + 1],
                ctx2, image_emb["clip_feature"], image_emb["y"], np.float32(5.0), None,
            )

        lat8 = one8(lat8, 0)
        _ = np.asarray(lat8[0, 0, 0, 0, 0])
        t0 = time.perf_counter()
        for i in range(1, 4):
            lat8 = one8(lat8, i)
        _ = np.asarray(lat8[0, 0, 0, 0, 0])
        t8 = (time.perf_counter() - t0) / 3
        del q8, step8, pipe8, lat8
        int8_detail = {"denoise_step_seconds": round(t8, 3)}
        _log(f"1.3B w8a8 step {t8:.3f}s")
    except Exception as ex:  # noqa: BLE001
        int8_detail = {"error": f"{type(ex).__name__}: {ex}"[:200]}

    # --- VAE decode ---
    t_decode = None
    try:
        t0 = time.perf_counter()
        frames = pipe.decode_video(latents, tiled=False)
        _ = np.asarray(frames[0, 0, 0, 0, 0])
        t_decode_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        frames = pipe.decode_video(latents, tiled=False)
        _ = np.asarray(frames[0, 0, 0, 0, 0])
        t_decode = time.perf_counter() - t0
        del frames
        _log(f"decode {t_decode:.2f}s")
    except Exception as ex:  # noqa: BLE001
        errors["vae_decode"] = f"{type(ex).__name__}: {ex}"[:200]
        t_decode_compile = 0.0

    # --- TeaCache-on 1.3B clip (VERDICT r3 #3: measure the implemented
    # capability). Full 50-step CFG denoise through the split
    # prelude/blocks/head path with the reference's default threshold for
    # fast generation (ref test_svi.py --tea_cache 0.3). Skip decisions
    # depend on the timestep-modulation trajectory, which is well-defined
    # even with random weights; the skip COUNT with trained weights may
    # differ, so both the count and the per-clip seconds are recorded.
    tea_detail = {}
    try:
        from svi_tpu.pipelines.svi_video import TeaCache

        lat_tc = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
        tc = TeaCache(STEPS, rel_l1_thresh=0.3, model_id="Wan2.1-T2V-1.3B")
        t0 = time.perf_counter()
        lat_tc = pipe._sample(
            lat_tc, ctx_pos, ctx_neg, image_emb, np.float32(5.0),
            tea_cache_posi={"tea_cache": tc}, tea_cache_nega={"tea_cache": None},
        )
        _ = np.asarray(lat_tc[0, 0, 0, 0, 0])
        t_tea_total = time.perf_counter() - t0
        # separate compile from steady state: re-run with a fresh cache
        tc2 = TeaCache(STEPS, rel_l1_thresh=0.3, model_id="Wan2.1-T2V-1.3B")
        lat_tc = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
        t0 = time.perf_counter()
        lat_tc = pipe._sample(
            lat_tc, ctx_pos, ctx_neg, image_emb, np.float32(5.0),
            tea_cache_posi={"tea_cache": tc2}, tea_cache_nega={"tea_cache": None},
        )
        _ = np.asarray(lat_tc[0, 0, 0, 0, 0])
        t_tea = time.perf_counter() - t0
        del lat_tc
        tea_detail = {
            "denoise_50step_seconds": round(t_tea, 2),
            "steps_skipped_of_50": tc2.skipped_steps,
            "rel_l1_thresh": 0.3,
            "compile_seconds": round(t_tea_total - t_tea, 1),
            "note": ("skip count is a random-weights artifact (the rescaled "
                     "rel-L1 trajectory depends on trained modulation); "
                     "skipped_step_cost_fraction is weight-independent"),
        }
        if t_step is not None and t_decode is not None:
            clip_tea = t_encode + t_tea + t_decode
            tea_detail["clip_seconds"] = round(clip_tea, 2)
            tea_detail["speedup_vs_teacache_off"] = round(
                (t_encode + STEPS * t_step + t_decode) / clip_tea, 3)
        n_skip, n_full = tc2.skipped_steps, STEPS - tc2.skipped_steps
        if t_step is not None and n_skip:
            # cost of a skipped step (prelude+head only) as a fraction of a
            # full CFG step — the quantity docs/PERFORMANCE.md claims is ~2%
            tea_detail["skipped_step_cost_fraction"] = round(
                max(t_tea - n_full * t_step, 0.0) / n_skip / t_step, 4)
        _log(f"teacache 50-step denoise {t_tea:.1f}s "
             f"({tea_detail['steps_skipped_of_50']} skipped)")
    except Exception as ex:  # noqa: BLE001
        tea_detail = {"error": f"{type(ex).__name__}: {ex}"[:200]}

    # CLIP and the VAE are done (encode/decode measured); free their f32
    # weights (~5GB) before the train step and the 14B section — the chip
    # holds 15.75GB and the LoRA train step alone needs ~10GB
    pipe.vae = pipe.image_encoder = None
    pipe._jit_cache.clear()
    del clip_params, vae_params, latents

    # --- one Error-Recycling LoRA train step (1.3B, rank 128, remat) ---
    train_detail = {}
    trainable = opt_state = step_train = tbatch = None
    try:
        from svi_tpu.schedulers import flow_match as fm
        from svi_tpu.training import TrainerConfig, lora as lora_mod
        from svi_tpu.training import trainer as trainer_mod

        tc = TrainerConfig(lora_rank=128, lora_alpha=128.0)
        schedule = fm.make_schedule(1000, shift=5.0, sigma_min=0.0,
                                    extra_one_step=True, training=True)
        trainable = {"lora": lora_mod.init_lora_params(jax.random.PRNGKey(1), dit_cfg, rank=128)}
        optimizer = trainer_mod.make_optimizer(tc)
        opt_state = optimizer.init(trainable)
        step_train = trainer_mod.make_train_step(
            dit_cfg, schedule, optimizer, lora_scale=1.0, use_remat=True, mesh=None
        )
        rng_t = np.random.default_rng(1)
        fhw = (LT, H // 8, W // 8)
        tbatch = {
            "latents": jnp.asarray(rng_t.standard_normal((1, 16, *fhw)), jnp.float32),
            "noise_w_error": jnp.asarray(rng_t.standard_normal((1, 16, *fhw)), jnp.float32),
            "latents_w_error": jnp.asarray(rng_t.standard_normal((1, 16, *fhw)), jnp.float32),
            "timestep": jnp.asarray([500.0], jnp.float32),
            "timestep_id": jnp.asarray([500], jnp.int32),
            "context": ctx_pos,
            "clip_feature": image_emb["clip_feature"][:1],
            "y": image_emb["y"][:1],
        }
        t0 = time.perf_counter()
        trainable, opt_state, m = _retry_compile(
            lambda: step_train(trainable, opt_state, dit_params, tbatch),
            label="train_step")
        _ = float(m["loss"])
        t_train_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        trainable, opt_state, m = step_train(trainable, opt_state, dit_params, tbatch)
        _ = float(m["loss"])
        train_detail = {
            "train_step_seconds_1_3B_lora128": round(time.perf_counter() - t0, 3),
            "train_step_compile_seconds": round(t_train_compile, 1),
        }
        _log(f"train step {train_detail['train_step_seconds_1_3B_lora128']}s")

        # save-attention remat variant (the production recipe at <=1.3B):
        # flash out/lse saved at forward time so the backward's block
        # recompute skips the O(S^2) kernel — ~3GB extra activations at
        # 480p/81f, identity-tested in test_training.py
        try:
            del step_train
            step_sa = trainer_mod.make_train_step(
                dit_cfg, schedule, optimizer, lora_scale=1.0, use_remat=True,
                mesh=None, save_attention=True,
            )
            trainable, opt_state, m = _retry_compile(
                lambda: step_sa(trainable, opt_state, dit_params, tbatch),
                label="train_step_save_attention")
            _ = float(m["loss"])
            t0 = time.perf_counter()
            trainable, opt_state, m = step_sa(trainable, opt_state, dit_params, tbatch)
            _ = float(m["loss"])
            train_detail["train_step_seconds_1_3B_lora128_save_attn"] = round(
                time.perf_counter() - t0, 3)
            step_train = None
            del step_sa
            _log(f"train step (save_attention) "
                 f"{train_detail['train_step_seconds_1_3B_lora128_save_attn']}s")
        except Exception as ex:  # noqa: BLE001
            step_train = None
            train_detail["train_step_save_attn_error"] = f"{type(ex).__name__}: {ex}"[:200]

        # --use_gradient_checkpointing_offload: block carries saved to
        # pinned_host instead of rematted (ref save_on_cpu,
        # wan_video_dit.py:547-561). Record the peak-HBM delta via AOT
        # memory_analysis (no execution needed for the memory evidence)
        # plus the executed step time (the flag trades HBM for PCIe DMA).
        try:
            abst = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
                (trainable, opt_state, dit_params, tbatch))

            def _peak_hbm(**kw):
                st = trainer_mod.make_train_step(
                    dit_cfg, schedule, optimizer, lora_scale=1.0,
                    use_remat=True, mesh=None, **kw)
                ma = st.lower(*abst).compile().memory_analysis()
                return st, ma.temp_size_in_bytes / 2**30

            _st_base, hbm_base = _peak_hbm()
            step_off, hbm_off = _peak_hbm(offload_carries=True)
            del _st_base
            train_detail["train_step_temp_hbm_gib_1_3B"] = round(hbm_base, 2)
            train_detail["train_step_temp_hbm_gib_1_3B_offload_carries"] = round(
                hbm_off, 2)
            trainable, opt_state, m = _retry_compile(
                lambda: step_off(trainable, opt_state, dit_params, tbatch),
                label="train_step_offload")
            _ = float(m["loss"])
            t0 = time.perf_counter()
            trainable, opt_state, m = step_off(trainable, opt_state, dit_params, tbatch)
            _ = float(m["loss"])
            train_detail["train_step_seconds_1_3B_lora128_offload_carries"] = round(
                time.perf_counter() - t0, 3)
            del step_off
            _log(f"train step (offload_carries) "
                 f"{train_detail['train_step_seconds_1_3B_lora128_offload_carries']}s, "
                 f"temp HBM {hbm_base:.2f} -> {hbm_off:.2f} GiB")
        except Exception as ex:  # noqa: BLE001
            train_detail["train_step_offload_error"] = f"{type(ex).__name__}: {ex}"[:200]
    except Exception as ex:  # train-step bench must not kill the headline metric
        train_detail = {"train_step_error": f"{type(ex).__name__}: {ex}"[:200]}
    finally:
        # free adapter/optimizer buffers before the 14B section even when the
        # train bench failed (a leaked compile must not eat the 14B's HBM)
        del trainable, opt_state, step_train, tbatch

    # --- 14B flagship, single chip, packed-int4 weights (HEADLINE) ---
    # free everything but the conditioning tensors: int4 14B weights are
    # 8.3GB of the 15.75GB usable HBM, so CLIP (f32), VAE, decoded frames
    # and the 1.3B DiT must go (the reference does the same via CPU offload,
    # vram_management/layers.py)
    pipe.dit = None
    pipe._jit_cache.clear()
    del dit_params

    def bench_14b(use_w4a8):
        cfg14 = wan_dit.WAN_14B_I2V
        params14 = wan_dit.init_params_int4(jax.random.PRNGKey(2), cfg14,
                                            w4a8=use_w4a8)
        jax.block_until_ready(jax.tree.leaves(params14)[0])
        pipe14 = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
        pipe14.dit = (params14, cfg14)
        pipe14.scheduler.set_timesteps(STEPS, shift=5.0)
        # primary timing: b=1 no-CFG forward x2 per step (the reference's
        # memory-constrained deployment behavior). Whether the b=2
        # batched-CFG step actually fits next to the 8.3GB int4 weights is
        # MEASURED below (cfg_b2_measured) rather than assumed; if it fits
        # and is faster, the headline uses it.
        step14 = pipe14._denoise_step_nocfg_fn()
        lat14 = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)

        def one_step14(lat, i):
            return step14(
                params14, lat, jnp.asarray([timesteps[i]]), sigmas[i], sigmas[i + 1],
                ctx_pos, image_emb["clip_feature"], image_emb["y"], None,
            )

        t0 = time.perf_counter()
        lat14 = one_step14(lat14, 0)
        _ = np.asarray(lat14[0, 0, 0, 0, 0])
        t14_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(1, 3):
            lat14 = one_step14(lat14, i)
        _ = np.asarray(lat14[0, 0, 0, 0, 0])
        t14_step = 2 * (time.perf_counter() - t0) / 2  # CFG = 2 forwards/step

        # VERDICT r3 #4: measure (don't assert) whether the b=2 batched-CFG
        # step fits next to the 8.3GB int4 weights. Records either the step
        # time (and flips the per-step accounting if faster) or the OOM.
        cfg_b2 = {}
        if use_w4a8:
            try:
                step14c = pipe14._denoise_step_fn()
                ctx2_14 = jnp.concatenate([ctx_pos, ctx_pos], axis=0)
                lat_b2 = jnp.asarray(
                    rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)

                def one_step14_b2(lat, i):
                    return step14c(
                        params14, lat, jnp.asarray([timesteps[i]]), sigmas[i],
                        sigmas[i + 1], ctx2_14, image_emb["clip_feature"],
                        image_emb["y"], np.float32(5.0), None,
                    )

                lat_b2 = one_step14_b2(lat_b2, 0)
                _ = np.asarray(lat_b2[0, 0, 0, 0, 0])
                t0 = time.perf_counter()
                lat_b2 = one_step14_b2(lat_b2, 1)
                _ = np.asarray(lat_b2[0, 0, 0, 0, 0])
                t_b2 = time.perf_counter() - t0
                cfg_b2 = {"step_seconds": round(t_b2, 3),
                          "note": "batched cond/uncond in one forward"}
                del lat_b2, step14c, ctx2_14
                _log(f"14B batched-CFG b=2 step {t_b2:.3f}s (fits)")
                if t_b2 < t14_step:
                    t14_step = t_b2
            except Exception as ex:  # noqa: BLE001
                cfg_b2 = {"error": f"{type(ex).__name__}: {ex}"[:300]}
                _log(f"14B batched-CFG b=2: {cfg_b2['error'][:120]}")

        # per-step roofline decomposition (docs/PERFORMANCE.md): time one
        # block and one attention via dispatch-free 1-vs-3 differencing on
        # the batched-CFG shape, then attribute the step to attention /
        # W4A8 linears+norms / glue (scripts/breakdown_14b.py standalone)
        if use_w4a8:
            try:
                from svi_tpu.ops.attention import flash_attention_flat
                from svi_tpu.ops.rope import rope_angles_for_grid

                grid14 = (LT, H // 16, W // 16)
                S_b = grid14[0] * grid14[1] * grid14[2]
                cosb, sinb = rope_angles_for_grid(grid14, cfg14.head_dim)
                b0 = jax.tree.map(lambda v: v[0], params14["blocks"])
                tok = jnp.asarray(
                    rng.standard_normal((2, S_b, cfg14.dim)), jnp.bfloat16)
                ctxtok = jnp.asarray(
                    rng.standard_normal((2, 769, cfg14.dim)), jnp.bfloat16)
                tmodb = jnp.asarray(
                    rng.standard_normal((2, 6, cfg14.dim)), jnp.bfloat16)

                def chain(f, n):
                    def run(x):
                        for _ in range(n):
                            x = f(x)
                        return x
                    return jax.jit(run)

                def timed_min(fn, x, reps=2):
                    _ = np.asarray(fn(x)[0, 0, 0])
                    ts = []
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        _ = np.asarray(fn(x)[0, 0, 0])
                        ts.append(time.perf_counter() - t0)
                    return min(ts)

                blk = lambda x: wan_dit.dit_block(  # noqa: E731
                    b0, cfg14, x, ctxtok, tmodb, cosb, sinb)
                attn = lambda x: flash_attention_flat(  # noqa: E731
                    x, x, x, cfg14.head_dim, cos=cosb, sin=sinb)
                tb = (timed_min(chain(blk, 3), tok) -
                      timed_min(chain(blk, 1), tok)) / 2
                ta = (timed_min(chain(attn, 3), tok) -
                      timed_min(chain(attn, 1), tok)) / 2
                L14 = cfg14.num_layers
                breakdown = {
                    "attention_seconds": round(ta * L14, 2),
                    "w4a8_linears_plus_norms_seconds": round((tb - ta) * L14, 2),
                    "prelude_head_glue_seconds": round(
                        t14_step - tb * L14, 2),
                    "attention_tf_s": round(
                        4 * 2 * S_b * S_b * cfg14.dim * L14 / (ta * L14) / 1e12, 1),
                }
                _log(f"14B breakdown: attn {ta * L14:.2f}s / "
                     f"linears {(tb - ta) * L14:.2f}s of {t14_step:.2f}s")
                del tok, ctxtok, tmodb, b0, blk, attn
                import gc

                gc.collect()  # free the chain executables + sliced block
            except Exception as ex:  # noqa: BLE001
                breakdown = {"error": f"{type(ex).__name__}: {ex}"[:200]}
        else:
            breakdown = None

        n14 = sum(
            (x.size * 2 if x.dtype == jnp.int8 else x.size)
            for x in jax.tree.leaves(params14) if x.ndim >= 2
        )
        S_tok = LT * (H // 16) * (W // 16)
        flops14 = 2 * n14 * S_tok + cfg14.num_layers * 4 * S_tok * S_tok * cfg14.dim
        enc = t_encode if t_encode is not None else 0.0
        dec = t_decode if t_decode is not None else 0.0
        clip14 = enc + STEPS * t14_step + dec
        a100_14 = (STEPS * 2 * flops14) / (312e12 * 0.5) + enc + dec
        used_b2 = "step_seconds" in cfg_b2 and cfg_b2["step_seconds"] == round(t14_step, 3)
        detail = {
            "step_seconds": round(t14_step, 3),
            "frames_per_sec_per_chip": round(NF / clip14, 4),
            "min_per_1min_video": round(clip14 * (60 * 24) / (NF - 1) / 60, 1),
            "vs_baseline": round(a100_14 / clip14, 3),
            # VERDICT r3 #10: the A100 comparison is an estimate; report the
            # sensitivity band across 40/50/60% sustained-bf16-util assumptions
            "vs_baseline_band_40_50_60pct_util": [
                round(((STEPS * 2 * flops14) / (312e12 * u) + enc + dec) / clip14, 3)
                for u in (0.4, 0.5, 0.6)
            ],
            "weights": ("packed int4 (8.3GB), group-128 scales"
                        + (", int8-MXU W4A8 execution" if use_w4a8
                           else ", bf16 dequant-per-use")),
            "cfg": ("batched cond/uncond b=2 forward" if used_b2
                    else "2 sequential b=1 forwards per step"),
            "compile_seconds": round(t14_compile, 1),
        }
        if cfg_b2:
            detail["cfg_b2_measured"] = cfg_b2
        if breakdown:
            detail["breakdown"] = breakdown

        # TeaCache at the flagship: the headline stays cache-off for
        # reference parity (the flagship config defaults use_teacache
        # False), so record what a SKIPPED step costs at 14B — prelude +
        # cached-residual add + head (the split path's skip branch,
        # svi_video.py _sample) — and the derived clip time at the 48/50
        # skip rate the 1.3B loop measures. The full 50-step tc loop does
        # not fit next to the 8.3GB weights on one chip (the b=2 blocks fn
        # plus two token-sized residual buffers: measured
        # RESOURCE_EXHAUSTED), so skip cost is measured, clip derived.
        if use_w4a8:
            try:
                import gc

                pipe14._jit_cache.clear()
                step14 = None
                gc.collect()
                grid14 = (LT, H // 16, W // 16)
                xin2 = jnp.concatenate([lat14, lat14], axis=0)
                ctx2_14 = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
                clip2 = jnp.concatenate([image_emb["clip_feature"]] * 2, axis=0)
                y2 = jnp.concatenate([image_emb["y"]] * 2, axis=0)

                @jax.jit
                def skip_step(p, x, t, c, cf, y_, residual):
                    tok, _, t_emb, _ = wan_dit.forward_prelude(
                        p, cfg14, x, t, c, clip_feature=cf, y=y_)[:4]
                    tok = tok + residual  # tc.update: cached residual add
                    out = wan_dit.forward_head(p, cfg14, tok, t_emb, grid14)
                    return out[1:] + 5.0 * (out[:1] - out[1:])

                S_b2 = grid14[0] * grid14[1] * grid14[2]
                resid = jnp.asarray(
                    rng.standard_normal((2, S_b2, cfg14.dim)), jnp.bfloat16)
                args_sk = (params14, xin2, jnp.asarray([timesteps[0]]),
                           ctx2_14, clip2, y2, resid)
                _ = np.asarray(skip_step(*args_sk)[0, 0, 0, 0, 0])
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = np.asarray(skip_step(*args_sk)[0, 0, 0, 0, 0])
                    ts.append(time.perf_counter() - t0)
                t_skip = min(ts)
                clip_tc = enc + 2 * t14_step + (STEPS - 2) * t_skip + dec
                detail["teacache_0.3"] = {
                    "skipped_step_seconds": round(t_skip, 3),
                    "skipped_step_cost_fraction": round(t_skip / t14_step, 4),
                    "derived_clip_seconds_48_of_50_skipped": round(clip_tc, 1),
                    "derived_speedup_vs_teacache_off": round(clip14 / clip_tc, 2),
                    "note": ("skip cost measured (prelude + residual add + "
                             "head, b=2); clip derived at the 48/50 skip "
                             "rate the 1.3B full loop measures"),
                }
                del xin2, ctx2_14, clip2, y2, resid, skip_step
                gc.collect()
                _log(f"14B teacache skipped-step {t_skip:.3f}s "
                     f"(derived clip {clip_tc:.0f}s)")
            except Exception as ex:  # noqa: BLE001
                detail["teacache_error"] = f"{type(ex).__name__}: {ex}"[:200]
        # free before the next variant (incl. deferred-by-GC executables)
        import gc

        pipe14._jit_cache.clear()
        del params14, step14, pipe14, lat14
        gc.collect()
        return detail

    fl14_w4a8, fl14_bf16 = {}, {}
    try:
        fl14_w4a8 = bench_14b(use_w4a8=True)
        _log(f"14B w4a8 step {fl14_w4a8['step_seconds']}s")
    except Exception as ex:  # noqa: BLE001
        fl14_w4a8 = {"error": f"{type(ex).__name__}: {ex}"[:200]}
    try:
        fl14_bf16 = bench_14b(use_w4a8=False)
        _log(f"14B bf16-dequant step {fl14_bf16['step_seconds']}s")
    except Exception as ex:  # noqa: BLE001
        fl14_bf16 = {"error": f"{type(ex).__name__}: {ex}"[:200]}

    # --- warm-start: time-to-first-step in a FRESH process with the
    # persistent compilation cache warm (VERDICT r3 #3). The child re-jits
    # the exact 1.3B denoise-step HLO this process just compiled; the
    # persistent cache (svi_tpu.enable_compilation_cache) turns the ~35s
    # cold compile into a cache load.
    warm_detail = {}
    try:
        import subprocess

        child_src = f"""
import json, time
t_start = time.perf_counter()
import numpy as np
import jax
import svi_tpu
svi_tpu.enable_compilation_cache()
import jax.numpy as jnp
from svi_tpu.models import wan_dit
from svi_tpu.pipelines.svi_video import SVIVideoPipeline
H, W, NF, LT = {H}, {W}, {NF}, {LT}
dit_cfg = wan_dit.WanDiTConfig(
    dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12, num_layers=30,
    has_image_input=True, dtype=jnp.bfloat16,
)
params = wan_dit.init_params(jax.random.PRNGKey(0), dit_cfg)
pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
pipe.dit = (params, dit_cfg)
pipe.scheduler.set_timesteps({STEPS}, shift=5.0)
step_fn = pipe._denoise_step_fn()
rng = np.random.default_rng(0)
lat = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
ctx2 = jnp.asarray(rng.standard_normal((2, 512, 4096)), jnp.bfloat16)
clip_f = jnp.zeros({list(image_emb["clip_feature"].shape)}, jnp.{image_emb["clip_feature"].dtype.name})
y = jnp.zeros({list(image_emb["y"].shape)}, jnp.{image_emb["y"].dtype.name})
t_ready = time.perf_counter()
lat = step_fn(params, lat, jnp.asarray([999.0], jnp.float32), np.float32(1.0),
              np.float32(0.98), ctx2, clip_f, y, np.float32(5.0), None)
_ = np.asarray(lat[0, 0, 0, 0, 0])
t_first = time.perf_counter()
print(json.dumps({{
    "seconds_to_first_step_from_process_start": round(t_first - t_start, 1),
    "import_and_init_seconds": round(t_ready - t_start, 1),
    "warm_compile_plus_exec_seconds": round(t_first - t_ready, 1),
}}))
"""
        proc = subprocess.run(
            [sys.executable, "-c", child_src], capture_output=True, text=True,
            timeout=600, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and last:
            warm_detail = json.loads(last[-1])
            warm_detail["note"] = (
                "fresh process, persistent compile cache warm; compare "
                "wan_1_3B.compile_seconds for the cold number")
            _log(f"warm-start first step "
                 f"{warm_detail['seconds_to_first_step_from_process_start']}s")
        else:
            warm_detail = {"error": (proc.stderr or "no output")[-300:]}
    except Exception as ex:  # noqa: BLE001
        warm_detail = {"error": f"{type(ex).__name__}: {ex}"[:200]}

    # --- opt-in probe: one 14B QLoRA train step (int4 base on the int8 MXU,
    # fp32 rank-64 adapters, sqrt-remat block groups). Measured r5: does NOT
    # fit one v5e at 480p/81f — compile-time OOM, 27.2G needed vs 15.75G
    # (11.6G weights+states+batch, 15.6G temp at 37% fragmentation), and the
    # carry-offload variant hits an XLA async-start/pinned-host bug at this
    # scale (docs/PERFORMANCE.md). 14B training is the multi-chip TP/TPxSP
    # regime, like the reference's (8-64 GPU ZeRO-2 only). Gated behind
    # SVI_BENCH_TRAIN14B=1 as a probe for future toolchains/chips; expect
    # train_step_14B_error on current hardware.
    if os.environ.get("SVI_BENCH_TRAIN14B"):
        try:
            from svi_tpu.schedulers import flow_match as fm
            from svi_tpu.training import TrainerConfig, lora as lora_mod
            from svi_tpu.training import trainer as trainer_mod

            # rank 64: rank 128 (the reference's multi-GPU training rank) puts
            # fp32 adapters+Adam moments at ~6.4GB next to the 8.3GB int4 base
            # and overflows the 15.75GB chip by 1.4GB (measured); rank-128
            # training is the data/sequence-parallel multi-chip regime
            cfg14 = wan_dit.WAN_14B_I2V
            params14 = wan_dit.init_params_int4(jax.random.PRNGKey(3), cfg14, w4a8=True)
            jax.block_until_ready(jax.tree.leaves(params14)[0])
            tc14 = TrainerConfig(lora_rank=64, lora_alpha=64.0)
            schedule14 = fm.make_schedule(1000, shift=5.0, sigma_min=0.0,
                                          extra_one_step=True, training=True)
            trainable14 = {"lora": lora_mod.init_lora_params(
                jax.random.PRNGKey(4), cfg14, rank=64)}
            optimizer14 = trainer_mod.make_optimizer(tc14)
            opt14 = optimizer14.init(trainable14)
            step14t = trainer_mod.make_train_step(
                cfg14, schedule14, optimizer14, lora_scale=1.0, use_remat=True,
                mesh=None, remat_granularity=0,
            )
            rng14 = np.random.default_rng(3)
            fhw = (LT, H // 8, W // 8)
            batch14 = {
                "latents": jnp.asarray(rng14.standard_normal((1, 16, *fhw)), jnp.float32),
                "noise_w_error": jnp.asarray(rng14.standard_normal((1, 16, *fhw)), jnp.float32),
                "latents_w_error": jnp.asarray(rng14.standard_normal((1, 16, *fhw)), jnp.float32),
                "timestep": jnp.asarray([500.0], jnp.float32),
                "timestep_id": jnp.asarray([500], jnp.int32),
                "context": ctx_pos,
                "clip_feature": image_emb["clip_feature"][:1],
                "y": image_emb["y"][:1],
            }
            t0 = time.perf_counter()
            trainable14, opt14, m14 = _retry_compile(
                lambda: step14t(trainable14, opt14, params14, batch14),
                label="train_step_14B")
            _ = float(m14["loss"])
            t14t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            trainable14, opt14, m14 = step14t(trainable14, opt14, params14, batch14)
            _ = float(m14["loss"])
            train_detail["train_step_seconds_14B_qlora64_int4"] = round(
                time.perf_counter() - t0, 3)
            train_detail["train_step_14B_compile_seconds"] = round(t14t_compile, 1)
            _log(f"14B qlora train step {train_detail['train_step_seconds_14B_qlora64_int4']}s")
        except Exception as ex:  # noqa: BLE001
            train_detail["train_step_14B_error"] = f"{type(ex).__name__}: {ex}"[:200]
        finally:
            # drop the ~8.3GB base + adapter/optimizer buffers even on failure
            trainable14 = opt14 = step14t = batch14 = params14 = None  # noqa: F841

    # --- assemble result: headline = 14B flagship (BASELINE.json metric) ---
    detail = {
        "cond_encode_seconds": None if t_encode is None else round(t_encode, 2),
        "vae_decode_seconds": None if t_decode is None else round(t_decode, 2),
        "baseline": "A100-80G estimate: same FLOPs at 50% bf16 util + measured VAE cost",
        "baseline_note": (
            "conservative: the reference's actual 14B-on-A100 config offloads "
            "weights past num_persistent_param_in_dit=6e9 to host RAM "
            "(ref test_svi.py:351, vram_management/layers.py), so its real "
            "wall-clock is below the zero-offload estimate used here; the only "
            "published reference wall-clock is Wan2.2-5B-SVI at ~10 min per "
            "1-min video on 1xH100 (ref docs/DevLog.md:4)"),
        "flagship_14b_bf16": fl14_bf16,
        "wan_1_3B_teacache_0.3": tea_detail,
        "warm_start": warm_detail,
        **train_detail,
    }
    if errors:
        detail["errors"] = errors

    if t_step is not None and t_decode is not None:
        clip_seconds = t_encode + STEPS * t_step + t_decode
        S = LT * (H // 16) * (W // 16)
        flops_fwd = 2 * n_params * S + dit_cfg.num_layers * 4 * S * S * dit_cfg.dim
        a100_clip_seconds = (STEPS * 2 * flops_fwd) / (312e12 * 0.5) + (t_encode + t_decode)
        detail["wan_1_3B"] = {
            "metric": "frames_per_sec_per_chip_svi_clip_1.3B_480p_81f_50steps_cfg",
            "frames_per_sec_per_chip": round(NF / clip_seconds, 4),
            "denoise_step_seconds": round(t_step, 3),
            "clip_seconds": round(clip_seconds, 2),
            "min_per_1min_video": round(clip_seconds * (60 * 24) / (NF - 1) / 60, 2),
            "vs_baseline": round(a100_clip_seconds / clip_seconds, 3),
            "vs_baseline_band_40_50_60pct_util": [
                round((((STEPS * 2 * flops_fwd) / (312e12 * u) + t_encode + t_decode)
                       / clip_seconds), 3)
                for u in (0.4, 0.5, 0.6)
            ],
            "compile_seconds": round(t_encode_compile + t_step_compile + t_decode_compile, 1),
        }
        if "denoise_step_seconds" in int8_detail:
            clip8 = t_encode + STEPS * int8_detail["denoise_step_seconds"] + t_decode
            int8_detail.update({
                "clip_seconds": round(clip8, 2),
                "frames_per_sec_per_chip": round(NF / clip8, 4),
                "vs_baseline": round(a100_clip_seconds / clip8, 3),
                "note": "opt-in quantize_params_w8a8 (int8 MXU linears); golden-tested",
            })
        detail["wan_1_3B_int8_linears"] = int8_detail

    best14 = None
    for cand in (fl14_w4a8, fl14_bf16):
        if "frames_per_sec_per_chip" in cand:
            if best14 is None or cand["frames_per_sec_per_chip"] > best14["frames_per_sec_per_chip"]:
                best14 = cand

    if best14 is not None:
        detail["flagship_14b"] = fl14_w4a8
        result = {
            "metric": "frames_per_sec_per_chip_svi_clip_14B_480p_81f_50steps_cfg",
            "value": best14["frames_per_sec_per_chip"],
            "unit": "frames/s/chip",
            "vs_baseline": best14["vs_baseline"],
            "detail": detail,
        }
    elif t_step is not None and t_decode is not None:
        # 14B failed entirely: fall back to the 1.3B continuity headline
        w13 = detail["wan_1_3B"]
        detail["flagship_14b"] = fl14_w4a8
        result = {
            "metric": w13["metric"],
            "value": w13["frames_per_sec_per_chip"],
            "unit": "frames/s/chip",
            "vs_baseline": w13["vs_baseline"],
            "detail": detail,
        }
    else:
        raise SystemExit(f"no metric measured: {errors}")

    line = json.dumps(result) + "\n"
    if result_fd is not None:
        os.write(result_fd, line.encode())
    else:
        print(line, end="")


if __name__ == "__main__":
    # The driver machine-parses stdout; anything else that writes fd 1
    # (TPU runtime banners, library prints) would corrupt it. Redirect fd 1
    # to stderr for the whole run and emit the result JSON as the SOLE
    # stdout line through a duplicate of the original fd.
    _real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    main(result_fd=_real_stdout)
