"""Repro/validate the save-attention train-step compile on the real chip.

BENCH_r04 recorded `train_step_save_attn_error: HTTP 500 tpu_compile_helper`
for this exact HLO (both single-shot attempts failed). This script compiles
and times the 1.3B rank-128 save-attention train step standalone, with the
same 3-try backoff bench.py now uses, to establish whether the failure is a
transient remote-compile flake or a real compiler break.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import svi_tpu
    from svi_tpu.models import wan_dit
    from svi_tpu.schedulers import flow_match as fm
    from svi_tpu.training import TrainerConfig, lora as lora_mod
    from svi_tpu.training import trainer as trainer_mod

    svi_tpu.enable_compilation_cache()
    assert jax.default_backend() == "tpu"

    H, W, NF = 480, 832, 81
    LT = (NF - 1) // 4 + 1
    cfg = wan_dit.WanDiTConfig(
        dim=1536, in_dim=36, ffn_dim=8960, out_dim=16, num_heads=12,
        num_layers=30, has_image_input=True, dtype=jnp.bfloat16,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(0), cfg)
    tc = TrainerConfig(lora_rank=128, lora_alpha=128.0)
    schedule = fm.make_schedule(1000, shift=5.0, sigma_min=0.0,
                                extra_one_step=True, training=True)
    trainable = {"lora": lora_mod.init_lora_params(jax.random.PRNGKey(1), cfg, rank=128)}
    optimizer = trainer_mod.make_optimizer(tc)
    opt_state = optimizer.init(trainable)
    step = trainer_mod.make_train_step(
        cfg, schedule, optimizer, lora_scale=1.0, use_remat=True, mesh=None,
        save_attention=True,
    )
    rng = np.random.default_rng(1)
    fhw = (LT, H // 8, W // 8)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
        "noise_w_error": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
        "latents_w_error": jnp.asarray(rng.standard_normal((1, 16, *fhw)), jnp.float32),
        "timestep": jnp.asarray([500.0], jnp.float32),
        "timestep_id": jnp.asarray([500], jnp.int32),
        "context": jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16),
        "clip_feature": jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.bfloat16),
        "y": jnp.asarray(rng.standard_normal((1, 20, *fhw)), jnp.bfloat16),
    }

    for attempt in range(3):
        t0 = time.perf_counter()
        try:
            trainable, opt_state, m = step(trainable, opt_state, params, batch)
            loss = float(m["loss"])
            print(f"compile+first step ok: {time.perf_counter() - t0:.1f}s "
                  f"loss {loss:.4f}", flush=True)
            break
        except Exception as ex:  # noqa: BLE001
            print(f"attempt {attempt + 1}/3 failed after "
                  f"{time.perf_counter() - t0:.1f}s: "
                  f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)
            # only compile-channel errors are retriable: the step donates
            # trainable/opt_state, so an execution failure must not be
            # re-invoked on deleted buffers (see bench._retry_compile)
            if attempt == 2 or "compile" not in str(ex):
                raise
            time.sleep(20)

    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        trainable, opt_state, m = step(trainable, opt_state, params, batch)
        _ = float(m["loss"])
        ts.append(time.perf_counter() - t0)
    print(f"steady save-attention train step: {min(ts):.3f}s", flush=True)


if __name__ == "__main__":
    main()
