"""14B real-checkpoint rehearsal (VERDICT r3 #9): prove the day-1 path for
real Wan2.1-I2V-14B weights without the weights.

Synthesizes 7 disk shards of random 14B-shaped bf16 safetensors in the
reference's torch key naming (ref Wan2.1_VAE-adjacent DiT shard layout,
test_svi.py:316-351 load flow), plus a rank-16 peft LoRA file, then runs the
production load path end to end:

    ModelManager(quantize_dit="int4_w4a8", file_path_list=[shards])
      -> hash/structure detect -> host-staged bf16 conversion
      -> load_lora_v2 (host fusion) -> fetch_model (int4 pack, subtree-wise
         ship to TPU) -> one 480x832/81f denoise step

and records peak host RSS (VmHWM) and device HBM against the ceilings a real
deployment must respect. Writes REHEARSAL_14B.json at the repo root.

Usage: python scripts/rehearse_14b_load.py [--workdir /root/rehearsal_14b]
       [--keep-shards]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DIM, FFN, LAYERS = 5120, 13824, 40
IN_DIM, TEXT_DIM, FREQ_DIM, OUT_DIM, CLIP_DIM = 36, 4096, 256, 16, 1280
N_SHARDS = 7


def _wan14b_key_shapes():
    """(key, shape) for every tensor of the reference WanModel 14B-I2V state
    dict (naming per wan_dit.params_from_torch_state_dict, which mirrors
    diffsynth/models/wan_video_dit.py)."""
    yield "patch_embedding.weight", (DIM, IN_DIM, 1, 2, 2)
    yield "patch_embedding.bias", (DIM,)
    yield "text_embedding.0.weight", (DIM, TEXT_DIM)
    yield "text_embedding.0.bias", (DIM,)
    yield "text_embedding.2.weight", (DIM, DIM)
    yield "text_embedding.2.bias", (DIM,)
    yield "time_embedding.0.weight", (DIM, FREQ_DIM)
    yield "time_embedding.0.bias", (DIM,)
    yield "time_embedding.2.weight", (DIM, DIM)
    yield "time_embedding.2.bias", (DIM,)
    yield "time_projection.1.weight", (DIM * 6, DIM)
    yield "time_projection.1.bias", (DIM * 6,)
    yield "head.head.weight", (OUT_DIM * 4, DIM)
    yield "head.head.bias", (OUT_DIM * 4,)
    yield "head.modulation", (1, 2, DIM)
    yield "img_emb.proj.0.weight", (CLIP_DIM,)
    yield "img_emb.proj.0.bias", (CLIP_DIM,)
    yield "img_emb.proj.1.weight", (CLIP_DIM, CLIP_DIM)
    yield "img_emb.proj.1.bias", (CLIP_DIM,)
    yield "img_emb.proj.3.weight", (DIM, CLIP_DIM)
    yield "img_emb.proj.3.bias", (DIM,)
    yield "img_emb.proj.4.weight", (DIM,)
    yield "img_emb.proj.4.bias", (DIM,)


def _block_key_shapes(i: int):
    b = f"blocks.{i}"
    for attn in ("self_attn", "cross_attn"):
        for proj in ("q", "k", "v", "o"):
            yield f"{b}.{attn}.{proj}.weight", (DIM, DIM)
            yield f"{b}.{attn}.{proj}.bias", (DIM,)
        yield f"{b}.{attn}.norm_q.weight", (DIM,)
        yield f"{b}.{attn}.norm_k.weight", (DIM,)
    yield f"{b}.cross_attn.k_img.weight", (DIM, DIM)
    yield f"{b}.cross_attn.k_img.bias", (DIM,)
    yield f"{b}.cross_attn.v_img.weight", (DIM, DIM)
    yield f"{b}.cross_attn.v_img.bias", (DIM,)
    yield f"{b}.cross_attn.norm_k_img.weight", (DIM,)
    yield f"{b}.norm3.weight", (DIM,)
    yield f"{b}.norm3.bias", (DIM,)
    yield f"{b}.ffn.0.weight", (FFN, DIM)
    yield f"{b}.ffn.0.bias", (FFN,)
    yield f"{b}.ffn.2.weight", (DIM, FFN)
    yield f"{b}.ffn.2.bias", (DIM,)
    yield f"{b}.modulation", (1, 6, DIM)


def synth_shards(workdir: str) -> list[str]:
    """Write the 7-shard bf16 safetensors set (~33GB). Values come from one
    shared random pool (the rehearsal exercises memory/layout, not numerics).
    """
    import torch
    from safetensors.torch import save_file

    os.makedirs(workdir, exist_ok=True)
    pool = np.random.default_rng(0).standard_normal(
        FFN * DIM + 7, dtype=np.float32) * 0.02
    paths = []
    # shard 0: all non-block tensors; shards 1..6: ~7 blocks each
    groups = [list(_wan14b_key_shapes())]
    per = (LAYERS + N_SHARDS - 2) // (N_SHARDS - 1)
    for s0 in range(0, LAYERS, per):
        g = []
        for i in range(s0, min(s0 + per, LAYERS)):
            g.extend(_block_key_shapes(i))
        groups.append(g)
    for si, group in enumerate(groups):
        path = os.path.join(
            workdir, f"diffusion_pytorch_model-{si + 1:05d}-of-{len(groups):05d}.safetensors")
        paths.append(path)
        if os.path.exists(path):
            continue
        tensors = {}
        for j, (key, shape) in enumerate(group):
            size = int(np.prod(shape))
            arr = pool[j % 7: j % 7 + size].reshape(shape)
            tensors[key] = torch.from_numpy(np.ascontiguousarray(arr)).to(torch.bfloat16)
        save_file(tensors, path)
        del tensors
        print(f"  wrote {os.path.basename(path)} "
              f"({os.path.getsize(path) / 1e9:.1f} GB)", flush=True)
    return paths


def synth_lora(workdir: str, rank: int = 16) -> str:
    """Rank-16 peft-style LoRA over every self_attn q/k/v/o (reference
    checkpoint naming, model_io.lora_name_map)."""
    import torch
    from safetensors.torch import save_file

    path = os.path.join(workdir, "svi_shot_lora_r16.safetensors")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(1)
    tensors = {}
    for i in range(LAYERS):
        for proj in ("q", "k", "v", "o"):
            base = f"diffusion_model.blocks.{i}.self_attn.{proj}"
            tensors[f"{base}.lora_A.weight"] = torch.from_numpy(
                rng.standard_normal((rank, DIM)).astype(np.float32) * 0.01)
            tensors[f"{base}.lora_B.weight"] = torch.from_numpy(
                rng.standard_normal((DIM, rank)).astype(np.float32) * 0.01)
    save_file(tensors, path)
    return path


def _host_peak_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6  # kB -> GB
    return -1.0


def _hbm_stats(dev) -> dict:
    try:
        ms = dev.memory_stats() or {}
        return {
            "bytes_in_use_gb": round(ms.get("bytes_in_use", 0) / 2**30, 2),
            "peak_bytes_in_use_gb": round(ms.get("peak_bytes_in_use", 0) / 2**30, 2),
        }
    except Exception as ex:  # noqa: BLE001
        return {"error": str(ex)[:100]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/rehearsal_14b")
    ap.add_argument("--keep-shards", action="store_true")
    ap.add_argument("--hbm-ceiling-gb", type=float, default=12.0,
                    help="assert peak HBM below this (int4 14B = 8.3GB + activations)")
    args = ap.parse_args()
    result = {"t_start": time.strftime("%Y-%m-%d %H:%M:%S")}

    print("synthesizing shards...", flush=True)
    t0 = time.perf_counter()
    shard_paths = synth_shards(args.workdir)
    lora_path = synth_lora(args.workdir)
    result["synth_seconds"] = round(time.perf_counter() - t0, 1)
    result["shards_gb"] = round(sum(os.path.getsize(p) for p in shard_paths) / 2**30, 1)

    import jax

    import svi_tpu

    svi_tpu.enable_compilation_cache()
    import jax.numpy as jnp

    from svi_tpu.models.model_io import ModelManager
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    assert jax.default_backend() == "tpu", "rehearsal must run on the TPU"
    dev = jax.devices()[0]

    print("loading + host-staging (bf16 numpy -> host jnp)...", flush=True)
    t0 = time.perf_counter()
    mm = ModelManager(torch_dtype=jnp.bfloat16, quantize_dit="int4_w4a8")
    mm.load_model(shard_paths)
    result["load_stage_seconds"] = round(time.perf_counter() - t0, 1)
    result["host_peak_gb_after_stage"] = round(_host_peak_gb(), 1)
    result["detected"] = list(mm.models)

    print("fusing LoRA on host...", flush=True)
    t0 = time.perf_counter()
    mm.load_lora_v2(lora_path, lora_alpha=1.0)
    result["lora_fuse_seconds"] = round(time.perf_counter() - t0, 1)
    result["lora_tensors_fused"] = mm.lora_log[-1][1]

    print("quantize int4 + ship subtree-wise...", flush=True)
    t0 = time.perf_counter()
    (params, cfg), _ = mm.fetch_model("wan_video_dit", require_model_path=True)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    result["quantize_ship_seconds"] = round(time.perf_counter() - t0, 1)
    result["hbm_after_ship"] = _hbm_stats(dev)
    packed_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)) / 2**30
    result["packed_params_gb"] = round(packed_gb, 2)

    print("one 480x832/81f denoise step...", flush=True)
    pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
    pipe.dit = (params, cfg)
    pipe.scheduler.set_timesteps(50, shift=5.0)
    step = pipe._denoise_step_nocfg_fn()
    rng = np.random.default_rng(0)
    H, W, LT = 480, 832, 21
    lat = jnp.asarray(rng.standard_normal((1, 16, LT, H // 8, W // 8)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((1, 512, 4096)), jnp.bfloat16)
    clip_f = jnp.asarray(rng.standard_normal((1, 257, CLIP_DIM)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((1, 20, LT, H // 8, W // 8)), jnp.bfloat16)
    t0 = time.perf_counter()
    lat = step(params, lat, jnp.asarray([999.0], jnp.float32), np.float32(1.0),
               np.float32(0.98), ctx, clip_f, y, None)
    _ = np.asarray(lat[0, 0, 0, 0, 0])
    result["first_step_seconds_incl_compile"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    lat = step(params, lat, jnp.asarray([998.0], jnp.float32), np.float32(0.98),
               np.float32(0.96), ctx, clip_f, y, None)
    _ = np.asarray(lat[0, 0, 0, 0, 0])
    result["step_seconds"] = round(time.perf_counter() - t0, 2)
    result["hbm_after_step"] = _hbm_stats(dev)
    result["host_peak_gb"] = round(_host_peak_gb(), 1)

    peak_hbm = result["hbm_after_step"].get("peak_bytes_in_use_gb")
    result["hbm_ceiling_gb"] = args.hbm_ceiling_gb
    result["ok"] = bool(peak_hbm is None or peak_hbm < args.hbm_ceiling_gb)

    out_path = os.path.join(os.path.dirname(__file__), "..", "REHEARSAL_14B.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    if not args.keep_shards:
        for p in shard_paths:
            os.remove(p)
        os.remove(lora_path)
    if not result["ok"]:
        raise SystemExit(f"peak HBM {peak_hbm} GB exceeded ceiling {args.hbm_ceiling_gb} GB")


if __name__ == "__main__":
    main()
