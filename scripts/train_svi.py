"""SVI Error-Recycling LoRA training driver (shot/film/tom).

Behavioral reference: /root/reference/train_svi.py — flag-for-flag for the
flags scripts/train/svi_shot.sh uses. The Lightning/DeepSpeed harness becomes:
frozen encoder pass (T5/VAE/CLIP) per step on device, one jitted train step
(bf16 remat forward + AdamW on fp32 LoRA adapters, optionally data/sequence
sharded over a mesh), host-side error buffers, LoRA-only safetensors
checkpoints every N steps (the analog of on_save_checkpoint :1294-1304 +
utils/extract_lora.py).
"""

import argparse
import glob
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_parser(description="SVI-TPU error-recycling LoRA training"):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lora_rank", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=128.0)
    p.add_argument("--lora_target_modules", type=str, default="q,k,v,o,ffn.0,ffn.2")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--dit_path", type=str, required=True, help="comma-separated shards or dir")
    p.add_argument("--vae_path", type=str, required=True)
    p.add_argument("--text_encoder_path", type=str, required=True)
    p.add_argument("--image_encoder_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--max_epochs", type=int, default=10)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--train_architecture", type=str, default="lora")
    p.add_argument("--use_gradient_checkpointing", action="store_true", default=True)
    p.add_argument("--use_gradient_checkpointing_offload", action="store_true", default=False)
    p.add_argument("--training_strategy", type=str, default="data_parallel",
                   help="mesh layout: data_parallel | sp | dataxsp (ZeRO analog: sharded batch)")
    p.add_argument("--shard_optimizer_state", action="store_true", default=False,
                   help="ZeRO-1 analog of the reference's deepspeed_stage_2 "
                        "(train_svi.py:156-161): shard optimizer moments over "
                        "the mesh's 'data' axis")
    p.add_argument("--remat_granularity", type=int, default=1,
                   help="blocks per checkpoint group: 1 = per-block remat, 0 = auto "
                        "sqrt(L) grouping (fits 14B LoRA activations on one chip), "
                        "n>1 explicit")
    p.add_argument("--save_attention", action="store_true", default=False,
                   help="save each block's flash-attention out/lse at forward "
                        "time so the backward's remat recompute skips the "
                        "O(S^2) kernel (~11%% faster train step at <=1.3B; "
                        "costs S*dim bf16 per block — too much for 14B on "
                        "one chip)")
    p.add_argument("--quantize", type=str, default="none",
                   help="DiT base-weight quantization for QLoRA-style training: "
                        "none | int8 | w8a8 | int4 | int4_w4a8 (int4_w4a8 fits the "
                        "14B base on one 16GB chip; adapters stay fp32)")
    p.add_argument("--output_path", type=str, default="./experiments/train/svi")
    p.add_argument("--use_error_recycling", action="store_true", default=False)
    p.add_argument("--error_buffer_k", type=int, default=500)
    p.add_argument("--y_error_num", type=int, default=1)
    p.add_argument("--num_motion_frames", type=int, default=1)
    p.add_argument("--p_motion_threshold", type=float, default=0.5)
    p.add_argument("--repeat_first_frame", action="store_true", default=False)
    p.add_argument("--buffer_warmup_iter", type=int, default=50)
    p.add_argument("--buffer_replacement_strategy", type=str, default="random")
    p.add_argument("--y_error_sample_from_all_grids", action="store_true", default=False)
    p.add_argument("--y_error_sample_range", type=str, default=None)
    p.add_argument("--use_last_y_error", action="store_true", default=False)
    p.add_argument("--num_grids", type=int, default=40)
    p.add_argument("--timestep_grid_size", type=int, default=25)
    p.add_argument("--error_modulate_factor", type=float, default=0.2)
    p.add_argument("--ref_pad_num", type=int, default=-1)
    p.add_argument("--ref_pad_cfg", action="store_true", default=False)
    p.add_argument("--noise_prob", type=float, default=0.99)
    p.add_argument("--y_prob", type=float, default=0.99)
    p.add_argument("--latent_prob", type=float, default=0.99)
    p.add_argument("--clean_prob", type=float, default=0.1)
    p.add_argument("--clean_buffer_update_prob", type=float, default=0.5)
    p.add_argument("--exp_prefix", type=str, default="svi")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--frame_interval", type=int, default=1)
    p.add_argument("--save_every_n_steps", type=int, default=100)
    p.add_argument("--pretrained_lora_path", type=str, default=None)
    p.add_argument("--use_first_aug", action="store_true", default=False)
    p.add_argument("--gradient_clip_val", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="dump a jax.profiler (xprof) trace of train step 3 here")
    return p


def parse_args():
    return build_parser().parse_args()


def trainer_config_from_args(args):
    from svi_tpu.training import TrainerConfig

    y_range = None
    if args.y_error_sample_range:
        a, b = (int(v) for v in args.y_error_sample_range.split(","))
        gs = args.timestep_grid_size
        y_range = (a // gs, b // gs)
    return TrainerConfig(
        train_architecture=args.train_architecture,
        learning_rate=args.learning_rate,
        gradient_clip_val=args.gradient_clip_val,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        lora_targets=tuple(args.lora_target_modules.split(",")),
        use_gradient_checkpointing=args.use_gradient_checkpointing,
        use_gradient_checkpointing_offload=getattr(
            args, "use_gradient_checkpointing_offload", False),
        use_error_recycling=args.use_error_recycling,
        error_buffer_k=args.error_buffer_k,
        buffer_replacement_strategy=args.buffer_replacement_strategy,
        buffer_warmup_iter=args.buffer_warmup_iter,
        num_grids=args.num_grids,
        error_modulate_factor=args.error_modulate_factor,
        noise_prob=args.noise_prob,
        y_prob=args.y_prob,
        latent_prob=args.latent_prob,
        clean_prob=args.clean_prob,
        clean_buffer_update_prob=args.clean_buffer_update_prob,
        y_error_num=args.y_error_num,
        use_last_y_error=args.use_last_y_error,
        y_error_sample_from_all_grids=args.y_error_sample_from_all_grids,
        y_error_sample_range=y_range,
        seed=args.seed,
        remat_granularity=args.remat_granularity,
        save_attention_activations=getattr(args, "save_attention", False),
        shard_optimizer_state=getattr(args, "shard_optimizer_state", False),
    )


def load_models_and_prompter(args):
    import jax.numpy as jnp

    from svi_tpu.models.model_io import ModelManager
    from svi_tpu.prompters.wan_prompter import WanPrompter

    quantize = getattr(args, "quantize", "none")
    mm = ModelManager(torch_dtype=jnp.bfloat16,
                      quantize_dit=None if quantize == "none" else quantize)
    dit_paths = args.dit_path.split(",") if "," in args.dit_path else args.dit_path
    load_list = [dit_paths, args.vae_path, args.text_encoder_path]
    if args.image_encoder_path:
        load_list.append(args.image_encoder_path)
    mm.load_models(load_list)
    t5_entry = mm.fetch_model("wan_video_text_encoder")
    prompter = WanPrompter(tokenizer_path=args.tokenizer_path)
    prompter.fetch_models(t5_entry)
    if args.tokenizer_path is None:
        cand = os.path.join(os.path.dirname(args.text_encoder_path), "google/umt5-xxl")
        if os.path.isdir(cand):
            prompter.fetch_tokenizer(cand)
    return mm, prompter


def main():
    args = parse_args()
    import svi_tpu

    svi_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from svi_tpu.models import clip_vision, t5 as t5_mod, wan_vae
    from svi_tpu.models.model_io import ModelManager
    from svi_tpu.pipelines import base as pipe_base
    from svi_tpu.prompters.wan_prompter import WanPrompter
    from svi_tpu.training import ErrorRecyclingTrainer, TrainerConfig
    from svi_tpu.training.dataset import TextVideoDataset, prefetch_samples

    os.makedirs(args.output_path, exist_ok=True)
    with open(os.path.join(args.output_path, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)  # provenance dump (ref project_utils.py:46-109)

    mm, prompter = load_models_and_prompter(args)
    dit_params, dit_cfg = mm.fetch_model("wan_video_dit")
    vae_params, vae_cfg = mm.fetch_model("wan_video_vae")
    clip_entry = mm.fetch_model("wan_video_image_encoder")

    # mesh per --training_strategy (the TPU analog of the reference's
    # deepspeed_stage flag, train_svi.py:156-161): batch shards over 'data',
    # the DiT forward runs sequence-parallel over 'sp'. None on one device.
    from svi_tpu.parallel.mesh import make_training_mesh

    mesh = make_training_mesh(args.training_strategy)
    if mesh is not None:
        print(f"training mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    tc = trainer_config_from_args(args)
    trainer = ErrorRecyclingTrainer(dit_params, dit_cfg, tc, mesh=mesh)
    if args.pretrained_lora_path:
        trainer.load_lora_safetensors(args.pretrained_lora_path)

    # ---- frozen encoder pipeline (analog of LightningModelForDataProcess) ----
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    enc_pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
    enc_pipe.vae = (vae_params, vae_cfg)
    enc_pipe.image_encoder = clip_entry

    ds = TextVideoDataset(
        args.dataset_path, max_num_frames=args.num_frames,
        frame_interval=args.frame_interval, height=args.height, width=args.width,
        seed=args.seed,
    )
    print(f"dataset: {len(ds)} videos")
    rng = random.Random(args.seed)

    # one jitted VAE encode reused every step (single (T,H,W) shape per run)
    vae_encode = jax.jit(lambda p, v: wan_vae.encode(p, vae_cfg, v))

    # micro-batch: one sample per 'data' shard (per-device batch 1, like the
    # reference's per-GPU batch size 1)
    batch_b = mesh.shape["data"] if mesh is not None else 1

    def encode_sample(item):
        # prompt -> T5 (frozen)
        ctx = np.asarray(prompter.encode_prompt(item["text"]), np.float32)
        # video -> latents (fp32 VAE, jitted)
        video = item["video"][None]  # (1, 3, T, H, W)
        latents = np.asarray(vae_encode(vae_params, jnp.asarray(video)), np.float32)

        # motion-frame curriculum (ref :1013-1031)
        first_ref_frames = item["first_ref_frames"]
        if args.num_motion_frames > 1:
            if rng.random() < args.p_motion_threshold:
                cond_frames = first_ref_frames[: args.num_motion_frames]
            elif args.repeat_first_frame:
                cond_frames = [first_ref_frames[0]] * args.num_motion_frames
            else:
                cond_frames = first_ref_frames[:1]
        else:
            cond_frames = first_ref_frames[:1]

        image_emb = enc_pipe.encode_images_adaptive(
            cond_frames, item["random_ref_frame"], args.num_frames,
            args.height, args.width, use_first_aug=args.use_first_aug,
            ref_pad_cfg=args.ref_pad_cfg, ref_pad_num=args.ref_pad_num,
        )
        y = np.asarray(image_emb["y"], np.float32)
        clip_feat = np.asarray(image_emb["clip_feature"], np.float32)
        return latents, ctx, y, clip_feat

    from svi_tpu.utils.logging import MetricsLogger, profile_trace

    metrics_log = MetricsLogger(os.path.join(args.output_path, "metrics.jsonl"))
    step = 0
    max_steps = args.max_steps if args.max_steps > 0 else args.max_epochs * len(ds)
    t_start = time.time()
    pending = []
    for epoch in range(args.max_epochs):
        order = list(range(len(ds)))
        rng.shuffle(order)
        for item in prefetch_samples(ds, order):
            pending.append(encode_sample(item))
            if len(pending) < batch_b:
                continue
            latents, ctx, y, clip_feat = (np.concatenate(parts, axis=0)
                                          for parts in zip(*pending))
            pending = []
            with profile_trace(args.profile_dir if step + 1 == 3 else None):
                metrics = trainer.training_step(latents, ctx, y=y, clip_feature=clip_feat)
            step += 1
            metrics_log.log(step, **{k: v for k, v in metrics.items()
                                     if isinstance(v, (int, float, bool))})
            if step % 10 == 0 or step == 1:
                el = time.time() - t_start
                print(f"step {step}/{max_steps} epoch {epoch} loss {metrics['loss']:.4f} "
                      f"grad {metrics['grad_norm']:.3f} buffers L{metrics.get('buffer_latent_total', 0)}/"
                      f"Y{metrics.get('buffer_y_total', 0)} {el/step:.1f}s/step")
            if step % args.save_every_n_steps == 0 or step >= max_steps:
                ckpt = os.path.join(args.output_path, f"epoch={epoch}-step={step}.safetensors")
                trainer.save_lora_safetensors(ckpt)
                print(f"saved {ckpt}")
            if step >= max_steps:
                return


if __name__ == "__main__":
    main()
