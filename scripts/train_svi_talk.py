"""SVI-Talk training driver (behavioral ref: /root/reference/train_svi_talk.py).

train_svi + per-sample audio_embedding.pkl windows (cut_audio_embedding
slicing aligned to the sampled frame window), audio dropout p<0.1
(ref :969-973), multitalk DiT (loads multitalk.safetensors alongside the base
shards, which enables the audio branches).
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from train_svi import build_parser, load_models_and_prompter, trainer_config_from_args


def parse_args():
    p = build_parser("SVI-TPU talk error-recycling training")
    p.add_argument("--multitalk_path", type=str, default=None,
                   help="multitalk.safetensors (audio branches) merged into the DiT")
    p.add_argument("--audio_drop_prob", type=float, default=0.1)
    return p.parse_args()


def main():
    args = parse_args()
    if args.multitalk_path:
        args.dit_path = args.dit_path + "," + args.multitalk_path
    import jax.numpy as jnp

    from svi_tpu.models import wan_vae
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline
    from svi_tpu.training import ErrorRecyclingTrainer
    from svi_tpu.training.dataset import TalkVideoDataset

    os.makedirs(args.output_path, exist_ok=True)
    with open(os.path.join(args.output_path, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2)

    mm, prompter = load_models_and_prompter(args)
    dit_params, dit_cfg = mm.fetch_model("wan_video_dit")
    vae_params, vae_cfg = mm.fetch_model("wan_video_vae")
    clip_entry = mm.fetch_model("wan_video_image_encoder")
    if not dit_cfg.enable_multitalk:
        print("WARNING: DiT loaded without multitalk audio branches "
              "(pass --multitalk_path); audio conditioning will be ignored")

    tc = trainer_config_from_args(args)
    tc.audio_drop_prob = args.audio_drop_prob
    from svi_tpu.parallel.mesh import make_training_mesh

    mesh = make_training_mesh(args.training_strategy)
    if mesh is not None:
        print(f"training mesh: {dict(mesh.shape)}")
    trainer = ErrorRecyclingTrainer(dit_params, dit_cfg, tc, mesh=mesh)
    if args.pretrained_lora_path:
        trainer.load_lora_safetensors(args.pretrained_lora_path)

    enc_pipe = SVIVideoPipeline(torch_dtype=jnp.bfloat16)
    enc_pipe.vae = (vae_params, vae_cfg)
    enc_pipe.image_encoder = clip_entry

    ds = TalkVideoDataset(
        args.dataset_path, max_num_frames=args.num_frames,
        frame_interval=args.frame_interval, height=args.height, width=args.width,
        seed=args.seed,
    )
    print(f"talk dataset: {len(ds)} samples")
    rng = random.Random(args.seed)
    import jax

    vae_encode = jax.jit(lambda p_, v: wan_vae.encode(p_, vae_cfg, v))
    batch_b = mesh.shape["data"] if mesh is not None else 1
    from svi_tpu.utils.logging import MetricsLogger

    metrics_log = MetricsLogger(os.path.join(args.output_path, "metrics.jsonl"))
    step = 0
    max_steps = args.max_steps if args.max_steps > 0 else args.max_epochs * max(len(ds), 1)
    t_start = time.time()
    pending = []
    for epoch in range(args.max_epochs):
        order = list(range(len(ds)))
        rng.shuffle(order)
        from svi_tpu.training.dataset import prefetch_samples

        for item in prefetch_samples(ds, order):
            ctx = np.asarray(prompter.encode_prompt(item["text"]), np.float32)
            latents = np.asarray(vae_encode(vae_params, jnp.asarray(item["video"][None])), np.float32)
            image_emb = enc_pipe.encode_images_adaptive(
                item["first_ref_frames"][:1], item["random_ref_frame"], args.num_frames,
                args.height, args.width, ref_pad_num=args.ref_pad_num,
            )
            pending.append((
                latents,
                ctx,
                np.asarray(image_emb["y"], np.float32),
                np.asarray(image_emb["clip_feature"], np.float32),
                np.asarray(item["audio_first"], np.float32),
                np.asarray(item["audio_vf"], np.float32),
            ))
            if len(pending) < batch_b:
                continue
            lat_b, ctx_b, y_b, clip_b, af_b, av_b = (
                np.concatenate(parts, axis=0) for parts in zip(*pending)
            )
            pending = []
            metrics = trainer.training_step(
                lat_b, ctx_b, y=y_b, clip_feature=clip_b,
                audio_tuple=(af_b, av_b) if dit_cfg.enable_multitalk else None,
            )
            step += 1
            metrics_log.log(step, **{k: v for k, v in metrics.items()
                                     if isinstance(v, (int, float, bool))})
            if step % 10 == 0 or step == 1:
                print(f"step {step}/{max_steps} loss {metrics['loss']:.4f} "
                      f"{(time.time() - t_start) / step:.1f}s/step")
            if step % args.save_every_n_steps == 0 or step >= max_steps:
                trainer.save_lora_safetensors(
                    os.path.join(args.output_path, f"epoch={epoch}-step={step}.safetensors")
                )
            if step >= max_steps:
                return


if __name__ == "__main__":
    main()
