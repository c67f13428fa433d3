"""SVI-Dance infinite-video inference driver.

Behavioral reference: /root/reference/test_svi_dance.py — pose video load/pad,
rolling 81-frame pose window advanced clip-to-clip keeping the motion-frame
poses (:281-288), cond_wo_pose CFG, per-chunk mp4 save.
"""

import argparse
import glob
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NEGATIVE = (
    "bright tones, overexposed, static, blurred details, subtitles, style, works, "
    "paintings, images, static, overall gray, worst quality, low quality, JPEG "
    "compression residue, ugly, incomplete, extra fingers, poorly drawn hands, "
    "poorly drawn faces, deformed, disfigured, misshapen limbs, fused fingers, "
    "still picture, messy background, three legs, many people in the background, "
    "walking backwards"
)


def parse_args():
    p = argparse.ArgumentParser(description="SVI-TPU dance inference")
    p.add_argument("--dit_root", type=str, default="weights/Wan2.1-I2V-14B-480P/")
    p.add_argument("--extra_module_root", type=str,
                   default="weights/Stable-Video-Infinity/version-1.0/svi-dance.safetensors")
    p.add_argument("--output", type=str, default="videos/svi_dance/")
    p.add_argument("--cfg_scale_audio", type=float, default=2.0)
    p.add_argument("--cfg_scale_text", type=float, default=2.0)
    p.add_argument("--train_architecture", type=str, default="lora")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "w8a8", "int4", "int4_w4a8"],
                   help="DiT weight quantization (int4_w4a8 fits+runs "
                        "the 14B flagship on one 16GB chip)")
    p.add_argument("--ref_pad_cfg", action="store_true", default=False)
    p.add_argument("--ref_pad_num", type=int, default=-1)
    p.add_argument("--num_motion_frames", type=int, default=5)
    p.add_argument("--num_clips", type=int, default=10)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--remove_pose", action="store_true", default=False)
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--pose_path", type=str, required=True)
    p.add_argument("--prompt", type=str, default="the person is dancing")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--tiled", action="store_true", default=False)
    p.add_argument("--sample_fps", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use_teacache", action="store_true", default=False)
    p.add_argument("--sequential_cfg", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import svi_tpu

    svi_tpu.enable_compilation_cache()
    from PIL import Image

    import jax.numpy as jnp

    from svi_tpu.models.model_io import ModelManager
    from svi_tpu.pipelines.svi_video_dance import SVIDanceVideoPipeline
    from svi_tpu.utils.image_process import calculate_dimensions, resize_and_pad_to_target
    from svi_tpu.utils.video import load_video_frames, save_video

    mm = ModelManager(torch_dtype=jnp.bfloat16,
                  train_architecture=args.train_architecture,
                  quantize_dit=None if args.quantize == "none" else args.quantize)
    shards = sorted(glob.glob(os.path.join(args.dit_root, "diffusion_pytorch_model*.safetensors")))
    paths = [shards if shards else args.dit_root]
    for name in ("models_t5_umt5-xxl-enc-bf16.pth", "Wan2.1_VAE.pth",
                 "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"):
        fp = os.path.join(args.dit_root, name)
        if os.path.exists(fp):
            paths.append(fp)
    mm.load_models(paths)
    extra = args.extra_module_root
    lora_files = [extra] if extra.endswith(".safetensors") else sorted(
        glob.glob(os.path.join(extra, "*.safetensors"))
    )
    mm.load_lora_v2(lora_files, lora_alpha=args.lora_alpha)

    pipe = SVIDanceVideoPipeline.from_model_manager(mm, torch_dtype=jnp.bfloat16, is_test=True)
    tok_dir = os.path.join(args.dit_root, "google/umt5-xxl")
    if os.path.isdir(tok_dir):
        pipe.prompter.fetch_tokenizer(tok_dir)

    ref = Image.open(args.image_path).convert("RGB")
    height, width = calculate_dimensions(args.image_path, max_width=640)
    max_frames = args.num_frames

    # pose video -> (3, N, H, W), aspect-preserving resize + pad (ref :215)
    pose_frames = load_video_frames(args.pose_path)
    pose = np.stack([f.transpose(2, 0, 1) for f in pose_frames]).astype(np.float32)
    pose = resize_and_pad_to_target(pose, (height, width), pad_value=0)
    pose = np.transpose(pose, (1, 0, 2, 3))  # (3, N, H, W)
    if pose.shape[1] < max_frames:
        reps = max_frames // pose.shape[1] + 1
        pose = np.concatenate([pose] * reps, axis=1)
    humanpose = pose[:, :max_frames]
    sampled_idx = max_frames - 1

    first_frame = ref.resize((width, height))
    ref_gt = np.array(first_frame)
    motion_frames = first_frame

    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(args.output, exist_ok=True)
    base = f"dance_cfgt{args.cfg_scale_text}_step{args.num_steps}_{ts}"
    from svi_tpu.utils.video import AsyncVideoSaver

    video_list = []
    saver = AsyncVideoSaver()
    for chunk_idx in range(args.num_clips):
        print(f"clip {chunk_idx + 1}/{args.num_clips}")
        video = pipe(
            prompt=args.prompt,
            negative_prompt=NEGATIVE,
            input_image=motion_frames,
            num_frames=args.num_frames,
            num_inference_steps=args.num_steps,
            cfg_scale=dict(audio=args.cfg_scale_audio, text=args.cfg_scale_text),
            seed=args.seed, tiled=args.tiled,
            humanpose_data=None if args.remove_pose else humanpose,
            random_ref_frame=ref_gt,
            height=height, width=width,
            tea_cache_l1_thresh=0.3 if args.use_teacache else None,
            tea_cache_model_id="Wan2.1-I2V-14B-720P" if args.use_teacache else None,
            cond_wo_pose=True,
            args=args,
        )
        motion_frames = video[-args.num_motion_frames:]
        if chunk_idx < args.num_clips - 1:
            video_list += video[: -args.num_motion_frames]
        else:
            video_list += video
        frames_now = list(video_list)  # snapshot; the saver runs async
        saver.submit(lambda f=frames_now: save_video(
            f, os.path.join(args.output, f"{base}.mp4"), fps=25, quality=5))

        # advance rolling pose window keeping motion-frame poses (ref :281-288)
        new_pose = np.zeros_like(humanpose)
        new_pose[:, : args.num_motion_frames] = humanpose[:, -args.num_motion_frames :]
        for i in range(args.num_motion_frames, max_frames):
            sampled_idx = sampled_idx % pose.shape[1]
            new_pose[:, i] = pose[:, sampled_idx]
            sampled_idx += 1
        humanpose = new_pose
    saver.close()
    print(f"saved {len(video_list)} frames")


if __name__ == "__main__":
    main()
