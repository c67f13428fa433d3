"""SVI infinite-video inference driver (shot/film/tom variants).

Behavioral reference: /root/reference/test_svi.py — flag-for-flag for the
flags the reference's scripts/test/*.sh use. Owns the OUTER infinite loop:
per-clip seeds, prompt-stream advance, motion-frame recycling, overlap-trimmed
stitching, incremental mp4 save (ref :424-483).

Usage (mirrors scripts/test/svi_shot.sh):
  python scripts/test_svi.py \
    --dit_root <Wan2.1-I2V-14B-480P dir> \
    --extra_module_root <svi-shot.safetensors> \
    --ref_pad_num -1 --cfg_scale_text 5.0 --num_motion_frames 1 \
    --ref_image_path data/toy_test/shot/frame.jpg \
    --prompt_path data/toy_test/shot/prompt.txt --use_first_prompt_only
"""

import argparse
import glob
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

COMMON_NEGATIVE_PROMPT = (
    "bright tones, overexposed, static, blurred details, subtitles, style, works, "
    "paintings, images, static, overall gray, worst quality, low quality, JPEG "
    "compression residue, ugly, incomplete, extra fingers, poorly drawn hands, "
    "poorly drawn faces, deformed, disfigured, misshapen limbs, fused fingers, "
    "still picture, messy background, three legs, many people in the background, "
    "walking backwards"
)


def parse_args():
    p = argparse.ArgumentParser(description="SVI-TPU infinite video inference")
    p.add_argument("--dit_root", type=str, default="weights/Wan2.1-I2V-14B-480P/")
    p.add_argument("--extra_module_root", type=str,
                   default="weights/Stable-Video-Infinity/version-1.0/svi-shot.safetensors")
    p.add_argument("--output", type=str, default="videos/")
    p.add_argument("--cfg_scale_text", type=float, default=5.0)
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--train_architecture", type=str, default="lora")
    p.add_argument("--ref_pad_cfg", action="store_true", default=False)
    p.add_argument("--num_motion_frames", type=int, default=1)
    p.add_argument("--num_clips", type=int, default=10)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--data_root", type=str, default="data_inference/wan_i2v/")
    p.add_argument("--ref_image_path", type=str, default=None)
    p.add_argument("--prompt_path", type=str, default=None)
    p.add_argument("--test_samples", type=str, nargs="*", default=None)
    p.add_argument("--max_prompts_per_sample", type=int, default=None)
    p.add_argument("--ref_pad_num", type=int, default=0)
    p.add_argument("--use_first_prompt_only", action="store_true", default=False)
    p.add_argument("--use_first_aug", action="store_true", default=False)
    p.add_argument("--max_width", type=int, default=832)
    p.add_argument("--seed_times", type=int, default=42)
    p.add_argument("--repeat_first_clip", action="store_true", default=False)
    p.add_argument("--tiled", action="store_true", default=False)
    p.add_argument("--tile_size", type=int, nargs=2, default=[30, 52])
    p.add_argument("--tile_stride", type=int, nargs=2, default=[15, 26])
    p.add_argument("--prompt_prefix", type=str, default="none")
    p.add_argument("--prompt_repeat_times", type=int, default=1)
    p.add_argument("--num_persistent_param_in_dit", type=int, default=6 * 10**9)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--use_teacache", action="store_true", default=False)
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "w8a8", "int4", "int4_w4a8"],
                   help="DiT weight quantization (int4_w4a8 fits+runs the 14B "
                        "flagship on one 16GB chip on the int8 MXU)")
    p.add_argument("--sequential_cfg", type=str, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import svi_tpu

    svi_tpu.enable_compilation_cache()
    from PIL import Image

    import jax.numpy as jnp

    from svi_tpu.models.model_io import ModelManager
    from svi_tpu.pipelines.svi_video import SVIVideoPipeline
    from svi_tpu.utils.image_process import calculate_dimensions, find_reference_image
    from svi_tpu.utils.prompt_files import load_prompts_from_file
    from svi_tpu.utils.video import save_video

    # ---- sample list (ref test_svi.py:239-314) ----
    if args.ref_image_path and args.prompt_path:
        prompts = load_prompts_from_file(args.prompt_path)
        samples = [{
            "prompt_name": os.path.splitext(os.path.basename(args.ref_image_path))[0],
            "prompts": prompts,
            "negative_prompt": COMMON_NEGATIVE_PROMPT,
            "direct_image_path": args.ref_image_path,
        }]
    else:
        samples = []
        for d in sorted(os.listdir(args.data_root)):
            dd = os.path.join(args.data_root, d)
            if not os.path.isdir(dd):
                continue
            if args.test_samples and d not in args.test_samples:
                continue
            samples.append({
                "prompt_name": d,
                "prompts": load_prompts_from_file(os.path.join(dd, "prompt.txt")),
                "negative_prompt": COMMON_NEGATIVE_PROMPT,
                "ref_image_root": dd,
            })

    # ---- models (ref :316-351) ----
    # train_architecture selects the customtalk DiT block variant at detection
    # time (ref test_svi.py:316, configs/model_config_talk.py:57-58)
    mm = ModelManager(torch_dtype=jnp.bfloat16,
                      train_architecture=args.train_architecture,
                      quantize_dit=None if args.quantize == "none" else args.quantize)
    dit_root = args.dit_root
    shards = sorted(glob.glob(os.path.join(dit_root, "diffusion_pytorch_model*.safetensors")))
    model_paths = [shards if shards else dit_root]
    for name in ("models_t5_umt5-xxl-enc-bf16.pth", "Wan2.1_VAE.pth",
                 "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"):
        pth = os.path.join(dit_root, name)
        if os.path.exists(pth):
            model_paths.append(pth)
    mm.load_models(model_paths)

    extra = args.extra_module_root
    lora_files = [extra] if extra.endswith(".safetensors") else sorted(
        glob.glob(os.path.join(extra, "*.safetensors"))
    )
    mm.load_lora_v2(lora_files, lora_alpha=args.lora_alpha)

    pipe = SVIVideoPipeline.from_model_manager(mm, torch_dtype=jnp.bfloat16, is_test=True)
    pipe.enable_vram_management(num_persistent_param_in_dit=args.num_persistent_param_in_dit)
    tok_dir = os.path.join(dit_root, "google/umt5-xxl")
    if os.path.isdir(tok_dir):
        pipe.prompter.fetch_tokenizer(tok_dir)

    for sample in samples:
        ref_path = sample.get("direct_image_path") or find_reference_image(sample["ref_image_root"])
        height, width = calculate_dimensions(ref_path, max_width=args.max_width)
        print(f"[{sample['prompt_name']}] {width}x{height}, {len(sample['prompts'])} prompts")

        ref = Image.open(ref_path).convert("RGB")
        ref_single = ref.resize((width, height))
        motion_frames = (
            [ref_single] * args.num_motion_frames if args.repeat_first_clip else ref_single
        )
        ref_gt = np.array(ref_single)

        prompts = sample["prompts"]
        if args.use_first_prompt_only:
            num_clips = args.num_clips
        else:
            num_clips = min(args.num_clips, len(prompts) * args.prompt_repeat_times)

        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        out_dir = os.path.join(args.output, f"{sample['prompt_name']}_{ts}")
        os.makedirs(out_dir, exist_ok=True)
        base_name = f"i2v_{sample['prompt_name']}_cfgt{args.cfg_scale_text}_step{args.num_steps}_{ts}"

        from svi_tpu.utils.video import AsyncVideoSaver

        video_list = []
        saver = AsyncVideoSaver()
        for chunk_idx in range(num_clips):
            seed = None if args.seed_times == -1 else int(chunk_idx * args.seed_times)
            if args.use_first_prompt_only:
                prompt = prompts[0]
            else:
                prompt = prompts[(chunk_idx // args.prompt_repeat_times) % len(prompts)]
            if args.prompt_prefix != "none":
                prompt = f"{args.prompt_prefix}, {prompt}"
            print(f"  clip {chunk_idx + 1}/{num_clips} seed={seed}: {prompt[:70]}")

            video = pipe(
                prompt=prompt,
                negative_prompt=sample["negative_prompt"],
                input_image=motion_frames,
                num_frames=args.num_frames,
                num_inference_steps=args.num_steps,
                cfg_scale=dict(text=args.cfg_scale_text),
                seed=seed,
                tiled=args.tiled,
                tile_size=tuple(args.tile_size),
                tile_stride=tuple(args.tile_stride),
                random_ref_frame=ref_gt,
                height=height,
                width=width,
                tea_cache_l1_thresh=0.3 if args.use_teacache else None,
                tea_cache_model_id="Wan2.1-I2V-14B-720P" if args.use_teacache else None,
                args=args,
            )
            # motion-frame recycling + overlap trim (ref :472-476)
            motion_frames = video[-args.num_motion_frames :]
            if chunk_idx < num_clips - 1:
                video_list += video[: -args.num_motion_frames]
            else:
                video_list += video
            frames_now = list(video_list)  # snapshot; the saver runs async
            saver.submit(lambda f=frames_now: save_video(
                f, os.path.join(out_dir, f"{base_name}.mp4"), fps=24, quality=8))
        saver.close()
        print(f"  saved {len(video_list)} frames to {out_dir}")


if __name__ == "__main__":
    main()
