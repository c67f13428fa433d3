"""SVI-Talk infinite-video inference driver.

Behavioral reference: /root/reference/test_svi_talk.py — per-clip audio slice
`audio_start_idx = 81*clip - num_motion_frames` (:277-280), talk keeps overlap
frames when stitching (:304-308), per-chunk mp4 save (audio muxing requires an
ffmpeg binary; skipped when absent).
"""

import argparse
import glob
import os
import shutil
import subprocess
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
    p = argparse.ArgumentParser(description="SVI-TPU talk inference")
    p.add_argument("--dit_root", type=str, default="weights/Wan2.1-I2V-14B-480P/")
    p.add_argument("--extra_module_root", type=str,
                   default="weights/Stable-Video-Infinity/version-1.0/svi-talk.safetensors")
    p.add_argument("--multitalk_path", type=str, default=None,
                   help="multitalk.safetensors with the audio branches (loaded into the DiT)")
    p.add_argument("--wav2vec_path", type=str, default="./weights/chinese-wav2vec2-base/")
    p.add_argument("--output", type=str, default="videos/svi_talk/")
    p.add_argument("--cfg_scale_audio", type=float, default=2.0)
    p.add_argument("--cfg_scale_text", type=float, default=2.0)
    p.add_argument("--train_architecture", type=str, default="lora")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "w8a8", "int4", "int4_w4a8"],
                   help="DiT weight quantization (int4_w4a8 fits+runs "
                        "the 14B flagship on one 16GB chip)")
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--ref_pad_cfg", action="store_true", default=False)
    p.add_argument("--tiled", action="store_true", default=False)
    p.add_argument("--ref_pad_num", type=int, default=-1)
    p.add_argument("--num_motion_frames", type=int, default=1)
    p.add_argument("--num_clips", type=int, default=10)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--ref_image_path", type=str, required=True)
    p.add_argument("--audio_path", type=str, required=True)
    p.add_argument("--prompt", type=str, default="the person is talking")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--max_width", type=int, default=832)
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
    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline
    from svi_tpu.utils.image_process import calculate_dimensions
    from svi_tpu.utils.video import save_video

    mm = ModelManager(torch_dtype=jnp.bfloat16,
                  train_architecture=args.train_architecture,
                  quantize_dit=None if args.quantize == "none" else args.quantize)
    shards = sorted(glob.glob(os.path.join(args.dit_root, "diffusion_pytorch_model*.safetensors")))
    dit_paths = shards if shards else args.dit_root
    if args.multitalk_path:
        # multitalk.safetensors extends the DiT with audio branches
        # (test_svi_talk.py:156-172 flips the config to enable_multitalk)
        dit_paths = (dit_paths if isinstance(dit_paths, list) else [dit_paths]) + [args.multitalk_path]
    paths = [dit_paths]
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

    wav2vec = args.wav2vec_path if os.path.isdir(args.wav2vec_path) else None
    pipe = SVITalkVideoPipeline.from_model_manager(
        mm, torch_dtype=jnp.bfloat16, is_test=True, wav2vec_path=wav2vec
    )
    tok_dir = os.path.join(args.dit_root, "google/umt5-xxl")
    if os.path.isdir(tok_dir):
        pipe.prompter.fetch_tokenizer(tok_dir)

    ref = Image.open(args.ref_image_path).convert("RGB")
    height, width = calculate_dimensions(args.ref_image_path, max_width=args.max_width)
    first = ref.resize((width, height))
    ref_gt = np.array(first)
    motion_frames = first

    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    os.makedirs(args.output, exist_ok=True)
    base = f"talk_cfga{args.cfg_scale_audio}_cfgt{args.cfg_scale_text}_step{args.num_steps}_{ts}"
    from svi_tpu.utils.video import AsyncVideoSaver

    video_list = []
    saver = AsyncVideoSaver()
    for chunk_idx in range(args.num_clips):
        audio_start_idx = chunk_idx * 81
        if audio_start_idx > 0:
            audio_start_idx -= args.num_motion_frames
        print(f"clip {chunk_idx + 1}/{args.num_clips} audio_start={audio_start_idx}")
        video = pipe(
            prompt=args.prompt,
            negative_prompt=NEGATIVE,
            input_image=motion_frames,
            num_frames=args.num_frames,
            num_inference_steps=args.num_steps,
            cfg_scale=dict(audio=args.cfg_scale_audio, text=args.cfg_scale_text),
            seed=args.seed, tiled=args.tiled,
            random_ref_frame=ref_gt,
            height=height, width=width,
            tea_cache_l1_thresh=0.3 if args.use_teacache else None,
            tea_cache_model_id="Wan2.1-I2V-14B-720P" if args.use_teacache else None,
            audio_path=args.audio_path,
            audio_start_idx=audio_start_idx,
            args=args,
        )
        motion_frames = video[-args.num_motion_frames:]
        video_list += video  # talk keeps overlap frames (ref :304-308)
        out = os.path.join(args.output, f"{base}_chunk_{chunk_idx + 1:02d}.mp4")
        frames_now = list(video_list)  # snapshot; the saver runs async

        def _save_and_mux(frames=frames_now, out=out):
            save_video(frames, out, fps=25, quality=8)
            if shutil.which("ffmpeg") and os.path.exists(args.audio_path):
                muxed = out.replace(".mp4", "_with_audio.mp4")
                subprocess.run(
                    ["ffmpeg", "-y", "-i", out, "-i", args.audio_path, "-c:v", "copy",
                     "-c:a", "aac", "-shortest", muxed],
                    check=False, capture_output=True,
                )

        saver.submit(_save_and_mux)
    saver.close()
    print(f"saved {len(video_list)} frames")


if __name__ == "__main__":
    main()
