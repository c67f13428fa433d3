"""Gradio web demo for SVI-TPU infinite video generation.

Behavioral reference: /root/reference/gradio_demo.py (SVIGradioDemo :24,
Film/Shot mode configs :33-53, per-clip streaming generation :183-373).

Gated on gradio (not in this image): `pip install gradio` where available.
The core generation logic (SVIGradioDemo.generate_video) is UI-free and
unit-testable; create_demo() builds the Blocks UI around it.
"""

import argparse
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MODEL_MODES = {
    # (ref gradio_demo.py:33-53)
    "film": {
        "name": "SVI-Film (1 text prompt stream)",
        "lora_path": "weights/Stable-Video-Infinity/version-1.0/svi-film.safetensors",
        "demo_image": "data/toy_test/film/frame.jpg",
        "demo_prompts": "data/toy_test/film/prompt.txt",
        "num_motion_frames": 5,
        "ref_pad_num": 0,
        "use_first_prompt_only": False,
    },
    "shot": {
        "name": "SVI-Shot (1 text prompt)",
        "lora_path": "weights/Stable-Video-Infinity/version-1.0/svi-shot.safetensors",
        "demo_image": "data/toy_test/shot/frame.jpg",
        "demo_prompts": "data/toy_test/shot/prompt.txt",
        "num_motion_frames": 1,
        "ref_pad_num": -1,
        "use_first_prompt_only": True,
    },
}

NEGATIVE = (
    "bright tones, overexposed, static, blurred details, subtitles, style, works, "
    "paintings, images, static, overall gray, worst quality, low quality"
)


class SVIGradioDemo:
    def __init__(self, dit_root, output_dir="videos/gradio", mode="film"):
        self.dit_root = dit_root
        self.output_dir = output_dir
        self.mode = mode
        self.pipe = None

    def initialize_models(self, mode=None):
        import glob

        import jax.numpy as jnp

        from svi_tpu.models.model_io import ModelManager
        from svi_tpu.pipelines.svi_video import SVIVideoPipeline

        if mode is not None:
            self.mode = mode
        cfg = MODEL_MODES[self.mode]
        mm = ModelManager(torch_dtype=jnp.bfloat16)
        shards = sorted(glob.glob(os.path.join(self.dit_root, "diffusion_pytorch_model*.safetensors")))
        paths = [shards if shards else self.dit_root]
        for name in ("models_t5_umt5-xxl-enc-bf16.pth", "Wan2.1_VAE.pth",
                     "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"):
            fp = os.path.join(self.dit_root, name)
            if os.path.exists(fp):
                paths.append(fp)
        mm.load_models(paths)
        if os.path.exists(cfg["lora_path"]):
            mm.load_lora_v2(cfg["lora_path"], lora_alpha=1.0)
        self.pipe = SVIVideoPipeline.from_model_manager(mm, torch_dtype=jnp.bfloat16, is_test=True)
        tok = os.path.join(self.dit_root, "google/umt5-xxl")
        if os.path.isdir(tok):
            self.pipe.prompter.fetch_tokenizer(tok)
        return f"initialized {cfg['name']}"

    @staticmethod
    def parse_prompts(prompts_text):
        """Prompt parsing with the reference's format fallbacks
        (ref :236-268): python-literal list -> multi-line -> comma-separated
        -> single prompt."""
        import ast

        text = (prompts_text or "").strip()
        if text.startswith("[") and text.endswith("]"):
            try:
                parsed = ast.literal_eval(text)
                if isinstance(parsed, list):
                    out = [str(p).strip() for p in parsed if str(p).strip()]
                    if out:
                        return out
            except (ValueError, SyntaxError):
                pass
        if "\n" in text:
            return [l.strip() for l in text.split("\n") if l.strip()]
        if "," in text:
            return [p.strip() for p in text.split(",") if p.strip()]
        return [text] if text else []

    def get_demo_content_for_mode(self, mode=None):
        """Demo image + prompt stream for a mode (ref :76-107), from the
        repo-owned toy assets."""
        cfg = MODEL_MODES[mode or self.mode]
        image = cfg["demo_image"] if os.path.exists(cfg["demo_image"]) else None
        prompts = ""
        if os.path.exists(cfg["demo_prompts"]):
            from svi_tpu.utils.prompt_files import load_prompts_from_file

            prompts = "\n".join(load_prompts_from_file(cfg["demo_prompts"]))
        return image, prompts

    def generate_video(self, input_image, prompts_text, negative_prompt=NEGATIVE,
                       num_clips=3, num_steps=50, cfg_scale_text=5.0, seed=42,
                       num_frames=81):
        """Per-clip streaming generation (ref :183-382): yields
        (status, cumulative_mp4_path) after every clip; each clip also gets
        its own preview mp4 and every cumulative stage its own file inside a
        timestamped session dir, plus generation_info.json provenance."""
        import json

        from PIL import Image

        from svi_tpu.utils.image_process import calculate_dimensions
        from svi_tpu.utils.video import save_video

        cfg = MODEL_MODES[self.mode]
        if isinstance(input_image, np.ndarray):
            input_image = Image.fromarray(input_image)
        prompts = self.parse_prompts(prompts_text) or ["a video"]

        height, width = calculate_dimensions(input_image, max_width=832)
        ref = input_image.convert("RGB").resize((width, height))
        ref_gt = np.array(ref)
        nmf = cfg["num_motion_frames"]
        motion = [ref] * nmf if nmf > 1 else ref

        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        session_dir = os.path.join(self.output_dir, f"session_{ts}")
        os.makedirs(session_dir, exist_ok=True)
        seed_times = 42 if seed is None else int(seed)

        video_list = []
        cumulative_path = None
        for clip_idx in range(int(num_clips)):
            prompt = (prompts[0] if cfg["use_first_prompt_only"]
                      else prompts[clip_idx % len(prompts)])
            video = self.pipe(
                prompt=prompt, negative_prompt=negative_prompt,
                input_image=motion, num_frames=num_frames,
                num_inference_steps=int(num_steps),
                cfg_scale=dict(text=float(cfg_scale_text)),
                seed=clip_idx * seed_times,  # ref :286 / test_svi.py:425-427
                tiled=False, random_ref_frame=ref_gt,
                height=height, width=width, ref_pad_num=cfg["ref_pad_num"],
            )
            # per-clip preview (ref :314-319)
            preview = os.path.join(session_dir, f"clip_{clip_idx + 1:03d}_preview.mp4")
            save_video(video, preview, fps=16, quality=8)
            motion = video[-nmf:]
            if clip_idx < num_clips - 1:
                video_list += video[:-nmf]
            else:
                video_list += video
            # cumulative stage file (ref :334-339)
            cumulative_path = os.path.join(
                session_dir, f"cumulative_clips_1_to_{clip_idx + 1}.mp4"
            )
            save_video(video_list, cumulative_path, fps=16, quality=8)
            yield (f"clip {clip_idx + 1}/{num_clips} done "
                   f"({len(video_list)} frames)"), cumulative_path

        with open(os.path.join(session_dir, "generation_info.json"), "w") as f:
            json.dump({
                "timestamp": ts, "mode": self.mode, "num_clips": int(num_clips),
                "prompts": prompts, "seed": seed, "num_steps": int(num_steps),
                "cfg_scale": float(cfg_scale_text),
                "num_motion_frames": nmf,
                "video_dimensions": f"{width}x{height}",
                "cumulative_videos": [
                    f"cumulative_clips_1_to_{i + 1}.mp4" for i in range(int(num_clips))
                ],
            }, f, indent=2)
        yield f"done — {len(video_list)} frames in {session_dir}", cumulative_path


def create_demo(demo: SVIGradioDemo):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the web demo needs gradio (`pip install gradio`); the generation "
            "core (SVIGradioDemo.generate_video) works without it"
        ) from e

    with gr.Blocks(title="SVI-TPU: Stable Video Infinity") as ui:
        gr.Markdown("# SVI-TPU — infinite-length video generation")
        with gr.Row():
            with gr.Column():
                mode = gr.Dropdown(list(MODEL_MODES), value=demo.mode, label="Mode")
                init_btn = gr.Button("Initialize models")
                init_status = gr.Textbox(label="Status", interactive=False)
                image = gr.Image(label="Reference image")
                prompts = gr.Textbox(label="Prompts (one per clip)", lines=6)
                negative = gr.Textbox(label="Negative prompt", value=NEGATIVE)
                num_clips = gr.Slider(1, 30, value=3, step=1, label="Clips")
                num_steps = gr.Slider(10, 50, value=50, step=5, label="Denoise steps")
                cfg_text = gr.Slider(1.0, 10.0, value=5.0, step=0.5, label="CFG (text)")
                seed = gr.Number(value=42, label="Seed")
                gen_btn = gr.Button("Generate", variant="primary")
            with gr.Column():
                status = gr.Textbox(label="Progress", interactive=False)
                video_out = gr.Video(label="Cumulative video (streams per clip)")

        init_btn.click(demo.initialize_models, inputs=[mode], outputs=[init_status])
        gen_btn.click(
            demo.generate_video,
            inputs=[image, prompts, negative, num_clips, num_steps, cfg_text, seed],
            outputs=[status, video_out],
        )
    return ui


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dit_root", type=str, default="weights/Wan2.1-I2V-14B-480P/")
    p.add_argument("--output", type=str, default="videos/gradio")
    p.add_argument("--mode", type=str, default="film", choices=list(MODEL_MODES))
    p.add_argument("--server_port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    args = p.parse_args()
    demo = SVIGradioDemo(args.dit_root, args.output, args.mode)
    ui = create_demo(demo)
    ui.launch(server_port=args.server_port, share=args.share)


if __name__ == "__main__":
    main()
