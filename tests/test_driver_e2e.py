"""End-to-end driver test: synthesize tiny checkpoints in the reference's
on-disk formats, then run scripts/test_svi.py main() — ModelManager loading,
LoRA fusion, tokenizer, prompt stream, 2-clip motion-frame recycling, mp4 out."""

import json
import os
import sys

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

Z = 4  # tiny latent channels -> DiT in_dim = 4 + 4 + 4 = 12


def synth_weights(root):
    """Write tiny DiT/T5/VAE/CLIP checkpoints with reference file naming."""
    from safetensors.torch import save_file

    ref_dit = load_ref_module("diffsynth.models.wan_video_dit")
    ref_t5 = load_ref_module("diffsynth.models.wan_video_text_encoder")
    ref_vae = load_ref_module("diffsynth.models.wan_video_vae")
    ref_img = load_ref_module("diffsynth.models.wan_video_image_encoder")

    torch.manual_seed(0)
    dit = ref_dit.WanModel(
        has_image_input=True, dim=64, in_dim=3 * Z, ffn_dim=128, out_dim=Z,
        text_dim=64, freq_dim=32, eps=1e-6, patch_size=(1, 2, 2), num_heads=2,
        num_layers=2,
    )
    save_file(dit.state_dict(), os.path.join(root, "diffusion_pytorch_model.safetensors"))

    t5 = ref_t5.WanTextEncoder(
        vocab=128, dim=64, dim_attn=64, dim_ffn=96, num_heads=4, num_layers=2,
        num_buckets=32, shared_pos=False, dropout=0.0,
    )
    torch.save(t5.state_dict(), os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"))

    vae = ref_vae.VideoVAE_(dim=16, z_dim=Z)
    torch.save(vae.state_dict(), os.path.join(root, "Wan2.1_VAE.pth"))

    # the reference WanModel hardcodes img_emb = MLP(1280, dim), so the tiny
    # CLIP must still emit 1280-dim tokens
    vit = ref_img.VisionTransformer(
        image_size=28, patch_size=14, dim=1280, mlp_ratio=1, out_dim=16,
        num_heads=16, num_layers=2, pool_type="token", pre_norm=True, activation="gelu",
    )
    clip_sd = {f"visual.{k}": v for k, v in vit.state_dict().items()}
    torch.save(
        clip_sd,
        os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"),
    )

    # LoRA over the tiny DiT (peft naming)
    rng = np.random.default_rng(0)
    lora = {}
    for i in range(2):
        for mod, (fi, fo) in {
            "self_attn.q": (64, 64), "self_attn.k": (64, 64),
            "ffn.0": (64, 128), "ffn.2": (128, 64),
        }.items():
            lora[f"blocks.{i}.{mod}.lora_A.default.weight"] = torch.tensor(
                rng.standard_normal((4, fi)).astype(np.float32) * 0.02
            )
            lora[f"blocks.{i}.{mod}.lora_B.default.weight"] = torch.tensor(
                rng.standard_normal((fo, 4)).astype(np.float32) * 0.02
            )
    lora_path = os.path.join(root, "svi-lora.safetensors")
    save_file(lora, lora_path)
    return lora_path


def synth_tokenizer(root):
    """Minimal HF fast tokenizer (word-level) standing in for google/umt5-xxl."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2}
    for i, word in enumerate(
        "a the cat dog is walking running in park sunny day camera moves".split()
    ):
        vocab[word] = 3 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok_dir = os.path.join(root, "google", "umt5-xxl")
    os.makedirs(tok_dir, exist_ok=True)
    tok.save(os.path.join(tok_dir, "tokenizer.json"))
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "pad_token": "<pad>", "unk_token": "<unk>", "eos_token": "</s>",
            "model_max_length": 512,
        }, f)
    return tok_dir


def test_driver_end_to_end(tmp_path, monkeypatch):
    from PIL import Image

    root = str(tmp_path / "weights")
    os.makedirs(root)
    lora_path = synth_weights(root)
    synth_tokenizer(root)

    data_dir = str(tmp_path / "toy")
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(
        os.path.join(data_dir, "frame.jpg")
    )
    with open(os.path.join(data_dir, "prompt.txt"), "w") as f:
        f.write('prompts = ["a cat walking in the park", "the dog is running"]\n')

    out_dir = str(tmp_path / "videos")
    argv = [
        "test_svi.py",
        "--dit_root", root,
        "--extra_module_root", lora_path,
        "--output", out_dir,
        "--ref_image_path", os.path.join(data_dir, "frame.jpg"),
        "--prompt_path", os.path.join(data_dir, "prompt.txt"),
        "--ref_pad_num", "-1",
        "--cfg_scale_text", "5.0",
        "--num_motion_frames", "1",
        "--num_clips", "2",
        "--num_steps", "2",
        "--num_frames", "5",
        "--max_width", "48",
        "--seed_times", "1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib

    driver = importlib.import_module("test_svi")
    driver.main()

    # one sample dir with an incrementally-updated mp4
    sample_dirs = os.listdir(out_dir)
    assert len(sample_dirs) == 1
    mp4s = [f for f in os.listdir(os.path.join(out_dir, sample_dirs[0])) if f.endswith(".mp4")]
    assert len(mp4s) == 1
    from svi_tpu.utils.video import load_video_frames

    frames = load_video_frames(os.path.join(out_dir, sample_dirs[0], mp4s[0]))
    # 2 clips x 5 frames, 1 motion-frame overlap trimmed from the first clip
    assert len(frames) == 5 - 1 + 5
    assert frames[0].shape == (48, 48, 3)


def test_gradio_generate_video_streaming(tmp_path):
    """The gradio demo's UI-free streaming core (ref gradio_demo.py:183-382):
    per-clip previews, per-stage cumulative mp4s, generation_info.json, and
    the 4-format prompt parsing."""
    import json
    import sys

    import numpy as np
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib

    gd = importlib.import_module("gradio_demo")

    # prompt parsing formats (ref :236-268)
    assert gd.SVIGradioDemo.parse_prompts('["a", "b"]') == ["a", "b"]
    assert gd.SVIGradioDemo.parse_prompts("a\nb") == ["a", "b"]
    assert gd.SVIGradioDemo.parse_prompts("a, b") == ["a", "b"]
    assert gd.SVIGradioDemo.parse_prompts("just one") == ["just one"]

    sys.path.insert(0, os.path.dirname(__file__))
    from tests_pipeline_helpers import tiny_pipeline_models

    import jax.numpy as jnp

    from svi_tpu.pipelines.svi_video import SVIVideoPipeline

    (dit, vae, clip) = tiny_pipeline_models(z=4)
    inner = SVIVideoPipeline(torch_dtype=jnp.float32)
    inner.dit, inner.vae, inner.image_encoder = dit, vae, clip

    class _Pipe:
        def __call__(self, prompt, negative_prompt, input_image, num_frames,
                     num_inference_steps, cfg_scale, seed, tiled,
                     random_ref_frame, height, width, ref_pad_num):
            rng = np.random.default_rng(0)
            ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
            return inner(
                input_image=input_image, random_ref_frame=random_ref_frame,
                seed=seed, height=height, width=width, num_frames=num_frames,
                cfg_scale=cfg_scale["text"], num_inference_steps=num_inference_steps,
                tiled=False, prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5,
                ref_pad_num=ref_pad_num,
            )

    demo = gd.SVIGradioDemo(dit_root="unused", output_dir=str(tmp_path), mode="shot")
    demo.pipe = _Pipe()
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    updates = list(demo.generate_video(img, "a scene, another scene", num_clips=2,
                                       num_steps=2, cfg_scale_text=5.0, seed=3,
                                       num_frames=5))
    assert len(updates) == 3  # 2 clips + final
    session = os.path.dirname(updates[-1][1])
    files = sorted(os.listdir(session))
    assert "clip_001_preview.mp4" in files and "clip_002_preview.mp4" in files
    assert "cumulative_clips_1_to_1.mp4" in files
    assert "cumulative_clips_1_to_2.mp4" in files
    info = json.load(open(os.path.join(session, "generation_info.json")))
    assert info["num_clips"] == 2 and info["prompts"] == ["a scene", "another scene"]
