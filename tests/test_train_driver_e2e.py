"""End-to-end training driver test: tiny checkpoints + toy reference videos ->
scripts/train_svi.py -> LoRA safetensors checkpoint that the inference loader
can fuse."""

import os
import sys

import pytest

from test_driver_e2e import Z, synth_tokenizer, synth_weights


def test_train_driver_end_to_end(tmp_path, monkeypatch):
    toy = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train", "svi-film-shot")
    assert os.path.isdir(toy), "repo toy data missing — run scripts/make_toy_data.py"

    root = str(tmp_path / "weights")
    os.makedirs(root)
    synth_weights(root)
    synth_tokenizer(root)
    out = str(tmp_path / "exp")

    argv = [
        "train_svi.py",
        "--dataset_path", toy,
        "--dit_path", os.path.join(root, "diffusion_pytorch_model.safetensors"),
        "--vae_path", os.path.join(root, "Wan2.1_VAE.pth"),
        "--text_encoder_path", os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"),
        "--image_encoder_path",
        os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"),
        "--output_path", out,
        "--lora_rank", "4", "--lora_alpha", "4",
        "--use_error_recycling",
        "--buffer_warmup_iter", "1",
        "--num_grids", "10",
        "--error_buffer_k", "4",
        "--max_steps", "3",
        "--save_every_n_steps", "3",
        "--height", "48", "--width", "48", "--num_frames", "5",
        "--num_motion_frames", "1",
        "--ref_pad_num", "-1",
        "--noise_prob", "1.0", "--y_prob", "1.0", "--latent_prob", "1.0",
        "--clean_prob", "0.0",
        # 2x4 mesh on the virtual 8-CPU topology: the sharded train step
        # (batch over 'data', DiT forward sequence-parallel over 'sp')
        "--training_strategy", "dataxsp",
        # auto sqrt-remat grouping through the CLI
        "--remat_granularity", "0",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib

    driver = importlib.import_module("train_svi")
    driver.main()

    ckpts = [f for f in os.listdir(out) if f.endswith(".safetensors")]
    assert len(ckpts) == 1
    assert os.path.exists(os.path.join(out, "args.json"))

    # the produced checkpoint fuses into the tiny DiT via the inference loader
    import jax.numpy as jnp

    from svi_tpu.models import model_io

    mm = model_io.ModelManager(torch_dtype=jnp.float32)
    mm.load_models([os.path.join(root, "diffusion_pytorch_model.safetensors")])
    mm.load_lora_v2(os.path.join(out, ckpts[0]), lora_alpha=1.0)
    assert mm.lora_log[0][1] > 0


def test_train_talk_driver_end_to_end(tmp_path, monkeypatch):
    toy = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train", "svi-talk")
    assert os.path.isdir(toy), "repo toy data missing — run scripts/make_toy_data.py"

    import torch
    from reference_loader import load_ref_module
    from safetensors.torch import save_file

    root = str(tmp_path / "weights")
    os.makedirs(root)
    synth_weights(root)
    synth_tokenizer(root)

    # multitalk-enabled tiny DiT (audio branches included)
    ref_dit = load_ref_module("diffsynth.models.wan_video_dit")
    torch.manual_seed(0)
    dit = ref_dit.WanModel(
        has_image_input=True, enable_multitalk=True, dim=64, in_dim=3 * Z,
        ffn_dim=128, out_dim=Z, text_dim=64, freq_dim=32, eps=1e-6,
        patch_size=(1, 2, 2), num_heads=2, num_layers=2,
    )
    save_file(dit.state_dict(), os.path.join(root, "dit_multitalk.safetensors"))

    out = str(tmp_path / "exp")
    argv = [
        "train_svi_talk.py",
        "--dataset_path", toy,
        "--dit_path", os.path.join(root, "dit_multitalk.safetensors"),
        "--vae_path", os.path.join(root, "Wan2.1_VAE.pth"),
        "--text_encoder_path", os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"),
        "--image_encoder_path",
        os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"),
        "--output_path", out,
        "--lora_rank", "4", "--lora_alpha", "4",
        "--use_error_recycling", "--buffer_warmup_iter", "1",
        "--num_grids", "10", "--error_buffer_k", "4",
        "--max_steps", "2", "--save_every_n_steps", "2",
        "--height", "48", "--width", "48", "--num_frames", "9",
        "--ref_pad_num", "-1", "--audio_drop_prob", "0.0",
        "--training_strategy", "sp",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib

    driver = importlib.import_module("train_svi_talk")
    driver.main()
    assert any(f.endswith(".safetensors") for f in os.listdir(out))


def test_train_dance_driver_end_to_end(tmp_path, monkeypatch):
    import numpy as np

    root = str(tmp_path / "weights")
    os.makedirs(root)
    synth_weights(root)
    synth_tokenizer(root)

    # synthesize a dance sample dir: paired video.mp4 + dwpose.mp4
    from svi_tpu.utils.video import save_video

    data = str(tmp_path / "dance" / "00001")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(12)]
    poses = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(12)]
    save_video(frames, os.path.join(data, "video.mp4"), fps=8)
    save_video(poses, os.path.join(data, "dwpose.mp4"), fps=8)

    out = str(tmp_path / "exp")
    argv = [
        "train_svi_dance.py",
        "--dataset_path", str(tmp_path / "dance"),
        "--dit_path", os.path.join(root, "diffusion_pytorch_model.safetensors"),
        "--vae_path", os.path.join(root, "Wan2.1_VAE.pth"),
        "--text_encoder_path", os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"),
        "--image_encoder_path",
        os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"),
        "--output_path", out,
        "--lora_rank", "4", "--lora_alpha", "4",
        "--use_error_recycling", "--buffer_warmup_iter", "1",
        "--num_grids", "10", "--error_buffer_k", "4",
        "--max_steps", "2", "--save_every_n_steps", "2",
        "--height", "48", "--width", "48", "--num_frames", "5",
        "--ref_pad_num", "-1",
        "--pose_drop_prob1", "0.0", "--pose_drop_prob2", "0.0", "--cond_drop_prob", "0.0",
        "--training_strategy", "sp",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import importlib

    driver = importlib.import_module("train_svi_dance")
    driver.main()
    ckpts = [f for f in os.listdir(out) if f.endswith(".safetensors")]
    assert len(ckpts) == 1
    # checkpoint carries both lora and dwpose_embedding tensors
    from svi_tpu.models import model_io

    sd = model_io.load_state_dict(os.path.join(out, ckpts[0]))
    assert any("lora_A" in k for k in sd)
    assert any("dwpose_embedding" in k for k in sd)
