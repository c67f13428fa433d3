"""Preset model downloading (API parity with the reference downloader).

Behavioral reference: diffsynth/models/downloader.py (:9-111 —
`download_from_modelscope` / `download_from_huggingface` flatten the fetched
file into `local_dir` (move + remove the nested repo dirs),
`download_customized_models` and `download_models` walk a priority list of
websites and return the local paths to load) and configs/model_config.py
preset tables (:148-720 — model id -> [(repo_id, file_in_repo, local_dir)]).

This environment has no network egress and ships neither `modelscope` nor
`huggingface_hub`; both backends are import-gated. The local-cache hit path
(file already present in local_dir -> skip) is fully functional and is what
`ModelManager(downloading_priority=...)` relies on; real downloads work
wherever the optional deps + egress exist. Presets are a representative
subset of the reference table and can be extended at runtime with
`register_preset_models` (e.g. from a site-local JSON manifest).
"""

from __future__ import annotations

import os
import shutil
from typing import List

# model id -> [(repo_id, origin_file_path, local_dir)], matching the
# reference's preset_models_on_* tables (configs/model_config.py:148-720).
preset_models_on_huggingface = {
    "StableDiffusion_v15": [
        ("benjamin-paine/stable-diffusion-v1-5",
         "v1-5-pruned-emaonly.safetensors", "models/stable_diffusion"),
    ],
    "StableDiffusionXL_v1": [
        ("stabilityai/stable-diffusion-xl-base-1.0",
         "sd_xl_base_1.0.safetensors", "models/stable_diffusion_xl"),
    ],
    "stable-video-diffusion-img2vid-xt": [
        ("stabilityai/stable-video-diffusion-img2vid-xt",
         "svd_xt.safetensors", "models/stable_video_diffusion"),
    ],
    "HunyuanDiT": [
        ("Tencent-Hunyuan/HunyuanDiT",
         "t2i/clip_text_encoder/pytorch_model.bin",
         "models/HunyuanDiT/t2i/clip_text_encoder"),
        ("Tencent-Hunyuan/HunyuanDiT", "t2i/mt5/pytorch_model.bin",
         "models/HunyuanDiT/t2i/mt5"),
        ("Tencent-Hunyuan/HunyuanDiT", "t2i/model/pytorch_model_ema.pt",
         "models/HunyuanDiT/t2i/model"),
        ("Tencent-Hunyuan/HunyuanDiT",
         "t2i/sdxl-vae-fp16-fix/diffusion_pytorch_model.bin",
         "models/HunyuanDiT/t2i/sdxl-vae-fp16-fix"),
    ],
}

preset_models_on_modelscope = {
    "HunyuanDiT": [
        ("modelscope/HunyuanDiT", "t2i/clip_text_encoder/pytorch_model.bin",
         "models/HunyuanDiT/t2i/clip_text_encoder"),
        ("modelscope/HunyuanDiT", "t2i/mt5/pytorch_model.bin",
         "models/HunyuanDiT/t2i/mt5"),
        ("modelscope/HunyuanDiT", "t2i/model/pytorch_model_ema.pt",
         "models/HunyuanDiT/t2i/model"),
        ("modelscope/HunyuanDiT",
         "t2i/sdxl-vae-fp16-fix/diffusion_pytorch_model.bin",
         "models/HunyuanDiT/t2i/sdxl-vae-fp16-fix"),
    ],
    "stable-video-diffusion-img2vid-xt": [
        ("AI-ModelScope/stable-video-diffusion-img2vid-xt",
         "svd_xt.safetensors", "models/stable_video_diffusion"),
    ],
    "StableDiffusion_v15": [
        ("AI-ModelScope/stable-diffusion-v1-5",
         "v1-5-pruned-emaonly.safetensors", "models/stable_diffusion"),
    ],
    "StableDiffusionXL_v1": [
        ("AI-ModelScope/stable-diffusion-xl-base-1.0",
         "sd_xl_base_1.0.safetensors", "models/stable_diffusion_xl"),
    ],
    # Wan 2.1 I2V-14B-480P — the SVI base model (reference README.md "Model
    # Preparation"; not in the reference preset table, added for convenience)
    "Wan2.1-I2V-14B-480P": [
        ("Wan-AI/Wan2.1-I2V-14B-480P", f,
         "models/Wan-AI/Wan2.1-I2V-14B-480P")
        for f in (
            ["models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
             "models_t5_umt5-xxl-enc-bf16.pth", "Wan2.1_VAE.pth"]
            + [f"diffusion_pytorch_model-0000{i}-of-00007.safetensors"
               for i in range(1, 8)]
        )
    ],
}


def register_preset_models(model_id, file_data, website="ModelScope"):
    """Extend the preset table at runtime (or from a JSON manifest)."""
    table = (preset_models_on_modelscope if website == "ModelScope"
             else preset_models_on_huggingface)
    table[model_id] = list(file_data)


def _already_present(origin_file_path, local_dir):
    file_name = os.path.basename(origin_file_path)
    return (os.path.isdir(local_dir)
            and file_name in os.listdir(local_dir))


def _flatten_downloaded(origin_file_path, local_dir):
    """Ref downloader.py:17-21/:32-36: move the nested fetched file up into
    local_dir and drop the repo-structured directories."""
    downloaded = os.path.join(local_dir, origin_file_path)
    target = os.path.join(local_dir, os.path.basename(origin_file_path))
    if downloaded != target and os.path.exists(downloaded):
        shutil.move(downloaded, target)
        shutil.rmtree(os.path.join(local_dir, origin_file_path.split("/")[0]),
                      ignore_errors=True)


def download_from_modelscope(model_id, origin_file_path, local_dir):
    """Ref downloader.py:9-21. No-op when the file is already local."""
    os.makedirs(local_dir, exist_ok=True)
    if _already_present(origin_file_path, local_dir):
        print(f"    {os.path.basename(origin_file_path)} has been already "
              f"in {local_dir}.")
        return
    try:
        from modelscope import snapshot_download
    except ImportError as ex:
        raise RuntimeError(
            "modelscope is not installed (this environment has no network "
            f"egress); place {origin_file_path!r} under {local_dir!r} "
            "manually") from ex
    print(f"    Start downloading "
          f"{os.path.join(local_dir, os.path.basename(origin_file_path))}")
    snapshot_download(model_id, allow_file_pattern=origin_file_path,
                      local_dir=local_dir)
    _flatten_downloaded(origin_file_path, local_dir)


def download_from_huggingface(model_id, origin_file_path, local_dir):
    """Ref downloader.py:24-36."""
    os.makedirs(local_dir, exist_ok=True)
    if _already_present(origin_file_path, local_dir):
        print(f"    {os.path.basename(origin_file_path)} has been already "
              f"in {local_dir}.")
        return
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as ex:
        raise RuntimeError(
            "huggingface_hub is not installed (this environment has no "
            f"network egress); place {origin_file_path!r} under "
            f"{local_dir!r} manually") from ex
    print(f"    Start downloading "
          f"{os.path.join(local_dir, os.path.basename(origin_file_path))}")
    hf_hub_download(model_id, origin_file_path, local_dir=local_dir)
    _flatten_downloaded(origin_file_path, local_dir)


website_to_preset_models = {
    "HuggingFace": preset_models_on_huggingface,
    "ModelScope": preset_models_on_modelscope,
}
website_to_download_fn = {
    "HuggingFace": download_from_huggingface,
    "ModelScope": download_from_modelscope,
}


def download_customized_models(
    model_id, origin_file_path, local_dir,
    downloading_priority: List[str] = ("ModelScope", "HuggingFace"),
):
    """Ref downloader.py:53-70: try websites in order, return local paths."""
    downloaded_files = []
    for website in downloading_priority:
        file_to_download = os.path.join(
            local_dir, os.path.basename(origin_file_path))
        if file_to_download in downloaded_files:
            continue
        try:
            website_to_download_fn[website](model_id, origin_file_path,
                                            local_dir)
        except Exception:  # missing backend dep or network failure
            if not _already_present(origin_file_path, local_dir):
                continue
        if os.path.basename(origin_file_path) in os.listdir(local_dir):
            downloaded_files.append(file_to_download)
    return downloaded_files


def download_models(
    model_id_list: List[str] = (),
    downloading_priority: List[str] = ("ModelScope", "HuggingFace"),
):
    """Ref downloader.py:73-111: resolve each preset id via the website
    priority list; returns the local file paths to feed ModelManager."""
    print(f"Downloading models: {list(model_id_list)}")
    downloaded_files, load_files = [], []
    for model_id in model_id_list:
        for website in downloading_priority:
            if model_id not in website_to_preset_models[website]:
                continue
            model_metadata = website_to_preset_models[website][model_id]
            if isinstance(model_metadata, list):
                file_data = model_metadata
            else:
                file_data = model_metadata.get("file_list", [])
            model_files = []
            for repo_id, origin_file_path, local_dir in file_data:
                file_to_download = os.path.join(
                    local_dir, os.path.basename(origin_file_path))
                if file_to_download in downloaded_files:
                    continue
                try:
                    website_to_download_fn[website](repo_id, origin_file_path,
                                                    local_dir)
                except Exception:  # missing backend dep or network failure
                    if not _already_present(origin_file_path, local_dir):
                        continue
                if os.path.basename(origin_file_path) in os.listdir(local_dir):
                    downloaded_files.append(file_to_download)
                    model_files.append(file_to_download)
            if model_files:
                if isinstance(model_metadata, dict) \
                        and "load_path" in model_metadata:
                    model_files = model_metadata["load_path"]
                load_files.extend(model_files)
                break
    return load_files
