"""Checkpoint ingestion & model management (the reference's L2 layer).

Behavioral reference: diffsynth/models/model_manager.py (ModelManager :368,
load_model_from_single_file :57-105, load_lora_v2 :490-560),
diffsynth/models/utils.py (load_state_dict, hash_state_dict_keys :179),
diffsynth/models/lora.py (GeneralLoRAFromPeft :200-267).

Responsibilities:
  * read safetensors / torch-pickle checkpoints (single file, shard list, or
    directory of shards) into numpy-backed state dicts;
  * identify which model a state dict belongs to — structural detection with
    the reference's md5-of-keys hash kept for provenance/parity;
  * convert to svi_tpu param pytrees via each model's converter;
  * fuse LoRA adapters into base weights at load (W += α·B@A — peft
    `lora_A/lora_B` naming), and capture side-channel extra modules
    (dwpose_embedding etc.) like the reference's `state_dict_new_module`.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import clip_vision, t5, wan_dit, wan_vae


# ---------------------------------------------------------------------------
# State-dict reading
# ---------------------------------------------------------------------------


def _torch_to_numpy(t, bf16_as: str = "float32"):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        if str(t.dtype) == "torch.bfloat16":
            if bf16_as == "bf16":
                # zero-copy reinterpret: halves host staging RAM for bf16
                # checkpoints (a real 14B shard set is ~33GB bf16 vs ~66GB
                # if upcast to f32) — used by the quantize-on-load DiT path
                import ml_dtypes
                import torch

                return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            t = t.float()
        elif str(t.dtype).startswith("torch.float8"):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def load_state_dict(path: str, bf16_as: str = "float32") -> dict:
    """Load one checkpoint file into {name: numpy array} (ref utils.py
    load_state_dict_from_safetensors / load_state_dict_from_bin).

    bf16_as="bf16" keeps torch-bf16 tensors as ml_dtypes.bfloat16 numpy
    views instead of upcasting to float32 — safe only for consumers that do
    no numpy arithmetic on the values (the wan_dit converter: transpose /
    reshape / jnp.asarray)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                try:
                    out[k] = f.get_tensor(k)
                except (TypeError, ValueError):
                    out[k] = None
        if any(v is None for v in out.values()):
            # bf16/fp8 tensors need the torch framework
            import torch  # noqa: F401
            with safe_open(path, framework="pt") as f:
                for k in list(out.keys()):
                    if out[k] is None:
                        out[k] = _torch_to_numpy(f.get_tensor(k), bf16_as)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if "model_state" in sd:
        sd = sd["model_state"]
    return {k: _torch_to_numpy(v, bf16_as) for k, v in sd.items() if hasattr(v, "shape")}


def load_state_dicts(paths, bf16_as: str = "float32") -> dict:
    """Merge one file, a shard list, or a directory of shards."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.endswith((".safetensors", ".bin", ".pth", ".ckpt"))
            )
        else:
            paths = [paths]
    out = {}
    for p in paths:
        out.update(load_state_dict(p, bf16_as))
    return out


# ---------------------------------------------------------------------------
# Identification
# ---------------------------------------------------------------------------


def _keys_to_str(state_dict, with_shape=True):
    keys = []
    for key, value in state_dict.items():
        if isinstance(key, str):
            if hasattr(value, "shape"):
                if with_shape:
                    shape = "_".join(map(str, list(value.shape)))
                    keys.append(key + ":" + shape)
                keys.append(key)
            elif isinstance(value, dict):
                keys.append(key + "|" + _keys_to_str(value, with_shape=with_shape))
    keys.sort()
    return ",".join(keys)


def hash_state_dict_keys(state_dict, with_shape=True) -> str:
    """Byte-identical to the reference's md5 key hash (utils.py:179-182)."""
    return hashlib.md5(_keys_to_str(state_dict, with_shape).encode("utf-8")).hexdigest()


def detect_model_kind(sd: dict) -> Optional[str]:
    """Structural detection (robust to fine-tunes, unlike pure hash lookup)."""
    keys = sd.keys()

    def has(k):
        return k in keys

    if has("blocks.0.self_attn.q.weight") or has("blocks.0.self_attn.norm_q.weight"):
        return "wan_video_dit"
    if has("blocks.0.attn.q.weight") and has("token_embedding.weight"):
        return "wan_video_text_encoder"
    if has("encoder.conv1.weight") or has("model.encoder.conv1.weight"):
        return "wan_video_vae"
    if any(k.startswith(("visual.", "model.visual.", "textual.")) for k in keys):
        return "wan_video_image_encoder"
    # SD-family files in diffsynth naming (what the zoo pipelines consume)
    if has("motion_modules.0.transformer_blocks.0.pe1"):
        return "sd_motion_modules"
    if has("controlnet_blocks.0.weight") and has("controlnet_conv_in.blocks.0.weight"):
        return "sd_controlnet"
    if has("time_embedding.0.weight") and has("conv_in.weight") \
            and has("blocks.2.transformer_blocks.0.attn1.to_q.weight"):
        return "sd_unet"
    if has("encoders.0.layer_norm1.weight") and has("token_embedding.weight") \
            and has("position_embeds"):
        return "sd_text_encoder"
    if has("quant_conv.weight"):
        return "sd_vae_encoder"
    if has("post_quant_conv.weight"):
        return "sd_vae_decoder"
    if any(".lora_A." in k or ".lora_B." in k for k in keys):
        return "lora"
    return None


# ---------------------------------------------------------------------------
# LoRA fusion (ref lora.py GeneralLoRAFromPeft)
# ---------------------------------------------------------------------------


def lora_name_map(lora_sd: dict) -> dict:
    """peft key pairs -> target torch param name (ref get_name_dict :206-218)."""
    out = {}
    for key in lora_sd:
        if ".lora_B." not in key:
            continue
        keys = key.split(".")
        if len(keys) > keys.index("lora_B") + 2:
            keys.pop(keys.index("lora_B") + 1)
        keys.pop(keys.index("lora_B"))
        if keys[0] == "diffusion_model":
            keys.pop(0)
        target = ".".join(keys)
        out[target] = (key, key.replace(".lora_B.", ".lora_A."))
    return out


def extract_side_modules(sd: dict) -> dict:
    """Capture extra-module weights carried inside LoRA files
    (ref model_manager.py:516-518: dwpose_embedding / randomref / inpaint /
    learn_in embeddings)."""
    markers = ("dwpose_embedding", "randomref_embedding_pose", "inpaint_embedding",
               "learn_in_embedding", "randomref")
    return {k: v for k, v in sd.items() if any(m in k for m in markers)}


def _pytree_path_for_torch_name(name: str):
    """torch param name (diffsynth naming) -> (path tuple, layer index or None)
    within our stacked wan_dit pytree."""
    parts = name.split(".")
    layer = None
    if parts[0] == "blocks":
        layer = int(parts[1])
        parts = ["blocks"] + parts[2:]
    if parts[-1] == "weight":
        parts[-1] = "w"
    elif parts[-1] == "bias":
        parts[-1] = "b"
    return tuple(parts), layer


def fuse_lora_into_dit_params(params: dict, lora_sd: dict, alpha: float = 1.0) -> tuple[dict, int]:
    """W += α·B@A fused into (possibly stacked) DiT params (ref lora.py
    :246-267). Our weights are stored transposed (in, out), so the delta is
    α·(B@A)^T = α·Aᵀ@Bᵀ. Returns (new_params, n_updated). Raises KeyError on
    any unmatched target (mirrors the reference's hard failure).

    Per-layer updates to one stacked leaf are GROUPED into a single
    scatter-add: a 14B LoRA touches q/k/v/o across 40 stacked layers, and
    one .at[layer].add per target would copy the full ~2GB stacked leaf 160
    times during a real-checkpoint load."""
    name_map = lora_name_map(lora_sd)
    n = 0
    grouped: dict[tuple, list] = {}  # path -> [(layer, delta)]
    for target, (up_key, down_key) in name_map.items():
        up = np.asarray(lora_sd[up_key], np.float32)    # B: (out, r)
        down = np.asarray(lora_sd[down_key], np.float32)  # A: (r, in)
        if up.ndim == 4:
            up, down = up[..., 0, 0], down[..., 0, 0]
        delta = alpha * (up @ down)  # (out, in)
        path, layer = _pytree_path_for_torch_name(target)
        if path[-1] == "w" and "patch_embedding" not in path:
            delta = delta.T  # our linears are (in, out)
        grouped.setdefault(path, []).append((layer, delta))
        n += 1
    for path, updates in grouped.items():
        node = params
        for p in path[:-1]:
            node = node[p]
        leaf = node[path[-1]]
        layers = [la for la, _ in updates]
        if layers[0] is not None and leaf.ndim == updates[0][1].ndim + 1:
            idx = jnp.asarray(layers, jnp.int32)
            ds = jnp.asarray(np.stack([d for _, d in updates]), leaf.dtype)
            node[path[-1]] = leaf.at[idx].add(ds)
        else:
            for _, d in updates:
                leaf = leaf + jnp.asarray(d, leaf.dtype)
            node[path[-1]] = leaf
    return params, n


# ---------------------------------------------------------------------------
# ModelManager (reference API surface, ref model_manager.py:368-709)
# ---------------------------------------------------------------------------


def _load_sd_unet(sd):
    from . import sd as sd_models

    return sd_models.sd_unet_params_from_torch(sd)


def _load_sd_text_encoder(sd):
    from . import sd as sd_models

    return sd_models.sd_text_encoder_params_from_torch(sd)


def _load_sd_vae_encoder(sd):
    from . import sd as sd_models

    return sd_models.sd_vae_encoder_params_from_torch(sd)


def _load_sd_vae_decoder(sd):
    from . import sd as sd_models

    return sd_models.sd_vae_decoder_params_from_torch(sd)


def _load_sd_motion(sd):
    from . import motion

    return motion.motion_params_from_torch(sd)


def _load_sd_controlnet(sd):
    from . import controlnets

    return controlnets.sd_controlnet_params_from_torch(sd)


# diffsynth-named SD-family checkpoints -> converter (civitai/diffusers key
# layouts are out of scope; the reference's per-class state_dict_converters
# normalize to this naming first)
_SD_FAMILY_LOADERS = {
    "sd_unet": _load_sd_unet,
    "sd_text_encoder": _load_sd_text_encoder,
    "sd_vae_encoder": _load_sd_vae_encoder,
    "sd_vae_decoder": _load_sd_vae_decoder,
    "sd_motion_modules": _load_sd_motion,
    "sd_controlnet": _load_sd_controlnet,
}


class ModelManager:
    """Loads checkpoints, identifies models, fuses LoRA; pipelines fetch
    converted param pytrees + configs from it by name."""

    def __init__(self, torch_dtype=jnp.bfloat16, device=None, model_id_list=None,
                 downloading_priority=None, file_path_list=None, train_architecture=None,
                 quantize_dit=None):
        self.dtype = torch_dtype
        self.device = device
        self.train_architecture = train_architecture
        # quantize_dit: one of wan_dit.QUANTIZE_MODES. The DiT is staged on
        # the host CPU at load time (a real 14B bf16 tree is ~28GB and must
        # never touch the 15.75GB chip), LoRA fusion happens on the host, and
        # the tree is quantized + shipped subtree-by-subtree at first
        # fetch_model("wan_video_dit") — the TPU analog of the reference's
        # fp8-storage + layer-offload deployment (test_svi.py:337,
        # vram_management/layers.py).
        if quantize_dit is not None and quantize_dit not in wan_dit.QUANTIZE_MODES:
            raise ValueError(
                f"quantize_dit={quantize_dit!r}; choose from {wan_dit.QUANTIZE_MODES}")
        self.quantize_dit = quantize_dit
        self._dit_quantized = False
        self.models: dict[str, tuple[Any, Any]] = {}  # name -> (params, cfg)
        self.model_paths: dict[str, Any] = {}
        self.state_dict_new_module: dict = {}
        self.state_dict_new: dict = {}
        self.lora_log: list = []
        # preset downloads (ref model_manager.py:389-396); resolves to local
        # cache paths when egress/deps are absent (models/downloader.py)
        downloaded = []
        if model_id_list:
            from .downloader import download_models

            downloaded = download_models(
                model_id_list, downloading_priority
                or ["ModelScope", "HuggingFace"])
        paths = downloaded + list(file_path_list or [])
        if paths:
            self.load_models(paths)

    # -- loading ------------------------------------------------------------

    def load_model(self, paths, model_names=None, torch_dtype=None):
        # when the DiT will be host-staged for quantize-on-load, keep bf16
        # shards as bf16 numpy (halves peak host RAM for a real 14B load);
        # the wan_dit converter only transposes/reshapes, never does numpy
        # math, so the narrow staging dtype is value-exact
        sd = load_state_dicts(
            paths, bf16_as="bf16" if self.quantize_dit else "float32")
        kind = detect_model_kind(sd)
        if self.quantize_dit and kind != "wan_video_dit":
            # only the wan_dit converter is audited for bf16-numpy staging;
            # other converters may do numpy arithmetic — give them f32
            import ml_dtypes

            sd = {k: (np.asarray(v, np.float32)
                      if getattr(v, "dtype", None) == ml_dtypes.bfloat16 else v)
                  for k, v in sd.items()}
        if kind is None:
            raise ValueError(
                f"Cannot identify model from {paths}; key hash "
                f"{hash_state_dict_keys(sd)} (keys like {list(sd)[:3]})"
            )
        dtype = torch_dtype or self.dtype
        if kind == "wan_video_dit":
            cfg = wan_dit.config_from_state_dict(sd)
            cfg = wan_dit.WanDiTConfig(**{**cfg.__dict__, "dtype": dtype})
            if self.quantize_dit:
                # stage on host; quantize + ship at first fetch (post-LoRA)
                cpu = jax.local_devices(backend="cpu")[0]
                with jax.default_device(cpu):
                    params = wan_dit.params_from_torch_state_dict(sd, cfg)
                self._dit_quantized = False
            else:
                params = wan_dit.params_from_torch_state_dict(sd, cfg)
        elif kind == "wan_video_text_encoder":
            cfg = t5.config_from_state_dict(sd, dtype=dtype)
            params = t5.params_from_torch_state_dict(sd, cfg)
        elif kind == "wan_video_vae":
            cfg = wan_vae.config_from_state_dict(sd)  # fp32 on purpose (FAQ.md:27)
            params = wan_vae.params_from_torch_state_dict(sd, cfg)
        elif kind == "wan_video_image_encoder":
            cfg = clip_vision.config_from_state_dict(sd)  # fp32 on purpose
            params = clip_vision.params_from_torch_state_dict(sd, cfg)
        elif kind in _SD_FAMILY_LOADERS:
            cfg = None
            params = _SD_FAMILY_LOADERS[kind](sd)
        else:
            raise ValueError(f"load_model cannot load a '{kind}' file; use load_lora_v2")
        self.models[kind] = (params, cfg)
        self.model_paths[kind] = paths
        return kind

    def load_models(self, path_list, model_names=None, torch_dtype=None):
        for paths in path_list:
            self.load_model(paths, torch_dtype=torch_dtype)

    def load_lora_v2(self, file_path="", state_dict=None, lora_alpha=1.0):
        """Fuse LoRA file(s) into the loaded DiT (ref :490-560)."""
        if isinstance(file_path, (list, tuple)):
            for p in file_path:
                self.load_lora_v2(p, lora_alpha=lora_alpha)
            return
        sd = state_dict if state_dict else load_state_dict(file_path)
        self.state_dict_new_module.update(extract_side_modules(sd))
        if "wan_video_dit" not in self.models:
            raise RuntimeError("load the DiT before LoRA")
        params, cfg = self.models["wan_video_dit"]
        if self.quantize_dit and not self._dit_quantized:
            # DiT is host-staged pre-quantization: fuse on the host CPU so
            # the ~28GB bf16 tree never touches the chip
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                params, n = fuse_lora_into_dit_params(params, sd, alpha=lora_alpha)
        else:
            params, n = fuse_lora_into_dit_params(params, sd, alpha=lora_alpha)
        if n == 0:
            raise RuntimeError(f"Cannot load LoRA from {file_path}: no matching tensors")
        self.models["wan_video_dit"] = (params, cfg)
        self.lora_log.append((file_path, n))

    # -- fetching -----------------------------------------------------------

    def fetch_model(self, model_name, require_model_path=False):
        if model_name not in self.models:
            return None
        if (model_name == "wan_video_dit" and self.quantize_dit
                and not self._dit_quantized):
            params, cfg = self.models[model_name]
            params = wan_dit.quantize_params_for_inference(
                params, self.quantize_dit, consume=True)
            self.models[model_name] = (params, cfg)
            self._dit_quantized = True
        entry = self.models[model_name]
        if require_model_path:
            return entry, self.model_paths.get(model_name)
        return entry
