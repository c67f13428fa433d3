"""Generic text-to-image LoRA fine-tuning (SD / SDXL-style UNets).

Behavioral reference: diffsynth/trainers/text_to_image.py
(LightningModelForT2ILoRA :10-115 — LoRA injection on
to_q/to_k/to_v/to_out, fp32 adapters, eps-MSE loss against
scheduler.training_target with timestep loss weights, LoRA-only
checkpoints) and diffsynth/data/simple_text_image.py (TextImageDataset
:8-41 — metadata.csv, max-scale resize, center/random crop, flip,
[-1,1] normalize).

TPU-first: the reference wraps torch modules with peft hooks inside a
Lightning loop; here the base UNet is a frozen pytree, adapters are a small
{site: (A, B)} pytree fused on the fly inside ONE jitted
loss-grad-update step (adamw via optax), and the data pipeline is
numpy/PIL host-side.
"""

from __future__ import annotations

import csv
import os

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_TARGET_MODULES = ("to_q", "to_k", "to_v", "to_out")


# ---------------------------------------------------------------------------
# dataset (ref data/simple_text_image.py)
# ---------------------------------------------------------------------------


class TextImageDataset:
    """metadata.csv-driven (file_name, text) pairs; `steps_per_epoch` virtual
    length with fixed-seed rotation (ref simple_text_image.py:26-28)."""

    def __init__(self, dataset_path, steps_per_epoch=10000, height=1024,
                 width=1024, center_crop=True, random_flip=False, seed=0):
        self.steps_per_epoch = steps_per_epoch
        with open(os.path.join(dataset_path, "train", "metadata.csv")) as f:
            rows = list(csv.DictReader(f))
        self.path = [os.path.join(dataset_path, "train", r["file_name"])
                     for r in rows]
        self.text = [r["text"] for r in rows]
        self.height, self.width = height, width
        self.center_crop = center_crop
        self.random_flip = random_flip
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.steps_per_epoch

    def __getitem__(self, index):
        from PIL import Image

        data_id = (int(self.rng.randint(0, len(self.path))) + index) \
            % len(self.path)
        image = Image.open(self.path[data_id]).convert("RGB")
        w, h = image.size
        scale = max(self.width / w, self.height / h)
        image = image.resize((round(w * scale), round(h * scale)),
                             Image.BILINEAR)
        w, h = image.size
        if self.center_crop:
            left = (w - self.width) // 2
            top = (h - self.height) // 2
        else:
            left = int(self.rng.randint(0, w - self.width + 1))
            top = int(self.rng.randint(0, h - self.height + 1))
        image = image.crop((left, top, left + self.width, top + self.height))
        if self.random_flip and self.rng.rand() < 0.5:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(image, np.float32).transpose(2, 0, 1) / 127.5 - 1.0
        return {"text": self.text[data_id], "image": arr}


# ---------------------------------------------------------------------------
# generic pytree LoRA
# ---------------------------------------------------------------------------


def find_lora_sites(params, target_modules=DEFAULT_TARGET_MODULES):
    """Dotted paths of every {module: {"w": 2-D}} leaf whose module name is
    in target_modules (the generic analog of peft target_modules matching)."""
    sites = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in target_modules and isinstance(v, dict) \
                        and "w" in v and getattr(v["w"], "ndim", 0) == 2:
                    sites.append(path + (k,))
                else:
                    walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params, ())
    return sites


def _get(params, path):
    node = params
    for p in path:
        node = node[p]
    return node


def init_lora(key, params, rank=4, target_modules=DEFAULT_TARGET_MODULES,
              init_lora_weights="kaiming"):
    """{dotted_path: {"A": (in, r), "B": (r, out)}} fp32 adapters.
    B starts at zero (identity at init); A gaussian(1/r) or kaiming-uniform
    (peft semantics, ref text_to_image.py:37-53)."""
    sites = find_lora_sites(params, target_modules)
    lora = {}
    for path in sites:
        w = _get(params, path)["w"]
        fan_in, fan_out = w.shape
        key, sub = jax.random.split(key)
        if init_lora_weights == "gaussian":
            a = jax.random.normal(sub, (fan_in, rank), jnp.float32) / rank
        else:  # kaiming-uniform over the (r, in) torch layout
            bound = float(np.sqrt(6.0 / fan_in))
            a = jax.random.uniform(sub, (fan_in, rank), jnp.float32,
                                   -bound, bound)
        lora[".".join(map(str, path))] = {
            "A": a, "B": jnp.zeros((rank, fan_out), jnp.float32)}
    return lora


def apply_lora(params, lora, scale=1.0):
    """Fused view: w' = w + scale * A @ B at every adapted site; returns a
    new pytree sharing every untouched leaf."""

    def clone(node, path):
        dotted = ".".join(map(str, path))
        if isinstance(node, dict):
            if dotted in lora and "w" in node:
                ab = lora[dotted]
                delta = (ab["A"] @ ab["B"]) * scale
                return {**node, "w": node["w"] + delta.astype(node["w"].dtype)}
            return {k: clone(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [clone(v, path + (i,)) for i, v in enumerate(node)]
        return node

    return clone(params, ())


def lora_state_dict(lora, alpha=None, rank=None):
    """peft-style export ({path}.lora_A.default.weight = Aᵀ etc.) so the
    adapters round-trip through the reference's loaders."""
    out = {}
    for dotted, ab in lora.items():
        out[f"{dotted}.lora_A.default.weight"] = \
            np.ascontiguousarray(np.asarray(ab["A"]).T)
        out[f"{dotted}.lora_B.default.weight"] = \
            np.ascontiguousarray(np.asarray(ab["B"]).T)
    return out


def lora_from_state_dict(sd):
    lora = {}
    for k, v in sd.items():
        if ".lora_A." in k:
            dotted = k.split(".lora_A.")[0]
            lora.setdefault(dotted, {})["A"] = jnp.asarray(
                np.asarray(v, np.float32).T)
        elif ".lora_B." in k:
            dotted = k.split(".lora_B.")[0]
            lora.setdefault(dotted, {})["B"] = jnp.asarray(
                np.asarray(v, np.float32).T)
    return lora


# ---------------------------------------------------------------------------
# trainer (ref LightningModelForT2ILoRA)
# ---------------------------------------------------------------------------


class T2ILoRATrainer:
    """LoRA-only AdamW fine-tuning of a frozen UNet pytree.

    `forward_fn(params, noisy_latents, timestep, prompt_emb) -> noise_pred`
    defaults to the SD UNet; pass an SDXL closure for SDXL. The scheduler
    must expose add_noise / training_target / training_weight
    (EnhancedDDIMScheduler, ref text_to_image.py:78-91)."""

    def __init__(self, unet_params, scheduler=None, forward_fn=None,
                 learning_rate=1e-4, lora_rank=4, lora_alpha=4.0,
                 lora_target_modules=DEFAULT_TARGET_MODULES,
                 init_lora_weights="kaiming", pretrained_lora_path=None,
                 seed=0):
        import optax

        from ..models import sd as sd_models
        from ..schedulers.ddim import EnhancedDDIMScheduler

        self.unet_params = unet_params
        self.scheduler = scheduler or EnhancedDDIMScheduler()
        # train over the full timestep range (ref text_to_image.py:79-80)
        self.scheduler.set_timesteps(self.scheduler.num_train_timesteps)
        self.forward_fn = forward_fn or sd_models.sd_unet_forward
        self.lora_alpha = lora_alpha
        self.lora_rank = lora_rank
        self.scale = lora_alpha / lora_rank
        if isinstance(lora_target_modules, str):
            lora_target_modules = tuple(lora_target_modules.split(","))
        key = jax.random.PRNGKey(seed)
        self.lora = init_lora(key, unet_params, lora_rank,
                              lora_target_modules, init_lora_weights)
        if pretrained_lora_path is not None:
            from ..models.model_io import load_state_dict

            loaded = lora_from_state_dict(load_state_dict(pretrained_lora_path))
            matched = {k: v for k, v in loaded.items() if k in self.lora}
            print(f"{2 * len(matched)} parameters are loaded from "
                  f"{pretrained_lora_path}. "
                  f"{2 * (len(loaded) - len(matched))} parameters are "
                  "unexpected.")
            self.lora.update(matched)
        self.optimizer = optax.adamw(learning_rate)
        self.opt_state = self.optimizer.init(self.lora)
        self.rng = np.random.RandomState(seed)
        self._step = None

    def _build_step(self):
        import optax

        optimizer, forward_fn = self.optimizer, self.forward_fn
        unet_params, scale = self.unet_params, self.scale

        @jax.jit
        def step(lora, opt_state, noisy, timestep, prompt_emb, target, weight):
            def loss_fn(lo):
                pred = forward_fn(apply_lora(unet_params, lo, scale),
                                  noisy, timestep, prompt_emb)
                return jnp.mean((pred.astype(jnp.float32) - target) ** 2) \
                    * weight

            loss, grads = jax.value_and_grad(loss_fn)(lora)
            updates, opt_state = optimizer.update(grads, opt_state, lora)
            lora = optax.apply_updates(lora, updates)
            return lora, opt_state, loss

        return step

    def training_step(self, batch_image=None, prompt_emb=None, latents=None,
                      vae_encode_fn=None):
        """One step (ref text_to_image.py:67-95). Either `latents` or
        (`batch_image` + `vae_encode_fn`) must be given; `prompt_emb` is the
        already-encoded text context."""
        if self._step is None:
            self._step = self._build_step()
        if latents is None:
            latents = vae_encode_fn(batch_image)
        latents = np.asarray(latents, np.float32)
        noise = self.rng.standard_normal(latents.shape).astype(np.float32)
        timestep_id = int(self.rng.randint(
            0, len(self.scheduler.timesteps)))
        timestep = float(np.asarray(self.scheduler.timesteps)[timestep_id])
        noisy = self.scheduler.add_noise(latents, noise, timestep)
        target = self.scheduler.training_target(latents, noise, timestep)
        weight = float(self.scheduler.training_weight(timestep))
        self.lora, self.opt_state, loss = self._step(
            self.lora, self.opt_state, jnp.asarray(noisy),
            jnp.asarray([timestep], jnp.float32), jnp.asarray(prompt_emb),
            jnp.asarray(np.asarray(target, np.float32)), weight)
        return float(loss)

    def save_lora(self, path):
        """LoRA-only checkpoint (ref on_save_checkpoint :104-115)."""
        from safetensors.numpy import save_file

        save_file(lora_state_dict(self.lora, alpha=self.lora_alpha), path)
