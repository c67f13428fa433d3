"""OmniGen image pipeline.

Behavioral reference: diffsynth/pipelines/omnigen_image.py
(OmnigenImagePipeline :124-318 — FlowMatchScheduler(num_train_timesteps=1,
shift=1, inverse_timesteps=True, sigma_min=0, sigma_max=1), SDXL VAE,
separate-CFG denoising over [cond, uncond, img_cond] branches, condition
KV cache: after step 0 only the time+noise suffix re-runs each step with
cropped position ids / mask rows).

TPU notes: one jitted forward per branch per phase (full at step 0, suffix
afterwards — two compiled shapes); the condition K/V stacks live on-device
between steps as scan constants."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import omnigen as og
from ..models import sdxl
from ..schedulers.flow_match import FlowMatchScheduler
from .base import check_resize_height_width, generate_noise, preprocess_image


class OmnigenImagePipeline:
    """Ref omnigen_image.py:124-318."""

    def __init__(self, transformer_params, vae_encoder_params=None,
                 vae_decoder_params=None, prompter=None, dtype=jnp.float32,
                 num_heads=32, num_kv_heads=None, rope_cfg=og.OMNIGEN_ROPE):
        self.scheduler = FlowMatchScheduler(
            num_train_timesteps=1, shift=1, inverse_timesteps=True,
            sigma_min=0, sigma_max=1)
        self.transformer_params = transformer_params
        self.vae_encoder_params = vae_encoder_params
        self.vae_decoder_params = vae_decoder_params
        self.prompter = prompter
        self.dtype = dtype
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads or num_heads
        self.rope_cfg = rope_cfg

    def vae_output_to_image(self, vae_output):
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(
            ((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, reference_images=[], cfg_scale=2.0,
                 image_cfg_scale=2.0, use_kv_cache=True, input_image=None,
                 denoising_strength=1.0, height=1024, width=1024,
                 num_inference_steps=20, seed=None, prompt_inputs=None,
                 tiled=False, tile_size=64, tile_stride=32,
                 progress_bar_cmd=lambda x: x):
        height, width = check_resize_height_width(height, width)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        vae_jit_kw = {"static_argnames": ("tiled", "tile_size", "tile_stride")}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = jax.jit(sdxl.sdxl_vae_encode, **vae_jit_kw)(
                self.vae_encoder_params, image, **tiler_kwargs)
            noise = jnp.asarray(generate_noise(
                (1, 4, height // 8, width // 8), seed), self.dtype)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]),
                self.dtype)
        else:
            latents = jnp.asarray(generate_noise(
                (1, 4, height // 8, width // 8), seed), self.dtype)

        if prompt_inputs is None:
            prompt_inputs = self.prompter(prompt, reference_images or None,
                                          height=height, width=width)
        n_branches = len(prompt_inputs["input_ids"])

        # VAE-encode reference images per branch (ref :245)
        encode = jax.jit(lambda im: sdxl.sdxl_vae_encode(
            self.vae_encoder_params, im, **tiler_kwargs))
        ref_latents = [[encode(jnp.asarray(px, self.dtype)) for px in pix]
                       for pix in prompt_inputs["input_pixel_values"]]

        forward = jax.jit(og.omnigen_forward, static_argnames=(
            "input_image_sizes", "num_heads", "num_kv_heads", "return_kv",
            "rope_cfg"))

        def freeze(sizes):
            return tuple(sorted((k, tuple(map(tuple, v)))
                                for k, v in sizes.items()))

        num_img_tokens = latents.shape[-1] * latents.shape[-2] // 4
        caches = [None] * n_branches
        branch_inputs = [
            dict(input_ids=jnp.asarray(prompt_inputs["input_ids"][i]),
                 attention_mask=jnp.asarray(
                     prompt_inputs["attention_mask"][i], jnp.float32),
                 position_ids=jnp.asarray(prompt_inputs["position_ids"][i]),
                 input_image_sizes=freeze(
                     prompt_inputs["input_image_sizes"][i]))
            for i in range(n_branches)]

        for progress_id, timestep in enumerate(
                progress_bar_cmd(np.asarray(self.scheduler.timesteps))):
            t = jnp.asarray([float(timestep)], self.dtype)
            outs = []
            for i in range(n_branches):
                bi = branch_inputs[i]
                out, kv = forward(
                    self.transformer_params, latents, t, bi["input_ids"],
                    tuple(ref_latents[i]), bi["input_image_sizes"],
                    bi["attention_mask"], bi["position_ids"],
                    num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
                    rope_cfg=self.rope_cfg, kv_cache=caches[i],
                    return_kv=use_kv_cache and caches[i] is None)
                if use_kv_cache and caches[i] is None:
                    caches[i] = kv
                outs.append(out)

            if n_branches == 3:
                cond, uncond, img_cond = outs
                noise_pred = uncond + image_cfg_scale * (img_cond - uncond) \
                    + cfg_scale * (cond - img_cond)
            else:
                cond, uncond = outs
                noise_pred = uncond + cfg_scale * (cond - uncond)

            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32),
                self.scheduler.timesteps[progress_id],
                np.asarray(latents, np.float32)), self.dtype)

            if progress_id == 0 and use_kv_cache:
                # later steps: suffix-only (ref :289-297)
                for i in range(n_branches):
                    bi = branch_inputs[i]
                    bi["input_ids"] = None
                    bi["position_ids"] = \
                        bi["position_ids"][:, -(num_img_tokens + 1):]
                    bi["attention_mask"] = \
                        bi["attention_mask"][:, -(num_img_tokens + 1):, :]
                    bi["input_image_sizes"] = ()
                    ref_latents[i] = []

        return self.vae_output_to_image(
            jax.jit(sdxl.sdxl_vae_decode, **vae_jit_kw)(
                self.vae_decoder_params, latents, **tiler_kwargs))
