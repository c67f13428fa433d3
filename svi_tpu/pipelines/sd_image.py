"""SD 1.5 text/image-to-image pipeline.

Behavioral reference: diffsynth/pipelines/sd_image.py (SDImagePipeline) +
prompters/sd_prompter.py (SDPrompter.encode_prompt with long-prompt chunking,
base_prompter.py:6-36) — CFG denoising through EnhancedDDIMScheduler,
denoising_strength img2img via add_noise at timesteps[0].

TPU notes: one jitted CFG step (posi/nega batched into B=2 — one MXU pass —
instead of the reference's two sequential UNet calls); model params live as
device arrays in whatever dtype they were ingested with (bf16 recommended);
scheduler math stays host-side (tiny scalars). ControlNet / IP-Adapter /
local-prompt mixing are not implemented yet (tracked in ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sd
from ..prompters.base_prompter import tokenize_long_prompt
from ..prompters.sd_prompter import SDPrompter
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import (check_resize_height_width, control_noise_via_local_prompts,
                   extend_prompt, generate_noise, preprocess_image)


class SDImagePipeline:
    """Ref sd_image.py:14-199. Params are jax pytrees produced by
    sd.*_params_from_torch (or any same-structure initializer)."""

    def __init__(self, unet_params, text_encoder_params=None,
                 vae_encoder_params=None, vae_decoder_params=None,
                 tokenizer=None, dtype=jnp.float32):
        self.scheduler = EnhancedDDIMScheduler()
        self.prompter = SDPrompter(tokenizer)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.unet_params = cast(unet_params)
        self.text_encoder_params = cast(text_encoder_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    # -- jitted compute (params passed as traced args so they stay device
    # buffers instead of being baked into the executable as constants) ------

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _cfg_unet_impl(params, latents, timestep, emb_posi, emb_nega,
                       cfg_scale, tiled=False, tile_size=64, tile_stride=32):
        """Batched CFG: posi/nega in ONE UNet pass (the reference runs two
        sequential calls, sd_image.py:163-175); contexts are padded host-side
        to equal chunk counts before the call."""
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        pred = sd.sd_unet_forward(params, sample, t, ctx, tiled=tiled,
                                  tile_size=tile_size, tile_stride=tile_stride)
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    def _cfg_unet(self, latents, timestep, emb_posi, emb_nega, cfg_scale,
                  **tiler_kwargs):
        return self._cfg_unet_impl(self.unet_params, latents, timestep,
                                   emb_posi, emb_nega, cfg_scale,
                                   **tiler_kwargs)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _unet_single_impl(params, latents, timestep, emb, tiled=False,
                          tile_size=64, tile_stride=32):
        return sd.sd_unet_forward(params, latents, timestep, emb, tiled=tiled,
                                  tile_size=tile_size,
                                  tile_stride=tile_stride)

    def _decode(self, latents, **tiler_kwargs):
        return jax.jit(sd.sd_vae_decode, static_argnames=(
            "tiled", "tile_size", "tile_stride"))(
            self.vae_decoder_params, latents, **tiler_kwargs)

    def _encode(self, image, **tiler_kwargs):
        return jax.jit(sd.sd_vae_encode, static_argnames=(
            "tiled", "tile_size", "tile_stride"))(
            self.vae_encoder_params, image, **tiler_kwargs)

    # -- host-side API -----------------------------------------------------

    def encode_prompt(self, prompt, clip_skip=1, positive=True):
        return self.prompter.encode_prompt(self.text_encoder_params, prompt,
                                           clip_skip,
                                           positive=positive).astype(self.dtype)

    def vae_output_to_image(self, vae_output) -> "np.ndarray":
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 input_image=None, denoising_strength=1.0, height=512,
                 width=512, num_inference_steps=20, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, tiled=False,
                 tile_size=64, tile_stride=32, local_prompts=None, masks=None,
                 mask_scales=None):
        height, width = check_resize_height_width(height, width, factor=64)
        # regional prompting (ref sd_image.py:139-144 / base.py:95-104):
        # user-supplied masks + Omost-extended regions
        prompt, local_prompts, masks, mask_scales = extend_prompt(
            self.prompter, prompt, local_prompts, masks, mask_scales)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = self._encode(image, **tiler_kwargs)
            noise = jnp.asarray(
                generate_noise((1, 4, height // 8, width // 8), seed), self.dtype)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = jnp.asarray(
                generate_noise((1, 4, height // 8, width // 8), seed), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, clip_skip)
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, clip_skip,
                                                 positive=False)
        prompt_emb_locals = [self.encode_prompt(pl, clip_skip)
                             for pl in local_prompts]
        # equal-length contexts for the batched CFG pass: pad the shorter one
        # with repeats of the final 77-token chunk (a full padding chunk)
        n = max(prompt_emb_posi.shape[1], prompt_emb_nega.shape[1])

        def _pad(e):
            while e.shape[1] < n:
                e = jnp.concatenate([e, e[:, -77:]], axis=1)
            return e

        prompt_emb_posi, prompt_emb_nega = _pad(prompt_emb_posi), _pad(prompt_emb_nega)

        for timestep in self.scheduler.timesteps:
            t = jnp.asarray([timestep], self.dtype)
            if local_prompts:
                # separate branches so only the positive one is region-merged
                # (ref sd_image.py:164-176)
                cb = lambda emb: np.asarray(self._unet_single_impl(
                    self.unet_params, latents, t, emb, **tiler_kwargs),
                    np.float32)
                posi = control_noise_via_local_prompts(
                    prompt_emb_posi, prompt_emb_locals, masks, mask_scales,
                    cb)
                nega = cb(prompt_emb_nega)
                noise_pred = nega + float(cfg_scale) * (posi - nega)
            else:
                noise_pred = self._cfg_unet(latents, t, prompt_emb_posi,
                                            prompt_emb_nega, float(cfg_scale),
                                            **tiler_kwargs)
            latents = jnp.asarray(
                self.scheduler.step(np.asarray(noise_pred, np.float32),
                                    timestep,
                                    np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(self._decode(latents, **tiler_kwargs))
