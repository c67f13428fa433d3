"""SDXL text/image-to-image pipeline.

Behavioral reference: diffsynth/pipelines/sdxl_image.py (SDXLImagePipeline) +
prompters/sdxl_prompter.py (dual-encoder prompt encoding: CLIP-L hidden +
bigG hidden concatenated to 2048, pooled bigG as add_text_embeds) —
EnhancedDDIMScheduler CFG loop with add_time_id = (h, w, 0, 0, h, w).

TPU notes: posi/nega batched into one UNet pass; scheduler math host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sdxl
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import (check_resize_height_width, control_noise_via_local_prompts,
                   extend_prompt, generate_noise, preprocess_image)
from ..prompters.kolors_prompter import KolorsPrompter
from ..prompters.sdxl_prompter import SDXLPrompter
from .sd_image import tokenize_long_prompt  # noqa: F401 (compat re-export)


class SDXLImagePipeline:
    """Ref sdxl_image.py:15-232. Passing chatglm_params switches to Kolors:
    the prompter becomes KolorsPrompter and the scheduler becomes
    EnhancedDDIMScheduler(beta_end=0.014, num_train_timesteps=1100)
    (ref :64-68); the UNet params carry the is_kolors projections.
    (Pipeline-level ControlNet / IP-Adapter wiring tracked in ROADMAP.md.)"""

    def __init__(self, unet_params, text_encoder_params=None,
                 text_encoder_2_params=None, vae_encoder_params=None,
                 vae_decoder_params=None, tokenizer=None, tokenizer_2=None,
                 chatglm_params=None, dtype=jnp.float32):
        if chatglm_params is not None:
            self.scheduler = EnhancedDDIMScheduler(beta_end=0.014,
                                                   num_train_timesteps=1100)
            self.prompter = KolorsPrompter(tokenizer)
            text_encoder_params = chatglm_params
        else:
            self.scheduler = EnhancedDDIMScheduler()
            self.prompter = SDXLPrompter(tokenizer, tokenizer_2)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.unet_params = cast(unet_params)
        self.text_encoder_params = cast(text_encoder_params)
        self.text_encoder_2_params = cast(text_encoder_2_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _cfg_unet_impl(params, latents, timestep, emb_posi, emb_nega,
                       pooled_posi, pooled_nega, add_time_id, cfg_scale,
                       tiled=False, tile_size=64, tile_stride=32):
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        pooled = jnp.concatenate([pooled_posi, pooled_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        ids = jnp.concatenate([add_time_id, add_time_id], axis=0)
        pred = sdxl.sdxl_unet_forward(params, sample, t, ctx, ids, pooled,
                                      tiled=tiled, tile_size=tile_size,
                                      tile_stride=tile_stride)
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _unet_impl(params, latents, timestep, emb, pooled, add_time_id,
                   tiled=False, tile_size=64, tile_stride=32):
        return sdxl.sdxl_unet_forward(params, latents, timestep, emb,
                                      add_time_id, pooled, tiled=tiled,
                                      tile_size=tile_size,
                                      tile_stride=tile_stride)

    def encode_prompt(self, prompt, clip_skip=1, clip_skip_2=2):
        pooled, emb = self.prompter.encode_prompt(
            self.text_encoder_params, self.text_encoder_2_params, prompt,
            clip_skip, clip_skip_2)
        return pooled.astype(self.dtype), emb.astype(self.dtype)

    def vae_output_to_image(self, vae_output):
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 clip_skip_2=2, input_image=None, denoising_strength=1.0,
                 height=1024, width=1024, num_inference_steps=20, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, tiled=False,
                 tile_size=64, tile_stride=32, local_prompts=None, masks=None,
                 mask_scales=None):
        height, width = check_resize_height_width(height, width, factor=64)
        prompt, local_prompts, masks, mask_scales = extend_prompt(
            self.prompter, prompt, local_prompts, masks, mask_scales)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = jax.jit(sdxl.sdxl_vae_encode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_encoder_params, image, **tiler_kwargs)
            noise = jnp.asarray(
                generate_noise((1, 4, height // 8, width // 8), seed), self.dtype)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = jnp.asarray(
                generate_noise((1, 4, height // 8, width // 8), seed), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, clip_skip, clip_skip_2)
        if prompt_emb_nega is None and cfg_scale != 1.0:
            prompt_emb_nega = self.encode_prompt(negative_prompt, clip_skip,
                                                 clip_skip_2)
        prompt_emb_locals = [self.encode_prompt(pl, clip_skip, clip_skip_2)
                             for pl in local_prompts]
        pooled_posi, emb_posi = prompt_emb_posi
        # add_time_id: (height, width, 0, 0, height, width) per sample
        # (ref sdxl_image.py:105-108)
        add_time_id = jnp.asarray([height, width, 0, 0, height, width],
                                  jnp.float32)[None]

        if cfg_scale != 1.0:
            pooled_nega, emb_nega = prompt_emb_nega
            n = max(emb_posi.shape[1], emb_nega.shape[1])

            def _pad(e):
                while e.shape[1] < n:
                    e = jnp.concatenate([e, e[:, -77:]], axis=1)
                return e

            emb_posi, emb_nega = _pad(emb_posi), _pad(emb_nega)

        for timestep in self.scheduler.timesteps:
            t = jnp.asarray([timestep], self.dtype)
            if local_prompts:
                # region-merge only the positive branch (ref sdxl_image.py)
                cb = lambda pe: np.asarray(self._unet_impl(
                    self.unet_params, latents, t, pe[1], pe[0], add_time_id,
                    **tiler_kwargs), np.float32)
                posi = control_noise_via_local_prompts(
                    (pooled_posi, emb_posi), prompt_emb_locals, masks,
                    mask_scales, cb)
                if cfg_scale != 1.0:
                    nega = cb((pooled_nega, emb_nega))
                    noise_pred = nega + float(cfg_scale) * (posi - nega)
                else:
                    noise_pred = posi
            elif cfg_scale != 1.0:
                noise_pred = self._cfg_unet_impl(
                    self.unet_params, latents, t, emb_posi, emb_nega,
                    pooled_posi, pooled_nega, add_time_id, float(cfg_scale),
                    **tiler_kwargs)
            else:
                noise_pred = self._unet_impl(self.unet_params, latents, t,
                                             emb_posi, pooled_posi,
                                             add_time_id, **tiler_kwargs)
            latents = jnp.asarray(
                self.scheduler.step(np.asarray(noise_pred, np.float32),
                                    timestep,
                                    np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(
            jax.jit(sdxl.sdxl_vae_decode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_decoder_params, latents, **tiler_kwargs))
