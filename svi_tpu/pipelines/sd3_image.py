"""SD3 / SD3.5 text/image-to-image pipeline.

Behavioral reference: diffsynth/pipelines/sd3_image.py (SD3ImagePipeline:
FlowMatchScheduler shift=3, CFG over the MMDiT) + prompters/sd3_prompter.py
(CLIP-L + bigG hidden concatenated and zero-padded to 4096, stacked on the
T5-XXL sequence; pooled = concat of the two CLIP pooled outputs; T5 absent ->
zero context rows).

TPU notes: posi/nega batched into one MMDiT pass; FlowMatch step host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sd3, sdxl
from ..schedulers.flow_match import FlowMatchScheduler
from ..prompters.sd3_prompter import SD3Prompter
from .base import (check_resize_height_width, control_noise_via_local_prompts,
                   extend_prompt, generate_noise, preprocess_image)


class SD3ImagePipeline:
    """Ref sd3_image.py:12-152."""

    def __init__(self, dit_params, text_encoder_1_params=None,
                 text_encoder_2_params=None, t5=None, vae_encoder_params=None,
                 vae_decoder_params=None, tokenizer=None, dtype=jnp.float32):
        self.scheduler = FlowMatchScheduler(shift=3.0)
        self.prompter = SD3Prompter(tokenizer)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.dit_params = cast(dit_params)
        self.text_encoder_1_params = cast(text_encoder_1_params)
        self.text_encoder_2_params = cast(text_encoder_2_params)
        self.t5 = t5
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _cfg_dit_impl(params, latents, timestep, emb_posi, emb_nega,
                      pooled_posi, pooled_nega, cfg_scale, tiled=False,
                      tile_size=128, tile_stride=64):
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        pooled = jnp.concatenate([pooled_posi, pooled_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        pred = sd3.sd3_dit_forward(params, sample, t, ctx, pooled, tiled=tiled,
                                   tile_size=tile_size, tile_stride=tile_stride)
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tiled", "tile_size",
                                                 "tile_stride"))
    def _dit_single(params, latents, timestep, emb, pooled, tiled=False,
                    tile_size=128, tile_stride=64):
        return sd3.sd3_dit_forward(params, latents, timestep, emb, pooled,
                                   tiled=tiled, tile_size=tile_size,
                                   tile_stride=tile_stride)

    def encode_prompt(self, prompt, t5_sequence_length=77):
        emb, pooled = self.prompter.encode_prompt(
            self.text_encoder_1_params, self.text_encoder_2_params, self.t5,
            prompt, t5_sequence_length)
        return emb.astype(self.dtype), pooled.astype(self.dtype)

    def vae_output_to_image(self, vae_output):
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5,
                 input_image=None, denoising_strength=1.0, height=1024,
                 width=1024, num_inference_steps=28, t5_sequence_length=77,
                 seed=None, prompt_emb_posi=None, prompt_emb_nega=None,
                 tiled=False, tile_size=128, tile_stride=64,
                 local_prompts=None, masks=None, mask_scales=None):
        height, width = check_resize_height_width(height, width, factor=64)
        prompt, local_prompts, masks, mask_scales = extend_prompt(
            self.prompter, prompt, local_prompts, masks, mask_scales)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = jax.jit(sd3.sd3_vae_encode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_encoder_params, image, **tiler_kwargs)
            noise = jnp.asarray(
                generate_noise((1, 16, height // 8, width // 8), seed), self.dtype)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = jnp.asarray(
                generate_noise((1, 16, height // 8, width // 8), seed), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, t5_sequence_length)
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt,
                                                 t5_sequence_length)
        emb_posi, pooled_posi = prompt_emb_posi
        emb_nega, pooled_nega = prompt_emb_nega
        prompt_emb_locals = [self.encode_prompt(pl, t5_sequence_length)
                             for pl in local_prompts]

        for i, timestep in enumerate(np.asarray(self.scheduler.timesteps)):
            t = jnp.asarray([timestep], self.dtype)
            if local_prompts:
                cb = lambda pe: np.asarray(self._dit_single(
                    self.dit_params, latents, t, pe[0], pe[1],
                    **tiler_kwargs), np.float32)
                posi = control_noise_via_local_prompts(
                    (emb_posi, pooled_posi), prompt_emb_locals, masks,
                    mask_scales, cb)
                nega = cb((emb_nega, pooled_nega))
                noise_pred = nega + float(cfg_scale) * (posi - nega)
            else:
                noise_pred = self._cfg_dit_impl(
                    self.dit_params, latents, t, emb_posi, emb_nega,
                    pooled_posi, pooled_nega, float(cfg_scale), **tiler_kwargs)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32),
                self.scheduler.timesteps[i],
                np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(
            jax.jit(sd3.sd3_vae_decode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_decoder_params, latents, **tiler_kwargs))
