"""HunyuanDiT text-to-image pipeline.

Behavioral reference: diffsynth/pipelines/hunyuan_image.py
(HunyuanDiTImagePipeline: DDIM v-prediction with beta_end 0.03, SDXL VAE,
ImageSizeManager rotary tables) + prompters/hunyuan_dit_prompter.py (Chinese
BERT CLIP-like encoder to 77 tokens, mT5 to 256 tokens, attention masks kept
and passed into the DiT's learned-padding merge).

The reference's two text encoders are transformers BertModel/T5EncoderModel
subclasses (models/hunyuan_dit_text_encoder.py) — host-side preprocessing;
`HunyuanTextEncoderWrapper` wraps them lazily (torch CPU) and the pipeline
also accepts precomputed embeddings (prompt_emb_posi/nega) directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hunyuan_dit as hy
from ..models.sd import sd_vae_decoder_params_from_torch  # noqa: F401 (re-export convenience)
from ..models import sdxl
from ..prompters.hunyuan_dit_prompter import HunyuanDiTPrompter
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import (check_resize_height_width, control_noise_via_local_prompts,
                   extend_prompt, generate_noise, preprocess_image)


# HunyuanDiTPrompter moved to prompters/hunyuan_dit_prompter.py; the old
# wrapper name remains the pipeline-facing alias.
HunyuanTextEncoderWrapper = HunyuanDiTPrompter


class HunyuanDiTImagePipeline:
    """Ref hunyuan_image.py:125-299."""

    def __init__(self, dit_params, text_encoder=None, vae_encoder_params=None,
                 vae_decoder_params=None, dtype=jnp.float32,
                 num_layers_down=21):
        self.scheduler = EnhancedDDIMScheduler(
            prediction_type="v_prediction", beta_start=0.00085, beta_end=0.03)
        self.text_encoder = text_encoder  # HunyuanTextEncoderWrapper or None
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.dit_params = cast(dit_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype
        self.num_layers_down = num_layers_down
        self._dit_jit = jax.jit(
            lambda params, *args, **kw: hy.hunyuan_dit_forward(
                params, *args, num_layers_down=self.num_layers_down, **kw),
            static_argnames=("tiled", "tile_size", "tile_stride"))

    def _cfg_dit(self, latents, timestep, posi, nega, size_emb, freqs,
                 cfg_scale, **tiler_kwargs):
        def run(emb):
            text_emb, mask, text_emb_t5, mask_t5 = emb
            return self._dit_jit(
                self.dit_params, latents,
                jnp.asarray(text_emb, self.dtype), jnp.asarray(text_emb_t5, self.dtype),
                jnp.asarray(mask), jnp.asarray(mask_t5), timestep, size_emb,
                freqs, **tiler_kwargs)
        pred_posi = run(posi)
        if cfg_scale == 1.0 or nega is None:
            return pred_posi
        pred_nega = run(nega)
        return pred_nega + cfg_scale * (pred_posi - pred_nega)

    def vae_output_to_image(self, vae_output):
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 clip_skip_2=1, input_image=None, denoising_strength=1.0,
                 height=1024, width=1024, num_inference_steps=20, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, tiled=False,
                 tile_size=64, tile_stride=32, local_prompts=None, masks=None,
                 mask_scales=None):
        height, width = check_resize_height_width(height, width, factor=16)
        prompter = getattr(self.text_encoder, "prompter", None)
        prompt, local_prompts, masks, mask_scales = extend_prompt(
            prompter, prompt, local_prompts, masks, mask_scales)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        vae_jit_kw = {"static_argnames": ("tiled", "tile_size", "tile_stride")}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        noise = jnp.asarray(
            generate_noise((1, 4, height // 8, width // 8), seed), self.dtype)
        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = jax.jit(sdxl.sdxl_vae_encode, **vae_jit_kw)(
                self.vae_encoder_params, image, **tiler_kwargs)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        if prompt_emb_posi is None:
            prompt_emb_posi = self.text_encoder(prompt, clip_skip, clip_skip_2)
        if prompt_emb_nega is None and cfg_scale != 1.0:
            prompt_emb_nega = self.text_encoder(negative_prompt, clip_skip,
                                                clip_skip_2)
        prompt_emb_locals = [self.text_encoder(pl, clip_skip, clip_skip_2)
                             for pl in (local_prompts or [])]

        # tiled: size embedding and RoPE tables describe ONE tile
        # (ref hunyuan_image.py:193-206)
        if tiled:
            rh = rw = tile_size * 16
        else:
            rh, rw = height, width
        size_emb = jnp.asarray([[rw, rh, rw, rh, 0, 0]], jnp.float32)
        cos, sin = hy.calc_rope(rh, rw)
        freqs = (jnp.asarray(cos), jnp.asarray(sin))

        for timestep in self.scheduler.timesteps:
            t = jnp.asarray([timestep], self.dtype)
            if local_prompts:
                # region-merge the positive branch (ref hunyuan_image.py
                # :263-273)
                cb = lambda emb: np.asarray(self._cfg_dit(
                    latents, t, emb, None, size_emb, freqs, 1.0,
                    **tiler_kwargs), np.float32)
                posi = control_noise_via_local_prompts(
                    prompt_emb_posi, prompt_emb_locals, masks, mask_scales,
                    cb)
                if cfg_scale != 1.0:
                    nega = cb(prompt_emb_nega)
                    noise_pred = nega + float(cfg_scale) * (posi - nega)
                else:
                    noise_pred = posi
            else:
                noise_pred = self._cfg_dit(latents, t, prompt_emb_posi,
                                           prompt_emb_nega, size_emb, freqs,
                                           float(cfg_scale), **tiler_kwargs)
            latents = jnp.asarray(
                self.scheduler.step(np.asarray(noise_pred, np.float32),
                                    timestep,
                                    np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(
            jax.jit(sdxl.sdxl_vae_decode, **vae_jit_kw)(
                self.vae_decoder_params, latents, **tiler_kwargs))
