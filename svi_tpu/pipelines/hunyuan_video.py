"""HunyuanVideo text-to-video pipeline.

Behavioral reference: diffsynth/pipelines/hunyuan_video.py
(HunyuanVideoPipeline: FlowMatchScheduler(shift=7, sigma_min=0,
extra_one_step=True), embedded guidance 6.0 with optional true CFG, latent
shape (1,16,(F-1)/4+1,H/8,W/8)). The reference's prompter runs an
LLaVA-llama-3-8B text encoder (host-side transformers); this pipeline takes
precomputed (prompt_emb, text_mask, pooled) or a callable text_encoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hunyuan_video as hv
from ..schedulers.flow_match import FlowMatchScheduler
from .base import check_resize_height_width, generate_noise, tensor_to_frames


class HunyuanVideoPipeline:
    """Ref hunyuan_video.py:16-248."""

    def __init__(self, dit_params, text_encoder=None, vae_encoder_params=None,
                 vae_decoder_params=None, dtype=jnp.bfloat16):
        self.scheduler = FlowMatchScheduler(shift=7.0, sigma_min=0.0,
                                            extra_one_step=True)
        self.text_encoder = text_encoder
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.dit_params = cast(dit_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    @staticmethod
    @jax.jit
    def _dit_impl(params, latents, timestep, emb, mask, pooled, guidance,
                  cos, sin):
        return hv.hunyuan_video_dit_forward(
            params, latents, timestep, emb, mask, pooled, guidance=guidance,
            freqs=(cos, sin))

    def __call__(self, prompt, negative_prompt="", cfg_scale=1.0,
                 embedded_guidance=6.0, denoising_strength=1.0, height=720,
                 width=1280, num_frames=129, num_inference_steps=30,
                 seed=None, prompt_emb_posi=None, prompt_emb_nega=None):
        height, width = check_resize_height_width(height, width, factor=16)
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        lat_t = (num_frames - 1) // 4 + 1
        latents = jnp.asarray(generate_noise(
            (1, 16, lat_t, height // 8, width // 8), seed), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.text_encoder(prompt)
        if prompt_emb_nega is None and cfg_scale != 1.0:
            prompt_emb_nega = self.text_encoder(negative_prompt)

        cos_np, sin_np = hv.prepare_rope_tables(lat_t, height // 16,
                                                width // 16)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        guidance = jnp.asarray([embedded_guidance], self.dtype)

        def run(emb_pack):
            emb, mask, pooled = emb_pack
            return self._dit_impl(
                self.dit_params, latents, t, jnp.asarray(emb, self.dtype),
                jnp.asarray(mask), jnp.asarray(pooled, self.dtype), guidance,
                cos, sin)

        for i, timestep in enumerate(np.asarray(self.scheduler.timesteps)):
            t = jnp.asarray([timestep], self.dtype)
            noise_pred = run(prompt_emb_posi)
            if cfg_scale != 1.0:
                noise_pred_nega = run(prompt_emb_nega)
                noise_pred = noise_pred_nega + cfg_scale * (noise_pred
                                                            - noise_pred_nega)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32),
                self.scheduler.timesteps[i],
                np.asarray(latents, np.float32)), self.dtype)

        video = hv.hunyuan_video_vae_decode(self.vae_decoder_params, latents)
        return tensor_to_frames(np.asarray(video[0], np.float32))
