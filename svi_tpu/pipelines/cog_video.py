"""CogVideoX text/video-to-video pipeline.

Behavioral reference: diffsynth/pipelines/cog_video.py (CogVideoPipeline:
zero-terminal-SNR DDIM v-prediction, T5 prompt encoding via the Flux T5
encoder, latent shape (1,16,T/4+1,H/8,W/8), CFG denoising over CogDiT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cog
from ..prompters.cog_prompter import CogPrompter
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import check_resize_height_width, generate_noise, tensor_to_frames


class CogVideoPipeline:
    """Ref cog_video.py:13-141. t5: optional (params, cfg, tokenizer) triple
    for svi_tpu.models.t5 (226-token prompts as in CogPrompter); precomputed
    prompt embeddings can be passed directly."""

    def __init__(self, dit_params, t5=None, vae_encoder_params=None,
                 vae_decoder_params=None, dtype=jnp.bfloat16):
        self.scheduler = EnhancedDDIMScheduler(
            rescale_zero_terminal_snr=True, prediction_type="v_prediction")
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.dit_params = cast(dit_params)
        self.t5 = t5
        self.prompter = CogPrompter(t5)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    @staticmethod
    @jax.jit
    def _cfg_dit_impl(params, latents, timestep, emb_posi, emb_nega, cos, sin,
                      cfg_scale):
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        pred = cog.cog_dit_forward(params, sample, t, ctx, (cos, sin))
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    @staticmethod
    @jax.jit
    def _dit_impl(params, latents, timestep, emb, cos, sin):
        return cog.cog_dit_forward(params, latents, timestep, emb, (cos, sin))

    def encode_prompt(self, prompt, max_length=226, positive=True):
        if self.prompter.t5 is None:
            self.prompter.fetch_models(self.t5)
        return self.prompter.encode_prompt(prompt, positive=positive,
                                           max_length=max_length,
                                           dtype=self.dtype)

    def __call__(self, prompt, negative_prompt="", input_video=None,
                 cfg_scale=7.0, denoising_strength=1.0, num_frames=49,
                 height=480, width=720, num_inference_steps=20, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, tiled=False,
                 tile_size=(60, 90), tile_stride=(30, 45)):
        height, width = check_resize_height_width(height, width, factor=16)
        tiler_kwargs = {"tiled": tiled, "tile_size": tuple(tile_size),
                        "tile_stride": tuple(tile_stride)}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        noise = jnp.asarray(generate_noise(
            (1, 16, num_frames // 4 + 1, height // 8, width // 8), seed),
            self.dtype)
        if denoising_strength == 1.0:
            latents = noise
        else:
            video = jnp.asarray(np.stack(
                [np.asarray(f, np.float32) * (2 / 255) - 1
                 for f in input_video], axis=1).transpose(2, 0, 1, 3)[None]
                if isinstance(input_video, (list, tuple)) else input_video,
                self.dtype)
            latents = cog.cog_vae_encode_video(self.vae_encoder_params, video,
                                               **tiler_kwargs)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, self.scheduler.timesteps[0]), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt)
        if prompt_emb_nega is None and cfg_scale != 1.0:
            prompt_emb_nega = self.encode_prompt(negative_prompt)

        cos_np, sin_np = cog.prepare_rope_tables(
            height // 8, width // 8, num_frames // 4 + 1)
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        for timestep in self.scheduler.timesteps:
            t = jnp.asarray([timestep], self.dtype)
            if tiled:
                # the DiT recomputes per-tile RoPE tables (ref cog_dit.py
                # :287-296 passes image_rotary_emb=None inside the tiler)
                posi = cog.cog_dit_forward(self.dit_params, latents, t,
                                           prompt_emb_posi, **tiler_kwargs)
                if cfg_scale != 1.0:
                    nega = cog.cog_dit_forward(self.dit_params, latents, t,
                                               prompt_emb_nega, **tiler_kwargs)
                    noise_pred = nega + cfg_scale * (posi - nega)
                else:
                    noise_pred = posi
            elif cfg_scale != 1.0:
                noise_pred = self._cfg_dit_impl(
                    self.dit_params, latents, t, prompt_emb_posi,
                    prompt_emb_nega, cos, sin, float(cfg_scale))
            else:
                noise_pred = self._dit_impl(self.dit_params, latents, t,
                                            prompt_emb_posi, cos, sin)
            latents = jnp.asarray(
                self.scheduler.step(np.asarray(noise_pred, np.float32),
                                    timestep,
                                    np.asarray(latents, np.float32)), self.dtype)

        video = cog.cog_vae_decode_video(self.vae_decoder_params, latents,
                                         **tiler_kwargs)
        return tensor_to_frames(np.asarray(video[0], np.float32))
