"""Stable Video Diffusion image-to-video pipeline.

Behavioral reference: diffsynth/pipelines/svd_video.py (SVDVideoPipeline:
ContinuousODEScheduler (Karras sigmas, forward-Euler), CLIP-image + noise-
augmented VAE-image conditioning concatenated on the channel axis, per-frame
linspace CFG scales, optional mask-frame re-noising, latent post-normalize +
contrast enhance before decode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import svd
from ..models.sd import sd_vae_encode
from ..schedulers.continuous_ode import ContinuousODEScheduler
from .base import check_resize_height_width, generate_noise, preprocess_image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class SVDVideoPipeline:
    """Ref svd_video.py:12-185. image_encoder_params: models/ipadapter.py
    CLIP vision tower params (SVDImageEncoder); precomputed image_emb_clip
    can be passed instead."""

    def __init__(self, unet_params, image_encoder_params=None,
                 vae_encoder_params=None, vae_decoder_params=None,
                 dtype=jnp.float32):
        self.scheduler = ContinuousODEScheduler()
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.unet_params = cast(unet_params)
        self.image_encoder_params = cast(image_encoder_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    def encode_image_with_clip(self, image):
        """Ref svd_video.py:41-50: bicubic 224 resize, CLIP normalize."""
        from ..models import ipadapter as ipa
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image).astype(np.uint8))
        arr = np.asarray(image.resize((224, 224), Image.BICUBIC),
                         np.float32) / 255.0
        arr = (arr - CLIP_MEAN) / CLIP_STD
        pixels = jnp.asarray(arr.transpose(2, 0, 1)[None], self.dtype)
        return ipa.clip_image_encoder_forward(self.image_encoder_params,
                                              pixels)[None]

    def encode_image_with_vae(self, image, noise_aug_strength, seed=None):
        """Ref :52-57: noise-augmented un-scaled VAE latent."""
        img = preprocess_image(image)
        noise = generate_noise(img.shape, seed)
        img = jnp.asarray(img + noise_aug_strength * noise, self.dtype)
        return sd_vae_encode(self.vae_encoder_params, img, scaling_factor=1.0)

    def encode_video_with_vae(self, video):
        lat = [sd_vae_encode(self.vae_encoder_params,
                             jnp.asarray(preprocess_image(f), self.dtype),
                             scaling_factor=1.0) for f in video]
        return jnp.concatenate(lat, axis=0)

    def tensor2video(self, frames):
        from PIL import Image

        arr = np.asarray(frames, np.float32).transpose(1, 2, 3, 0)
        arr = ((arr + 1) * 127.5).clip(0, 255).astype(np.uint8)
        return [Image.fromarray(f) for f in arr]

    def __call__(self, input_image=None, input_video=None, mask_frames=(),
                 mask_frame_ids=(), min_cfg_scale=1.0, max_cfg_scale=3.0,
                 denoising_strength=1.0, num_frames=25, height=576,
                 width=1024, fps=7, motion_bucket_id=127,
                 noise_aug_strength=0.02, num_inference_steps=20,
                 post_normalize=True, contrast_enhance_scale=1.2, seed=None):
        height, width = check_resize_height_width(height, width, factor=64)
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        noise = jnp.asarray(generate_noise(
            (num_frames, 4, height // 8, width // 8), seed), self.dtype)
        if denoising_strength == 1.0:
            latents = noise
        else:
            latents = self.encode_video_with_vae(input_video)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, self.scheduler.timesteps[0]), self.dtype)
        if len(mask_frames) > 0:
            mask_latents = self.encode_video_with_vae(mask_frames)

        clip_posi = self.encode_image_with_clip(input_image)
        clip_nega = jnp.zeros_like(clip_posi)
        vae_posi = jnp.repeat(self.encode_image_with_vae(
            input_image, noise_aug_strength, seed=seed), num_frames, axis=0)
        vae_nega = jnp.zeros_like(vae_posi)

        cfg = np.linspace(min_cfg_scale, max_cfg_scale,
                          num_frames).reshape(num_frames, 1, 1, 1)
        cfg = jnp.asarray(cfg, self.dtype)
        add_time_id = jnp.asarray([fps - 1, motion_bucket_id,
                                   noise_aug_strength], jnp.float32)

        unet = jax.jit(svd.svd_unet_forward)
        for timestep in np.asarray(self.scheduler.timesteps):
            for fid, mid in enumerate(mask_frame_ids):
                renoised = self.scheduler.add_noise(
                    mask_latents[fid], noise[mid], timestep)
                latents = latents.at[mid].set(jnp.asarray(renoised, self.dtype))
            t = jnp.asarray([timestep], self.dtype)
            posi = unet(self.unet_params,
                        jnp.concatenate([latents, vae_posi], axis=1), t,
                        clip_posi[0], add_time_id)
            nega = unet(self.unet_params,
                        jnp.concatenate([latents, vae_nega], axis=1), t,
                        clip_nega[0], add_time_id)
            noise_pred = nega + cfg * (posi - nega)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32), timestep,
                np.asarray(latents, np.float32)), self.dtype)

        # post_process_latents (ref :102-108)
        lat = np.asarray(latents, np.float32)
        if post_normalize:
            mean, std = lat.mean(), lat.std()
            lat = (lat - lat.mean(axis=(1, 2, 3), keepdims=True)) \
                / lat.std(axis=(1, 2, 3), keepdims=True) * std + mean
        lat = lat * contrast_enhance_scale
        video = svd.svd_vae_decode(self.vae_decoder_params,
                                   jnp.asarray(lat.transpose(1, 0, 2, 3),
                                               self.dtype))
        return self.tensor2video(np.asarray(video, np.float32))
