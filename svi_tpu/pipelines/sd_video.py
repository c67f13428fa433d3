"""AnimateDiff-style SD video pipeline (and the long-video window blender).

Behavioral reference: diffsynth/pipelines/sd_video.py (SDVideoPipeline:
linear-beta DDIM when motion modules are present, frames ride the batch axis,
`lets_dance_with_long_video` :14-66 — sliding 16-frame windows with stride 8,
triangle-biased running average per frame; optional smoother hook rendering
to pixels mid-trajectory and re-encoding via return_to_timestep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import motion as mo
from ..models import sd as sd_models
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import check_resize_height_width, generate_noise, preprocess_image


def denoise_long_video(run_window, latents, window=16, stride=8):
    """lets_dance_with_long_video (ref sd_video.py:14-66): run_window(lo, hi)
    -> noise prediction for frames [lo, hi); outputs blended with the
    triangle bias schedule."""
    num_frames = latents.shape[0]
    acc = np.zeros(latents.shape, np.float32)
    weight = np.zeros((num_frames,) + (1,) * (latents.ndim - 1), np.float32)
    for lo in range(0, num_frames, stride):
        hi = min(lo + window, num_frames)
        out = np.asarray(run_window(lo, hi), np.float32)
        for i in range(lo, hi):
            bias = max(1 - abs(i - (lo + hi - 1) / 2) / ((hi - lo - 1 + 1e-2) / 2),
                       1e-2)
            acc[i] = acc[i] * (weight[i] / (weight[i] + bias)) \
                + out[i - lo] * (bias / (weight[i] + bias))
            weight[i] += bias
        if hi == num_frames:
            break
    return acc


class SDVideoPipeline:
    """Ref sd_video.py:68-280 (core denoise path; ControlNet / IP-Adapter
    conditioning accepted as precomputed kwargs)."""

    def __init__(self, unet_params, motion_params=None,
                 text_encoder_params=None, vae_encoder_params=None,
                 vae_decoder_params=None, tokenizer=None, dtype=jnp.float32,
                 use_original_animatediff=True, controlnet=None):
        beta = "linear" if (motion_params is not None
                            and use_original_animatediff) else "scaled_linear"
        self.scheduler = EnhancedDDIMScheduler(beta_schedule=beta)
        from .sd_image import SDPrompter

        self.prompter = SDPrompter(tokenizer)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.unet_params = cast(unet_params)
        self.motion_params = cast(motion_params)
        self.text_encoder_params = cast(text_encoder_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.controlnet = controlnet  # MultiControlNetManager or None
        self.dtype = dtype

    @staticmethod
    def from_model_manager(model_manager, controlnet_config_units=(),
                           prompt_refiner_classes=(), **kwargs):
        """Ref sd_video.py fetch_models: pull sd_unet / text encoder / VAE /
        motion modules from a ModelManager, build ControlNet units from
        config units, attach prompt refiners."""
        from ..models import controlnets as cn
        from ..models import model_io

        def fetch(name):
            entry = model_manager.fetch_model(name)
            return None if entry is None else entry[0]

        units, processors = [], []
        for cfg_unit in controlnet_config_units:
            cn_params = cn.sd_controlnet_params_from_torch(
                model_io.load_state_dict(cfg_unit.model_path))
            units.append((cn.sd_controlnet_forward, cn_params,
                          cfg_unit.scale))
            processors.append(cn.Annotator(cfg_unit.processor_id,
                                           skip_processor=cfg_unit.skip_processor))
        controlnet = cn.MultiControlNetManager(units, processors) \
            if units else None

        pipe = SDVideoPipeline(
            fetch("sd_unet"), motion_params=fetch("sd_motion_modules"),
            text_encoder_params=fetch("sd_text_encoder"),
            vae_encoder_params=fetch("sd_vae_encoder"),
            vae_decoder_params=fetch("sd_vae_decoder"),
            controlnet=controlnet, **kwargs)
        pipe.prompter.load_prompt_refiners(model_manager,
                                           prompt_refiner_classes)
        return pipe

    def encode_prompt(self, prompt, clip_skip=1):
        return self.prompter.encode_prompt(self.text_encoder_params, prompt,
                                           clip_skip).astype(self.dtype)

    def _unet_window(self, latents, t, emb, ipadapter_kwargs_list=None,
                     controlnet_res=None, tiled=False, tile_size=64,
                     tile_stride=32):
        hooks = None
        if self.motion_params is not None:
            hooks = mo.motion_hooks(self.motion_params, batch_size=1)
        return sd_models.sd_unet_forward(
            self.unet_params, latents, t, emb,
            controlnet_res=controlnet_res,
            ipadapter_kwargs_list=ipadapter_kwargs_list, motion=hooks,
            tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)

    def decode_video(self, latents, tiled=False, tile_size=64,
                     tile_stride=32):
        from PIL import Image

        frames = []
        for i in range(latents.shape[0]):
            img = sd_models.sd_vae_decode(self.vae_decoder_params,
                                          latents[i:i + 1], tiled=tiled,
                                          tile_size=tile_size,
                                          tile_stride=tile_stride)
            arr = np.asarray(img[0], np.float32).transpose(1, 2, 0)
            frames.append(Image.fromarray(
                ((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8)))
        return frames

    def encode_video(self, frames, tiled=False, tile_size=64,
                     tile_stride=32):
        lat = []
        for f in frames:
            img = jnp.asarray(preprocess_image(f), self.dtype)
            lat.append(sd_models.sd_vae_encode(
                self.vae_encoder_params, img, tiled=tiled,
                tile_size=tile_size, tile_stride=tile_stride))
        return jnp.concatenate(lat, axis=0)

    def _prepare_controlnet_frames(self, controlnet_frames, dtype):
        """PIL frame streams -> (num_units, F, 3, H, W) conditioning stack
        (ref sdxl_video.py:164-179 / sd_video.py equivalents)."""
        if controlnet_frames is None:
            return None
        if isinstance(controlnet_frames[0], list):  # one stream per unit
            streams = []
            for pid, stream in enumerate(controlnet_frames):
                streams.append(np.stack([
                    self.controlnet.process_image(f, processor_id=pid)[0]
                    for f in stream], axis=0))
            return jnp.asarray(np.stack(streams, axis=0), dtype)
        # one shared stream annotated per unit
        return jnp.asarray(np.stack(
            [self.controlnet.process_image(f) for f in controlnet_frames],
            axis=1), dtype)

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 num_frames=None, input_frames=None, denoising_strength=1.0,
                 height=512, width=512, num_inference_steps=20,
                 animatediff_batch_size=16, animatediff_stride=8,
                 controlnet_frames=None, smoother=None,
                 smoother_progress_ids=(), seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, tiled=False,
                 tile_size=64, tile_stride=32):
        height, width = check_resize_height_width(height, width, factor=64)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)
        controlnet_cond = self._prepare_controlnet_frames(controlnet_frames,
                                                          self.dtype)

        if self.motion_params is None:
            noise = np.repeat(generate_noise((1, 4, height // 8, width // 8),
                                             seed), num_frames, axis=0)
        else:
            noise = generate_noise((num_frames, 4, height // 8, width // 8),
                                   seed)
        noise = jnp.asarray(noise, self.dtype)
        if input_frames is None or denoising_strength == 1.0:
            latents = noise
        else:
            latents = self.encode_video(input_frames, **tiler_kwargs)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, clip_skip)
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, clip_skip)

        for progress_id, timestep in enumerate(self.scheduler.timesteps):
            t = jnp.asarray([timestep], self.dtype)

            def run(emb):
                def run_window(lo, hi):
                    e = emb if emb.shape[0] == 1 else emb[lo:hi]
                    res = None
                    if self.controlnet is not None \
                            and controlnet_cond is not None:
                        res = self.controlnet(latents[lo:hi], t, e,
                                              controlnet_cond[:, lo:hi])
                    return self._unet_window(latents[lo:hi], t, e,
                                             controlnet_res=res,
                                             **tiler_kwargs)
                return denoise_long_video(run_window, latents,
                                          animatediff_batch_size,
                                          animatediff_stride)

            noise_pred = run(prompt_emb_posi)
            if cfg_scale != 1.0:
                nega = run(prompt_emb_nega)
                noise_pred = nega + cfg_scale * (noise_pred - nega)
            if smoother is not None and progress_id in smoother_progress_ids:
                rendered = self.scheduler.step(noise_pred, timestep,
                                               np.asarray(latents, np.float32),
                                               to_final=True)
                frames = self.decode_video(jnp.asarray(rendered, self.dtype))
                frames = smoother(frames, original_frames=input_frames)
                target = np.asarray(self.encode_video(frames), np.float32)
                noise_pred = self.scheduler.return_to_timestep(
                    timestep, np.asarray(latents, np.float32), target)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32), timestep,
                np.asarray(latents, np.float32)), self.dtype)

        frames = self.decode_video(latents, **tiler_kwargs)
        if smoother is not None and (num_inference_steps in smoother_progress_ids
                                     or -1 in smoother_progress_ids):
            frames = smoother(frames, original_frames=input_frames)
        return frames
