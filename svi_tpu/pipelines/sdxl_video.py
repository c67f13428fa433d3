"""AnimateDiff-SDXL / Kolors video pipeline.

Behavioral reference: diffsynth/pipelines/sdxl_video.py (SDXLVideoPipeline
:15-226): frames ride the batch axis through the SDXL UNet while the
SDXLMotionModel temporal blocks attend across the full frame axis
(dancer.py lets_dance_xl "4.2 AnimateDiff"); without motion modules every
frame shares ONE noise tensor (ref :140-143); the scheduler is linear-beta
DDIM with motion modules, scaled-linear without, and the Kolors-without-
motion combination uses beta_end=0.014 / 1100 train timesteps (ref :57-64).
IP-Adapter images condition via extra K/V on the positive branch with a
zero-image negative branch (ref :155-165), optionally in "instant style"
(up-block modules only). A smoother hook may render mid-trajectory frames
to pixels and re-encode them (ref :205-211).

TPU-first: the UNet + motion forward for the whole clip is one jitted call
(frames batched, temporal attention via motion hooks inside the same XLA
program); the denoise loop stays host-side like the reference (DDIM math is
numpy), and the VAE runs per frame to bound memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ipadapter as ip
from ..models import motion as mo
from ..models import sdxl as sdxl_models
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import check_resize_height_width, generate_noise, preprocess_image
from .sdxl_image import KolorsPrompter, SDXLPrompter


class SDXLVideoPipeline:
    """Ref sdxl_video.py:15-226. Passing chatglm_params switches the
    prompter to Kolors (ref :57-64)."""

    def __init__(self, unet_params, motion_params=None,
                 text_encoder_params=None, text_encoder_2_params=None,
                 vae_encoder_params=None, vae_decoder_params=None,
                 tokenizer=None, tokenizer_2=None, chatglm_params=None,
                 ipadapter_params=None, ipadapter_image_encoder_params=None,
                 controlnet=None, dtype=jnp.float32,
                 use_original_animatediff=True):
        if chatglm_params is not None:
            self.prompter = KolorsPrompter(tokenizer)
            text_encoder_params = chatglm_params
            if motion_params is None:
                # AnimateDiff and Kolors schedulers are incompatible;
                # Kolors-only keeps its native schedule (ref :62-64)
                self.scheduler = EnhancedDDIMScheduler(
                    beta_end=0.014, num_train_timesteps=1100)
            else:
                self.scheduler = EnhancedDDIMScheduler(
                    beta_schedule="linear" if use_original_animatediff
                    else "scaled_linear")
        else:
            self.prompter = SDXLPrompter(tokenizer, tokenizer_2)
            beta = "linear" if (motion_params is not None
                                and use_original_animatediff) \
                else "scaled_linear"
            self.scheduler = EnhancedDDIMScheduler(beta_schedule=beta)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.unet_params = cast(unet_params)
        self.motion_params = cast(motion_params)
        self.text_encoder_params = cast(text_encoder_params)
        self.text_encoder_2_params = cast(text_encoder_2_params)
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.ipadapter_params = cast(ipadapter_params)
        self.ipadapter_image_encoder_params = cast(
            ipadapter_image_encoder_params)
        self.controlnet = controlnet  # MultiControlNetManager or None
        self.dtype = dtype

    @staticmethod
    def from_model_manager(model_manager, controlnet_config_units=(),
                           prompt_refiner_classes=(), **kwargs):
        """Ref sdxl_video.py fetch_models :35-66."""
        from ..models import controlnets as cn
        from ..models import model_io

        def fetch(name):
            entry = model_manager.fetch_model(name)
            return None if entry is None else entry[0]

        units, processors = [], []
        for cfg_unit in controlnet_config_units:
            cn_params = cn.sdxl_controlnet_params_from_torch(
                model_io.load_state_dict(cfg_unit.model_path))

            def fwd(p, s, t, e, c, _pid=cfg_unit.processor_id, **kw):
                return cn.sdxl_controlnet_forward(p, s, t, e, c, _pid, **kw)

            units.append((fwd, cn_params, cfg_unit.scale))
            processors.append(cn.Annotator(
                cfg_unit.processor_id,
                skip_processor=getattr(cfg_unit, "skip_processor", False)))
        manager = (cn.MultiControlNetManager(units, processors)
                   if units else None)
        return SDXLVideoPipeline(
            unet_params=fetch("sdxl_unet"),
            motion_params=fetch("sdxl_motion_modules"),
            text_encoder_params=fetch("sdxl_text_encoder"),
            text_encoder_2_params=fetch("sdxl_text_encoder_2"),
            chatglm_params=fetch("kolors_text_encoder"),
            vae_encoder_params=fetch("sdxl_vae_encoder"),
            vae_decoder_params=fetch("sdxl_vae_decoder"),
            ipadapter_params=fetch("sdxl_ipadapter"),
            ipadapter_image_encoder_params=fetch(
                "sdxl_ipadapter_clip_image_encoder"),
            controlnet=manager, **kwargs)

    def encode_prompt(self, prompt, clip_skip=1, clip_skip_2=2):
        pooled, emb = self.prompter.encode_prompt(
            self.text_encoder_params, self.text_encoder_2_params, prompt,
            clip_skip, clip_skip_2)
        return pooled.astype(self.dtype), emb.astype(self.dtype)

    def _unet_all_frames(self, latents, t, emb, pooled, add_time_id,
                         ipadapter_kwargs_list=None, controlnet_res=None,
                         tiled=False, tile_size=64, tile_stride=32):
        hooks = None
        if self.motion_params is not None:
            hooks = mo.motion_hooks(self.motion_params,
                                    call_map=mo.SDXL_MOTION_CALL_MAP,
                                    batch_size=1)
        f = latents.shape[0]
        emb = jnp.repeat(emb, f, axis=0) if emb.shape[0] == 1 else emb
        pooled = jnp.repeat(pooled, f, axis=0) if pooled.shape[0] == 1 \
            else pooled
        ids = jnp.repeat(add_time_id, f, axis=0) \
            if add_time_id.shape[0] == 1 else add_time_id
        return sdxl_models.sdxl_unet_forward(
            self.unet_params, latents, t, emb, ids, pooled,
            controlnet_res=controlnet_res,
            ipadapter_kwargs_list=ipadapter_kwargs_list, motion=hooks,
            tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)

    def decode_video(self, latents, tiled=False, tile_size=64,
                     tile_stride=32):
        """Ref sdxl_video.py:81-86: per-frame VAE decode -> PIL frames."""
        from PIL import Image

        frames = []
        for i in range(latents.shape[0]):
            img = sdxl_models.sdxl_vae_decode(
                self.vae_decoder_params, latents[i:i + 1], tiled=tiled,
                tile_size=tile_size, tile_stride=tile_stride)
            arr = np.asarray(img[0], np.float32).transpose(1, 2, 0)
            frames.append(Image.fromarray(
                ((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8)))
        return frames

    def encode_video(self, frames, tiled=False, tile_size=64,
                     tile_stride=32):
        """Ref sdxl_video.py:89-97."""
        lat = []
        for f in frames:
            img = jnp.asarray(preprocess_image(f), self.dtype)
            lat.append(sdxl_models.sdxl_vae_encode(
                self.vae_encoder_params, img, tiled=tiled,
                tile_size=tile_size, tile_stride=tile_stride))
        return jnp.concatenate(lat, axis=0)

    def _prepare_controlnet_frames(self, controlnet_frames, dtype):
        if controlnet_frames is None or self.controlnet is None:
            return None
        if isinstance(controlnet_frames[0], list):
            streams = []
            for pid, stream in enumerate(controlnet_frames):
                streams.append(np.stack([
                    self.controlnet.process_image(f, processor_id=pid)[0]
                    for f in stream], axis=0))
            return jnp.asarray(np.stack(streams, axis=0), dtype)
        return jnp.asarray(np.stack(
            [self.controlnet.process_image(f) for f in controlnet_frames],
            axis=1), dtype)

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 clip_skip_2=2, num_frames=None, input_frames=None,
                 ipadapter_images=None, ipadapter_scale=1.0,
                 ipadapter_use_instant_style=False, controlnet_frames=None,
                 denoising_strength=1.0, height=512, width=512,
                 num_inference_steps=20, smoother=None,
                 smoother_progress_ids=(), tiled=False, tile_size=64,
                 tile_stride=32, seed=None, prompt_emb_posi=None,
                 prompt_emb_nega=None, ipadapter_image_emb=None):
        height, width = check_resize_height_width(height, width, factor=64)
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size,
                        "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        # noise: one shared tensor without motion modules (ref :140-143)
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
                latents, noise, timestep=self.scheduler.timesteps[0]),
                self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, clip_skip,
                                                 clip_skip_2)
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, clip_skip,
                                                 clip_skip_2)
        pooled_posi, emb_posi = prompt_emb_posi
        pooled_nega, emb_nega = prompt_emb_nega

        # IP-Adapter (ref :155-165): zero image embedding on the negative
        ip_posi = ip_nega = None
        if self.ipadapter_params is not None and (
                ipadapter_images is not None
                or ipadapter_image_emb is not None):
            if ipadapter_image_emb is None:
                imgs = jnp.concatenate([
                    jnp.asarray(preprocess_image(im.resize((224, 224))),
                                self.dtype)
                    for im in ipadapter_images], axis=0)
                ipadapter_image_emb = ip.clip_image_encoder_forward(
                    self.ipadapter_image_encoder_params, imgs)
            emb_img = jnp.asarray(ipadapter_image_emb, self.dtype)
            ip_posi = ip.sdxl_ipadapter_kv(
                self.ipadapter_params, emb_img, scale=float(ipadapter_scale),
                use_instant_style=ipadapter_use_instant_style)
            ip_nega = ip.sdxl_ipadapter_kv(
                self.ipadapter_params, jnp.zeros_like(emb_img),
                use_instant_style=ipadapter_use_instant_style)

        controlnet_cond = self._prepare_controlnet_frames(controlnet_frames,
                                                          self.dtype)
        add_time_id = jnp.asarray([height, width, 0, 0, height, width],
                                  jnp.float32)[None]

        for progress_id, timestep in enumerate(self.scheduler.timesteps):
            t = jnp.asarray([timestep], self.dtype)

            def run(emb, pooled, ipkw):
                res = None
                if self.controlnet is not None \
                        and controlnet_cond is not None:
                    f = latents.shape[0]
                    res = self.controlnet(
                        latents, t, jnp.repeat(emb, f, axis=0)
                        if emb.shape[0] == 1 else emb,
                        controlnet_cond,
                        add_time_id=jnp.repeat(add_time_id, f, axis=0),
                        add_text_embeds=jnp.repeat(pooled, f, axis=0)
                        if pooled.shape[0] == 1 else pooled)
                return self._unet_all_frames(
                    latents, t, emb, pooled, add_time_id,
                    ipadapter_kwargs_list=ipkw, controlnet_res=res,
                    **tiler_kwargs)

            noise_pred = run(emb_posi, pooled_posi, ip_posi)
            if cfg_scale != 1.0:
                nega = run(emb_nega, pooled_nega, ip_nega)
                noise_pred = nega + cfg_scale * (noise_pred - nega)

            if smoother is not None and progress_id in smoother_progress_ids:
                rendered = self.scheduler.step(
                    np.asarray(noise_pred, np.float32), timestep,
                    np.asarray(latents, np.float32), to_final=True)
                frames = self.decode_video(jnp.asarray(rendered, self.dtype))
                frames = smoother(frames, original_frames=input_frames)
                target = np.asarray(self.encode_video(frames), np.float32)
                noise_pred = self.scheduler.return_to_timestep(
                    timestep, np.asarray(latents, np.float32), target)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32), timestep,
                np.asarray(latents, np.float32)), self.dtype)

        frames = self.decode_video(latents, **tiler_kwargs)
        if smoother is not None and (
                num_inference_steps in smoother_progress_ids
                or -1 in smoother_progress_ids):
            frames = smoother(frames, original_frames=input_frames)
        return frames
