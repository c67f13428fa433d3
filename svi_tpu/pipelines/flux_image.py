"""FLUX.1 text/image-to-image pipeline.

Behavioral reference: diffsynth/pipelines/flux_image.py (FluxImagePipeline:
FlowMatchScheduler, embedded guidance 3.5 with optional true CFG) +
prompters/flux_prompter.py (CLIP-L pooled via SD3TextEncoder1 + T5 sequence,
default t5_sequence_length 512).

TPU notes: the common cfg_scale==1.0 path is a single jitted DiT call per
step; RoPE tables are computed inside the jit (constant-folded per shape).
ControlNets enter as `controlnet_units` (params, conditioning image, scale,
processor index — ref :562-578 + controlnets/controlnet_unit.py:79-91) and
IP-Adapters as `ipadapter_params` + a precomputed SigLIP image embedding
(the SigLIP tower is host-side transformers, ref :333-339). EliGen entity
masks run as extra prompt groups with a block attention mask inside the DiT
(ref :269-280, flux_dit.py:341-402), with optional inpaint fusion (:248-257).
TeaCache-for-Flux skips the block stacks when the step-to-step modulated
input moves less than a threshold (ref :470-510 + :600-641), reusing the
previous residual — decided host-side on the positive branch only (:433).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import flux
from ..prompters.flux_prompter import FluxPrompter
from ..schedulers.flow_match import FlowMatchScheduler
from .base import (check_resize_height_width, control_noise_via_local_prompts,
                   extend_prompt, generate_noise, preprocess_image)


class FluxTeaCache:
    """Ref flux_image.py:470-510: accumulated-rel-L1 step skipping with the
    FLUX polynomial rescale; residual reuse of the block-stack delta."""

    COEFFS = [4.98651651e+02, -2.83781631e+02, 5.58554382e+01,
              -3.82021401e+00, 2.64230861e-01]

    def __init__(self, num_inference_steps, rel_l1_thresh):
        self.num_inference_steps = num_inference_steps
        self.step = 0
        self.accumulated_rel_l1_distance = 0.0
        self.previous_modulated_input = None
        self.rel_l1_thresh = rel_l1_thresh
        self.previous_residual = None
        self.previous_hidden_states = None

    def check(self, modulated_inp):
        """modulated_inp: blocks[0].norm1_a output on the embedded tokens
        (models/flux.flux_teacache_modulated). Returns True -> reuse."""
        modulated_inp = np.asarray(modulated_inp, np.float32)
        if self.step == 0 or self.step == self.num_inference_steps - 1:
            should_calc = True
            self.accumulated_rel_l1_distance = 0.0
        else:
            prev = self.previous_modulated_input
            rel = float(np.abs(modulated_inp - prev).mean()
                        / np.abs(prev).mean())
            self.accumulated_rel_l1_distance += float(
                np.polyval(self.COEFFS, rel))
            if self.accumulated_rel_l1_distance < self.rel_l1_thresh:
                should_calc = False
            else:
                should_calc = True
                self.accumulated_rel_l1_distance = 0.0
        self.previous_modulated_input = modulated_inp
        self.step += 1
        if self.step == self.num_inference_steps:
            self.step = 0
        return not should_calc

    def store(self, pre_tokens, post_tokens):
        self.previous_residual = (np.asarray(post_tokens, np.float32)
                                  - np.asarray(pre_tokens, np.float32))

    def update(self, pre_tokens):
        return np.asarray(pre_tokens, np.float32) + self.previous_residual


class FluxImagePipeline:
    """Ref flux_image.py:20-470 (core denoise path)."""

    def __init__(self, dit_params, text_encoder_1_params=None, t5=None,
                 vae_encoder_params=None, vae_decoder_params=None,
                 tokenizer=None, dtype=jnp.bfloat16):
        self.scheduler = FlowMatchScheduler(shift=3.0)
        self.prompter = FluxPrompter(tokenizer)
        cast = lambda p: (None if p is None else
                          jax.tree.map(lambda a: jnp.asarray(a, dtype), p))
        self.dit_params = cast(dit_params)
        self.text_encoder_1_params = cast(text_encoder_1_params)
        self.t5 = t5
        self.vae_encoder_params = cast(vae_encoder_params)
        self.vae_decoder_params = cast(vae_decoder_params)
        self.dtype = dtype

    @staticmethod
    @jax.jit
    def _dit_impl(params, latents, timestep, emb, pooled, guidance,
                  controlnet_res=None, ipadapter=None, entity_prompt_emb=None,
                  entity_masks=None):
        return flux.flux_dit_forward(params, latents, timestep, emb, pooled,
                                     guidance=guidance,
                                     controlnet_res=controlnet_res,
                                     ipadapter=ipadapter,
                                     entity_prompt_emb=entity_prompt_emb,
                                     entity_masks=entity_masks)

    @staticmethod
    @jax.jit
    def _controlnet_impl(params, latents, cond, timestep, emb, pooled,
                         guidance, scale, processor_id_index=None):
        joint, single = flux.flux_controlnet_forward(
            params, latents, cond, timestep, emb, pooled, guidance,
            processor_id_index=processor_id_index)
        return joint * scale, single * scale

    @staticmethod
    @jax.jit
    def _cfg_dit_impl(params, latents, timestep, emb_posi, emb_nega,
                      pooled_posi, pooled_nega, guidance, cfg_scale):
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        pooled = jnp.concatenate([pooled_posi, pooled_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        g = jnp.concatenate([guidance, guidance], axis=0)
        pred = flux.flux_dit_forward(params, sample, t, ctx, pooled, guidance=g)
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    def encode_prompt(self, prompt, t5_sequence_length=512):
        emb, pooled = self.prompter.encode_prompt(
            self.text_encoder_1_params, self.t5, prompt, t5_sequence_length)
        return emb.astype(self.dtype), pooled.astype(self.dtype)

    def vae_output_to_image(self, vae_output):
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=1.0,
                 embedded_guidance=3.5, t5_sequence_length=512,
                 input_image=None, denoising_strength=1.0, height=1024,
                 width=1024, num_inference_steps=30, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None,
                 controlnet_units=(), ipadapter_params=None,
                 ipadapter_image_emb=None, ipadapter_scale=1.0,
                 tiled=False, tile_size=128, tile_stride=64,
                 local_prompts=None, masks=None, mask_scales=None,
                 eligen_entity_prompts=None, eligen_entity_masks=None,
                 enable_eligen_on_negative=False,
                 enable_eligen_inpaint=False, tea_cache_l1_thresh=None):
        """controlnet_units: iterable of (params, conditioning, scale,
        processor_id_index) — conditioning is an annotated PIL image (VAE-
        encoded here, ref prepare_controlnet_input :218-239) or a
        ready (1,16,h/8,w/8) latent. ipadapter_image_emb: (1, 1152) SigLIP
        pooled embedding (host-side transformers). tiled: latent-space
        feathered tiling of the whole denoise forward with per-tile
        ControlNet conditioning slices (ref lets_dance_flux tiled branch,
        flux_image.py:534-559) and tiled VAE."""
        height, width = check_resize_height_width(height, width, factor=16)
        prompt, local_prompts, masks, mask_scales = extend_prompt(
            self.prompter, prompt, local_prompts, masks, mask_scales)
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        vae_tiler = {"tiled": tiled, "tile_size": tile_size,
                     "tile_stride": tile_stride}
        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = jax.jit(flux.flux_vae_encode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_encoder_params, image, **vae_tiler)
            noise = jnp.asarray(
                generate_noise((1, 16, height // 8, width // 8), seed), self.dtype)
            latents = jnp.asarray(self.scheduler.add_noise(
                latents, noise, timestep=self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = jnp.asarray(
                generate_noise((1, 16, height // 8, width // 8), seed), self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, t5_sequence_length)
        emb_posi, pooled_posi = prompt_emb_posi
        prompt_emb_locals = [self.encode_prompt(pl, t5_sequence_length)
                             for pl in (local_prompts or [])]
        if cfg_scale != 1.0:
            if prompt_emb_nega is None:
                prompt_emb_nega = self.encode_prompt(negative_prompt,
                                                     t5_sequence_length)
            emb_nega, pooled_nega = prompt_emb_nega
        guidance = jnp.asarray([embedded_guidance], self.dtype)

        cn_units = []
        for cn_params, cond, scale, proc_idx in controlnet_units:
            if not hasattr(cond, "shape"):
                cond = jax.jit(flux.flux_vae_encode)(
                    self.vae_encoder_params,
                    jnp.asarray(preprocess_image(cond), self.dtype))
            cn_units.append((cn_params, jnp.asarray(cond, self.dtype),
                             float(scale), proc_idx))
        # EliGen entity inputs (ref prepare_entity_inputs :269-280)
        ent_posi = ent_nega = ent_masks = fg_mask = bg_mask = None
        input_latents_np = None
        if eligen_entity_masks is not None:
            from PIL import Image as _Image

            lat_masks = []
            for m in eligen_entity_masks:
                arr = preprocess_image(m.resize(
                    (width // 8, height // 8), resample=_Image.NEAREST))
                lat_masks.append((arr.mean(axis=1, keepdims=True) > 0)
                                 .astype(np.float32))
            ent_masks = jnp.asarray(np.stack(lat_masks, axis=1))  # (1,N,1,h,w)
            ent_posi = jnp.stack(
                [self.encode_prompt(pp, t5_sequence_length)[0]
                 for pp in eligen_entity_prompts], axis=1)  # (1,N,S,4096)
            if enable_eligen_on_negative and cfg_scale != 1.0:
                ent_nega = jnp.repeat(emb_nega[:, None],
                                      ent_masks.shape[1], axis=1)
            if enable_eligen_inpaint:
                assert input_image is not None, \
                    "eligen inpaint needs input_image"
                fg = np.stack(lat_masks).sum(axis=0) > 0  # (1,1,h,w)
                fg_mask = np.repeat(fg, 16, axis=1)
                bg_mask = ~fg_mask
                input_latents_np = np.asarray(
                    jax.jit(flux.flux_vae_encode)(
                        self.vae_encoder_params,
                        jnp.asarray(preprocess_image(input_image),
                                    self.dtype)), np.float32)
        ipadapter = None
        if ipadapter_params is not None and ipadapter_image_emb is not None:
            ip_k, ip_v, _ = jax.jit(
                flux.flux_ipadapter_forward, static_argnames=("scale",))(
                ipadapter_params,
                jnp.asarray(ipadapter_image_emb, self.dtype))
            ipadapter = (ip_k, ip_v, float(ipadapter_scale))

        n_joint = jax.tree.leaves(self.dit_params["blocks"])[0].shape[0]
        n_single = jax.tree.leaves(
            self.dit_params["single_blocks"])[0].shape[0]

        # TeaCache rides the positive branch only (ref :422-433)
        tea_cache = (FluxTeaCache(num_inference_steps, tea_cache_l1_thresh)
                     if tea_cache_l1_thresh is not None else None)
        prelude_jit = jax.jit(flux.flux_dit_prelude)
        blocks_jit = jax.jit(flux.flux_dit_blocks)
        head_jit = jax.jit(flux.flux_dit_head, static_argnames=("h", "w"))
        mod_jit = jax.jit(flux.flux_teacache_modulated)

        def predict_posi_teacache(latents, t):
            h, w = latents.shape[-2:]
            xa, ctx, temb, cos, sin, am = prelude_jit(
                self.dit_params, latents, t, emb_posi, pooled_posi,
                guidance=guidance, entity_prompt_emb=ent_posi,
                entity_masks=ent_masks)
            reuse = tea_cache.check(mod_jit(self.dit_params, xa, temb))
            if reuse:
                xa_out = jnp.asarray(tea_cache.update(xa), xa.dtype)
            else:
                xa_out = blocks_jit(self.dit_params, xa, ctx, temb, cos, sin,
                                    attn_mask=am)
                tea_cache.store(xa, xa_out)
            return head_jit(self.dit_params, xa_out, temb, h=h, w=w)

        def predict(latents, t, cn_units, ent_p=None, ent_m=None):
            controlnet_res = None
            if cn_units:
                joint = single = 0.0
                for cn_params, cond, scale, proc_idx in cn_units:
                    j_, s_ = self._controlnet_impl(
                        cn_params, latents, cond, t, emb_posi, pooled_posi,
                        guidance, scale, processor_id_index=proc_idx)
                    joint, single = joint + j_, single + s_
                controlnet_res = (joint[:n_joint], single[:n_single])
            if cfg_scale != 1.0 and controlnet_res is None \
                    and ipadapter is None and ent_p is None \
                    and ent_nega is None:
                noise_pred = self._cfg_dit_impl(
                    self.dit_params, latents, t, emb_posi, emb_nega,
                    pooled_posi, pooled_nega, guidance, float(cfg_scale))
            elif cfg_scale != 1.0:
                # conditioned extras ride the positive branch only
                # (ref :300-321: enable_controlnet_on_negative off, zero
                # image embedding on the negative IP branch; eligen joins
                # the negative only when enable_eligen_on_negative)
                posi = self._dit_impl(self.dit_params, latents, t, emb_posi,
                                      pooled_posi, guidance,
                                      controlnet_res=controlnet_res,
                                      ipadapter=ipadapter,
                                      entity_prompt_emb=ent_p,
                                      entity_masks=ent_m)
                nega = self._dit_impl(self.dit_params, latents, t, emb_nega,
                                      pooled_nega, guidance,
                                      entity_prompt_emb=ent_nega,
                                      entity_masks=ent_m if ent_nega
                                      is not None else None)
                noise_pred = nega + cfg_scale * (posi - nega)
            else:
                noise_pred = self._dit_impl(self.dit_params, latents, t,
                                            emb_posi, pooled_posi, guidance,
                                            controlnet_res=controlnet_res,
                                            ipadapter=ipadapter,
                                            entity_prompt_emb=ent_p,
                                            entity_masks=ent_m)
            return noise_pred

        for i, timestep in enumerate(np.asarray(self.scheduler.timesteps)):
            t = jnp.asarray([timestep], self.dtype)
            if tea_cache is not None:
                posi = predict_posi_teacache(latents, t)
                if cfg_scale != 1.0:
                    nega = self._dit_impl(self.dit_params, latents, t,
                                          emb_nega, pooled_nega, guidance,
                                          entity_prompt_emb=ent_nega,
                                          entity_masks=ent_masks if ent_nega
                                          is not None else None)
                    noise_pred = nega + cfg_scale * (posi - nega)
                else:
                    noise_pred = posi
            elif local_prompts:
                # region-merged positive branch; locals run without the
                # ControlNet conditioning (ref flux_image.py:430-438 with
                # enable_controlnet_on_local off)
                def cb(pe, cn=()):
                    return np.asarray(self._dit_impl(
                        self.dit_params, latents, t, pe[0], pe[1], guidance,
                        controlnet_res=None, ipadapter=None), np.float32)

                posi = control_noise_via_local_prompts(
                    (emb_posi, pooled_posi), prompt_emb_locals, masks,
                    mask_scales, cb)
                if cfg_scale != 1.0:
                    nega = cb((emb_nega, pooled_nega))
                    noise_pred = nega + float(cfg_scale) * (posi - nega)
                else:
                    noise_pred = posi
            elif tiled:
                # ref lets_dance_flux:534-559 — FastTileWorker over the full
                # per-tile branch (ControlNet conds sliced per tile)
                from ..models.tiler import fast_tiled_forward

                lat_nhwc = jnp.moveaxis(latents, 1, -1)

                def tile_fn(hl, hr, wl, wr):
                    sl = latents[:, :, hl:hr, wl:wr]
                    cn_sl = [(cp, cond[:, :, hl:hr, wl:wr], sc, pi)
                             for cp, cond, sc, pi in cn_units]
                    return jnp.moveaxis(predict(sl, t, cn_sl), 1, -1)

                noise_pred = jnp.moveaxis(
                    fast_tiled_forward(tile_fn, lat_nhwc, tile_size,
                                       tile_stride), -1, 1)
            else:
                noise_pred = predict(latents, t, cn_units, ent_p=ent_posi,
                                     ent_m=ent_masks)
            if enable_eligen_inpaint and input_latents_np is not None:
                # ref inpaint_fusion :248-257 (background_weight=0)
                sig = float(self.scheduler.sigmas[i])
                inp = (np.asarray(latents, np.float32)
                       - input_latents_np) / sig
                noise_pred = np.where(fg_mask,
                                      np.asarray(noise_pred, np.float32), inp)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(noise_pred, np.float32),
                self.scheduler.timesteps[i],
                np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(
            jax.jit(flux.flux_vae_decode, static_argnames=(
                "tiled", "tile_size", "tile_stride"))(
                self.vae_decoder_params, latents, **vae_tiler))
