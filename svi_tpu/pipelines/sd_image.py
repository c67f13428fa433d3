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

import jax
import jax.numpy as jnp
import numpy as np

from ..models import sd
from ..schedulers.ddim import EnhancedDDIMScheduler
from .base import check_resize_height_width, generate_noise, preprocess_image


def tokenize_long_prompt(tokenizer, prompt: str, length: int = 77) -> np.ndarray:
    """Long-prompt chunking (ref base_prompter.py:6-36): tokenize unbounded,
    round up to a multiple of `length`, reshape to (num_sentence, length)."""
    tokenizer.model_max_length = 99999999
    ids = tokenizer(prompt, return_tensors="np").input_ids
    max_length = (ids.shape[1] + length - 1) // length * length
    tokenizer.model_max_length = length
    ids = tokenizer(
        prompt, return_tensors="np", padding="max_length",
        max_length=max_length, truncation=True,
    ).input_ids
    return ids.reshape(ids.shape[1] // length, length)


class SDPrompter:
    """Minimal SDPrompter (ref sd_prompter.py:9-74): CLIP tokenizer + chunked
    encoding, flattened back to (1, n*77, 768). Textual-inversion loading and
    prompt refiners are not implemented."""

    def __init__(self, tokenizer=None):
        self.tokenizer = tokenizer  # a transformers CLIPTokenizer(-Fast)

    def encode_prompt(self, text_encoder_params, prompt: str, clip_skip: int = 1):
        if self.tokenizer is None:
            from transformers import CLIPTokenizerFast

            self.tokenizer = CLIPTokenizerFast.from_pretrained(
                "openai/clip-vit-large-patch14")
        ids = tokenize_long_prompt(self.tokenizer, prompt)
        emb = sd.sd_text_encoder_forward(
            text_encoder_params, jnp.asarray(ids), clip_skip=clip_skip)
        return emb.reshape(1, emb.shape[0] * emb.shape[1], -1)


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
    @jax.jit
    def _cfg_unet_impl(params, latents, timestep, emb_posi, emb_nega, cfg_scale):
        """Batched CFG: posi/nega in ONE UNet pass (the reference runs two
        sequential calls, sd_image.py:163-175); contexts are padded host-side
        to equal chunk counts before the call."""
        sample = jnp.concatenate([latents, latents], axis=0)
        ctx = jnp.concatenate([emb_posi, emb_nega], axis=0)
        t = jnp.concatenate([timestep, timestep], axis=0)
        pred = sd.sd_unet_forward(params, sample, t, ctx)
        posi, nega = jnp.split(pred, 2, axis=0)
        return nega + cfg_scale * (posi - nega)

    def _cfg_unet(self, latents, timestep, emb_posi, emb_nega, cfg_scale):
        return self._cfg_unet_impl(self.unet_params, latents, timestep,
                                   emb_posi, emb_nega, cfg_scale)

    def _decode(self, latents):
        return jax.jit(sd.sd_vae_decode)(self.vae_decoder_params, latents)

    def _encode(self, image):
        return jax.jit(sd.sd_vae_encode)(self.vae_encoder_params, image)

    # -- host-side API -----------------------------------------------------

    def encode_prompt(self, prompt, clip_skip=1):
        return self.prompter.encode_prompt(self.text_encoder_params, prompt,
                                           clip_skip).astype(self.dtype)

    def vae_output_to_image(self, vae_output) -> "np.ndarray":
        from PIL import Image

        arr = np.asarray(vae_output[0], np.float32).transpose(1, 2, 0)
        return Image.fromarray(((arr / 2 + 0.5).clip(0, 1) * 255).astype(np.uint8))

    def __call__(self, prompt, negative_prompt="", cfg_scale=7.5, clip_skip=1,
                 input_image=None, denoising_strength=1.0, height=512,
                 width=512, num_inference_steps=20, seed=None,
                 prompt_emb_posi=None, prompt_emb_nega=None):
        height, width = check_resize_height_width(height, width, factor=64)
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        if input_image is not None:
            image = jnp.asarray(preprocess_image(input_image), self.dtype)
            latents = self._encode(image)
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
            prompt_emb_nega = self.encode_prompt(negative_prompt, clip_skip)
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
            noise_pred = self._cfg_unet(latents, t, prompt_emb_posi,
                                        prompt_emb_nega, float(cfg_scale))
            latents = jnp.asarray(
                self.scheduler.step(np.asarray(noise_pred, np.float32),
                                    timestep,
                                    np.asarray(latents, np.float32)), self.dtype)

        return self.vae_output_to_image(self._decode(latents))
