"""StepVideo text-to-video pipeline.

Behavioral reference: diffsynth/pipelines/step_video.py (StepVideoPipeline
:21-209 — FlowMatchScheduler(sigma_min=0, extra_one_step=True, shift=13,
reverse_sigmas=True, num_train_timesteps=1), latent shape
(1, max(F//17*3, 1), 64, H//16, W//16), CFG over two text branches, tiled
VAE decode) and prompters/stepvideo_prompter.py (dual encoders: the
HunyuanDiT bilingual CLIP-BERT to 77 tokens and the Step1 LLM to 320
tokens; the LLM mask is left-padded with ones over the CLIP tokens).

The CLIP-BERT branch is host-side transformers preprocessing (as in
hunyuan_image); the Step1 LLM runs in JAX (models/stepvideo.step1_encode).
The denoise step is jitted once per latent shape with both CFG branches
batched into one DiT call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import stepvideo as sv
from ..models import stepvideo_vae as svae
from ..schedulers.flow_match import FlowMatchScheduler
from ..prompters.stepvideo_prompter import StepVideoPrompter
from .base import generate_noise, tensor_to_frames


class StepVideoPipeline:
    """Ref step_video.py:21-209."""

    def __init__(self, dit_params, vae_params=None, prompter=None,
                 dtype=jnp.bfloat16, num_heads=None, head_dim=128):
        self.scheduler = FlowMatchScheduler(
            sigma_min=0.0, extra_one_step=True, shift=13.0,
            reverse_sigmas=True, num_train_timesteps=1)
        cast = lambda p: (None if p is None else jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, p))
        self.dit_params = cast(dit_params)
        self.vae_params = vae_params
        self.prompter = prompter
        self.dtype = dtype
        # head_dim is pinned at 128 by the RoPE channel split [64,32,32]
        self.head_dim = head_dim
        self.num_heads = num_heads or (
            dit_params["pos_embed"]["w"].shape[1] // head_dim)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _denoise_step(self, latents, timestep, posi, nega, cfg_scale,
                      rope_tables):
        def run(emb):
            clip, llm, mask = emb
            return sv.stepvideo_dit_forward(
                self.dit_params, latents, llm, mask, timestep,
                encoder_hidden_states_2=clip, rope_tables=rope_tables,
                num_heads=self.num_heads, head_dim=self.head_dim)

        noise_pred_posi = run(posi)
        if nega is None:
            return noise_pred_posi
        noise_pred_nega = run(nega)
        return noise_pred_nega + cfg_scale * (noise_pred_posi
                                              - noise_pred_nega)

    def __call__(self, prompt, negative_prompt="", seed=None, height=544,
                 width=992, num_frames=204, cfg_scale=9.0,
                 num_inference_steps=30, denoising_strength=1.0, tiled=True,
                 tile_size=(34, 34), tile_stride=(16, 16), smooth_scale=0.6,
                 prompt_emb_posi=None, prompt_emb_nega=None,
                 progress_bar_cmd=lambda x: x):
        self.scheduler.set_timesteps(num_inference_steps, denoising_strength)

        # 64 in the flagship config (ref :185); derived so tiny configs work
        latent_ch = self.dit_params["pos_embed"]["w"].shape[0]
        latents = generate_noise(
            (1, max(num_frames // 17 * 3, 1), latent_ch,
             height // 16, width // 16), seed=seed).astype(self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.prompter(prompt)
        posi = tuple(jnp.asarray(e).astype(self.dtype) if i < 2
                     else jnp.asarray(e) for i, e in
                     enumerate(prompt_emb_posi))
        nega = None
        if cfg_scale != 1.0:
            if prompt_emb_nega is None:
                prompt_emb_nega = self.prompter(negative_prompt)
            nega = tuple(jnp.asarray(e).astype(self.dtype) if i < 2
                         else jnp.asarray(e) for i, e in
                         enumerate(prompt_emb_nega))

        f = latents.shape[1]
        rope_tables = tuple(jnp.asarray(t) for t in sv.prepare_stepvideo_rope(
            f, height // 16, width // 16))

        for progress_id, timestep in enumerate(
                progress_bar_cmd(np.asarray(self.scheduler.timesteps))):
            latents = self.scheduler.step(
                self._denoise_step(latents, jnp.float32(timestep), posi,
                                   nega, cfg_scale, rope_tables),
                self.scheduler.timesteps[progress_id], latents)
            latents = latents.astype(self.dtype)

        decode = jax.jit(lambda z: svae.stepvideo_vae_decode_chunk(
            self.vae_params, z))
        if tiled:
            video = svae.stepvideo_vae_tiled_decode(
                self.vae_params, latents.astype(jnp.float32),
                tile_size=tile_size, tile_stride=tile_stride,
                smooth_scale=smooth_scale, decode_chunk_fn=decode)
        else:
            video = svae.stepvideo_vae_decode(
                self.vae_params, latents.astype(jnp.float32),
                smooth_scale=smooth_scale, decode_chunk_fn=decode)
        # (B, T, C, H, W) -> frames (ref tensor2video :147-152)
        return tensor_to_frames(np.asarray(video[0]).transpose(1, 0, 2, 3))
