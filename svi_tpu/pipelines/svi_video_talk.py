"""SVI-Talk: audio-conditioned per-clip generation.

Behavioral reference: diffsynth/pipelines/svi_video_talk.py
(SVITalkVideoPipeline :157, get_audio_embedding :412-430, preprocess_audio
:432-446, 3-branch CFG _sample_with_multitalk :448-466,
model_fn_wan_talk_video :83-155).

TPU-first: the THREE CFG branches (cond / drop-text / uncond-null-audio) are
batched into ONE DiT forward (batch axis 3); the per-frame audio cross-attn
runs inside every block (models/wan_dit audio path). wav2vec2 feature
extraction runs host-side (utils/audio.py) from a local checkpoint, or the
caller passes precomputed embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wan_dit
from ..utils import audio as audio_utils
from .svi_video import SVIVideoPipeline, TeaCache
from . import base


class SVITalkVideoPipeline(SVIVideoPipeline):
    def __init__(self, *args, wav2vec_path=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.wav2vec = None
        if wav2vec_path is not None:
            self.wav2vec = audio_utils.load_wav2vec(wav2vec_path)
        # whole-file embedding cache: {audio_path: (s, 12, 768)}. The
        # reference recomputes the full wav2vec pass every clip
        # (ref svi_video_talk.py:548, flagged in SURVEY §3.3); caching makes
        # multi-clip runs embed each file exactly once.
        self._audio_emb_cache = {}

    @staticmethod
    def from_model_manager(model_manager, torch_dtype=None, device=None, use_usp=False,
                           is_test=False, num_train_timesteps=1000, wav2vec_path=None):
        pipe = SVITalkVideoPipeline(
            device=device, torch_dtype=torch_dtype or model_manager.dtype,
            is_test=is_test, num_train_timesteps=num_train_timesteps,
            wav2vec_path=wav2vec_path,
        )
        pipe.fetch_models(model_manager)
        return pipe

    # -- audio ------------------------------------------------------------------

    def get_audio_embedding(self, audio_path, num_frames, audio_start_idx=0):
        """audio file -> per-frame ±2-window embeddings (1, nf, 5, 12, 768)
        (ref :412-430). The whole-file wav2vec embedding is computed once per
        path and cached; per-clip calls only re-slice windows."""
        emb = self._audio_emb_cache.get(audio_path)
        if emb is None:
            assert self.wav2vec is not None, "pass wav2vec_path or precomputed audio_embed"
            fe, model = self.wav2vec
            speech = audio_utils.load_audio(audio_path)
            emb = audio_utils.wav2vec_embedding(speech, fe, model)
            self._audio_emb_cache[audio_path] = emb
        return audio_utils.slice_audio_windows(emb, num_frames, audio_start_idx)

    def preprocess_audio(self, audio_embed, audio_window=5, vae_scale=4):
        first, latter = audio_utils.regroup_audio_windows(
            np.asarray(audio_embed, np.float32), audio_window, vae_scale
        )
        return (jnp.asarray(first, self.dtype), jnp.asarray(latter, self.dtype))

    # -- denoising ----------------------------------------------------------------

    def _talk_step_fn(self):
        dit_cfg = self.dit[1]

        def step_fn(dit_params, latents, timestep, sigma, sigma_next,
                    ctx3, clip_feature, y, audio_first3, audio_vf3,
                    cfg_text, cfg_audio):
            b = latents.shape[0]
            x3 = jnp.concatenate([latents] * 3, axis=0)
            clip3 = None if clip_feature is None else jnp.concatenate([clip_feature] * 3, axis=0)
            y3 = None if y is None else jnp.concatenate([y] * 3, axis=0)
            pred = wan_dit.forward(
                dit_params, dit_cfg, x3, timestep, ctx3,
                clip_feature=clip3, y=y3,
                audio_embed_tuple=(audio_first3, audio_vf3),
            )
            cond, drop_text, uncond = pred[:b], pred[b : 2 * b], pred[2 * b :]
            # ref :460-462: uncond + cfg_text*(cond - drop_text) + cfg_audio*(drop_text - uncond)
            noise_pred = (
                uncond.astype(jnp.float32)
                + cfg_text * (cond.astype(jnp.float32) - drop_text.astype(jnp.float32))
                + cfg_audio * (drop_text.astype(jnp.float32) - uncond.astype(jnp.float32))
            )
            out = latents.astype(jnp.float32) + noise_pred * (sigma_next - sigma)
            return out.astype(latents.dtype)

        return self._jit("talk_step", step_fn)

    def _sample_talk(self, latents, ctx_pos, ctx_neg, image_emb, cfg_text, cfg_audio,
                     audio_tuple, audio_tuple_null, tea_cache=None):
        dit_params, dit_cfg = self.dit
        sigmas = np.asarray(self.scheduler.sigmas, np.float32)
        timesteps = np.asarray(self.scheduler.timesteps, np.float32)
        n = len(timesteps)
        clip_feature = image_emb.get("clip_feature")
        y = image_emb.get("y")
        # branch order: cond(audio), drop_text(audio), uncond(null audio)
        ctx3 = jnp.concatenate([ctx_pos, ctx_neg, ctx_neg], axis=0)
        audio_first3 = jnp.concatenate(
            [audio_tuple[0], audio_tuple[0], audio_tuple_null[0]], axis=0
        )
        audio_vf3 = jnp.concatenate(
            [audio_tuple[1], audio_tuple[1], audio_tuple_null[1]], axis=0
        )
        if tea_cache is None:
            step = self._talk_step_fn()
            for i in range(n):
                latents = step(
                    dit_params, latents, jnp.asarray([timesteps[i]]),
                    sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0),
                    ctx3, clip_feature, y, audio_first3, audio_vf3,
                    np.float32(cfg_text), np.float32(cfg_audio),
                )
            return latents

        # TeaCache path (ref model_fn_wan_talk_video svi_video_talk.py:127-148,
        # threaded through all three CFG branches at :455-462). The skip
        # decision depends only on t_mod (timestep-only), and the stored
        # residual is per-batch-row — so ONE cache serves the batched 3-branch
        # forward, unlike the reference, which runs three sequential forwards
        # with tea_cache_posi on the cond branch and tea_cache_nega shared by
        # the other two.
        pt, ph, pw = dit_cfg.patch_size
        _, _, lf, lh, lw = latents.shape
        grid = (lf // pt, lh // ph, lw // pw)
        prelude = self._jit(
            ("tc_prelude", grid),
            lambda p, x, t, c, cf, y_, ac: wan_dit.forward_prelude(
                p, dit_cfg, x, t, c, clip_feature=cf, y=y_, add_condition=ac
            )[:4],
        )
        n_img = (clip_feature.shape[1]
                 if (dit_cfg.has_image_input and clip_feature is not None) else 257)
        blocks = self._jit(
            ("talk_tc_blocks", grid, n_img),
            lambda p, tok, c, tm, ae: wan_dit.forward_blocks(
                p, dit_cfg, tok, c, tm, grid, audio_embed=ae, num_img_tokens=n_img,
            ),
        )
        head = self._jit(
            ("tc_head", grid),
            lambda p, tok, t: wan_dit.forward_head(p, dit_cfg, tok, t, grid),
        )
        # audio projection is timestep-independent: compute once per clip
        audio_proj = self._jit(
            "talk_audio_proj",
            lambda p, a, b_: wan_dit.audio_proj_forward(p, dit_cfg, a, b_),
        )
        ae3 = audio_proj(dit_params, audio_first3, audio_vf3)
        b = latents.shape[0]
        clip3 = None if clip_feature is None else jnp.concatenate([clip_feature] * 3, axis=0)
        y3 = None if y is None else jnp.concatenate([y] * 3, axis=0)
        for i in range(n):
            xin = jnp.concatenate([latents] * 3, axis=0)
            tokens, ctx_emb, t_emb, t_mod = prelude(
                dit_params, xin, jnp.asarray([timesteps[i]]), ctx3, clip3, y3, None
            )
            if tea_cache.check(tokens, t_mod):
                tokens = tea_cache.update(tokens)
            else:
                tokens = blocks(dit_params, tokens, ctx_emb, t_mod, ae3)
                tea_cache.store(tokens)
            out = head(dit_params, tokens, t_emb)
            cond, drop_text, uncond = out[:b], out[b : 2 * b], out[2 * b :]
            noise_pred = (
                uncond.astype(jnp.float32)
                + cfg_text * (cond.astype(jnp.float32) - drop_text.astype(jnp.float32))
                + cfg_audio * (drop_text.astype(jnp.float32) - uncond.astype(jnp.float32))
            )
            sig = sigmas[i]
            sig_next = sigmas[i + 1] if i + 1 < n else np.float32(0.0)
            latents = (
                latents.astype(jnp.float32) + noise_pred * (sig_next - sig)
            ).astype(latents.dtype)
        return latents

    # -- entry ----------------------------------------------------------------------

    def __call__(self, *args, audio_path=None, audio_embed=None, audio_start_idx=0,
                 cfg_scale=None, num_frames=81, **kwargs):
        """Adds over the base pipeline: audio_path or precomputed audio_embed
        (1, nf, 5, 12, 768) windows; cfg_scale dict(text=..., audio=...);
        3-forward CFG per step (ref __call__ :468-564)."""
        if isinstance(cfg_scale, dict):
            cfg_text = cfg_scale.get("text", 5.0)
            cfg_audio = cfg_scale.get("audio", cfg_text)
        else:
            cfg_text = cfg_audio = cfg_scale if cfg_scale is not None else 5.0

        if audio_embed is None and audio_path is not None:
            audio_embed = self.get_audio_embedding(audio_path, num_frames, audio_start_idx)
        if audio_embed is None:
            # no audio: plain SVI sampling
            return super().__call__(*args, cfg_scale=cfg_text, num_frames=num_frames, **kwargs)

        audio_embed = np.asarray(audio_embed, np.float32)
        audio_tuple = self.preprocess_audio(audio_embed)
        audio_tuple_null = self.preprocess_audio(np.zeros_like(audio_embed))

        self._audio_state = (audio_tuple, audio_tuple_null, cfg_text, cfg_audio)
        try:
            return super().__call__(*args, cfg_scale=cfg_text, num_frames=num_frames, **kwargs)
        finally:
            self._audio_state = None

    def _sample(self, latents, ctx_pos, ctx_neg, image_emb, cfg_scale, **kw):
        state = getattr(self, "_audio_state", None)
        if state is None:
            return super()._sample(latents, ctx_pos, ctx_neg, image_emb, cfg_scale, **kw)
        audio_tuple, audio_tuple_null, cfg_text, cfg_audio = state
        tc_posi = kw.get("tea_cache_posi")
        tea_cache = tc_posi.get("tea_cache") if tc_posi else None
        return self._sample_talk(
            latents, ctx_pos, ctx_neg, image_emb, cfg_text, cfg_audio,
            audio_tuple, audio_tuple_null, tea_cache=tea_cache,
        )
