"""SVI per-clip video generation pipeline (shot/film/tom variants).

Behavioral reference: diffsynth/pipelines/svi_video.py (SVIVideoPipeline :140,
encode_images_adaptive :291-364, _sample_with_regular_video :392-421,
__call__ :423-520, TeaCache :23-72, model_fn_wan_video :74-137).

TPU-first design:
  * the classifier-free-guidance pair (cond/uncond) is BATCHED into one DiT
    forward (batch axis 2) instead of two sequential forwards — same numerics,
    half the kernel launches, and the batch axis is the natural data-parallel
    sharding axis on a mesh;
  * each denoise step runs as one jitted function (DiT forward + CFG combine +
    Euler step), compiled once per (resolution, frames) shape;
  * TeaCache's data-dependent step skipping is decided on host from the
    (timestep-only) modulation tensor, using split prelude/blocks/head jits;
  * conditioning encoders (VAE, CLIP) run in float32 (ref :296-362 — this is
    load-bearing for output fidelity), the DiT in bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip_vision, t5, wan_dit, wan_vae
from ..schedulers.flow_match import FlowMatchScheduler
from ..prompters.wan_prompter import WanPrompter
from . import base


class TeaCache:
    """Step-skipping cache (ref svi_video.py:23-72): a polynomial rescale of
    the relative L1 change of t_mod decides whether to reuse the previous
    block-stack residual. Decisions depend only on the timestep, so one cache
    serves the batched cond/uncond pair."""

    COEFFICIENTS = {
        "Wan2.1-T2V-1.3B": [-5.21862437e04, 9.23041404e03, -5.28275948e02, 1.36987616e01, -4.99875664e-02],
        "Wan2.1-T2V-14B": [-3.03318725e05, 4.90537029e04, -2.65530556e03, 5.87365115e01, -3.15583525e-01],
        "Wan2.1-I2V-14B-480P": [2.57151496e05, -3.54229917e04, 1.40286849e03, -1.35890334e01, 1.32517977e-01],
        "Wan2.1-I2V-14B-720P": [8.10705460e03, 2.13393892e03, -3.72934672e02, 1.66203073e01, -4.17769401e-02],
    }

    def __init__(self, num_inference_steps, rel_l1_thresh, model_id):
        if model_id not in self.COEFFICIENTS:
            supported = ", ".join(self.COEFFICIENTS)
            raise ValueError(
                f"{model_id} is not a supported TeaCache model id. Please choose a valid model id in ({supported})."
            )
        self.num_inference_steps = num_inference_steps
        self.step = 0
        self.accumulated_rel_l1_distance = 0.0
        self.previous_modulated_input = None
        self.rel_l1_thresh = rel_l1_thresh
        self.previous_residual = None
        self.previous_hidden_states = None
        self.coefficients = self.COEFFICIENTS[model_id]
        self.skipped_steps = 0  # observability: block-stack evaluations saved

    def check(self, x_tokens, t_mod) -> bool:
        """Returns True if the block stack can be SKIPPED this step."""
        modulated = np.asarray(t_mod, np.float32)
        if self.step == 0 or self.step == self.num_inference_steps - 1:
            should_calc = True
            self.accumulated_rel_l1_distance = 0.0
        else:
            rescale = np.poly1d(self.coefficients)
            prev = self.previous_modulated_input
            rel = np.abs(modulated - prev).mean() / np.abs(prev).mean()
            self.accumulated_rel_l1_distance += float(rescale(rel))
            if self.accumulated_rel_l1_distance < self.rel_l1_thresh:
                should_calc = False
            else:
                should_calc = True
                self.accumulated_rel_l1_distance = 0.0
        self.previous_modulated_input = modulated
        self.step += 1
        if self.step == self.num_inference_steps:
            self.step = 0
        if should_calc:
            self.previous_hidden_states = x_tokens
        else:
            self.skipped_steps += 1
        return not should_calc

    def store(self, hidden_states):
        self.previous_residual = hidden_states - self.previous_hidden_states
        self.previous_hidden_states = None

    def update(self, hidden_states):
        return hidden_states + self.previous_residual


def model_fn_wan_video(dit, x, timestep, context, clip_feature=None, y=None,
                       add_condition=None, **kwargs):
    """Functional DiT forward matching the reference helper (svi_video.py:74-137).
    `dit` is a (params, cfg) pair."""
    params, cfg = dit
    return wan_dit.forward(params, cfg, x, timestep, context,
                           clip_feature=clip_feature, y=y, add_condition=add_condition)


class SVIVideoPipeline:
    """Per-clip I2V generation with motion-frame conditioning (ref :140)."""

    def __init__(self, device=None, torch_dtype=jnp.bfloat16, tokenizer_path=None,
                 is_test=False, num_train_timesteps=1000):
        self.dtype = torch_dtype
        self.scheduler = FlowMatchScheduler(
            shift=5, sigma_min=0.0, extra_one_step=True,
            num_train_timesteps=num_train_timesteps,
        )
        self.prompter = WanPrompter(tokenizer_path=tokenizer_path)
        self.text_encoder = None  # (params, cfg)
        self.image_encoder = None
        self.dit = None
        self.vae = None
        self.is_test = is_test
        self.use_unified_sequence_parallel = False
        self.sp_mesh = None
        self.height_division_factor = 16
        self.width_division_factor = 16
        # streaming precision of the VAE conv stacks: f32 matches the
        # reference exactly; bf16 halves HBM traffic with f32 accumulation /
        # norms / head (PSNR-gated in tests/test_wan_vae.py)
        self.vae_dtype = jnp.float32
        self._jit_cache = {}

    # -- construction ---------------------------------------------------------

    def fetch_models(self, model_manager):
        res = model_manager.fetch_model("wan_video_text_encoder", require_model_path=True)
        if res is not None:
            self.text_encoder, tokenizer_path = res
            self.prompter.fetch_models(self.text_encoder)
            if tokenizer_path:
                import os

                cand = os.path.join(
                    os.path.dirname(tokenizer_path if isinstance(tokenizer_path, str)
                                    else tokenizer_path[0]),
                    "google/umt5-xxl",
                )
                if os.path.isdir(cand):
                    self.prompter.fetch_tokenizer(cand)
        self.dit = model_manager.fetch_model("wan_video_dit")
        self.vae = model_manager.fetch_model("wan_video_vae")
        self.image_encoder = model_manager.fetch_model("wan_video_image_encoder")
        return self

    @staticmethod
    def from_model_manager(model_manager, torch_dtype=None, device=None, use_usp=False,
                           is_test=False, num_train_timesteps=1000):
        pipe = SVIVideoPipeline(
            device=device, torch_dtype=torch_dtype or model_manager.dtype,
            is_test=is_test, num_train_timesteps=num_train_timesteps,
        )
        pipe.fetch_models(model_manager)
        if use_usp:
            from ..parallel.mesh import make_sp_mesh

            pipe.sp_mesh = make_sp_mesh()
            pipe.use_unified_sequence_parallel = True
        return pipe

    def enable_vram_management(self, num_persistent_param_in_dit=None):
        """Layer-offload budgeting is a CUDA-VRAM workaround (ref :156-241);
        on TPU the weights live in HBM and XLA manages transfers — no-op kept
        for API parity."""
        self.vram_budget = num_persistent_param_in_dit

    def denoising_model(self):
        return self.dit

    # -- conditioning ---------------------------------------------------------

    def encode_prompt(self, prompt, positive=True):
        emb = self.prompter.encode_prompt(prompt, positive=positive)
        return {"context": emb}

    def encode_images_adaptive(self, first_frames, random_ref_frame, num_frames,
                               height, width, use_first_aug=False, ref_pad_cfg=False,
                               ref_pad_num=None):
        """Build `y` = (4-ch temporal mask ‖ 16-ch VAE latent of
        [motion frames ‖ padding]) + CLIP features (ref :291-364). All
        conditioning encodes run in float32."""
        from PIL import Image

        if not isinstance(first_frames, (list, tuple)):
            first_frames = [first_frames]
        num_condition_frames = len(first_frames)
        remaining = num_frames - num_condition_frames

        def prep(img, aug=False):
            if isinstance(img, np.ndarray):
                img = Image.fromarray(img)
            return base.preprocess_image(img.resize((width, height)), use_aug=aug)  # (1,3,H,W)

        ref_frame = prep(random_ref_frame)
        first = prep(first_frames[0])  # CLIP input is never augmented (ref :326)
        clip_params, clip_cfg = self.image_encoder
        clip_context = self._jit(
            "clip_encode",
            lambda p, f: clip_vision.encode_image(p, clip_cfg, f),
        )(clip_params, jnp.asarray(first, jnp.float32))

        # temporal mask (ref :319-326)
        lh, lw = height // 8, width // 8
        msk = np.ones((1, num_frames, lh, lw), np.float32)
        if ref_pad_cfg:
            msk[:, num_condition_frames:] = 0
        else:
            msk[:, 1:] = 0
        msk = np.concatenate([np.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
        msk = msk.reshape(1, msk.shape[1] // 4, 4, lh, lw)
        msk = np.transpose(msk, (0, 2, 1, 3, 4))[0]  # (4, T_lat, lh, lw)

        # VAE input: condition frames ‖ padding (ref :329-349). The padded
        # 81-frame fp32 video is ~390MB — building it ON DEVICE from the few
        # real frames avoids a multi-second host->device transfer. Train-time
        # first-frame augmentation applies HERE (ref :331-334): the VAE
        # condition frames only, never the CLIP input or the anchor frame.
        cond = np.concatenate(
            [prep(f, aug=use_first_aug) for f in first_frames], axis=0
        )  # (n,3,H,W)
        cond = np.transpose(cond, (1, 0, 2, 3))  # (3, n, H, W)
        vae_params, vae_cfg = self.vae

        def build_and_encode(p, cond_d, ref_d, msk_d):
            ref_t = jnp.transpose(ref_d, (1, 0, 2, 3))  # (3,1,H,W)
            if ref_pad_num == 0:
                pad = jnp.zeros((3, remaining, height, width), jnp.float32)
            elif ref_pad_num is not None and ref_pad_num > 0:
                k = min(ref_pad_num, remaining)
                pieces = [jnp.repeat(ref_t, k, axis=1)]
                if remaining > ref_pad_num:
                    pieces.append(jnp.zeros((3, remaining - ref_pad_num, height, width), jnp.float32))
                pad = jnp.concatenate(pieces, axis=1)
            elif ref_pad_num == -1:
                pad = jnp.repeat(ref_t, remaining, axis=1)
            else:
                raise ValueError(f"ref_pad_num must be set (got {ref_pad_num})")
            vae_input = jnp.concatenate([cond_d, pad], axis=1)[None]
            y_lat = wan_vae.encode(p, vae_cfg, vae_input, compute_dtype=self.vae_dtype)
            return jnp.concatenate([msk_d[None], y_lat.astype(jnp.float32)], axis=1)

        y = self._jit(
            ("vae_encode_cond", num_condition_frames, int(ref_pad_num), num_frames,
             height, width, str(self.vae_dtype)),
            build_and_encode,
        )(vae_params, jnp.asarray(cond, jnp.float32), jnp.asarray(ref_frame, jnp.float32),
          jnp.asarray(msk))
        return {
            "clip_feature": clip_context.astype(self.dtype),
            "y": y.astype(self.dtype),
        }

    # -- video <-> latent -------------------------------------------------------

    def encode_video(self, input_video, tiled=True, tile_size=(34, 34), tile_stride=(18, 16)):
        vae_params, vae_cfg = self.vae
        v = jnp.asarray(input_video, jnp.float32)
        if tiled:
            lat = wan_vae.tiled_encode(
                vae_params, vae_cfg, v,
                tile_size=(tile_size[0] * 8, tile_size[1] * 8),
                tile_stride=(tile_stride[0] * 8, tile_stride[1] * 8),
                compute_dtype=self.vae_dtype,
            )
        else:
            lat = self._jit(
                ("vae_encode", str(self.vae_dtype)),
                lambda p, x: wan_vae.encode(p, vae_cfg, x, compute_dtype=self.vae_dtype),
            )(vae_params, v)
        return lat.astype(self.dtype)

    def decode_video(self, latents, tiled=True, tile_size=(34, 34), tile_stride=(18, 16)):
        vae_params, vae_cfg = self.vae
        z = jnp.asarray(latents, jnp.float32)
        if tiled:
            return wan_vae.tiled_decode(vae_params, vae_cfg, z, tile_size=tile_size,
                                        tile_stride=tile_stride, compute_dtype=self.vae_dtype)
        return self._jit(
            ("vae_decode", str(self.vae_dtype)),
            lambda p, x: wan_vae.decode(p, vae_cfg, x, compute_dtype=self.vae_dtype),
        )(vae_params, z)

    # -- denoising --------------------------------------------------------------

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _dit_forward(self, dit_params, x, timestep, ctx, clip_feature, y,
                     add_condition=None):
        """DiT forward dispatch: sequence-parallel over the mesh when USP is
        enabled (the reference's use_usp monkey-patching, svi_video.py:265-273),
        single-device otherwise."""
        params_cfg = self.dit[1]
        if self.use_unified_sequence_parallel and self.sp_mesh is not None:
            from ..parallel.sequence_parallel import forward_sp

            return forward_sp(
                dit_params, params_cfg, x, timestep, ctx,
                clip_feature=clip_feature, y=y, add_condition=add_condition,
                mesh=self.sp_mesh,
            )
        return wan_dit.forward(
            dit_params, params_cfg, x, timestep, ctx,
            clip_feature=clip_feature, y=y, add_condition=add_condition,
        )

    def _denoise_step_fn(self):
        params_cfg = self.dit[1]

        def step_fn(dit_params, latents, timestep, sigma, sigma_next,
                    ctx2, clip_feature, y, cfg_scale, add_condition2=None):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            clip2 = None if clip_feature is None else jnp.concatenate([clip_feature] * 2, axis=0)
            y2 = None if y is None else jnp.concatenate([y] * 2, axis=0)
            noise_pred = self._dit_forward(
                dit_params, x2, timestep, ctx2, clip2, y2, add_condition2,
            )
            pred_cond, pred_uncond = noise_pred[:b], noise_pred[b:]
            pred = pred_uncond + cfg_scale * (pred_cond - pred_uncond)
            out = latents.astype(jnp.float32) + pred.astype(jnp.float32) * (sigma_next - sigma)
            return out.astype(latents.dtype)

        return self._jit("denoise_step", step_fn)

    def _denoise_step_nocfg_fn(self):
        params_cfg = self.dit[1]

        def step_fn(dit_params, latents, timestep, sigma, sigma_next,
                    ctx, clip_feature, y, add_condition=None):
            pred = self._dit_forward(
                dit_params, latents, timestep, ctx, clip_feature, y, add_condition,
            )
            out = latents.astype(jnp.float32) + pred.astype(jnp.float32) * (sigma_next - sigma)
            return out.astype(latents.dtype)

        return self._jit("denoise_step_nocfg", step_fn)

    def _sample(self, latents, ctx_pos, ctx_neg, image_emb, cfg_scale,
                tea_cache_posi=None, tea_cache_nega=None, add_condition=None,
                progress=None):
        """CFG denoise loop (ref _sample_with_regular_video :392-421)."""
        dit_params, dit_cfg = self.dit
        sigmas = np.asarray(self.scheduler.sigmas, np.float32)
        timesteps = np.asarray(self.scheduler.timesteps, np.float32)
        n = len(timesteps)
        clip_feature = image_emb.get("clip_feature")
        y = image_emb.get("y")

        # add_condition per CFG branch: a (cond, uncond) pair (SVI-Dance keeps
        # pose in the uncond branch when cond_wo_pose, svi_video_dance.py:423-430)
        if isinstance(add_condition, tuple):
            ac_cond, ac_uncond = add_condition
        else:
            ac_cond, ac_uncond = add_condition, None

        use_teacache = tea_cache_posi is not None and tea_cache_posi.get("tea_cache") is not None
        if not use_teacache:
            if cfg_scale != 1.0:
                ctx2 = jnp.concatenate([ctx_pos, ctx_neg], axis=0)
                if ac_cond is not None:
                    ac2 = jnp.concatenate(
                        [ac_cond, ac_uncond if ac_uncond is not None else jnp.zeros_like(ac_cond)],
                        axis=0,
                    )
                else:
                    ac2 = None
                # per-step dispatch: measured equal to a fused-fori-loop
                # variant in steady state, but compiles ~5x faster (the
                # fused variant was removed in round 5 as dead code)
                step = self._denoise_step_fn()
                for i in range(n):
                    latents = step(
                        dit_params, latents, jnp.asarray([timesteps[i]]),
                        sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0),
                        ctx2, clip_feature, y, np.float32(cfg_scale),
                        ac2,
                    )
                    if progress:
                        progress(i, n)
            else:
                step = self._denoise_step_nocfg_fn()
                for i in range(n):
                    latents = step(
                        dit_params, latents, jnp.asarray([timesteps[i]]),
                        sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0),
                        ctx_pos, clip_feature, y, ac_cond,
                    )
                    if progress:
                        progress(i, n)
            return latents

        # TeaCache path: split prelude / blocks / head with host-side skipping.
        tc = tea_cache_posi["tea_cache"]
        pt, ph, pw = dit_cfg.patch_size
        _, _, lf, lh, lw = latents.shape
        grid = (lf // pt, lh // ph, lw // pw)  # static: computed on host
        prelude = self._jit(
            ("tc_prelude", grid),
            lambda p, x, t, c, cf, y_, ac: wan_dit.forward_prelude(
                p, dit_cfg, x, t, c, clip_feature=cf, y=y_, add_condition=ac
            )[:4],
        )
        n_img = (clip_feature.shape[1]
                 if (dit_cfg.has_image_input and clip_feature is not None) else 257)
        blocks = self._jit(
            ("tc_blocks", grid, n_img),
            lambda p, tok, c, tm: wan_dit.forward_blocks(
                p, dit_cfg, tok, c, tm, grid, num_img_tokens=n_img),
        )
        head = self._jit(
            ("tc_head", grid),
            lambda p, tok, t: wan_dit.forward_head(p, dit_cfg, tok, t, grid),
        )
        ctx2 = jnp.concatenate([ctx_pos, ctx_neg], axis=0) if cfg_scale != 1.0 else ctx_pos
        b = latents.shape[0]
        nb = ctx2.shape[0] // ctx_pos.shape[0]

        for i in range(n):
            xin = jnp.concatenate([latents] * nb, axis=0)
            clip_in = None if clip_feature is None else jnp.concatenate([clip_feature] * nb, axis=0)
            y_in = None if y is None else jnp.concatenate([y] * nb, axis=0)
            if ac_cond is None:
                ac_in = None
            elif nb == 1:
                ac_in = ac_cond
            else:
                ac_in = jnp.concatenate(
                    [ac_cond, ac_uncond if ac_uncond is not None else jnp.zeros_like(ac_cond)],
                    axis=0,
                )
            tokens, ctx_emb, t_emb, t_mod = prelude(
                dit_params, xin, jnp.asarray([timesteps[i]]), ctx2, clip_in, y_in, ac_in
            )
            skip = tc.check(tokens, t_mod)
            if skip:
                tokens = tc.update(tokens)
            else:
                tokens = blocks(dit_params, tokens, ctx_emb, t_mod)
                tc.store(tokens)
            out = head(dit_params, tokens, t_emb)
            if cfg_scale != 1.0:
                pred = out[b:] + cfg_scale * (out[:b] - out[b:])
            else:
                pred = out
            sig, sig_next = sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0)
            latents = (latents.astype(jnp.float32) + pred.astype(jnp.float32) * (sig_next - sig)).astype(latents.dtype)
            if progress:
                progress(i, n)
        return latents

    # -- main entry ---------------------------------------------------------------

    def __call__(
        self,
        prompt=None,
        negative_prompt="",
        input_image=None,
        input_video=None,
        denoising_strength=1.0,
        seed=None,
        rand_device="cpu",
        height=480,
        width=832,
        num_frames=81,
        cfg_scale=5.0,
        num_inference_steps=50,
        sigma_shift=5.0,
        tiled=True,
        tile_size=(30, 52),
        tile_stride=(15, 26),
        tea_cache_l1_thresh=None,
        tea_cache_model_id="",
        progress_bar_cmd=None,
        random_ref_frame=None,
        use_controlnet=False,
        args=None,
        last_latent=None,
        prompt_emb_posi=None,
        prompt_emb_nega=None,
        ref_pad_cfg=None,
        ref_pad_num=None,
        return_latents=False,
        add_condition=None,
        y_extra=None,
    ):
        """Generate one clip (ref __call__ :423-520). Returns a list of PIL
        frames; with args.sequential_cfg == 'latent', returns (frames, last
        latent channel) like the reference (:517-519)."""
        height, width = base.check_resize_height_width(height, width)
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        if isinstance(cfg_scale, dict):  # drivers pass dict(text=...) (test_svi.py:460)
            cfg_scale = cfg_scale["text"]

        if ref_pad_cfg is None:
            ref_pad_cfg = getattr(args, "ref_pad_cfg", False) if args is not None else False
        if ref_pad_num is None:
            ref_pad_num = getattr(args, "ref_pad_num", None) if args is not None else None

        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size, "tile_stride": tile_stride}
        self.scheduler.set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength, shift=sigma_shift
        )

        lt = (num_frames - 1) // 4 + 1
        z_dim = self.vae[1].z_dim if self.vae is not None else 16
        noise_np = base.generate_noise((1, z_dim, lt, height // 8, width // 8), seed=seed)
        noise = jnp.asarray(noise_np, self.dtype)
        if input_video is not None:
            frames_chw = np.concatenate(
                [base.preprocess_image(f) for f in input_video], axis=0
            )  # (T, 3, H, W)
            vid = np.transpose(frames_chw, (1, 0, 2, 3))[None]  # (1, 3, T, H, W)
            latents = self.encode_video(vid, **tiler_kwargs)
            from ..schedulers import flow_match as fm

            latents = fm.add_noise(
                self.scheduler.schedule, latents, noise, float(self.scheduler.timesteps[0])
            )
        else:
            latents = noise

        # prompts
        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, positive=True)["context"]
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, positive=False)["context"]
        ctx_pos = jnp.asarray(prompt_emb_posi, self.dtype)
        ctx_neg = jnp.asarray(prompt_emb_nega, self.dtype)

        # image conditioning
        if input_image is not None and self.image_encoder is not None:
            if not isinstance(input_image, list):
                input_image = [input_image]
            ref_img = random_ref_frame
            if hasattr(ref_img, "cpu"):
                ref_img = ref_img.cpu().numpy()
            image_emb = self.encode_images_adaptive(
                input_image, ref_img, num_frames, height, width,
                use_first_aug=False, ref_pad_cfg=ref_pad_cfg, ref_pad_num=ref_pad_num,
            )
            if last_latent is not None:
                image_emb["y"] = image_emb["y"].at[:, 0].set(jnp.asarray(last_latent, self.dtype))
            if y_extra is not None:
                # additive conditioning on the 20-channel y grid (UniAnimate's
                # randomref pose embedding, ref wan_video.py:732-734)
                image_emb["y"] = image_emb["y"] + jnp.asarray(y_extra, self.dtype)
        else:
            image_emb = {}

        tea_cache_posi = {
            "tea_cache": TeaCache(num_inference_steps, rel_l1_thresh=tea_cache_l1_thresh, model_id=tea_cache_model_id)
            if tea_cache_l1_thresh is not None else None
        }
        tea_cache_nega = {
            "tea_cache": TeaCache(num_inference_steps, rel_l1_thresh=tea_cache_l1_thresh, model_id=tea_cache_model_id)
            if tea_cache_l1_thresh is not None else None
        }

        latents = self._sample(
            latents, ctx_pos, ctx_neg, image_emb, {"text": cfg_scale}.get("text"),
            tea_cache_posi=tea_cache_posi, tea_cache_nega=tea_cache_nega,
            add_condition=add_condition,
        )

        # decode + uint8 conversion on device (4x smaller device->host transfer)
        if tiled:
            frames_dev = self.decode_video(latents, **tiler_kwargs)
            frames_u8 = jnp.clip((frames_dev.astype(jnp.float32) + 1) * 127.5, 0, 255).astype(jnp.uint8)
        else:
            vae_params, vae_cfg = self.vae

            def dec_u8(p, z):
                v = wan_vae.decode(p, vae_cfg, jnp.asarray(z, jnp.float32),
                                   compute_dtype=self.vae_dtype)
                return jnp.clip((v + 1) * 127.5, 0, 255).astype(jnp.uint8)

            frames_u8 = self._jit(("vae_decode_u8", str(self.vae_dtype)), dec_u8)(vae_params, latents)
        frames = base.frames_from_uint8(np.asarray(frames_u8[0]))
        if return_latents:
            return frames, latents
        if args is not None and getattr(args, "sequential_cfg", None) == "latent":
            return frames, latents[:, -1, ...]
        return frames
