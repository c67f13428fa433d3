"""Plain Wan 2.1 video pipeline family (upstream T2V/I2V + UniAnimate).

Behavioral reference: diffsynth/pipelines/wan_video.py —
  * WanVideoPipeline (:25-287): the pipeline SVI derives from. Standard I2V
    conditioning is the ref_pad_num=0 case of SVI's encode_images_adaptive
    (first frame + zero padding, mask only on frame 0); T2V omits
    input_image.
  * WanUniAnimateVideoPipeline (:411-759): pose-driven animation — the
    dwpose_embedding conv stack adds pose tokens to the patch tokens (the
    machinery SVI-Dance derives from) and randomref_embedding_pose adds the
    reference pose to the 20-channel y grid.
  * WanUniAnimateLongVideoPipeline (:800-1204): long pose videos denoised in
    overlapping context windows (context_scheduler :769-797) with per-window
    first-2-latent-frame carry and counter-averaged aggregation.
  * WanRepalceAnyoneVideoPipeline (:1207-1583): masked-region replacement —
    the conditional branch's input latents are augmented with
    learn_in_embedding(masked video ‖ mask) + inpaint_embedding(VAE(masked)).
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

from ..models import pose_embedding, unianimate
from .svi_video import SVIVideoPipeline


class WanVideoPipeline(SVIVideoPipeline):
    @staticmethod
    def from_model_manager(model_manager, torch_dtype=None, device=None, use_usp=False,
                           is_test=False, num_train_timesteps=1000):
        pipe = WanVideoPipeline(
            device=device, torch_dtype=torch_dtype or model_manager.dtype,
            is_test=is_test, num_train_timesteps=num_train_timesteps,
        )
        pipe.fetch_models(model_manager)
        if use_usp:
            from ..parallel.mesh import make_sp_mesh

            pipe.sp_mesh = make_sp_mesh()
            pipe.use_unified_sequence_parallel = True
        return pipe

    def __call__(self, *args, ref_pad_num=None, random_ref_frame=None,
                 input_image=None, **kwargs):
        if input_image is not None and random_ref_frame is None:
            # upstream I2V has no anchor frame; reuse the input image
            import numpy as np

            img = input_image[0] if isinstance(input_image, list) else input_image
            random_ref_frame = np.array(img)
        return super().__call__(
            *args,
            input_image=input_image,
            random_ref_frame=random_ref_frame,
            ref_pad_num=0 if ref_pad_num is None else ref_pad_num,
            **kwargs,
        )


# ---------------------------------------------------------------------------
# UniAnimate family (ref wan_video.py:411-1583)
# ---------------------------------------------------------------------------


def ordered_halving(val: int) -> float:
    """Bit-reversed fraction in [0,1) (ref :762-767)."""
    bin_str = f"{val:064b}"
    return int(bin_str[::-1], 2) / (1 << 64)


def context_scheduler(step, num_steps, num_frames, context_size,
                      context_stride=3, context_overlap=4, closed_loop=False):
    """Overlapping context-window schedule over latent frames (ref :769-797)."""
    if num_frames <= context_size:
        yield list(range(num_frames))
        return
    context_stride = min(
        context_stride, int(np.ceil(np.log2(num_frames / context_size))) + 1
    )
    for context_step in 1 << np.arange(context_stride):
        pad = int(round(num_frames * ordered_halving(step)))
        for j in range(
            int(ordered_halving(step) * context_step) + pad,
            num_frames + pad + (0 if closed_loop else -context_overlap),
            (context_size * context_step - context_overlap),
        ):
            yield [
                e % num_frames
                for e in range(j, j + context_size * context_step, context_step)
            ]


class WanUniAnimateVideoPipeline(SVIVideoPipeline):
    """Pose-driven I2V animation (ref :411-759): dwpose tokens added to the
    patch tokens (conditional CFG branch only) + reference pose added to y."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.dwpose_embedding = None
        self.randomref_embedding_pose = None

    def fetch_models(self, model_manager):
        super().fetch_models(model_manager)
        side = model_manager.state_dict_new_module
        dw = {k: v for k, v in side.items() if "dwpose_embedding" in k}
        if dw:
            self.dwpose_embedding = pose_embedding.params_from_torch_state_dict(dw)
        rr = {k: v for k, v in side.items() if "randomref_embedding_pose" in k}
        if rr:
            self.randomref_embedding_pose = unianimate.randomref_from_torch(rr)
        return self

    @staticmethod
    def from_model_manager(model_manager, torch_dtype=None, device=None, use_usp=False,
                           is_test=False, num_train_timesteps=1000):
        pipe = WanUniAnimateVideoPipeline(
            device=device, torch_dtype=torch_dtype or model_manager.dtype,
            is_test=is_test, num_train_timesteps=num_train_timesteps,
        )
        pipe.fetch_models(model_manager)
        if use_usp:
            from ..parallel.mesh import make_sp_mesh

            pipe.sp_mesh = make_sp_mesh()
            pipe.use_unified_sequence_parallel = True
        return pipe

    def _pose_inputs(self, dwpose_data, random_ref_dwpose):
        """pose video (3,F,H,W) [0,255] -> add_condition tokens; reference
        pose (H,W,3) [0,255] -> additive y term (ref :728-734)."""
        if hasattr(dwpose_data, "cpu"):
            dwpose_data = dwpose_data.cpu().numpy()
        if hasattr(random_ref_dwpose, "cpu"):
            random_ref_dwpose = random_ref_dwpose.cpu().numpy()
        pose = jnp.asarray(np.asarray(dwpose_data, np.float32))[None]
        cond = pose_embedding.forward(self.dwpose_embedding, pose).astype(self.dtype)
        ref_pose = jnp.asarray(np.asarray(random_ref_dwpose, np.float32))[None]
        y_extra = unianimate.randomref_forward(
            self.randomref_embedding_pose, ref_pose
        ).astype(self.dtype)
        return cond, y_extra

    def __call__(self, *args, dwpose_data=None, random_ref_dwpose=None,
                 input_image=None, random_ref_frame=None, ref_pad_num=None, **kwargs):
        add_condition = None
        y_extra = None
        if dwpose_data is not None:
            cond, y_extra = self._pose_inputs(dwpose_data, random_ref_dwpose)
            # pose rides the CONDITIONAL branch only (ref :739-742)
            add_condition = (cond, None)
        if input_image is not None and random_ref_frame is None:
            img = input_image[0] if isinstance(input_image, list) else input_image
            random_ref_frame = np.array(img)
        return super().__call__(
            *args, input_image=input_image, random_ref_frame=random_ref_frame,
            ref_pad_num=0 if ref_pad_num is None else ref_pad_num,
            add_condition=add_condition, y_extra=y_extra, **kwargs,
        )


class WanUniAnimateLongVideoPipeline(WanUniAnimateVideoPipeline):
    """Long pose-driven videos via overlapping context windows (ref
    :800-1204): every denoise step runs the DiT once per window, carries the
    first TWO latent frames of each window across steps, and averages
    overlapping predictions with a counter grid."""

    def __call__(self, prompt=None, negative_prompt="", input_image=None,
                 seed=None, height=480, width=832, num_frames=81, cfg_scale=5.0,
                 num_inference_steps=50, sigma_shift=5.0, tiled=True,
                 tile_size=(30, 52), tile_stride=(15, 26),
                 dwpose_data=None, random_ref_dwpose=None,
                 context_size=21, context_overlap=4,
                 prompt_emb_posi=None, prompt_emb_nega=None, **kwargs):
        from . import base

        height, width = base.check_resize_height_width(height, width)
        if num_frames % 4 != 1:
            num_frames = (num_frames - 1) // 4 * 4 + 1
        if isinstance(cfg_scale, dict):
            cfg_scale = cfg_scale["text"]
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size, "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, shift=sigma_shift)

        lt = (num_frames - 1) // 4 + 1
        z_dim = self.vae[1].z_dim if self.vae is not None else 16
        noise_np = base.generate_noise((1, z_dim, lt, height // 8, width // 8), seed=seed)
        latents = jnp.asarray(noise_np, self.dtype)

        # window schedule (ref :1069-1092): step-0 schedule, tail window pinned
        context_queue = list(context_scheduler(
            0, 31, lt, context_size=context_size, context_stride=1,
            context_overlap=context_overlap,
        ))
        context_step = min(1, int(np.ceil(np.log2(lt / context_size))) + 1)
        context_queue[-1] = [
            e % lt for e in range(lt - context_size * context_step, lt, context_step)
        ]
        global_context = [[w] for w in context_queue]

        # prompts
        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, positive=True)["context"]
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, positive=False)["context"]
        ctx_pos = jnp.asarray(prompt_emb_posi, self.dtype)
        ctx_neg = jnp.asarray(prompt_emb_nega, self.dtype)

        # image conditioning at WINDOW length (ref :1108: context_size*4-3)
        img = input_image[0] if isinstance(input_image, list) else input_image
        image_emb = self.encode_images_adaptive(
            [img], np.array(img), context_size * 4 - 3, height, width, ref_pad_num=0,
        )

        # per-window pose tokens + shared reference-pose y term (ref :1131-1143)
        if hasattr(dwpose_data, "cpu"):
            dwpose_data = dwpose_data.cpu().numpy()
        dwpose_data = np.asarray(dwpose_data, np.float32)
        conds, first_feature = [], []
        rng = np.random.default_rng(seed)
        for (win,) in global_context:
            pose_win = dwpose_data[:, win[0] * 4:win[-1] * 4 + 1]
            cond = pose_embedding.forward(
                self.dwpose_embedding, jnp.asarray(pose_win)[None]
            ).astype(self.dtype)
            conds.append(cond)
            first_feature.append(jnp.asarray(
                rng.standard_normal((1, z_dim, 2, height // 8, width // 8)), self.dtype
            ))
        if random_ref_dwpose is not None:
            if hasattr(random_ref_dwpose, "cpu"):
                random_ref_dwpose = random_ref_dwpose.cpu().numpy()
            y_extra = unianimate.randomref_forward(
                self.randomref_embedding_pose,
                jnp.asarray(np.asarray(random_ref_dwpose, np.float32))[None],
            ).astype(self.dtype)
            image_emb["y"] = image_emb["y"] + y_extra

        sigmas = np.asarray(self.scheduler.sigmas, np.float32)
        timesteps = np.asarray(self.scheduler.timesteps, np.float32)
        step_cfg = self._denoise_step_fn()
        ctx2 = jnp.concatenate([ctx_pos, ctx_neg], axis=0)

        n = len(timesteps)
        lat_np = latents
        for i in range(n):
            counter = np.zeros((1, 1, lt, 1, 1), np.float32)
            out_acc = jnp.zeros_like(lat_np)
            for w_idx, (win,) in enumerate(global_context):
                lat_in = jnp.take(lat_np, jnp.asarray(win), axis=2)
                lat_in = lat_in.at[:, :, :2].set(first_feature[w_idx])
                stepped = step_cfg(
                    self.dit[0], lat_in, jnp.asarray([timesteps[i]]),
                    sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0),
                    ctx2, image_emb["clip_feature"], image_emb["y"],
                    np.float32(cfg_scale),
                    jnp.concatenate([conds[w_idx], jnp.zeros_like(conds[w_idx])], axis=0),
                )
                first_feature[w_idx] = stepped[:, :, :2]
                # aggregate, skipping each later window's carried 2 frames
                # (ref :1180-1193)
                keep = win if w_idx == 0 else win[2:]
                upd = stepped if w_idx == 0 else stepped[:, :, 2:]
                out_acc = out_acc.at[:, :, jnp.asarray(keep)].add(upd)
                for c in keep:
                    counter[:, :, c] += 1
            lat_np = out_acc / jnp.asarray(counter, out_acc.dtype)

        frames_dev = self.decode_video(lat_np, **tiler_kwargs)
        frames_u8 = np.clip(
            (np.asarray(frames_dev, np.float32) + 1) * 127.5, 0, 255
        ).astype(np.uint8)
        return base.frames_from_uint8(frames_u8[0])


class WanRepalceAnyoneVideoPipeline(WanUniAnimateVideoPipeline):
    """Masked-region replacement (ref :1207-1583): the CONDITIONAL branch's
    latents are augmented with learn_in_embedding(masked video ‖ mask) +
    inpaint_embedding(VAE(masked video)); class name keeps the reference's
    spelling."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.learn_in_embedding = None
        self.inpaint_embedding = None

    def fetch_models(self, model_manager):
        super().fetch_models(model_manager)
        side = model_manager.state_dict_new_module
        li = {k: v for k, v in side.items() if "learn_in_embedding" in k}
        if li:
            self.learn_in_embedding = unianimate.learn_in_from_torch(li)
        ip = {k: v for k, v in side.items() if "inpaint_embedding" in k}
        if ip:
            self.inpaint_embedding = unianimate.inpaint_from_torch(ip)
        return self

    def __call__(self, prompt=None, negative_prompt="", input_image=None,
                 seed=None, height=480, width=832, num_frames=81, cfg_scale=5.0,
                 num_inference_steps=50, sigma_shift=5.0, tiled=True,
                 tile_size=(30, 52), tile_stride=(15, 26),
                 dwpose_data=None, random_ref_dwpose=None, batch=None,
                 prompt_emb_posi=None, prompt_emb_nega=None, **kwargs):
        from . import base

        height, width = base.check_resize_height_width(height, width)
        if num_frames % 4 != 1:
            num_frames = (num_frames + 2) // 4 * 4 + 1
        if isinstance(cfg_scale, dict):
            cfg_scale = cfg_scale["text"]
        tiler_kwargs = {"tiled": tiled, "tile_size": tile_size, "tile_stride": tile_stride}
        self.scheduler.set_timesteps(num_inference_steps, shift=sigma_shift)

        lt = (num_frames - 1) // 4 + 1
        z_dim = self.vae[1].z_dim if self.vae is not None else 16
        noise_np = base.generate_noise((1, z_dim, lt, height // 8, width // 8), seed=seed)
        latents = jnp.asarray(noise_np, self.dtype)

        if prompt_emb_posi is None:
            prompt_emb_posi = self.encode_prompt(prompt, positive=True)["context"]
        if prompt_emb_nega is None:
            prompt_emb_nega = self.encode_prompt(negative_prompt, positive=False)["context"]
        ctx_pos = jnp.asarray(prompt_emb_posi, self.dtype)
        ctx_neg = jnp.asarray(prompt_emb_nega, self.dtype)

        img = input_image[0] if isinstance(input_image, list) else input_image
        image_emb = self.encode_images_adaptive(
            [img], np.array(img), num_frames, height, width, ref_pad_num=0,
        )

        cond, y_extra = self._pose_inputs(dwpose_data, random_ref_dwpose)
        image_emb["y"] = image_emb["y"] + y_extra

        # masked-video features (ref :1545-1555)
        video = np.asarray(batch["video"], np.float32)[None]  # (1,3,F,H,W) [-1,1]
        seg = np.asarray(batch["segmentation_data"], np.float32) / 255.0 > 0  # (F,H,W)
        keep = (~seg).astype(np.float32)[None, None]  # (1,1,F,H,W)
        masked = video * keep
        masked_4ch = jnp.asarray(np.concatenate([masked, keep], axis=1), self.dtype)
        lat_masked_enc = self.encode_video(masked, **tiler_kwargs)
        masked_feat = unianimate.learn_in_forward(
            self.learn_in_embedding, masked_4ch
        ).astype(self.dtype)
        inpaint_feat = unianimate.inpaint_forward(
            self.inpaint_embedding, jnp.asarray(lat_masked_enc, self.dtype)
        ).astype(self.dtype)

        sigmas = np.asarray(self.scheduler.sigmas, np.float32)
        timesteps = np.asarray(self.scheduler.timesteps, np.float32)
        n = len(timesteps)
        nocfg = self._denoise_step_nocfg_fn()

        import jax

        def raw_fwd(x_in, t, ctx, ac):
            return self._dit_forward(self.dit[0], x_in, t, ctx,
                                     image_emb["clip_feature"], image_emb["y"], ac)

        fwd = self._jit("replace_anyone_fwd", raw_fwd)
        for i in range(n):
            t = jnp.asarray([timesteps[i]])
            pred_pos = fwd(latents + masked_feat + inpaint_feat, t, ctx_pos, cond)
            pred_neg = fwd(latents, t, ctx_neg, None)
            pred = pred_neg + cfg_scale * (pred_pos - pred_neg)
            sig, sig_next = sigmas[i], sigmas[i + 1] if i + 1 < n else np.float32(0.0)
            latents = (latents.astype(jnp.float32)
                       + pred.astype(jnp.float32) * (sig_next - sig)).astype(latents.dtype)

        frames_dev = self.decode_video(latents, **tiler_kwargs)
        frames_u8 = np.clip(
            (np.asarray(frames_dev, np.float32) + 1) * 127.5, 0, 255
        ).astype(np.uint8)
        return base.frames_from_uint8(frames_u8[0])
