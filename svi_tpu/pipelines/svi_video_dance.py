"""SVI-Dance: DWPose skeleton-conditioned per-clip generation.

Behavioral reference: diffsynth/pipelines/svi_video_dance.py
(SVIDanceVideoPipeline :139, dwpose_embedding :254-268, pose condition added
to patch tokens :103-104 & :526-532, cond_wo_pose CFG handling :414-444).

Extends SVIVideoPipeline: the pose video is embedded by a 7-conv3d stack into
patch-grid tokens and added to the DiT tokens (`add_condition`); with
cond_wo_pose=True the UNCOND CFG branch also receives the pose (the reference
default in test_svi_dance.py:270).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import pose_embedding
from .svi_video import SVIVideoPipeline, TeaCache
from . import base


class SVIDanceVideoPipeline(SVIVideoPipeline):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.dwpose_embedding = None  # params list

    def fetch_models(self, model_manager):
        super().fetch_models(model_manager)
        side = {
            k: v for k, v in model_manager.state_dict_new_module.items()
            if "dwpose_embedding" in k
        }
        if side:
            self.dwpose_embedding = pose_embedding.params_from_torch_state_dict(side)
        return self

    @staticmethod
    def from_model_manager(model_manager, torch_dtype=None, device=None, use_usp=False,
                           is_test=False, num_train_timesteps=1000):
        pipe = SVIDanceVideoPipeline(
            device=device, torch_dtype=torch_dtype or model_manager.dtype,
            is_test=is_test, num_train_timesteps=num_train_timesteps,
        )
        pipe.fetch_models(model_manager)
        if use_usp:
            from ..parallel.mesh import make_sp_mesh

            pipe.sp_mesh = make_sp_mesh()
            pipe.use_unified_sequence_parallel = True
        return pipe

    def encode_pose(self, humanpose_data) -> jnp.ndarray:
        """pose video (3, F, H, W) in [0,255] -> add_condition tokens
        (1, S, dim) (ref :526-532)."""
        assert self.dwpose_embedding is not None, "no dwpose_embedding weights loaded"
        pose = jnp.asarray(np.asarray(humanpose_data, np.float32))[None]
        cond = pose_embedding.forward(self.dwpose_embedding, pose)
        # the reference rounds the condition through bf16 unconditionally
        # (svi_video_dance.py:529 `.to(torch.bfloat16)`) before casting to the
        # latent dtype; replicate for bit-level parity even in f32 pipelines
        return cond.astype(jnp.bfloat16).astype(self.dtype)

    def __call__(self, *args, humanpose_data=None, cond_wo_pose=True, **kwargs):
        if humanpose_data is not None:
            if hasattr(humanpose_data, "cpu"):
                humanpose_data = humanpose_data.cpu().numpy()
            cond = self.encode_pose(humanpose_data)
            # cond_wo_pose keeps the pose in the uncond branch (ref :423-430)
            add_condition = (cond, cond if cond_wo_pose else None)
        else:
            add_condition = None
        return super().__call__(*args, add_condition=add_condition, **kwargs)
