"""Plain Wan 2.1 video pipeline (upstream T2V/I2V, no SVI extras).

Behavioral reference: diffsynth/pipelines/wan_video.py (WanVideoPipeline
:25-287) — the pipeline SVI derives from. Standard I2V conditioning is the
ref_pad_num=0 case of SVI's encode_images_adaptive (first frame + zero
padding, mask only on frame 0); T2V simply omits input_image. Exposed as a
thin subclass so diffsynth users find the familiar entry point.
"""

from __future__ import annotations

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
