"""DWPose whole-body keypoint extraction (offline data preprocessing).

Behavioral reference: dwpose/wholebody.py (+onnxdet/onnxpose) — YOLOX-L person
detection + DWPose 133-keypoint estimation via onnxruntime, followed by the
standard COCO→OpenPose joint conversion (neck = mean(shoulders), index remap).

Inference runs through onnxruntime when available, and otherwise through the
repo's native ONNX-to-JAX executor (svi_tpu.utils.onnx_jax) — the ONNX graphs
execute as XLA ops on whatever backend JAX has (TPU here), so the extraction
path no longer depends on onnxruntime at all; only the .onnx weight files are
required. The pure-numpy post-processing (the part SVI's training/inference
semantics depend on) works standalone and is unit-tested. This runs OFFLINE
per SURVEY §2.6 — it is not in the generation hot path.
"""

from __future__ import annotations

import numpy as np

# COCO (mmpose) -> OpenPose body-18 conversion (standard mapping).
_MMPOSE_IDX = [17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3]
_OPENPOSE_IDX = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]


def keypoints_to_openpose(keypoints: np.ndarray, scores: np.ndarray):
    """(n, 133, 2) keypoints + (n, 133) scores -> OpenPose-ordered
    (n, 134, 2)/(n, 134) with the synthetic neck joint inserted at 17
    (ref wholebody.py:25-46)."""
    info = np.concatenate([keypoints, scores[..., None]], axis=-1)  # (n,133,3)
    neck = info[:, [5, 6]].mean(axis=1)
    neck[:, 2] = np.logical_and(info[:, 5, 2] > 0.3, info[:, 6, 2] > 0.3).astype(info.dtype)
    info = np.insert(info, 17, neck, axis=1)  # (n,134,3)
    out = info.copy()
    out[:, _OPENPOSE_IDX] = info[:, _MMPOSE_IDX]
    return out[..., :2], out[..., 2]


class Wholebody:
    """ORT-backed detector+pose pipeline (ref wholebody.py:8-46)."""

    def __init__(self, det_onnx="./weights/UniAnimate-DiT/yolox_l.onnx",
                 pose_onnx="./weights/UniAnimate-DiT/dw-ll_ucoco_384.onnx",
                 providers=("CPUExecutionProvider",), engine="auto"):
        """engine: 'ort' (onnxruntime), 'jax' (svi_tpu.utils.onnx_jax), or
        'auto' (ort if installed, else the native JAX executor)."""
        ort = None
        if engine in ("auto", "ort"):
            try:
                import onnxruntime as ort  # noqa: F811
            except ImportError:
                if engine == "ort":
                    raise
        if ort is not None:
            mk = lambda p: ort.InferenceSession(p, providers=list(providers))
        else:
            from ..utils import onnx_jax

            mk = onnx_jax.InferenceSession
        self.session_det = mk(det_onnx)
        self.session_pose = mk(pose_onnx)

    def __call__(self, frame_rgb: np.ndarray):
        from . import onnx_infer

        det = onnx_infer.inference_detector(self.session_det, frame_rgb)
        keypoints, scores = onnx_infer.inference_pose(self.session_pose, det, frame_rgb)
        return keypoints_to_openpose(keypoints, scores)
