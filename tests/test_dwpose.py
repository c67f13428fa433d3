"""DWPose preprocessing: keypoint conversion math + skeleton rendering."""

import numpy as np


def test_keypoints_to_openpose_neck_and_remap():
    from svi_tpu.dwpose import keypoints_to_openpose

    rng = np.random.default_rng(0)
    kpts = rng.uniform(0, 100, (2, 133, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, (2, 133)).astype(np.float32)
    scores[0, 5] = scores[0, 6] = 0.9  # both shoulders confident
    scores[1, 5] = 0.1  # left shoulder unreliable

    out_k, out_s = keypoints_to_openpose(kpts, scores)
    assert out_k.shape == (2, 134, 2) and out_s.shape == (2, 134)
    # neck joint = mean of shoulders, remapped to openpose index 1
    np.testing.assert_allclose(out_k[0, 1], kpts[0, [5, 6]].mean(axis=0), rtol=1e-6)
    assert out_s[0, 1] == 1.0  # both shoulders confident -> neck visible
    assert out_s[1, 1] == 0.0  # one unreliable shoulder -> neck hidden
    # nose stays at index 0
    np.testing.assert_allclose(out_k[0, 0], kpts[0, 0])


def test_draw_pose_frame():
    from svi_tpu.dwpose import draw_pose_frame

    rng = np.random.default_rng(1)
    pose = {
        "bodies": rng.uniform(0.2, 0.8, (1, 18, 2)).astype(np.float32),
        "body_scores": np.ones((1, 18), np.float32),
        "hands": rng.uniform(0.2, 0.8, (2, 21, 2)).astype(np.float32),
        "faces": rng.uniform(0.2, 0.8, (1, 68, 2)).astype(np.float32),
    }
    canvas = draw_pose_frame(pose, 128, 96, draw_face_pts=True)
    assert canvas.shape == (128, 96, 3) and canvas.dtype == np.uint8
    assert canvas.sum() > 0  # something was drawn


def test_wholebody_gated_without_ort():
    import importlib.util

    if importlib.util.find_spec("onnxruntime") is not None:
        return
    import pytest

    from svi_tpu.dwpose import Wholebody

    with pytest.raises(ImportError, match="onnxruntime"):
        Wholebody()
