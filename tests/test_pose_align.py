"""Numpy-level unit tests of the pose retargeting math
(svi_tpu/dwpose/align.py vs the reference utils/run_align_pose.py semantics)."""

import math

import numpy as np

from svi_tpu.dwpose.align import (
    OneEuroFilter,
    align_pose_sequence,
    compute_retarget_params,
    pose_from_openpose,
    retarget_pose,
)


def make_skeleton(scale=1.0, cx=0.5, cy=0.3, arm=0.10, leg=0.14, torso=0.22,
                  shoulder=0.16, neck=0.05, head=0.04):
    """Synthetic 20-joint body (OpenPose-18 + foot centers), normalized."""
    c = np.full((20, 2), -1.0)
    s = scale
    c[1] = [cx, cy]                        # neck joint
    c[0] = [cx, cy - neck * s]             # nose
    c[14] = [cx - 0.02 * s, cy - (neck + head) * s]  # eyes
    c[15] = [cx + 0.02 * s, cy - (neck + head) * s]
    c[16] = [cx - 0.045 * s, cy - (neck + head) * s]  # ears
    c[17] = [cx + 0.045 * s, cy - (neck + head) * s]
    c[2] = [cx - shoulder / 2 * s, cy]     # right shoulder
    c[5] = [cx + shoulder / 2 * s, cy]     # left shoulder
    c[3] = c[2] + [-arm * s, arm * s]      # elbows
    c[6] = c[5] + [arm * s, arm * s]
    c[4] = c[3] + [-arm * s, arm * s]      # wrists
    c[7] = c[6] + [arm * s, arm * s]
    c[8] = [cx - 0.06 * s, cy + torso * s]  # hips
    c[11] = [cx + 0.06 * s, cy + torso * s]
    c[9] = c[8] + [0, leg * s]             # knees
    c[12] = c[11] + [0, leg * s]
    c[10] = c[9] + [0, leg * s]            # ankles
    c[13] = c[12] + [0, leg * s]
    c[18] = c[10] + [0, 0.02 * s]          # foot centers
    c[19] = c[13] + [0, 0.02 * s]
    hands = np.stack([np.tile(c[7], (21, 1)), np.tile(c[4], (21, 1))])
    faces = np.tile(c[0], (1, 68, 1))
    return {
        "bodies": {"candidate": c, "subset": np.arange(20, dtype=np.float64)[None]},
        "hands": hands,
        "faces": faces,
    }


def _limb(c, a, b):
    return math.hypot(c[a][0] - c[b][0], c[a][1] - c[b][1])


def test_retarget_matches_reference_proportions():
    """After alignment, frame 0's limb lengths equal the reference skeleton's
    and its neck lands exactly on the reference neck (ref :509-513)."""
    ref = make_skeleton(scale=1.4, cx=0.55, cy=0.35, arm=0.12, leg=0.11)
    frames = [make_skeleton(scale=1.0, cx=0.4 + 0.01 * t, cy=0.3) for t in range(4)]
    aligned = align_pose_sequence(frames, ref)

    c0 = aligned[0]["bodies"]["candidate"]
    cr = ref["bodies"]["candidate"]
    np.testing.assert_allclose(c0[1], cr[1], atol=1e-9)  # neck anchored
    for a, b in [(0, 1), (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7),
                 (8, 9), (9, 10), (11, 12), (12, 13), (0, 14), (0, 15)]:
        np.testing.assert_allclose(
            _limb(c0, a, b), _limb(cr, a, b), rtol=1e-6,
            err_msg=f"limb ({a},{b}) length not retargeted",
        )


def test_retarget_preserves_motion_consistency():
    """All frames get the SAME ratios/offset: relative motion between frames
    is preserved up to the global scaling."""
    ref = make_skeleton(scale=1.3)
    frames = [make_skeleton(cx=0.40), make_skeleton(cx=0.44)]
    aligned = align_pose_sequence(frames, ref)
    params = compute_retarget_params(frames[0], ref)
    # neck x displacement between frames scales by x_ratio exactly
    dx_in = frames[1]["bodies"]["candidate"][1][0] - frames[0]["bodies"]["candidate"][1][0]
    dx_out = aligned[1]["bodies"]["candidate"][1][0] - aligned[0]["bodies"]["candidate"][1][0]
    np.testing.assert_allclose(dx_out, dx_in * params["x_ratio"], rtol=1e-9)
    # limb lengths of frame 1 also match the reference (same pose => same fix)
    for a, b in [(2, 3), (8, 9)]:
        np.testing.assert_allclose(
            _limb(aligned[1]["bodies"]["candidate"], a, b),
            _limb(ref["bodies"]["candidate"], a, b), rtol=1e-6,
        )


def test_hands_follow_their_arm_chain():
    """Hand keypoints translate with the wrist they're attached to
    (ref :320-321, :354-355, ...)."""
    ref = make_skeleton(scale=1.5, arm=0.13)
    frame = make_skeleton(scale=1.0)
    params = compute_retarget_params(frame, ref)
    out = retarget_pose(frame, params)
    # hands stay glued to the wrists: hand 0 <-> joint 7, hand 1 <-> joint 4
    np.testing.assert_allclose(out["hands"][0][0], out["bodies"]["candidate"][7], atol=1e-9)
    np.testing.assert_allclose(out["hands"][1][0], out["bodies"]["candidate"][4], atol=1e-9)


def test_pose_from_openpose_foot_centers_and_masking():
    rng = np.random.default_rng(0)
    kpts = rng.random((1, 134, 2)) * [[512, 768]]
    scores = np.full((1, 134), 0.9)
    scores[0, 3] = 0.1  # low-confidence joint -> -1
    pose = pose_from_openpose(kpts, scores, H=768, W=512)
    c = pose["bodies"]["candidate"]
    assert c.shape == (20, 2)
    assert (pose["bodies"]["candidate"] <= 1.0 + 1e-9).all()
    assert (c[3] == -1).all()
    # foot centers are midpoints of the raw foot keypoint pairs
    raw = kpts[0] / [512, 768]
    np.testing.assert_allclose(c[18], (raw[18] + raw[19]) / 2, atol=1e-9)
    np.testing.assert_allclose(c[19], (raw[21] + raw[22]) / 2, atol=1e-9)
    assert pose["hands"].shape == (2, 21, 2)
    assert pose["faces"].shape == (1, 68, 2)


def _jittered_skeleton(rng, **kw):
    """make_skeleton + per-joint noise so no two limbs are symmetric (the
    golden comparison must not pass by accident of symmetry)."""
    pose = make_skeleton(**kw)
    c = pose["bodies"]["candidate"]
    c += rng.normal(0, 0.004, c.shape)
    pose["hands"] = pose["hands"] + rng.normal(0, 0.004, pose["hands"].shape)
    pose["faces"] = pose["faces"] + rng.normal(0, 0.004, pose["faces"].shape)
    return pose


def _load_ref_align_module():
    """Import the reference utils/run_align_pose.py with its DWPose/ONNX deps
    stubbed (the retarget math itself is pure numpy)."""
    import importlib.util
    import sys
    import types

    for name in ("dwpose", "dwpose.util", "dwpose.wholebody"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "dwpose.wholebody":
                mod.Wholebody = object
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_run_align_pose", "/root/reference/utils/run_align_pose.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_run_align_pose"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_align_sequence_golden_parity_vs_mp_main(tmp_path):
    """Run the reference's ACTUAL mp_main retarget loop (run_align_pose.py
    :243-693) on synthetic skeletons — pose extraction, video IO, and drawing
    stubbed out — and assert keypoint-level agreement with
    align_pose_sequence."""
    import copy
    import types

    mod = _load_ref_align_module()
    rng = np.random.default_rng(7)
    n_frames = 5
    frames = [_jittered_skeleton(rng, scale=1.0, cx=0.40 + 0.012 * t,
                                 cy=0.30 + 0.004 * t, arm=0.11)
              for t in range(n_frames)]
    ref_pose = _jittered_skeleton(rng, scale=1.35, cx=0.55, cy=0.36,
                                  arm=0.13, leg=0.12, torso=0.25)

    # --- drive the reference: DWposeDetector yields our synthetic poses ----
    queue = [copy.deepcopy(p) for p in frames] + [copy.deepcopy(ref_pose)]

    class FakeDetector:
        def __init__(self):
            pass

        def __call__(self, frame):
            return queue.pop(0)

    class FakeCapture:
        def __init__(self, path):
            self.left = n_frames

        def isOpened(self):
            return True

        def read(self):
            if self.left > 0:
                self.left -= 1
                return True, np.zeros((4, 4, 3), np.uint8)
            return False, None

        def release(self):
            pass

    drawn = []

    def fake_draw_pose(pose, H, W):
        drawn.append(copy.deepcopy(pose))
        return np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8)

    mod.DWposeDetector = FakeDetector
    mod.draw_pose = fake_draw_pose
    mod.cv2 = types.SimpleNamespace(
        VideoCapture=FakeCapture, IMREAD_COLOR=1,
        imread=lambda *a, **k: np.zeros((4, 4, 3), np.uint8),
        imwrite=lambda *a, **k: True)
    args = types.SimpleNamespace(
        source_video_paths=str(tmp_path / "drive.mp4"),
        ref_name=str(tmp_path / "ref.png"),
        saved_pose_dir=str(tmp_path / "out"))
    mod.mp_main(args)
    # draw order: pose_ref preview, then the N aligned frames, then pose_ref
    ref_aligned = drawn[1:1 + n_frames]
    assert len(drawn) == n_frames + 2

    # --- ours ---------------------------------------------------------------
    ours = align_pose_sequence(frames, ref_pose)
    for t in range(n_frames):
        np.testing.assert_allclose(
            ours[t]["bodies"]["candidate"],
            ref_aligned[t]["bodies"]["candidate"], atol=1e-12,
            err_msg=f"frame {t} body keypoints diverge from mp_main")
        np.testing.assert_allclose(ours[t]["hands"], ref_aligned[t]["hands"],
                                   atol=1e-12)
        np.testing.assert_allclose(ours[t]["faces"], ref_aligned[t]["faces"],
                                   atol=1e-12)


def test_one_euro_filter_golden_parity():
    """Our OneEuroFilter vs the reference's (run_align_pose.py:36-78) on the
    same noisy trajectory."""
    mod = _load_ref_align_module()
    rng = np.random.default_rng(3)
    xs = np.sin(np.linspace(0, 5, 60)) + rng.normal(0, 0.15, 60)
    theirs = mod.OneEuroFilter(0.0, xs[0], min_cutoff=0.7, beta=0.02)
    ours = OneEuroFilter(0.0, xs[0], min_cutoff=0.7, beta=0.02)
    for t in range(1, 60):
        a = theirs(t * 0.04, xs[t])
        b = ours(t * 0.04, xs[t])
        np.testing.assert_allclose(b, a, atol=1e-12)


def test_one_euro_filter_smooths():
    rng = np.random.default_rng(1)
    clean = np.sin(np.linspace(0, 4, 100))
    noisy = clean + rng.normal(0, 0.2, 100)
    f = OneEuroFilter(0.0, noisy[0], min_cutoff=0.5, beta=0.01)
    smoothed = [noisy[0]] + [float(f(t * 0.04 + 0.04, noisy[t + 1])) for t in range(99)]
    # the filter's job is jitter removal: frame-to-frame variation shrinks
    assert np.diff(smoothed).std() < 0.6 * np.diff(noisy).std()
