"""OpenPose-style skeleton rendering for pose conditioning videos.

Behavioral reference: dwpose/util.py (draw_body_and_foot :112, draw_handpose
:156, draw_facepose :184) — the standard OpenPose 18-joint limb/color scheme
used by UniAnimate-style pose videos that SVI-Dance consumes.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 0.01

# OpenPose body-18 limb pairs (1-indexed, standard) + the standard color wheel.
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18],
]
COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]
HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8],
    [0, 9], [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15],
    [15, 16], [0, 17], [17, 18], [18, 19], [19, 20],
]


def draw_body(canvas: np.ndarray, body_kpts: np.ndarray, body_scores: np.ndarray,
              stickwidth: int = 4, conf_thr: float = 0.3) -> np.ndarray:
    """body_kpts: (n, 18, 2) normalized [0,1]; draws limbs then joints."""
    import cv2

    H, W = canvas.shape[:2]
    for person, score in zip(body_kpts, body_scores):
        for limb, color in zip(LIMB_SEQ, COLORS[: len(LIMB_SEQ)]):
            a, b = limb[0] - 1, limb[1] - 1
            if score[a] < conf_thr or score[b] < conf_thr:
                continue
            y = person[[a, b], 0] * W
            x = person[[a, b], 1] * H
            mx, my = x.mean(), y.mean()
            length = ((x[0] - x[1]) ** 2 + (y[0] - y[1]) ** 2) ** 0.5
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            poly = cv2.ellipse2Poly(
                (int(my), int(mx)), (int(length / 2), stickwidth), int(angle), 0, 360, 1
            )
            cv2.fillConvexPoly(canvas, poly, [int(c * 0.6) for c in color])
        for j in range(18):
            if score[j] < conf_thr:
                continue
            x, y = person[j]
            cv2.circle(canvas, (int(x * W), int(y * H)), 4, COLORS[j % len(COLORS)], thickness=-1)
    return canvas


def draw_hands(canvas: np.ndarray, hands: np.ndarray) -> np.ndarray:
    """hands: (m, 21, 2) normalized; standard HSV-cycled edges."""
    import cv2

    H, W = canvas.shape[:2]
    for peaks in hands:
        for ie, (e0, e1) in enumerate(HAND_EDGES):
            x1, y1 = peaks[e0]
            x2, y2 = peaks[e1]
            if min(x1, y1, x2, y2) < EPS:
                continue
            rgb = [
                int(c * 255)
                for c in _hsv_to_rgb(ie / len(HAND_EDGES), 1.0, 1.0)
            ]
            cv2.line(
                canvas, (int(x1 * W), int(y1 * H)), (int(x2 * W), int(y2 * H)), rgb, thickness=2
            )
        for x, y in peaks:
            if min(x, y) > EPS:
                cv2.circle(canvas, (int(x * W), int(y * H)), 4, (0, 0, 255), thickness=-1)
    return canvas


def draw_face(canvas: np.ndarray, faces: np.ndarray) -> np.ndarray:
    import cv2

    H, W = canvas.shape[:2]
    for lmks in faces:
        for x, y in lmks:
            if min(x, y) > EPS:
                cv2.circle(canvas, (int(x * W), int(y * H)), 3, (255, 255, 255), thickness=-1)
    return canvas


def _hsv_to_rgb(h, s, v):
    import colorsys

    return colorsys.hsv_to_rgb(h, s, v)


def draw_pose_frame(pose: dict, height: int, width: int, draw_face_pts: bool = False) -> np.ndarray:
    """pose dict with normalized coords: {'bodies': (n,18,2), 'body_scores':
    (n,18), 'hands': (m,21,2), 'faces': (k,68,2)} -> HWC uint8 canvas."""
    canvas = np.zeros((height, width, 3), np.uint8)
    if "bodies" in pose and len(pose["bodies"]):
        canvas = draw_body(canvas, np.asarray(pose["bodies"]), np.asarray(pose["body_scores"]))
    if "hands" in pose and len(pose["hands"]):
        canvas = draw_hands(canvas, np.asarray(pose["hands"]))
    if draw_face_pts and "faces" in pose and len(pose["faces"]):
        canvas = draw_face(canvas, np.asarray(pose["faces"]))
    return canvas
