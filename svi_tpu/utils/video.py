"""Video I/O (behavioral ref: diffsynth/data/video.py save_video :138).

Uses OpenCV (the only video backend in this environment — no ffmpeg binary /
imageio-ffmpeg); falls back to imageio when an ffmpeg backend exists.
"""

from __future__ import annotations

import numpy as np


def _cv2():
    import cv2

    return cv2


def save_video(frames, save_path: str, fps: int = 24, quality: int = 8):
    """List of PIL images (or HWC uint8 arrays) -> mp4."""
    frames = [np.asarray(f) for f in frames]
    try:
        import imageio

        writer = imageio.get_writer(save_path, fps=fps, quality=quality)
        for frame in frames:
            writer.append_data(frame)
        writer.close()
        return
    except Exception:
        pass
    cv2 = _cv2()
    h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(save_path, fourcc, fps, (w, h))
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def load_video_frames(path: str, indices=None):
    """mp4 -> list of HWC uint8 RGB numpy frames (all, or the given indices)."""
    cv2 = _cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    try:
        if indices is None:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        else:
            for idx in indices:
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
                ok, frame = cap.read()
                if not ok:
                    raise IOError(f"cannot read frame {idx} of {path}")
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    return frames


def video_frame_count(path: str) -> int:
    cv2 = _cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
