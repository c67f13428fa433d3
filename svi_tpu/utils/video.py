"""Video I/O (behavioral ref: diffsynth/data/video.py save_video :138)."""

from __future__ import annotations

import numpy as np


def save_video(frames, save_path: str, fps: int = 24, quality: int = 8):
    """List of PIL images (or HWC uint8 arrays) -> mp4 via imageio-ffmpeg."""
    import imageio

    writer = imageio.get_writer(save_path, fps=fps, quality=quality)
    for frame in frames:
        writer.append_data(np.asarray(frame))
    writer.close()


def load_video_frames(path: str):
    """mp4 -> list of HWC uint8 numpy frames."""
    import imageio

    reader = imageio.get_reader(path)
    frames = [np.asarray(f) for f in reader]
    reader.close()
    return frames
