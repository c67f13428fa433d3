"""Host-side image utilities (behavioral ref: utils/image_process.py)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def calculate_dimensions(image_input, max_width: int = 640):
    """Aspect-preserving (height, width) rounded DOWN to multiples of 16
    (ref image_process.py:38-68)."""
    img = image_input if isinstance(image_input, Image.Image) else Image.open(image_input)
    ow, oh = img.size
    if ow <= max_width:
        width, height = ow, oh
    else:
        width = max_width
        height = int(width * (oh / ow))
    return (height // 16) * 16, (width // 16) * 16


def find_reference_image(ref_image_root: str) -> str:
    """frame.jpg > frame.png > first jpg > first png (ref :177-204)."""
    for name in ("frame.jpg", "frame.png"):
        p = os.path.join(ref_image_root, name)
        if os.path.exists(p):
            return p
    files = sorted(os.listdir(ref_image_root))
    for exts in ((".jpg", ".jpeg"), (".png",)):
        for f in files:
            if f.lower().endswith(exts):
                return os.path.join(ref_image_root, f)
    raise FileNotFoundError(f"No reference image (jpg/png) found in {ref_image_root}")


def resize_and_pad_to_target(frames: np.ndarray, target_size, pad_value=0.0) -> np.ndarray:
    """(b, c, h, w) -> aspect-preserving nearest resize + centered constant pad
    to target (ref :135-175)."""
    th, tw = target_size
    b, c, h, w = frames.shape
    scale = min(th / h, tw / w)
    nh, nw = int(h * scale), int(w * scale)
    yi = (np.arange(nh) * (h / nh)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64).clip(0, w - 1)
    resized = frames[:, :, yi][:, :, :, xi]
    out = np.full((b, c, th, tw), pad_value, frames.dtype)
    top = (th - nh) // 2
    left = (tw - nw) // 2
    out[:, :, top : top + nh, left : left + nw] = resized
    return out
