"""Base pipeline utilities (behavioral ref: diffsynth/pipelines/base.py).

Host-side image preprocessing stays in numpy/PIL; noise generation uses the
torch CPU RNG when torch is importable so seeded outputs are bit-identical to
the reference (base.py:140-143 uses torch.Generator('cpu')), falling back to
jax.random otherwise.
"""

from __future__ import annotations

import numpy as np


def check_resize_height_width(height: int, width: int, factor: int = 16):
    """Round up to the division factor (ref base.py:21-28; Wan uses 16)."""
    if height % factor != 0:
        height = (height + factor - 1) // factor * factor
    if width % factor != 0:
        width = (width + factor - 1) // factor * factor
    return height, width


def preprocess_image(image) -> np.ndarray:
    """PIL.Image (or HWC uint8 array) -> (1, 3, H, W) float32 in [-1, 1]
    (ref base.py:44-48)."""
    arr = np.array(image, dtype=np.float32) * (2 / 255) - 1
    return arr.transpose(2, 0, 1)[None]


def generate_noise(shape, seed=None, dtype=np.float32) -> np.ndarray:
    """Seeded CPU gaussian noise, bit-identical to the reference when torch is
    available (torch.randn on a seeded CPU generator, base.py:140-143)."""
    try:
        import torch

        gen = None if seed is None else torch.Generator("cpu").manual_seed(int(seed))
        return torch.randn(shape, generator=gen, dtype=torch.float32).numpy().astype(dtype)
    except ImportError:  # pragma: no cover
        import jax

        key = jax.random.PRNGKey(0 if seed is None else int(seed))
        return np.asarray(jax.random.normal(key, shape), dtype)


def tensor_to_frames(video: np.ndarray):
    """(3, T, H, W) in [-1,1] -> list of PIL images (ref svi_video.py:366-370)."""
    frames = np.transpose(video, (1, 2, 3, 0))
    frames = ((frames + 1) * 127.5).clip(0, 255).astype(np.uint8)
    return frames_from_uint8(np.transpose(frames, (3, 0, 1, 2)))


def frames_from_uint8(video_u8: np.ndarray):
    """(3, T, H, W) uint8 -> list of PIL images."""
    from PIL import Image

    return [Image.fromarray(f) for f in np.transpose(video_u8, (1, 2, 3, 0))]
