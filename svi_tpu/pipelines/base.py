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


def preprocess_image(image, use_aug: bool = False, rng=None) -> np.ndarray:
    """PIL.Image (or HWC uint8 array) -> (1, 3, H, W) float32 in [-1, 1]
    (ref base.py:44-48). use_aug applies the train-time first-frame
    augmentation (ref base.py:30-42)."""
    if use_aug:
        image = apply_augmentation(image, rng=rng)
    arr = np.array(image, dtype=np.float32) * (2 / 255) - 1
    return arr.transpose(2, 0, 1)[None]


def apply_augmentation(image, rng=None):
    """Train-time condition-frame augmentation (ref base.py:30-42):
    ColorJitter(brightness/contrast/saturation 0.3, hue 0.1) w.p. 0.7,
    GaussianBlur(kernel 3, sigma U[0.1,2]) w.p. 0.5, sharpness 2x w.p. 0.5 —
    teaching the model to tolerate drifted motion-frame statistics. PIL-domain
    host preprocessing (not a device op); returns a PIL image.
    """
    from PIL import Image, ImageEnhance, ImageFilter

    rng = rng or np.random.default_rng()
    if isinstance(image, np.ndarray):
        image = Image.fromarray(image.astype(np.uint8))

    if rng.random() < 0.7:
        # torchvision ColorJitter applies the four jitters in random order
        ops = [
            ("brightness", lambda im, f: ImageEnhance.Brightness(im).enhance(f),
             1 + rng.uniform(-0.3, 0.3)),
            ("contrast", lambda im, f: ImageEnhance.Contrast(im).enhance(f),
             1 + rng.uniform(-0.3, 0.3)),
            ("saturation", lambda im, f: ImageEnhance.Color(im).enhance(f),
             1 + rng.uniform(-0.3, 0.3)),
            ("hue", None, rng.uniform(-0.1, 0.1)),
        ]
        order = rng.permutation(4)
        for i in order:
            name, fn, factor = ops[i]
            if name == "hue":
                hsv = np.array(image.convert("HSV"), dtype=np.int16)
                hsv[..., 0] = (hsv[..., 0] + int(factor * 255)) % 256
                image = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
            else:
                image = fn(image, factor)
    if rng.random() < 0.5:
        sigma = rng.uniform(0.1, 2.0)  # torchvision GaussianBlur sigma range
        image = image.filter(ImageFilter.GaussianBlur(radius=sigma))
    if rng.random() < 0.5:
        image = ImageEnhance.Sharpness(image).enhance(2.0)
    return image


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
