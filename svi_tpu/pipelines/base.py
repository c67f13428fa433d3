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


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    """torchvision _get_gaussian_kernel1d: symmetric normalized gaussian."""
    lim = (kernel_size - 1) / 2
    x = np.linspace(-lim, lim, kernel_size)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    return (pdf / pdf.sum()).astype(np.float32)


def gaussian_blur(x: np.ndarray, kernel_size: int = 33,
                  sigma: float = 10.0) -> np.ndarray:
    """torchvision GaussianBlur on (B,C,H,W): separable reflect-padded
    convolution (used by merge_latents to feather regional masks)."""
    k = _gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    x = np.asarray(x, np.float32)
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = np.einsum("k,bckhw->bchw", k, np.stack(
        [xp[:, :, i:i + x.shape[2], :] for i in range(kernel_size)], axis=2))
    xp = np.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="reflect")
    x = np.einsum("k,bchkw->bchw", k, np.stack(
        [xp[:, :, :, i:i + x.shape[3]] for i in range(kernel_size)], axis=3))
    return x


def merge_latents(value, latents, masks, scales, blur_kernel_size=33,
                  blur_sigma=10.0):
    """Ref base.py:67-79: feathered mask-weighted average of the global
    prediction with per-region local predictions. value/latents: (B,C,h,w)
    arrays; masks: PIL images (resized to the latent grid)."""
    value = np.asarray(value, np.float32).copy()
    if len(latents) > 0:
        height, width = value.shape[-2:]
        weight = np.ones_like(value)
        for latent, mask, scale in zip(latents, masks, scales):
            m = preprocess_image(mask.resize((width, height)))
            m = (m.mean(axis=1, keepdims=True) > 0).astype(np.float32)
            m = np.repeat(m, value.shape[1], axis=1)
            m = gaussian_blur(m, blur_kernel_size, blur_sigma)
            value += np.asarray(latent, np.float32) * m * scale
            weight += m * scale
        value /= weight
    return value


def control_noise_via_local_prompts(prompt_emb_global, prompt_emb_locals,
                                    masks, mask_scales, inference_callback,
                                    special_kwargs=None,
                                    special_local_kwargs_list=None):
    """Ref base.py:82-92: run the model once globally and once per regional
    prompt, then merge with feathered masks."""
    if special_kwargs is None:
        noise_pred_global = inference_callback(prompt_emb_global)
    else:
        noise_pred_global = inference_callback(prompt_emb_global,
                                               special_kwargs)
    if special_local_kwargs_list is None:
        noise_pred_locals = [inference_callback(e) for e in prompt_emb_locals]
    else:
        noise_pred_locals = [
            inference_callback(e, kw)
            for e, kw in zip(prompt_emb_locals, special_local_kwargs_list)]
    return merge_latents(noise_pred_global, noise_pred_locals, masks,
                         mask_scales)


def extend_prompt(prompter, prompt, local_prompts, masks, mask_scales):
    """Ref base.py:95-104: fold prompter-generated regional prompts (Omost)
    into the user-provided ones (generated regions get scale 100)."""
    local_prompts = list(local_prompts or [])
    masks = list(masks or [])
    mask_scales = list(mask_scales or [])
    extend = getattr(prompter, "extend_prompt", None)
    extended = extend(prompt) if extend is not None else {"prompt": prompt}
    prompt = extended.get("prompt", prompt)
    local_prompts += extended.get("prompts", [])
    masks += extended.get("masks", [])
    mask_scales += [100.0] * len(extended.get("masks", []))
    return prompt, local_prompts, masks, mask_scales
