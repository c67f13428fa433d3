"""Fidelity measurement utilities — the in-repo path for the BASELINE
"PSNR > 35 vs reference clips" target.

Used by tests/test_fidelity_psnr.py (tiny-config pipeline-vs-reference
comparison through tests/reference_loader.py) and by real-weight validation
once checkpoints are available (generate with the reference, score with
clip_psnr)."""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    """Peak signal-to-noise ratio in dB. Arrays in [0,255] (peak=255) or
    [-1,1] (peak=2) — inferred from dtype when not given."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if peak is None:
        peak = 255.0 if a.max() > 2.0 else 2.0
    mse = np.mean((a - b) ** 2)
    return float(10 * np.log10(peak * peak / max(mse, 1e-12)))


def clip_psnr(frames_a, frames_b) -> float:
    """PSNR over two clips given as lists of PIL images / HWC uint8 arrays."""
    a = np.stack([np.asarray(f) for f in frames_a]).astype(np.float64)
    b = np.stack([np.asarray(f) for f in frames_b]).astype(np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return psnr(a, b, peak=255.0)
