"""Post-processing extensions (behavioral ref: diffsynth/extensions/):
ESRGAN upscaling, RIFE frame interpolation/smoothing, FastBlend."""

from .esrgan import ESRGAN, RRDBNetConfig, esrgan_forward
from .fastblend import FastBlendSmoother, PyramidPatchMatcher
from .rife import RIFEInterpolater, RIFESmoother, ifnet_forward

__all__ = [
    "ESRGAN",
    "FastBlendSmoother",
    "PyramidPatchMatcher",
    "RRDBNetConfig",
    "esrgan_forward",
    "RIFEInterpolater",
    "RIFESmoother",
    "ifnet_forward",
]
