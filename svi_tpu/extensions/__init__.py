"""Post-processing extensions (behavioral ref: diffsynth/extensions/):
ESRGAN upscaling, RIFE frame interpolation/smoothing, FastBlend."""

from .esrgan import ESRGAN, RRDBNetConfig, esrgan_forward
from .rife import RIFEInterpolater, RIFESmoother, ifnet_forward

__all__ = [
    "ESRGAN",
    "RRDBNetConfig",
    "esrgan_forward",
    "RIFEInterpolater",
    "RIFESmoother",
    "ifnet_forward",
]
