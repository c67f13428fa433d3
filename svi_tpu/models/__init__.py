from . import clip_vision, cog, controlnets, downloader, flux, ipadapter, motion, hunyuan_dit, hunyuan_video, model_io, sd, sd3, sdxl, svd, t5, tiler, wan_dit, wan_vae
from .model_io import ModelManager

__all__ = ["clip_vision", "cog", "controlnets", "downloader", "ipadapter", "motion", "flux", "hunyuan_dit", "hunyuan_video", "model_io", "sd", "sd3", "sdxl", "svd", "t5", "tiler", "wan_dit", "wan_vae", "ModelManager"]
