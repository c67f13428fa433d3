from .cog_video import CogVideoPipeline
from .flux_image import FluxImagePipeline, FluxPrompter
from .hunyuan_video import HunyuanVideoPipeline
from .hunyuan_image import HunyuanDiTImagePipeline, HunyuanTextEncoderWrapper
from .sd3_image import SD3ImagePipeline, SD3Prompter
from .sd_image import SDImagePipeline, SDPrompter
from .sd_video import SDVideoPipeline, denoise_long_video
from .sdxl_image import SDXLImagePipeline, SDXLPrompter
from .sdxl_video import SDXLVideoPipeline
from .svd_video import SVDVideoPipeline
from .svi_video import SVIVideoPipeline, TeaCache, model_fn_wan_video
from .svi_video_dance import SVIDanceVideoPipeline
from .svi_video_talk import SVITalkVideoPipeline
from .wan_video import WanVideoPipeline

__all__ = [
    "SVDVideoPipeline",
    "HunyuanVideoPipeline",
    "CogVideoPipeline",
    "HunyuanDiTImagePipeline",
    "HunyuanTextEncoderWrapper",
    "FluxImagePipeline",
    "FluxPrompter",
    "SDImagePipeline",
    "SDPrompter",
    "SDVideoPipeline",
    "denoise_long_video",
    "SD3ImagePipeline",
    "SD3Prompter",
    "SDXLImagePipeline",
    "SDXLPrompter",
    "SDXLVideoPipeline",
    "SVIVideoPipeline",
    "SVIDanceVideoPipeline",
    "SVITalkVideoPipeline",
    "WanVideoPipeline",
    "TeaCache",
    "model_fn_wan_video",
]
