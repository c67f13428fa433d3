from .sd_image import SDImagePipeline, SDPrompter
from .svi_video import SVIVideoPipeline, TeaCache, model_fn_wan_video
from .svi_video_dance import SVIDanceVideoPipeline
from .svi_video_talk import SVITalkVideoPipeline
from .wan_video import WanVideoPipeline

__all__ = [
    "SDImagePipeline",
    "SDPrompter",
    "SVIVideoPipeline",
    "SVIDanceVideoPipeline",
    "SVITalkVideoPipeline",
    "WanVideoPipeline",
    "TeaCache",
    "model_fn_wan_video",
]
