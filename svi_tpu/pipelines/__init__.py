from .svi_video import SVIVideoPipeline, TeaCache, model_fn_wan_video

__all__ = ["SVIVideoPipeline", "TeaCache", "model_fn_wan_video"]
