from . import audio, image_process, prompt_files, video

__all__ = ["audio", "image_process", "prompt_files", "video"]
