"""Video post-processor interface (ref diffsynth/processors/base.py)."""


class VideoProcessor:
    """A callable mapping a list of PIL frames to a list of PIL frames."""

    def __call__(self, rendered_frames, **kwargs):
        raise NotImplementedError
