"""Config-driven smoother chains (ref diffsynth/processors/
sequencial_processor.py — the reference's spelling is kept for API parity).

Processor types map onto the TPU-native implementations: FastBlend and RIFE
live in svi_tpu.extensions (patch-match pyramid / IFNet in JAX), the PIL
editors are host-side."""

from .base import VideoProcessor


class AutoVideoProcessor(VideoProcessor):
    """Ref sequencial_processor.py:4-21: processor_type dispatch."""

    @staticmethod
    def from_model_manager(model_manager, processor_type, **kwargs):
        if processor_type == "FastBlend":
            from ..extensions.fastblend import FastBlendSmoother

            return FastBlendSmoother.from_model_manager(model_manager,
                                                        **kwargs)
        if processor_type == "Contrast":
            from .pil_editor import ContrastEditor

            return ContrastEditor.from_model_manager(model_manager, **kwargs)
        if processor_type == "Sharpness":
            from .pil_editor import SharpnessEditor

            return SharpnessEditor.from_model_manager(model_manager, **kwargs)
        if processor_type == "RIFE":
            from ..extensions.rife import RIFESmoother

            return RIFESmoother.from_model_manager(model_manager, **kwargs)
        raise ValueError(f"invalid processor_type: {processor_type}")


class SequencialProcessor(VideoProcessor):
    """Ref sequencial_processor.py:24-41: run processors in order."""

    def __init__(self, processors=()):
        self.processors = list(processors)

    @staticmethod
    def from_model_manager(model_manager, configs):
        return SequencialProcessor([
            AutoVideoProcessor.from_model_manager(
                model_manager, config["processor_type"], **config["config"])
            for config in configs
        ])

    def __call__(self, rendered_frames, **kwargs):
        for processor in self.processors:
            rendered_frames = processor(rendered_frames, **kwargs)
        return rendered_frames
