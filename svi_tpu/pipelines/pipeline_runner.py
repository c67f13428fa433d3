"""Config-driven video style-transfer runner.

Behavioral reference: diffsynth/pipelines/pipeline_runner.py
(SDVideoPipelineRunner :8-105): JSON config with `models` (checkpoint list,
textual-inversion folder, LoRA alphas, ControlNet units), `data` (input
video / image-folder windows + output folder + fps) and `pipeline`
(seed + pipeline inputs); loads everything, renders, applies the smoother
chain, and writes frames + mp4 + the provenance config copy.

The streamlit progress plumbing is dropped (host UI concern); pass
`in_streamlit=False`-equivalent behavior always."""

from __future__ import annotations

import json
import os

import numpy as np

from ..models.model_io import ModelManager
from ..models.controlnets import ControlNetConfigUnit
from ..processors.sequencial_processor import SequencialProcessor
from ..utils.video import VideoData, save_frames, save_video
from .sd_video import SDVideoPipeline


class SDVideoPipelineRunner:
    """Ref pipeline_runner.py:8-105."""

    def __init__(self, in_streamlit=False):
        self.in_streamlit = in_streamlit

    def load_pipeline(self, model_list, textual_inversion_folder, device=None,
                      lora_alphas=(), controlnet_units=()):
        model_manager = ModelManager(device=device)
        model_manager.load_models(model_list)
        pipe = SDVideoPipeline.from_model_manager(
            model_manager,
            [ControlNetConfigUnit(processor_id=unit["processor_id"],
                                  model_path=unit["model_path"],
                                  scale=unit["scale"])
             for unit in controlnet_units])
        ti_paths = []
        if textual_inversion_folder and os.path.isdir(textual_inversion_folder):
            for file_name in sorted(os.listdir(textual_inversion_folder)):
                if file_name.endswith((".pt", ".bin", ".pth", ".safetensors")):
                    ti_paths.append(os.path.join(textual_inversion_folder,
                                                 file_name))
        if ti_paths:
            pipe.prompter.load_textual_inversions(ti_paths)
        return model_manager, pipe

    def load_smoother(self, model_manager, smoother_configs):
        return SequencialProcessor.from_model_manager(model_manager,
                                                      smoother_configs)

    def synthesize_video(self, model_manager, pipe, seed, smoother,
                         **pipeline_inputs):
        return pipe(**pipeline_inputs, smoother=smoother, seed=seed)

    def load_video(self, video_file=None, image_folder=None, height=None,
                   width=None, start_frame_id=None, end_frame_id=None):
        video = VideoData(video_file=video_file, image_folder=image_folder,
                          height=height, width=width)
        if start_frame_id is None:
            start_frame_id = 0
        if end_frame_id is None:
            end_frame_id = len(video)
        return [video[i] for i in range(start_frame_id, end_frame_id)]

    def add_data_to_pipeline_inputs(self, data, pipeline_inputs):
        pipeline_inputs["input_frames"] = self.load_video(
            **data["input_frames"])
        pipeline_inputs["num_frames"] = len(pipeline_inputs["input_frames"])
        pipeline_inputs["width"], pipeline_inputs["height"] = \
            pipeline_inputs["input_frames"][0].size
        if len(data.get("controlnet_frames", [])) > 0:
            pipeline_inputs["controlnet_frames"] = [
                self.load_video(**unit) for unit in data["controlnet_frames"]]
        return pipeline_inputs

    def save_output(self, video, output_folder, fps, config):
        os.makedirs(output_folder, exist_ok=True)
        save_frames(video, os.path.join(output_folder, "frames"))
        save_video(video, os.path.join(output_folder, "video.mp4"), fps=fps)
        config["pipeline"]["pipeline_inputs"]["input_frames"] = []
        config["pipeline"]["pipeline_inputs"]["controlnet_frames"] = []
        with open(os.path.join(output_folder, "config.json"), "w") as f:
            json.dump(config, f, indent=4)

    def run(self, config):
        config["pipeline"]["pipeline_inputs"] = self.add_data_to_pipeline_inputs(
            config["data"], config["pipeline"]["pipeline_inputs"])
        model_manager, pipe = self.load_pipeline(**config["models"])
        if "smoother_configs" in config:
            smoother = self.load_smoother(model_manager,
                                          config["smoother_configs"])
        else:
            smoother = None
        output_video = self.synthesize_video(
            model_manager, pipe, config["pipeline"]["seed"], smoother,
            **config["pipeline"]["pipeline_inputs"])
        self.save_output(output_video, config["data"]["output_folder"],
                         config["data"]["fps"], config)
        return output_video
