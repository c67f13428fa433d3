"""Processors chain, VideoData/frame IO, and the config-driven
SDVideoPipelineRunner orchestration."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from svi_tpu.processors import (AutoVideoProcessor, ContrastEditor,
                                SequencialProcessor, SharpnessEditor)
from svi_tpu.utils import video as vid

from reference_loader import load_ref_module


def _frames(n=3, size=(64, 48)):
    rng = np.random.RandomState(0)
    return [Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3),
                                        dtype=np.uint8)) for _ in range(n)]


def test_pil_editors_match_reference_semantics():
    frames = _frames(2)
    ours = ContrastEditor(rate=1.3)(frames)
    from PIL import ImageEnhance

    ref = [ImageEnhance.Contrast(f).enhance(1.3) for f in frames]
    np.testing.assert_array_equal(np.asarray(ours[0]), np.asarray(ref[0]))
    ours = SharpnessEditor(rate=0.5)(frames)
    ref = [ImageEnhance.Sharpness(f).enhance(0.5) for f in frames]
    np.testing.assert_array_equal(np.asarray(ours[1]), np.asarray(ref[1]))


def test_sequencial_processor_chain_and_dispatch():
    configs = [{"processor_type": "Contrast", "config": {"rate": 1.2}},
               {"processor_type": "Sharpness", "config": {"rate": 1.1}}]
    seq = SequencialProcessor.from_model_manager(None, configs)
    frames = _frames(2)
    out = seq(frames)
    assert len(out) == 2 and out[0].size == frames[0].size
    manual = SharpnessEditor(1.1)(ContrastEditor(1.2)(frames))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(manual[0]))

    with pytest.raises(ValueError):
        AutoVideoProcessor.from_model_manager(None, "NotAProcessor")


def test_split_file_name_matches_reference():
    ref = load_ref_module("diffsynth.data.video")
    for name in ("frame10.png", "frame2.png", "a1b02c.png", "xyz.png", "12"):
        assert vid.split_file_name(name) == ref.split_file_name(name)
    names = ["f10.png", "f2.png", "f1.png"]
    assert sorted(names, key=vid.split_file_name) == ["f1.png", "f2.png",
                                                      "f10.png"]


def test_crop_and_resize_matches_reference():
    ref = load_ref_module("diffsynth.data.video")
    img = _frames(1, size=(100, 60))[0]
    ours = np.asarray(vid.crop_and_resize(img, 32, 32))
    theirs = np.asarray(ref.crop_and_resize(img, 32, 32))
    np.testing.assert_array_equal(ours, theirs)
    img = _frames(1, size=(60, 100))[0]
    np.testing.assert_array_equal(
        np.asarray(vid.crop_and_resize(img, 32, 64)),
        np.asarray(ref.crop_and_resize(img, 32, 64)))


def test_video_data_sources(tmp_path):
    frames = _frames(4)
    folder = tmp_path / "imgs"
    os.makedirs(folder)
    for i, f in enumerate(frames):
        f.save(folder / f"frame{i}.png")

    data = vid.VideoData(image_folder=str(folder), height=32, width=32)
    assert len(data) == 4
    assert data[0].size == (32, 32)
    assert data.shape() == (32, 32)
    data.set_length(2)
    assert len(data) == 2

    mp4 = tmp_path / "v.mp4"
    vid.save_video(frames, str(mp4), fps=8)
    vdata = vid.VideoData(video_file=str(mp4))
    assert len(vdata) == 4
    assert vdata[1].size == frames[0].size

    out_dir = tmp_path / "frames_out"
    vid.save_frames(frames, str(out_dir))
    assert sorted(os.listdir(out_dir)) == ["0.png", "1.png", "2.png", "3.png"]

    with pytest.raises(ValueError):
        vid.VideoData()


def test_runner_orchestration(tmp_path, monkeypatch):
    """run(): data loading -> synthesize -> save_output provenance
    (ref pipeline_runner.py:82-105), pipeline stubbed."""
    from svi_tpu.pipelines.pipeline_runner import SDVideoPipelineRunner

    frames = _frames(3)
    mp4 = tmp_path / "in.mp4"
    vid.save_video(frames, str(mp4), fps=8)

    class StubPipe:
        prompter = type("P", (), {"load_textual_inversions":
                                  staticmethod(lambda paths: None)})()

        def __call__(self, prompt, input_frames=None, smoother=None,
                     seed=None, **kw):
            out = [f.copy() for f in input_frames]
            return smoother(out) if smoother is not None else out

    runner = SDVideoPipelineRunner()
    monkeypatch.setattr(runner, "load_pipeline",
                        lambda **kw: (None, StubPipe()))
    config = {
        "models": {"model_list": [], "textual_inversion_folder": None,
                   "device": None, "lora_alphas": [],
                   "controlnet_units": []},
        "data": {
            "input_frames": {"video_file": str(mp4), "height": 48,
                             "width": 64, "start_frame_id": 0,
                             "end_frame_id": 2},
            "controlnet_frames": [],
            "output_folder": str(tmp_path / "out"),
            "fps": 8,
        },
        "pipeline": {"seed": 0,
                     "pipeline_inputs": {"prompt": "x"}},
        "smoother_configs": [
            {"processor_type": "Contrast", "config": {"rate": 1.5}}],
    }
    out = runner.run(config)
    assert len(out) == 2
    assert os.path.exists(tmp_path / "out" / "video.mp4")
    assert os.path.exists(tmp_path / "out" / "frames" / "0.png")
    saved = json.load(open(tmp_path / "out" / "config.json"))
    assert saved["pipeline"]["pipeline_inputs"]["input_frames"] == []
    # num_frames / width / height were derived from the video
    assert saved["pipeline"]["pipeline_inputs"]["num_frames"] == 2
    assert saved["pipeline"]["pipeline_inputs"]["width"] == 64
