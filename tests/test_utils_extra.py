"""Golden/behavior tests for the downloader, VACE processor and qwen_vl
vision-input math (refs: diffsynth/models/downloader.py,
diffsynth/utils/vace_processor.py, diffsynth/utils/qwen_vl_utils.py)."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from reference_loader import load_ref_module


# ---------------------------------------------------------------------------
# qwen_vl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_qwen():
    return load_ref_module("diffsynth.utils.qwen_vl_utils")


def test_smart_resize_golden(ref_qwen):
    from svi_tpu.utils import qwen_vl

    for h, w in [(480, 832), (1080, 1920), (28, 28), (100, 3000), (720, 720)]:
        assert qwen_vl.smart_resize(h, w) == ref_qwen.smart_resize(h, w)
    # pixel budget clamps
    assert qwen_vl.smart_resize(10_000, 10_000) == \
        ref_qwen.smart_resize(10_000, 10_000)
    with pytest.raises(ValueError):
        qwen_vl.smart_resize(28, 28 * 300)


def test_smart_nframes_golden(ref_qwen):
    from svi_tpu.utils import qwen_vl

    for ele, total, fps in [({}, 100, 25), ({"fps": 4}, 240, 24),
                            ({"nframes": 17}, 100, 30),
                            ({"fps": 1, "max_frames": 10}, 1000, 30)]:
        assert qwen_vl.smart_nframes(ele, total, fps) == \
            ref_qwen.smart_nframes(ele, total, fps)


def test_fetch_image_resizes_to_factor():
    from svi_tpu.utils import qwen_vl

    img = Image.fromarray(np.zeros((123, 217, 3), np.uint8))
    out = qwen_vl.fetch_image({"image": img})
    assert out.width % 28 == 0 and out.height % 28 == 0


def test_process_vision_info_collects_messages():
    from svi_tpu.utils import qwen_vl

    img = Image.fromarray(np.zeros((56, 56, 3), np.uint8))
    messages = [
        {"role": "system", "content": [{"type": "text", "text": "s"}]},
        {"role": "user", "content": [{"type": "text", "text": "p"},
                                     {"type": "image", "image": img}]},
    ]
    images, videos = qwen_vl.process_vision_info(messages)
    assert len(images) == 1 and videos is None


# ---------------------------------------------------------------------------
# vace_processor
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_vace():
    return load_ref_module("diffsynth.utils.vace_processor")


def _procs(ref_vace, **kw):
    from svi_tpu.utils import vace_processor as ours

    args = dict(downsample=(4, 8, 8), min_area=480 * 832 // 4,
                max_area=480 * 832, min_fps=8, max_fps=24, zero_start=True,
                seq_len=32760, keep_last=True)
    args.update(kw)
    return (ours.VaceVideoProcessor(**args),
            ref_vace.VaceVideoProcessor(**args))


@pytest.mark.parametrize("keep_last", [True, False])
def test_frameid_bbox_golden(ref_vace, keep_last):
    ours, ref = _procs(ref_vace, keep_last=keep_last, zero_start=True)
    fps = 30.0
    n = 120
    ts = np.stack([np.arange(n) / fps, (np.arange(n) + 1) / fps],
                  axis=1).astype(np.float32)
    rng_a = np.random.default_rng(7)
    rng_b = np.random.default_rng(7)
    got = ours._get_frameid_bbox(fps, ts, 480, 640, None, rng_a)
    want = ref._get_frameid_bbox(fps, ts, 480, 640, None, rng_b)
    assert got[0] == want[0]          # frame ids
    assert got[1] == want[1]          # bbox
    assert got[2] == want[2]          # (oh, ow)
    np.testing.assert_allclose(got[3], want[3])  # fps


def test_vace_resize_crop_close_to_reference(ref_vace):
    from svi_tpu.utils import vace_processor as ours

    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (5, 60, 90, 3)).astype(np.uint8)
    got = ours.VaceVideoProcessor.resize_crop(video, 48, 64)
    want = ref_vace.VaceVideoProcessor.resize_crop(
        torch.from_numpy(video.astype(np.float32)), 48, 64).numpy()
    assert got.shape == want.shape == (3, 5, 48, 64)
    # PIL bicubic (antialias) vs torch antialias bicubic: near-identical
    assert np.abs(got - want).mean() < 0.01


def test_vace_image_processor_budget(ref_vace):
    from svi_tpu.utils import vace_processor as ours

    img = Image.fromarray(np.zeros((300, 500, 3), np.uint8))
    p = ours.VaceImageProcessor(downsample=(4, 8, 8), seq_len=1024)
    arr, (oh, ow) = p.load_image_batch(img)
    assert (oh // 8) * (ow // 8) <= 1024
    assert arr.shape == (3, 1, oh, ow)
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_prepare_source_fills_and_letterboxes():
    from svi_tpu.utils.vace_processor import prepare_source

    src_video = [None]
    src_mask = [None]
    ref_img = np.zeros((3, 1, 30, 40), np.float32)
    src_refs = [[ref_img]]
    v, m, r = prepare_source(src_video, src_mask, src_refs, 9, (64, 64))
    assert v[0].shape == (3, 9, 64, 64) and (v[0] == 0).all()
    assert m[0].shape == (1, 9, 64, 64) and (m[0] == 1).all()
    assert r[0][0].shape == (3, 1, 64, 64)
    # letterbox: white bands top/bottom (30/40 -> 48x64 centered)
    assert (r[0][0][:, :, :8, :] == 1).all()


# ---------------------------------------------------------------------------
# downloader
# ---------------------------------------------------------------------------


def test_download_models_uses_local_cache(tmp_path, monkeypatch):
    """Files already under local_dir resolve without any network backend
    (ref downloader.py:11-13/:27-29 skip-if-present)."""
    from svi_tpu.models import downloader

    monkeypatch.chdir(tmp_path)
    os.makedirs("models/stable_diffusion", exist_ok=True)
    target = os.path.join("models/stable_diffusion",
                          "v1-5-pruned-emaonly.safetensors")
    open(target, "wb").close()

    files = downloader.download_models(["StableDiffusion_v15"],
                                       ["HuggingFace"])
    assert files == [target]

    got = downloader.download_customized_models(
        "benjamin-paine/stable-diffusion-v1-5",
        "v1-5-pruned-emaonly.safetensors", "models/stable_diffusion",
        ["HuggingFace"])
    assert got == [target]


def test_download_models_missing_without_network(tmp_path, monkeypatch):
    """No local cache + no reachable backend -> empty result, no raise.
    hf_hub_download is monkeypatched out so the test never spins on DNS
    retries (this environment has no egress)."""
    from svi_tpu.models import downloader

    monkeypatch.chdir(tmp_path)

    def _no_net(*a, **k):
        raise OSError("no network egress")

    monkeypatch.setitem(downloader.website_to_download_fn, "HuggingFace",
                        _no_net)
    files = downloader.download_models(["StableDiffusionXL_v1"],
                                       ["HuggingFace"])
    assert files == []


def test_register_preset_models(tmp_path, monkeypatch):
    from svi_tpu.models import downloader

    monkeypatch.chdir(tmp_path)
    downloader.register_preset_models(
        "MyModel", [("org/repo", "weights.safetensors", "models/custom")],
        website="HuggingFace")
    os.makedirs("models/custom", exist_ok=True)
    open("models/custom/weights.safetensors", "wb").close()
    files = downloader.download_models(["MyModel"], ["HuggingFace"])
    assert files == [os.path.join("models/custom", "weights.safetensors")]
    downloader.preset_models_on_huggingface.pop("MyModel")
