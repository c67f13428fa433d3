"""Host utils: prompt-file parsing, dimension calc, reference image lookup."""

import os

import numpy as np
from PIL import Image

from svi_tpu.utils.image_process import calculate_dimensions, find_reference_image, resize_and_pad_to_target
from svi_tpu.utils.prompt_files import load_prompts_from_file


def test_load_prompts_python_literal(tmp_path):
    p = tmp_path / "prompt.txt"
    p.write_text('# header comment\nprompts = [\n  "a cat",\n  "a dog, running",\n]\ntrailing junk\n')
    assert load_prompts_from_file(str(p)) == ["a cat", "a dog, running"]


def test_load_prompts_reference_toyfile():
    path = "/root/reference/data/toy_test/film/prompt.txt"
    if not os.path.exists(path):
        return
    prompts = load_prompts_from_file(path)
    assert len(prompts) >= 1 and all(isinstance(x, str) for x in prompts)


def test_load_prompts_plain_lines(tmp_path):
    p = tmp_path / "prompt.txt"
    p.write_text("first prompt\n# comment\nsecond prompt\n")
    assert load_prompts_from_file(str(p)) == ["first prompt", "second prompt"]


def test_load_prompts_missing(tmp_path):
    out = load_prompts_from_file(str(tmp_path / "nope.txt"))
    assert len(out) == 1


def test_calculate_dimensions():
    img = Image.new("RGB", (1920, 1080))
    h, w = calculate_dimensions(img, max_width=832)
    assert w == 832 and w % 16 == 0 and h % 16 == 0
    assert abs(h / w - 1080 / 1920) < 0.05
    img2 = Image.new("RGB", (640, 480))
    h2, w2 = calculate_dimensions(img2, max_width=832)
    assert (h2, w2) == (480, 640)


def test_find_reference_image(tmp_path):
    (tmp_path / "zzz.png").touch()
    (tmp_path / "aaa.jpg").touch()
    assert find_reference_image(str(tmp_path)).endswith("aaa.jpg")
    (tmp_path / "frame.png").touch()
    assert find_reference_image(str(tmp_path)).endswith("frame.png")
    (tmp_path / "frame.jpg").touch()
    assert find_reference_image(str(tmp_path)).endswith("frame.jpg")


def test_resize_and_pad():
    x = np.ones((1, 3, 20, 40), np.float32)
    out = resize_and_pad_to_target(x, (32, 32), pad_value=0.0)
    assert out.shape == (1, 3, 32, 32)
    assert out[0, 0, 0, 0] == 0.0  # padded top
    assert out[0, 0, 16, 16] == 1.0  # center content
