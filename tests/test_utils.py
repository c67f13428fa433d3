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


def test_load_prompts_toyfile():
    path = os.path.join(os.path.dirname(__file__), "..", "data", "toy_test", "film", "prompt.txt")
    assert os.path.exists(path), "repo toy data missing — run scripts/make_toy_data.py"
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


def test_metadata_gen(tmp_path):
    from svi_tpu.utils.project_utils import generate_metadata_with_captions
    import csv

    vd = tmp_path / "videos"
    cd = tmp_path / "caps"
    vd.mkdir()
    cd.mkdir()
    (vd / "a.mp4").touch()
    (vd / "b.mp4").touch()
    (cd / "a.txt").write_text("a cat jumps")
    out = str(tmp_path / "meta.csv")
    n = generate_metadata_with_captions(str(vd), str(cd), out, default_text="fallback")
    assert n == 2
    rows = list(csv.DictReader(open(out)))
    d = {r["Filename"]: r["Video Description"] for r in rows}
    assert d["a.mp4"] == "a cat jumps"
    assert d["b.mp4"] == "fallback"


def test_save_args_and_experiment_path(tmp_path):
    import argparse

    from svi_tpu.utils.project_utils import save_args, update_experiment_path

    args = argparse.Namespace(train_architecture="lora", lora_rank=4,
                              exp_prefix="t", output_path=str(tmp_path))
    update_experiment_path(args)
    assert args.output_path.endswith("t-lora_4")
    path = save_args(args, args.output_path)
    assert os.path.exists(path) or os.path.exists(os.path.splitext(path)[0] + ".json")


def test_metrics_logger_and_profile_trace(tmp_path):
    """SURVEY §5 observability: JSONL metrics stream + profiler context."""
    import json

    from svi_tpu.utils.logging import MetricsLogger, profile_trace

    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path)
    log.log(1, loss=0.5, grad_norm=1.25, warmup=True)
    log.log(2, loss=0.25)
    log.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["step"] == 1 and recs[0]["loss"] == 0.5 and recs[0]["warmup"] == 1.0
    assert recs[1]["loss"] == 0.25 and "wall_time" in recs[1]

    with profile_trace(None):
        pass  # no-op path
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.ones((4,)) + 1
    assert (tmp_path / "trace").exists()


def test_prompt_expander_dispatch(tmp_path):
    """prompt_extend structure parity (ref prompt_extend.py:164-211):
    system-prompt selection by language/VL/multi-image, seed handling,
    PromptOutput envelope; official texts loadable at runtime."""
    import json

    from svi_tpu.utils import prompt_extend as pe

    calls = {}

    class Stub(pe.PromptExpander):
        def extend(self, prompt, system_prompt, seed=-1, *a, **k):
            calls.update(prompt=prompt, system_prompt=system_prompt, seed=seed)
            return pe.PromptOutput(True, prompt + "!", seed, system_prompt, "{}")

        def extend_with_img(self, prompt, system_prompt, image=None, seed=-1, *a, **k):
            calls.update(image=image, system_prompt=system_prompt)
            return pe.PromptOutput(True, prompt, seed, system_prompt, "{}")

    ex = Stub("stub")
    out = ex("a cat", tar_lang="en", seed=7)
    assert out.status and out.prompt == "a cat!" and out.seed == 7
    assert calls["system_prompt"] == pe.SYSTEM_PROMPT_TYPES[0]
    out = ex("一只猫", tar_lang="zh")
    assert calls["system_prompt"] == pe.SYSTEM_PROMPT_TYPES[1]
    assert out.seed >= 0

    vl = Stub("stub", is_vl=True)
    vl("a cat", tar_lang="en", image="img.png")
    assert calls["system_prompt"] == pe.SYSTEM_PROMPT_TYPES[2]
    vl2 = Stub("stub", is_vl=True)
    vl2("a cat", tar_lang="en", image=["a.png", "b.png"])
    assert calls["system_prompt"] == pe.SYSTEM_PROMPT_TYPES[6]

    # official texts can replace the defaults at runtime
    path = tmp_path / "sys.json"
    path.write_text(json.dumps({"0": "OFFICIAL EN"}))
    pe.load_system_prompts(str(path))
    try:
        ex("x", tar_lang="en")
        assert calls["system_prompt"] == "OFFICIAL EN"
    finally:
        pe.SYSTEM_PROMPT_TYPES[0] = pe.LM_EN_SYS_PROMPT

    out = pe.PromptOutput(True, "p", 1, "s", "{}")
    out.add_custom_field("extra", 3)
    assert out.extra == 3
