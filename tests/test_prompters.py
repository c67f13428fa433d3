"""Prompter subsystem: base plumbing, textual inversions, refiners, Omost.

Golden parity where the reference module is importable (omost Canvas math);
behavioral tests with injected fake LLMs elsewhere (the real refiners are
checkpoint-gated host tooling)."""

import numpy as np
import pytest
import torch

from svi_tpu.prompters import base_prompter as bp
from svi_tpu.prompters import omost
from svi_tpu.prompters import prompt_refiners as pr
from svi_tpu.prompters import textual_inversion as ti

from reference_loader import load_ref_module

CANVAS_PROGRAM = """```python
canvas = Canvas()
canvas.set_global_description(
    description='A serene lake at dawn',
    detailed_descriptions=['Mist drifts over the water', 'Golden light'],
    tags='lake, dawn, mist', HTML_web_color_name='sky blue')
canvas.add_local_description(
    location='on the left', offset='slightly to the upper',
    area='a medium-sized vertical area', distance_to_viewer=2.5,
    description='A wooden boat', detailed_descriptions=['An old rowboat'],
    tags='boat', atmosphere='calm', style='realistic',
    quality_meta='high detail', HTML_web_color_name='saddlebrown')
canvas.add_local_description(
    location='in the center', offset='no offset',
    area='a large square area', distance_to_viewer=5.0,
    description='The lake surface', detailed_descriptions=['Reflections'],
    tags='water', atmosphere='serene', style='photo', quality_meta='4k',
    HTML_web_color_name='navyblue')
```"""
BOT_RESPONSE = f"Sure! Here is the canvas:\n{CANVAS_PROGRAM}\nEnjoy."


def test_omost_vocab_tables_match_reference():
    ref = load_ref_module("diffsynth.prompters.omost")
    assert omost.valid_colors == ref.valid_colors
    assert omost.valid_locations == ref.valid_locations
    assert omost.valid_offsets == ref.valid_offsets
    assert omost.valid_areas == ref.valid_areas


def test_omost_canvas_golden_parity():
    """Canvas parse + process vs the reference implementation, including the
    fuzzy color correction ('sky blue' -> 'skyblue')."""
    ref = load_ref_module("diffsynth.prompters.omost")
    ours = omost.Canvas.from_bot_response(BOT_RESPONSE).process()
    theirs = ref.Canvas.from_bot_response(BOT_RESPONSE).process()

    np.testing.assert_array_equal(ours["initial_latent"],
                                  theirs["initial_latent"])
    assert len(ours["bag_of_conditions"]) == len(theirs["bag_of_conditions"])
    for a, b in zip(ours["bag_of_conditions"], theirs["bag_of_conditions"]):
        np.testing.assert_array_equal(a["mask"], b["mask"])
        assert a["prefixes"] == b["prefixes"]
        assert a["suffixes"] == b["suffixes"]
        assert a["location"] == b["location"]


def test_omost_prompter_end_to_end():
    """OmostPromter with an injected chat_fn: prompt/prompts/masks derivation
    (ref omost.py:296-311)."""
    ref = load_ref_module("diffsynth.prompters.omost")
    out = omost.OmostPromter(chat_fn=lambda conversation: BOT_RESPONSE)(
        dict(prompt="a lake"))
    ref_canvas = ref.Canvas.from_bot_response(BOT_RESPONSE).process()
    ref_prompts = [" ".join(c["prefixes"] + c["suffixes"][:2])
                   for c in ref_canvas["bag_of_conditions"]]
    assert out["prompt"] == ref_prompts[0]
    assert out["prompts"] == ref_prompts[1:]
    assert len(out["masks"]) == len(ref_canvas["bag_of_conditions"])
    m0 = np.asarray(out["masks"][0])
    assert m0.shape == (90, 90, 3) and m0.max() == 255


def test_omost_rejects_bad_response():
    with pytest.raises(ValueError):
        omost.Canvas.from_bot_response("no code here")
    with pytest.raises(ValueError):
        omost.Canvas.from_bot_response("```python\nx = 1\n```")


def test_base_prompter_refiner_chain():
    class AddA:
        def __call__(self, prompt, positive=True):
            return prompt + "|A" if positive else prompt

        @staticmethod
        def from_model_manager(mm):
            return AddA()

    class AddB(AddA):
        def __call__(self, prompt, positive=True):
            return prompt + "|B" if positive else prompt

        @staticmethod
        def from_model_manager(mm):
            return AddB()

    p = bp.BasePrompter()
    p.load_prompt_refiners(None, [AddA, AddB])
    assert p.process_prompt("x") == "x|A|B"
    assert p.process_prompt("x", positive=False) == "x"
    assert p.process_prompt(["x", "y"]) == ["x|A|B", "y|A|B"]


def test_prompt_refiners_assembly():
    beau = pr.BeautifulPrompt(generate_fn=lambda text: "  tags, here ")
    assert beau("a cat") == "a cat, tags, here"
    assert beau("a cat", positive=False) == "a cat"
    # the template carries the raw prompt
    seen = {}
    pr.BeautifulPrompt(generate_fn=lambda t: seen.setdefault("t", t) or "x")(
        "DOG")
    assert "DOG" in seen["t"]

    qwen = pr.QwenPrompt(chat_fn=lambda messages: "translated")
    assert qwen("CN prompt") == "translated"
    assert qwen("CN prompt", positive=False) == "CN prompt"

    trans = pr.Translator(translate_fn=lambda t: f"en({t})")
    assert trans("hola") == "en(hola)"

    assert pr.beautiful_prompt_template_for("/m/pai-bloom-1b1-text2prompt-sd"
                                            ) == pr.BEAUTIFUL_PROMPT_TEMPLATE_V1
    assert pr.beautiful_prompt_template_for("/m/bp-sd-v2"
                                            ) == pr.BEAUTIFUL_PROMPT_TEMPLATE_V2


def test_refiner_templates_match_reference_source():
    import ast
    import re

    src = open("/root/reference/diffsynth/prompters/prompt_refiners.py").read()
    m = re.search(r'system_prompt = (""".*?""")', src, re.DOTALL)
    assert pr.QWEN_SYSTEM_PROMPT == ast.literal_eval(m.group(1))
    m = re.search(r'template = ("""Converts.*?""")', src, re.DOTALL)
    assert pr.BEAUTIFUL_PROMPT_TEMPLATE_V2 == ast.literal_eval(m.group(1))
    m = re.search(r"template = ('Instruction.*?')", src, re.DOTALL)
    assert pr.BEAUTIFUL_PROMPT_TEMPLATE_V1 == ast.literal_eval(m.group(1))


def test_textual_inversion_loading(tmp_path):
    torch.manual_seed(0)
    flat = {"emb_params": torch.randn(3, 768)}
    torch.save(flat, tmp_path / "mystyle.pt")
    nested = {"string_to_param": {"*": torch.randn(2, 768)},
              "name": "other"}
    torch.save(nested, tmp_path / "otherstyle.pt")

    d = ti.load_textual_inversion_dict(
        [str(tmp_path / "mystyle.pt"), str(tmp_path / "otherstyle.pt")])
    assert d["mystyle"][0] == ["mystyle_0", "mystyle_1", "mystyle_2"]
    assert d["otherstyle"][1].shape == (2, 768)
    np.testing.assert_allclose(d["mystyle"][1], flat["emb_params"].numpy())

    table = np.zeros((10, 768), np.float32)
    extended = ti.extend_token_embedding(table, d)
    assert extended.shape == (15, 768)
    np.testing.assert_allclose(extended[10:13], d["mystyle"][1])

    repl = ti.keyword_replacements(d)
    assert repl["mystyle"] == " mystyle_0 mystyle_1 mystyle_2 "


def test_search_for_embeddings_recurses():
    sd = {"a": torch.ones(2, 3), "b": {"c": torch.zeros(4)}, "d": "str"}
    found = ti.search_for_embeddings(sd)
    assert len(found) == 2
