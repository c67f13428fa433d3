"""HunyuanVideoPrompter: template table parity + crop/assembly semantics.

Reference: diffsynth/prompters/hunyuan_video_prompter.py. The LLM itself is
injected (host-side conditioning); these tests pin the template constants
against the reference module and verify the token-surgery math on
hand-computable examples.
"""

import numpy as np

from reference_loader import load_ref_module

from svi_tpu.prompters.hunyuan_video_prompter import (
    NEGATIVE_PROMPT,
    PROMPT_TEMPLATE,
    HunyuanVideoPrompter,
)


def test_prompt_template_table_matches_reference():
    ref = load_ref_module("diffsynth.prompters.hunyuan_video_prompter")
    assert set(PROMPT_TEMPLATE) == set(ref.PROMPT_TEMPLATE)
    for key, tpl in ref.PROMPT_TEMPLATE.items():
        for field, val in tpl.items():
            assert PROMPT_TEMPLATE[key][field] == val, (key, field)
    assert NEGATIVE_PROMPT == ref.NEGATIVE_PROMPT


class _FakeLlamaTokenizer:
    """Pads to max_length with id 0, mask 1 on 'real' ids."""

    def __init__(self, ids):
        self.ids = ids

    def __call__(self, prompt, return_tensors=None, padding=None,
                 max_length=None, truncation=None):
        ids = list(self.ids)[:max_length]
        mask = [1] * len(ids) + [0] * (max_length - len(ids))
        ids = ids + [0] * (max_length - len(ids))

        class R:
            input_ids = np.asarray([ids])
            attention_mask = np.asarray([mask])

        return R()


def test_encode_prompt_using_llm_crops_template_prefix():
    """Ref :132-154: pad to max_length+crop_start, crop `crop_start`."""
    calls = {}

    def llm(input_ids, attention_mask, skip):
        calls["shape"] = input_ids.shape
        calls["skip"] = skip
        s = input_ids.shape[1]
        return np.arange(s, dtype=np.float32)[None, :, None] \
            * np.ones((1, s, 4))

    p = HunyuanVideoPrompter(tokenizer_2=_FakeLlamaTokenizer(range(1, 9)),
                             llm_forward=llm)
    hidden, mask = p.encode_prompt_using_llm("x", max_length=10,
                                             crop_start=3)
    assert calls["shape"] == (1, 13) and calls["skip"] == 2
    assert hidden.shape == (1, 10, 4)
    np.testing.assert_array_equal(hidden[0, :, 0], np.arange(3, 13))
    assert mask.shape == (1, 10)


def test_crop_mllm_states_spans():
    """Hand-computed i2v token surgery (ref :215-233 semantics)."""
    p = HunyuanVideoPrompter()
    template = {"image_emb_len": 6, "image_emb_start": 2, "image_emb_end": 8,
                "double_return_token_id": 99}
    input_ids = np.zeros((1, 12), np.int64)
    input_ids[0, 3] = 99
    input_ids[0, 9] = 99  # last double-return token at 9
    attention_mask = np.ones((1, 12), np.int64)
    s_h = 17  # 12 - 1 + image_emb_len (image token expands in hidden space)
    hidden = np.arange(s_h, dtype=np.float32)[None, :, None] * np.ones(
        (1, s_h, 2))
    crop_start = 4

    emb, mask = p.crop_mllm_states(input_ids, attention_mask, hidden,
                                   crop_start, template=template,
                                   image_embed_interleave=2)
    # image span: hidden[2:8] subsampled ::2 -> positions 2, 4, 6
    # text span: hidden[text_crop_start=9 : assistant_crop_start=10]
    #            ++ hidden[assistant_crop_end=14 :] -> 9, 14, 15, 16
    np.testing.assert_array_equal(emb[0, :, 0], [2, 4, 6, 9, 14, 15, 16])
    # mask: image ones (3) + attention_mask[4:5] ++ attention_mask[9:] (4)
    assert mask.shape == (1, 7) and (mask == 1).all()


def test_template_selection_and_negative_default():
    p = HunyuanVideoPrompter(tokenizer_2=_FakeLlamaTokenizer(range(5)))
    seen = {}

    def llm(input_ids, attention_mask, skip):
        return np.zeros((1, input_ids.shape[1], 4), np.float32)

    p.llm_forward = llm

    class TplTok(_FakeLlamaTokenizer):
        def __call__(self, prompt, **kw):
            seen["prompt"] = prompt
            return super().__call__(prompt, **kw)

    p.tokenizer_2 = TplTok(range(5))

    # bypass the CLIP branch: only template application is under test
    p.encode_prompt_using_clip = lambda prompt, n=77: np.zeros((1, 768))
    p.encode_prompt("hello", data_type="video")
    assert "Describe the video" in seen["prompt"]
    assert seen["prompt"].endswith("hello<|eot_id|>")
    p.encode_prompt("hello", data_type="image")
    assert "Describe the image" in seen["prompt"]

    p.encode_prompt("", positive=False, data_type="video")
    assert NEGATIVE_PROMPT in seen["prompt"]

    p.enable_i2v()
    p.encode_prompt("hi", data_type="video")
    assert "according to the reference image" in seen["prompt"]
