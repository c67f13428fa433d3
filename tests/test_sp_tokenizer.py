"""Native sentencepiece engine (prompters/sp_tokenizer.py) golden parity.

Goldens: the `tokenizers` (Rust) pipeline from the reference's vendored
tokenizer.json for T5-unigram; transformers' pure-python BertTokenizer for
WordPiece. ChatGLM-BPE has no loadable in-env golden (needs the
sentencepiece wheel), so it is locked by the publicly documented ChatGLM3
special-token ids plus round-trip/byte-fallback properties.
"""

import os

import numpy as np
import pytest

from svi_tpu.prompters.sp_tokenizer import (
    BertWordPieceTokenizer,
    ChatGLMSpTokenizer,
    T5SpTokenizer,
    asset_path,
    default_chatglm_tokenizer,
    default_t5_tokenizer,
)

REF_T5_JSON = "/root/reference/diffsynth/tokenizer_configs/flux/tokenizer_2/tokenizer.json"

BATTERY = [
    "a photo of an astronaut riding a horse on mars",
    "Hello, World!  Multiple  spaces\tand\ttabs",
    "ﬁancé résumé naïve — em–dash … ellipsis",
    "日本語のテキスト and ENGLISH mixed 123",
    "<extra_id_0> fill me <extra_id_1>",
    "emoji 🚀🔥 and symbols ©®™ §¶",
    "   leading spaces",
    "trailing spaces   ",
    "",
    " ",
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",
    "x",
    "Don't stop believin' – hold on to that feelin'",
    "▁literal metaspace char",
    "Ⅷ ⅸ ℘ ℃ №",
    "ﬀ ﬁ ﬂ ﬃ ﬄ",
    "ß ẞ İ ı",
    "한국어 텍스트",
    "Привет мир",
    "مرحبا بالعالم",
    "C'était l'été: œuvre, cœur!",
    "1/2 ¼ ½ ¾ ⅓",
]


@pytest.fixture(scope="module")
def t5():
    return default_t5_tokenizer()


@pytest.fixture(scope="module")
def ref_fast():
    if not os.path.isfile(REF_T5_JSON):
        pytest.skip("reference tokenizer.json not mounted")
    from tokenizers import Tokenizer

    return Tokenizer.from_file(REF_T5_JSON)


def test_t5_unigram_golden_battery(t5, ref_fast):
    for text in BATTERY:
        ours = t5._encode_one(text)
        theirs = ref_fast.encode(text, add_special_tokens=False).ids
        assert ours == theirs, text


def test_t5_unigram_golden_fuzz(t5, ref_fast):
    import random
    import string

    rng = random.Random(7)
    pool = "abc ABC 123 éüñ 日本語 한국 🚀 ─═★ \t'\"-"
    for i in range(150):
        if i % 2:
            text = "".join(rng.choice(string.printable[:95])
                           for _ in range(rng.randint(0, 50)))
        else:
            text = "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        assert t5._encode_one(text) == \
            ref_fast.encode(text, add_special_tokens=False).ids, repr(text)


def test_t5_batch_api(t5):
    enc = t5(["short prompt", "another"], max_length=16)
    assert enc.input_ids.shape == (2, 16) and enc.attention_mask.shape == (2, 16)
    n = int(enc.attention_mask[0].sum())
    assert enc.input_ids[0, n - 1] == t5.eos_id  # </s> appended
    assert (enc.input_ids[0, n:] == t5.pad_id).all()
    # truncation keeps eos as the final token (transformers T5 behavior)
    long = t5("word " * 100, max_length=8)
    assert long.input_ids.shape == (1, 8)
    assert long.input_ids[0, -1] == t5.eos_id


def test_t5_spm_mode_whitespace_semantics(ref_fast):
    """fast_pipeline=False replays sentencepiece Normalize(): leading and
    trailing whitespace is removed entirely and runs collapse, so padded
    variants tokenize identically. For this charsmap (nmt_nfkc maps
    controls/tabs to spaces) the result coincides with the fast pipeline on
    ordinary text — assert that equivalence against the Rust golden too."""
    slow = T5SpTokenizer(asset_path("t5"), fast_pipeline=False)
    base = slow._encode_one("hello world")
    assert slow._encode_one("  hello   world  ") == base
    assert slow._encode_one("\thello\nworld ") == base
    for text in BATTERY:
        if "extra_id" in text:
            continue  # added-token splitting is a tokenizer-level feature
        assert slow._encode_one(text) == \
            ref_fast.encode(text, add_special_tokens=False).ids, repr(text)


def test_t5_decode_roundtrip(t5):
    text = "a photo of an astronaut riding a horse"
    ids = t5._encode_one(text)
    assert t5.decode(ids) == text


def test_bert_wordpiece_golden():
    from transformers import BertTokenizer

    vocab = os.path.join(asset_path("hunyuan_dit"), "vocab.txt")
    ref = BertTokenizer(vocab, do_lower_case=True)
    ours = BertWordPieceTokenizer(asset_path("hunyuan_dit"), do_lower_case=True)
    for text in ["一只可爱的猫咪在草地上玩耍",
                 "A cute cat playing, 高清 8K 写实风格!",
                 "Hello World", "ÀÉÎÕÜ naïve café",
                 "混合 mixed 123 !@# 文本", "", "日月水火",
                 "超长词 supercalifragilisticexpialidocious"]:
        r = ref(text, padding="max_length", max_length=77, truncation=True)
        o = ours(text, max_length=77)
        assert list(o["input_ids"][0]) == r["input_ids"], text
        assert list(o["attention_mask"][0]) == r["attention_mask"], text


def test_bert_wordpiece_pt_tensors():
    import torch

    ours = BertWordPieceTokenizer(asset_path("hunyuan_dit"))
    enc = ours("测试 test", max_length=77, return_tensors="pt")
    assert isinstance(enc.input_ids, torch.Tensor)
    assert enc.input_ids.shape == (1, 77)


def test_chatglm_structure_and_roundtrip():
    g = default_chatglm_tokenizer()
    # publicly documented ChatGLM3 ids (reference kolors_prompter.py:25-32
    # appends specials after the 64789-piece sp vocab in fixed order)
    assert g.sp.vocab_size() == 64789
    assert g.special_tokens["[gMASK]"] == 64790
    assert g.special_tokens["sop"] == 64792
    assert g.pad_id == g.sp.unk_id == 0
    assert g.sp.trainer.model_type == 2 and g.sp.trainer.byte_fallback
    for text in ["一个漂亮的女孩站在海边",
                 "A beautiful sunset over the ocean, photorealistic",
                 "Hello 世界 mixed ascii 123", "emoji 🚀 test",
                 "标点，。！？；：符号"]:
        ids = g.encode(text)
        assert all(0 <= i < 64789 for i in ids)
        assert g.decode(ids) == text, text
    # byte fallback: an emoji outside the piece vocab becomes byte pieces
    ids = g.encode("🚀")
    assert len(ids) >= 4  # 4 utf-8 bytes
    assert g.encode("a", bos=True)[0] == g.bos_id
    assert g.encode("a", eos=True)[-1] == g.eos_id


def test_chatglm_kolors_tokenize_frame():
    from svi_tpu.models.kolors import kolors_tokenize

    g = default_chatglm_tokenizer()
    ids, mask, pos = kolors_tokenize("一个漂亮的女孩", g, max_length=32)
    assert ids.shape == (1, 32)
    n = int(mask.sum())
    row = ids[0, 32 - n:]
    assert row[0] == g.special_tokens["[gMASK]"] and row[1] == g.special_tokens["sop"]
    assert (ids[0, :32 - n] == g.pad_id).all()
    assert pos[0, -1] == n - 1  # positions restart after left padding


def test_wan_prompter_native_fallback():
    """WanPrompter loads the native engine from a dir holding spiece.model
    (the t5 asset stands in for the umt5-xxl dir shipped with Wan weights)."""
    from svi_tpu.prompters.wan_prompter import WanPrompter

    p = WanPrompter(tokenizer_path=asset_path("t5"), text_len=64)
    assert isinstance(p.tokenizer, T5SpTokenizer)
    assert p.tokenizer.fast_pipeline is False  # slow/spm semantics
    ids, mask = p.tokenize("a cat   sat on  the mat")
    assert ids.shape == (1, 64) and mask.shape == (1, 64)
    n = int(mask.sum())
    assert ids[0, n - 1] == p.tokenizer.eos_id
    assert (ids[0, n:] == p.tokenizer.pad_id).all()


def test_charsmap_replacements(t5):
    """The precompiled charsmap performs NFKC-style rewrites: ligatures and
    fullwidth forms must normalize identically to the Rust Precompiled."""
    norm = t5.sp.normalizer
    assert norm.normalize("ﬁ") == "▁fi".encode()
    assert norm.normalize("Ｆ") == "▁F".encode()
    assert norm.normalize("①") == "▁1".encode()
