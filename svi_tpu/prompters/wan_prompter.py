"""Prompt processing for Wan (behavioral ref: diffsynth/prompters/wan_prompter.py).

Tokenization uses HF AutoTokenizer (google/umt5-xxl) from a LOCAL path —
this framework runs in zero-egress environments, so the tokenizer directory
must be provided (the reference resolves it next to the text-encoder
checkpoint, svi_video.py:249). Pipelines also accept pre-tokenized ids or
precomputed embeddings, so the tokenizer is optional.
"""

from __future__ import annotations

import html
import re
from typing import Optional

import numpy as np


def basic_clean(text: str) -> str:
    """ftfy.fix_text + html unescape (ref :11-14); ftfy is optional here."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class WanPrompter:
    """Tokenize (pad/truncate to 512) and encode prompts (ref :84-109)."""

    def __init__(self, tokenizer_path: Optional[str] = None, text_len: int = 512):
        self.text_len = text_len
        self.tokenizer = None
        self.text_encoder = None  # (params, cfg) from svi_tpu.models.t5
        if tokenizer_path is not None:
            self.fetch_tokenizer(tokenizer_path)

    def fetch_tokenizer(self, tokenizer_path):
        import os

        if os.path.isfile(os.path.join(tokenizer_path, "spiece.model")):
            # native engine (prompters/sp_tokenizer.py): slow-tokenizer
            # semantics, exactly what the reference's AutoTokenizer load of
            # google/umt5-xxl resolves to — and the only loadable path in
            # environments without the sentencepiece wheel
            from .sp_tokenizer import T5SpTokenizer

            self.tokenizer = T5SpTokenizer(tokenizer_path, fast_pipeline=False)
        else:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(tokenizer_path, local_files_only=True)

    def fetch_models(self, text_encoder):
        self.text_encoder = text_encoder

    def tokenize(self, prompt: str):
        assert self.tokenizer is not None, (
            "no tokenizer loaded — pass tokenizer_path (local google/umt5-xxl dir) "
            "or provide pre-tokenized ids / precomputed embeddings to the pipeline"
        )
        prompt = whitespace_clean(basic_clean(prompt))
        enc = self.tokenizer(
            [prompt], padding="max_length", truncation=True, max_length=self.text_len,
            return_tensors="np", add_special_tokens=True,
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)

    def encode_prompt(self, prompt: str, positive: bool = True):
        """-> (1, text_len, 4096) with positions past the true length zeroed
        (ref :99-109). Requires fetch_models() with (params, cfg)."""
        from ..models import t5 as t5_mod

        ids, mask = self.tokenize(prompt)
        params, cfg = self.text_encoder
        return t5_mod.encode_prompt_states(params, cfg, ids, mask)
