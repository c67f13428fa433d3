"""SDXL prompter.

Behavioral reference: diffsynth/prompters/sdxl_prompter.py (SDXLPrompter:
dual CLIP tokenizers, chunked long-prompt encoding, concat of the two
encoders' hidden states, pooled embedding from the first chunk).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import sdxl
from .base_prompter import tokenize_long_prompt


class SDXLPrompter:
    """Ref sdxl_prompter.py:9-62 (no textual inversion / refiners yet)."""

    def __init__(self, tokenizer=None, tokenizer_2=None):
        self.tokenizer = tokenizer
        self.tokenizer_2 = tokenizer_2

    def _ensure_tokenizers(self):
        from .clip_tokenizer import ClipBpeTokenizer

        if self.tokenizer is None:
            self.tokenizer = ClipBpeTokenizer()
        if self.tokenizer_2 is None:
            # tokenizer_2 (bigG) pads with "!" (id 0), ref
            # tokenizer_configs/stable_diffusion_xl/tokenizer_2
            self.tokenizer_2 = ClipBpeTokenizer(pad_token="!")

    def encode_prompt(self, te_params, te2_params, prompt, clip_skip=1,
                      clip_skip_2=2):
        self._ensure_tokenizers()
        ids = tokenize_long_prompt(self.tokenizer, prompt)
        emb1 = sdxl.sdxl_text_encoder_forward(te_params, jnp.asarray(ids),
                                              clip_skip=clip_skip)
        ids2 = tokenize_long_prompt(self.tokenizer_2, prompt)
        pooled, emb2 = sdxl.sdxl_text_encoder_2_forward(
            te2_params, jnp.asarray(ids2), clip_skip=clip_skip_2)
        n = min(emb1.shape[0], emb2.shape[0])
        emb = jnp.concatenate([emb1[:n], emb2[:n]], axis=-1)
        # long prompts: pooled embedding from the first 77-token chunk only
        return pooled[0:1], emb.reshape(1, n * emb.shape[1], -1)
