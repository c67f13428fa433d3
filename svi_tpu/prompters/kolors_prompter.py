"""Kolors prompter.

Behavioral reference: diffsynth/prompters/kolors_prompter.py
(KolorsPrompter :304-354: ChatGLM tokenization to 256 left-padded tokens,
penultimate-layer hidden states as prompt embedding, first-token pooled).
"""

from __future__ import annotations

import jax.numpy as jnp


class KolorsPrompter:
    """Ref kolors_prompter.py:304-354: ChatGLM encoding to 256 left-padded
    tokens; returns (pooled (1,4096), prompt_emb (1,256,4096)).
    `tokenizer` is a kolors SPTokenizer-like object (models/kolors.py)."""

    def __init__(self, tokenizer=None):
        self.tokenizer = tokenizer

    def encode_prompt(self, chatglm_params, _unused, prompt, clip_skip=1,
                      clip_skip_2=2, max_length=256):
        from ..models import kolors

        if self.tokenizer is None:  # vendored ChatGLM sentencepiece BPE
            from .sp_tokenizer import default_chatglm_tokenizer

            self.tokenizer = default_chatglm_tokenizer()
        ids, mask, pos = kolors.kolors_tokenize(prompt, self.tokenizer,
                                                max_length)
        pooled, emb = kolors.kolors_encode_prompt(
            chatglm_params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pos), clip_skip_2=clip_skip_2)
        return pooled, emb
