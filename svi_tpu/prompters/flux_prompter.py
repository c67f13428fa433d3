"""FLUX prompter.

Behavioral reference: diffsynth/prompters/flux_prompter.py (FluxPrompter
:8-76: CLIP-L pooled embedding + T5-XXL sequence embedding at a configurable
sequence length, default 512).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import sd3


class FluxPrompter:
    """Ref flux_prompter.py:8-76."""

    def __init__(self, tokenizer=None, t5_tokenizer=None):
        self.tokenizer = tokenizer
        self.t5_tokenizer = t5_tokenizer

    def encode_prompt(self, te1_params, t5, prompt, t5_sequence_length=512):
        if self.tokenizer is None:
            from .clip_tokenizer import ClipBpeTokenizer

            self.tokenizer = ClipBpeTokenizer()
        ids = jnp.asarray(self.tokenizer(
            prompt, return_tensors="np", padding="max_length", max_length=77,
            truncation=True).input_ids)
        pooled, _ = sd3.sd3_text_encoder_1_forward(te1_params, ids)
        from ..models import t5 as t5_mod

        t5_params, t5_cfg, t5_tok = t5
        if t5_tok is None:
            from .sp_tokenizer import default_t5_tokenizer

            t5_tok = default_t5_tokenizer()
        tid = t5_tok(prompt, return_tensors="np", padding="max_length",
                     max_length=t5_sequence_length, truncation=True).input_ids
        emb = t5_mod.forward(t5_params, t5_cfg, jnp.asarray(tid))
        return emb.reshape(1, -1, emb.shape[-1]), pooled
