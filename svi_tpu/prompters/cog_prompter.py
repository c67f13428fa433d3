"""CogVideoX prompter.

Behavioral reference: diffsynth/prompters/cog_prompter.py (CogPrompter
:7-46: T5 tokenization padded to 226 tokens, encoded with the shared T5
encoder, reshaped to (1, n*226, dim); BasePrompter refiner chain on the
positive branch).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base_prompter import BasePrompter


class CogPrompter(BasePrompter):
    """Ref cog_prompter.py:7-46. `t5` is a (params, cfg, tokenizer) triple
    for svi_tpu.models.t5 (the TPU analog of the reference's
    FluxTextEncoder2-backed encoding)."""

    def __init__(self, t5=None):
        super().__init__()
        self.t5 = t5

    def fetch_models(self, t5=None):
        self.t5 = t5

    def encode_prompt(self, prompt, positive=True, max_length=226,
                      dtype=jnp.bfloat16):
        from ..models import t5 as t5_mod

        prompt = self.process_prompt(prompt, positive=positive)
        t5_params, t5_cfg, tok = self.t5
        if tok is None:  # vendored spiece + <extra_id_*> added tokens
            from .sp_tokenizer import default_t5_tokenizer

            tok = default_t5_tokenizer()
        ids = tok(prompt, return_tensors="np", padding="max_length",
                  max_length=max_length, truncation=True).input_ids
        emb = t5_mod.forward(t5_params, t5_cfg, jnp.asarray(ids))
        return emb.reshape(1, -1, emb.shape[-1]).astype(dtype)
