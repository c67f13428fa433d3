"""SD3 / SD3.5 prompter.

Behavioral reference: diffsynth/prompters/sd3_prompter.py (SD3Prompter
:8-93: fixed 77-token CLIP windows for both CLIP encoders, hidden states
concatenated and zero-padded to 4096, optional T5 branch appended on the
sequence axis, pooled = concat of both CLIP pooled outputs).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import sd3, sdxl


class SD3Prompter:
    """Ref sd3_prompter.py:8-93 (fixed 77-token CLIP windows, optional T5)."""

    def __init__(self, tokenizer=None, t5_tokenizer=None):
        self.tokenizer = tokenizer
        self.t5_tokenizer = t5_tokenizer

    def _clip_ids(self, prompt):
        if self.tokenizer is None:
            from .clip_tokenizer import ClipBpeTokenizer

            self.tokenizer = ClipBpeTokenizer()
        return jnp.asarray(self.tokenizer(
            prompt, return_tensors="np", padding="max_length", max_length=77,
            truncation=True).input_ids)

    def encode_prompt(self, te1_params, te2_params, t5, prompt,
                      t5_sequence_length=77):
        """t5: None or a (params, cfg, tokenizer) triple for
        svi_tpu.models.t5."""
        ids = self._clip_ids(prompt)
        pooled_1, emb_1 = sd3.sd3_text_encoder_1_forward(te1_params, ids)
        pooled_2, emb_2 = sdxl.sdxl_text_encoder_2_forward(te2_params, ids)
        clip_emb = jnp.concatenate([emb_1, emb_2], axis=-1)
        clip_emb = jnp.pad(clip_emb,
                           ((0, 0), (0, 0), (0, 4096 - clip_emb.shape[-1])))
        if t5 is None:
            emb_3 = jnp.zeros((clip_emb.shape[0], t5_sequence_length, 4096),
                              clip_emb.dtype)
        else:
            from ..models import t5 as t5_mod

            t5_params, t5_cfg, t5_tok = t5
            if t5_tok is None:
                from .sp_tokenizer import default_t5_tokenizer

                t5_tok = default_t5_tokenizer()
            tid = t5_tok(prompt, return_tensors="np", padding="max_length",
                         max_length=t5_sequence_length, truncation=True).input_ids
            emb_3 = t5_mod.forward(t5_params, t5_cfg, jnp.asarray(tid))
            emb_3 = emb_3.reshape(1, -1, 4096).astype(clip_emb.dtype)
        prompt_emb = jnp.concatenate([clip_emb, emb_3], axis=-2)
        pooled = jnp.concatenate([pooled_1, pooled_2], axis=-1)
        return prompt_emb, pooled
