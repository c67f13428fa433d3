"""StepVideo prompter.

Behavioral reference: diffsynth/prompters/stepvideo_prompter.py
(StepVideoPrompter :8-56: HunyuanCLIP bert branch + Step1 LLM branch,
attention mask left-padded with ones over the CLIP tokens :53-55).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import stepvideo as sv


class StepVideoPrompter:
    """Ref stepvideo_prompter.py:8-56. `clip_encoder(prompts) -> (B,77,1024)`
    is a host callable (transformers BertModel); the LLM branch is the JAX
    Step1 encoder. `tokenizer` is str -> list[int] (sentencepiece)."""

    def __init__(self, clip_encoder=None, step1_params=None, tokenizer=None,
                 num_heads=64, num_groups=8, dtype=jnp.bfloat16):
        self.clip_encoder = clip_encoder
        self.step1_params = step1_params
        self.tokenizer = tokenizer
        self.num_heads = num_heads
        self.num_groups = num_groups
        self.dtype = dtype

    def __call__(self, prompt, max_length=320):
        clip_embeds = np.asarray(self.clip_encoder([prompt]))
        ids, mask = sv.step1_tokenize([prompt], self.tokenizer, max_length)
        llm_embeds = sv.step1_encode(
            self.step1_params, jnp.asarray(ids), self.num_heads,
            self.num_groups, dtype=self.dtype)
        # left-pad the mask with ones over the CLIP tokens (ref :53-55)
        full_mask = np.concatenate(
            [np.ones((mask.shape[0], clip_embeds.shape[1]), mask.dtype), mask],
            axis=1)
        return clip_embeds, np.asarray(llm_embeds, np.float32), full_mask
