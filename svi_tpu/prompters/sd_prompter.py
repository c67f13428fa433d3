"""SD 1.5 prompter.

Behavioral reference: diffsynth/prompters/sd_prompter.py (SDPrompter:
CLIP tokenizer + chunked long-prompt encoding, textual-inversion
pseudo-tokens :48-68, BasePrompter refiner chain).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import sd
from . import textual_inversion as ti
from .base_prompter import BasePrompter, tokenize_long_prompt


class SDPrompter(BasePrompter):
    """SDPrompter (ref sd_prompter.py:9-74): CLIP tokenizer + chunked
    encoding, flattened back to (1, n*77, 768), with textual-inversion
    pseudo-tokens (:48-68) and the BasePrompter refiner chain."""

    def __init__(self, tokenizer=None):
        super().__init__()
        self.tokenizer = tokenizer  # a transformers CLIPTokenizer(-Fast)
        self.textual_inversion_dict = {}
        self.keyword_dict = {}
        # (base token_embedding array, extended params) cache; keyed by the
        # array object itself (checked with `is`) — id() alone could alias a
        # new params tree allocated at a freed address after GC
        self._extended = None

    def _ensure_tokenizer(self):
        if self.tokenizer is None:
            # native vendored-BPE tokenizer: works offline from a clean
            # checkout (the reference ships diffsynth/tokenizer_configs/
            # for the same reason); pass a transformers CLIPTokenizer(-Fast)
            # to the constructor to override.
            from .clip_tokenizer import ClipBpeTokenizer

            self.tokenizer = ClipBpeTokenizer()
        return self.tokenizer

    def load_textual_inversions(self, model_paths, embedding_dim=768):
        """Ref sd_prompter.py:48-60: discover (K, 768) embeddings per file,
        register `<stem>_<i>` pseudo-tokens with the tokenizer; the encoder
        embedding table is extended lazily at encode time (our params are
        immutable pytrees)."""
        self.textual_inversion_dict = ti.load_textual_inversion_dict(
            model_paths, embedding_dim)
        tok = self._ensure_tokenizer()
        for tokens, _ in self.textual_inversion_dict.values():
            tok.add_tokens(tokens)
        self.keyword_dict = ti.keyword_replacements(self.textual_inversion_dict)
        self._extended = None

    def _params_with_inversions(self, text_encoder_params):
        if not self.textual_inversion_dict:
            return text_encoder_params
        base = text_encoder_params["token_embedding"]
        if self._extended is None or self._extended[0] is not base:
            table = ti.extend_token_embedding(base, self.textual_inversion_dict)
            self._extended = (base,
                              {**text_encoder_params, "token_embedding": table})
        return self._extended[1]

    def encode_prompt(self, text_encoder_params, prompt: str, clip_skip: int = 1,
                      positive: bool = True):
        prompt = self.process_prompt(prompt, positive=positive)
        for keyword, replacement in self.keyword_dict.items():
            if keyword in prompt:
                prompt = prompt.replace(keyword, replacement)
        ids = tokenize_long_prompt(self._ensure_tokenizer(), prompt)
        emb = sd.sd_text_encoder_forward(
            self._params_with_inversions(text_encoder_params),
            jnp.asarray(ids), clip_skip=clip_skip)
        return emb.reshape(1, emb.shape[0] * emb.shape[1], -1)
