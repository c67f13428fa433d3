"""Prompt-processing base utilities shared by every per-model prompter.

Behavioral reference: diffsynth/prompters/base_prompter.py —
`tokenize_long_prompt` (:6-36, unbounded tokenize then re-tokenize padded to
a multiple of the window) and `BasePrompter` (:39-70, the refiner/extender
plug-in chain driven from the model registry).
"""

from __future__ import annotations

import numpy as np


def tokenize_long_prompt(tokenizer, prompt: str, length: int = 77) -> np.ndarray:
    """Long-prompt chunking (ref base_prompter.py:6-36): tokenize unbounded,
    round up to a multiple of `length`, reshape to (num_sentence, length)."""
    tokenizer.model_max_length = 99999999
    ids = tokenizer(prompt, return_tensors="np").input_ids
    max_length = (ids.shape[1] + length - 1) // length * length
    tokenizer.model_max_length = length
    ids = tokenizer(
        prompt, return_tensors="np", padding="max_length",
        max_length=max_length, truncation=True,
    ).input_ids
    return ids.reshape(ids.shape[1] // length, length)


class BasePrompter:
    """Refiner/extender plumbing (ref base_prompter.py:39-70). Refiner and
    extender classes expose `from_model_manager(model_manager)`; refiners map
    prompt->prompt (only on the positive branch), extenders map a prompt dict
    to an enriched dict (e.g. Omost region prompts)."""

    def __init__(self):
        self.refiners = []
        self.extenders = []

    def load_prompt_refiners(self, model_manager, refiner_classes=()):
        for refiner_class in refiner_classes:
            self.refiners.append(refiner_class.from_model_manager(model_manager))

    def load_prompt_extenders(self, model_manager, extender_classes=()):
        for extender_class in extender_classes:
            self.extenders.append(
                extender_class.from_model_manager(model_manager))

    def process_prompt(self, prompt, positive=True):
        if isinstance(prompt, list):
            return [self.process_prompt(p, positive=positive) for p in prompt]
        for refiner in self.refiners:
            prompt = refiner(prompt, positive=positive)
        return prompt

    def extend_prompt(self, prompt: str, positive=True):
        extended = dict(prompt=prompt)
        for extender in self.extenders:
            extended = extender(extended)
        return extended
