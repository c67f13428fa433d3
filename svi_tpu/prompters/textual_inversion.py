"""Textual-inversion embedding ingestion for CLIP-style prompters.

Behavioral reference: diffsynth/prompters/sd_prompter.py:25-60 (embedding
discovery per file, pseudo-token naming `<stem>_<i>`, token-table append and
tokenizer extension) and diffsynth/models/utils.py:91-98
(`search_for_embeddings` recursive state-dict walk).

TPU-first note: the reference mutates the torch text encoder's Embedding
module in place. Our text encoders are pure pytrees, so ingestion returns the
extra rows and `extend_token_embedding` produces a new (V+K, D) matrix the
caller threads into the params dict — no mutation, jit-safe.
"""

from __future__ import annotations

import os

import numpy as np


def search_for_embeddings(state_dict) -> list:
    """All tensors anywhere in a (possibly nested) state dict
    (ref models/utils.py:91-98)."""
    found = []
    for value in state_dict.values():
        if isinstance(value, dict):
            found += search_for_embeddings(value)
        elif hasattr(value, "shape"):
            found.append(value)
    return found


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def _load_nested_state_dict(path: str) -> dict:
    """Like model_io.load_state_dict but preserving nested sub-dicts, which
    A1111-style embedding files use ({'string_to_param': {'*': (K, D)}})."""
    if path.endswith(".safetensors"):
        from ..models.model_io import load_state_dict

        return load_state_dict(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd if isinstance(sd, dict) else {}


def load_textual_inversion_dict(model_paths, embedding_dim=768) -> dict:
    """{keyword: (pseudo_tokens, (K, embedding_dim) float32 rows)} from
    .pt/.bin/.safetensors embedding files; the keyword is the file stem and
    each embedding row gets a `<keyword>_<i>` pseudo-token
    (ref sd_prompter.py:48-57)."""
    out = {}
    for model_path in model_paths:
        keyword = os.path.splitext(os.path.basename(model_path))[0]
        sd = _load_nested_state_dict(model_path)
        for emb in search_for_embeddings(sd):
            emb = _to_numpy(emb)
            if emb.ndim == 2 and emb.shape[1] == embedding_dim:
                tokens = [f"{keyword}_{i}" for i in range(emb.shape[0])]
                out[keyword] = (tokens, emb)
    return out


def extend_token_embedding(token_embedding, textual_inversion_dict):
    """New (V + sum K_i, D) embedding matrix with every textual-inversion
    row appended in dict order (ref sd_prompter.py:25-36). Accepts and
    returns the array type of `token_embedding` (np or jnp)."""
    import jax.numpy as jnp

    rows = [token_embedding]
    for _, embeddings in textual_inversion_dict.values():
        rows.append(jnp.asarray(embeddings, token_embedding.dtype)
                    if isinstance(token_embedding, jnp.ndarray)
                    else np.asarray(embeddings, token_embedding.dtype))
    cat = jnp.concatenate if isinstance(token_embedding, jnp.ndarray) \
        else np.concatenate
    return cat(rows, axis=0)


def keyword_replacements(textual_inversion_dict) -> dict:
    """{keyword: ' tok_0 tok_1 ... '} replacement strings applied to prompts
    before tokenization (ref sd_prompter.py:39-45, :65-68)."""
    return {kw: " " + " ".join(tokens) + " "
            for kw, (tokens, _) in textual_inversion_dict.items()}
