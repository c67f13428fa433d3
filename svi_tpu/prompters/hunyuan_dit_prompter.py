"""HunyuanDiT prompter.

Behavioral reference: diffsynth/prompters/hunyuan_dit_prompter.py
(HunyuanDiTPrompter :8-69: Chinese BERT CLIP-like encoder to 77 tokens +
mT5 encoder to 256 tokens, attention masks returned alongside embeddings
for the DiT's learned-padding merge).
"""

from __future__ import annotations

from .base_prompter import BasePrompter


class HunyuanDiTPrompter(BasePrompter):
    """Lazy transformers wrapper for the two reference text encoders
    (hunyuan_dit_text_encoder.py:6-163). Produces (text_emb, mask,
    text_emb_t5, mask_t5) numpy arrays (host-side torch CPU preprocessing;
    the DiT itself consumes precomputed embeddings in JAX)."""

    def __init__(self, bert_model=None, bert_tokenizer=None, t5_model=None,
                 t5_tokenizer=None):
        super().__init__()
        self.bert_model = bert_model
        self.bert_tokenizer = bert_tokenizer
        self.t5_model = t5_model
        self.t5_tokenizer = t5_tokenizer

    def fetch_models(self, bert_model=None, t5_model=None):
        self.bert_model = bert_model
        self.t5_model = t5_model

    def encode_prompt(self, prompt, clip_skip=1, clip_skip_2=1, positive=True):
        import torch

        prompt = self.process_prompt(prompt, positive=positive)
        if self.bert_tokenizer is None:  # vendored WordPiece vocab
            from .sp_tokenizer import default_bert_tokenizer

            self.bert_tokenizer = default_bert_tokenizer()
        with torch.no_grad():
            ti = self.bert_tokenizer(prompt, padding="max_length", max_length=77,
                                     truncation=True, return_tensors="pt")
            emb = self.bert_model(ti.input_ids, ti.attention_mask,
                                  clip_skip=clip_skip)
            t5i = self.t5_tokenizer(prompt, padding="max_length", max_length=256,
                                    truncation=True, return_tensors="pt")
            emb_t5 = self.t5_model(t5i.input_ids, t5i.attention_mask,
                                   clip_skip=clip_skip_2)
        return (emb.numpy(), ti.attention_mask.numpy(),
                emb_t5.numpy(), t5i.attention_mask.numpy())

    # the pipeline historically calls the wrapper directly
    __call__ = encode_prompt
