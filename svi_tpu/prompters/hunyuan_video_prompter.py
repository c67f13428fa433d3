"""HunyuanVideo prompter: CLIP pooled + templated-LLaVA text conditioning.

Behavioral reference: diffsynth/prompters/hunyuan_video_prompter.py —
PROMPT_TEMPLATE table (:8-66, llama3-chat-style system prompts with fixed
`crop_start` offsets and i2v image-token spans), encode_prompt_using_clip
(:118-130), encode_prompt_using_llm (:132-154, pad to max_length+crop_start,
run the LLM keeping hidden states `hidden_state_skip_layer` layers before the
end, crop the template prefix), encode_prompt_using_mllm (:156-233, i2v:
split image/text token spans around the last double-return token, interleave-
subsample image embeddings), encode_prompt dispatch (:236-275).

The LLM itself is host-side conditioning (a LLaMA/LLaVA through
transformers in the reference, models/hunyuan_video_text_encoder.py) — here
it is an injected callable `llm_forward(input_ids, attention_mask,
hidden_state_skip_layer) -> (B,S,4096)` so the crop/assembly logic (the part
the DiT conditioning depends on) is framework-owned and unit-testable; the
CLIP pooled branch runs our JAX SD3TextEncoder1.
"""

from __future__ import annotations

import numpy as np

PROMPT_TEMPLATE_ENCODE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the image by "
    "detailing the color, shape, size, texture, quantity, text, spatial "
    "relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")

PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the "
    "video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")

PROMPT_TEMPLATE_ENCODE_I2V = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "image by detailing the color, shape, size, texture, quantity, text, "
    "spatial relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")

PROMPT_TEMPLATE_ENCODE_VIDEO_I2V = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "video by detailing the following aspects according to the reference "
    "image: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the "
    "video:<|eot_id|>\n\n"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")

PROMPT_TEMPLATE = {
    "dit-llm-encode": {
        "template": PROMPT_TEMPLATE_ENCODE,
        "crop_start": 36,
    },
    "dit-llm-encode-video": {
        "template": PROMPT_TEMPLATE_ENCODE_VIDEO,
        "crop_start": 95,
    },
    "dit-llm-encode-i2v": {
        "template": PROMPT_TEMPLATE_ENCODE_I2V,
        "crop_start": 36,
        "image_emb_start": 5,
        "image_emb_end": 581,
        "image_emb_len": 576,
        "double_return_token_id": 271,
    },
    "dit-llm-encode-video-i2v": {
        "template": PROMPT_TEMPLATE_ENCODE_VIDEO_I2V,
        "crop_start": 103,
        "image_emb_start": 5,
        "image_emb_end": 581,
        "image_emb_len": 576,
        "double_return_token_id": 271,
    },
}

NEGATIVE_PROMPT = (
    "Aerial view, aerial view, overexposed, low quality, deformation, a "
    "poor composition, bad hands, bad teeth, bad eyes, bad limbs, "
    "distortion")


class HunyuanVideoPrompter:
    """Ref hunyuan_video_prompter.py:71-275.

    clip_params: SD3TextEncoder1 pytree (svi_tpu.models.sd3) for the pooled
    branch; llm_forward(input_ids (B,S) np.int32, attention_mask (B,S),
    hidden_state_skip_layer) -> (B,S,D) hidden states (a transformers
    LLaMA/LLaVA adapter or a test stub). i2v mode is selected with
    `enable_i2v()` (the reference switches on the MLLM encoder class)."""

    def __init__(self, tokenizer_1=None, tokenizer_2=None, clip_params=None,
                 llm_forward=None):
        self.tokenizer_1 = tokenizer_1
        self.tokenizer_2 = tokenizer_2
        self.clip_params = clip_params
        self.llm_forward = llm_forward
        self.prompt_template = PROMPT_TEMPLATE["dit-llm-encode"]
        self.prompt_template_video = PROMPT_TEMPLATE["dit-llm-encode-video"]
        self.image_processor = None

    def enable_i2v(self, image_processor=None):
        """Ref :96-109 fetch_models MLLM branch."""
        self.prompt_template = PROMPT_TEMPLATE["dit-llm-encode-i2v"]
        self.prompt_template_video = \
            PROMPT_TEMPLATE["dit-llm-encode-video-i2v"]
        self.image_processor = image_processor

    def _ensure_tokenizer_1(self):
        if self.tokenizer_1 is None:
            from .clip_tokenizer import ClipBpeTokenizer

            self.tokenizer_1 = ClipBpeTokenizer()

    def _ensure_tokenizer_2(self):
        if self.tokenizer_2 is None:
            raise ValueError(
                "tokenizer_2 (LlamaTokenizerFast for the HunyuanVideo LLM) "
                "must be provided")

    def apply_text_to_template(self, text, template):
        """Ref :111-119."""
        assert isinstance(template, str)
        if isinstance(text, list):
            return [self.apply_text_to_template(t, template) for t in text]
        if isinstance(text, str):
            return template.format(text)
        raise TypeError(f"Unsupported prompt type: {type(text)}")

    def encode_prompt_using_clip(self, prompt, max_length=77):
        """Ref :118-130: pooled CLIP-L embedding with attention mask."""
        import jax.numpy as jnp

        from ..models import sd3

        self._ensure_tokenizer_1()
        tok = self.tokenizer_1(prompt, return_tensors="np",
                               padding="max_length", max_length=max_length,
                               truncation=True, return_attention_mask=True)
        pooled, _ = sd3.sd3_text_encoder_1_forward(
            self.clip_params, jnp.asarray(tok.input_ids),
            extra_mask=jnp.asarray(tok.attention_mask))
        return pooled

    def encode_prompt_using_llm(self, prompt, max_length, crop_start,
                                hidden_state_skip_layer=2,
                                use_attention_mask=True):
        """Ref :132-154."""
        self._ensure_tokenizer_2()
        max_length += crop_start
        inputs = self.tokenizer_2(prompt, return_tensors="np",
                                  padding="max_length",
                                  max_length=max_length, truncation=True)
        input_ids = np.asarray(inputs.input_ids)
        attention_mask = np.asarray(inputs.attention_mask)
        hidden = np.asarray(self.llm_forward(input_ids, attention_mask,
                                             hidden_state_skip_layer))
        if crop_start > 0:
            hidden = hidden[:, crop_start:]
            attention_mask = (attention_mask[:, crop_start:]
                              if use_attention_mask else None)
        return hidden, attention_mask

    def crop_mllm_states(self, input_ids, attention_mask, last_hidden_state,
                         crop_start, template=None,
                         use_attention_mask=True, image_embed_interleave=4):
        """The i2v token-surgery of encode_prompt_using_mllm (ref :156-233):
        slice out the 576 image-embedding positions and the text positions
        around the final assistant header, subsample the image span, and
        re-concatenate [image | text]. Pure numpy; separated for testing."""
        template = template or self.prompt_template_video
        img_len = template.get("image_emb_len", 576)
        image_crop_start = template.get("image_emb_start", 5)
        image_crop_end = template.get("image_emb_end", 581)
        dr_token = template.get("double_return_token_id", 271)

        text_crop_start = crop_start - 1 + img_len
        batch_idx, dr_idx = np.where(input_ids == dr_token)
        if dr_idx.shape[0] == 3:  # prompt too long: synthesize final marker
            dr_idx = np.concatenate([dr_idx, [input_ids.shape[-1]]])
            batch_idx = np.concatenate([batch_idx, [0]])
        dr_last = dr_idx.reshape(input_ids.shape[0], -1)[:, -1]
        assistant_crop_start = dr_last - 1 + img_len - 4
        assistant_crop_end = dr_last - 1 + img_len
        mask_crop_start = dr_last - 4
        mask_crop_end = dr_last

        text_h, text_m, img_h, img_m = [], [], [], []
        for i in range(input_ids.shape[0]):
            text_h.append(np.concatenate([
                last_hidden_state[i, text_crop_start:
                                  int(assistant_crop_start[i])],
                last_hidden_state[i, int(assistant_crop_end[i]):]]))
            text_m.append(np.concatenate([
                attention_mask[i, crop_start:int(mask_crop_start[i])],
                attention_mask[i, int(mask_crop_end[i]):]])
                if use_attention_mask else None)
            img_h.append(last_hidden_state[i, image_crop_start:
                                           image_crop_end])
            img_m.append(np.ones(img_h[-1].shape[0],
                                 attention_mask.dtype)
                         if use_attention_mask else None)
        text_h = np.stack(text_h)
        text_m = np.stack(text_m)
        img_h = np.stack(img_h)[:, ::image_embed_interleave, :]
        img_m = np.stack(img_m)[:, ::image_embed_interleave]
        return (np.concatenate([img_h, text_h], axis=1),
                np.concatenate([img_m, text_m], axis=1))

    def encode_prompt_using_mllm(self, prompt, images, max_length,
                                 crop_start, hidden_state_skip_layer=2,
                                 use_attention_mask=True,
                                 image_embed_interleave=4):
        """Ref :156-233. llm_forward receives pixel_values as a kwarg."""
        self._ensure_tokenizer_2()
        pixel_values = None
        if self.image_processor is not None:
            pixel_values = np.asarray(
                self.image_processor(images,
                                     return_tensors="np")["pixel_values"])
        max_length += crop_start
        inputs = self.tokenizer_2(prompt, return_tensors="np",
                                  padding="max_length",
                                  max_length=max_length, truncation=True)
        input_ids = np.asarray(inputs.input_ids)
        attention_mask = np.asarray(inputs.attention_mask)
        hidden = np.asarray(self.llm_forward(
            input_ids, attention_mask, hidden_state_skip_layer,
            pixel_values=pixel_values))
        return self.crop_mllm_states(
            input_ids, attention_mask, hidden, crop_start,
            use_attention_mask=use_attention_mask,
            image_embed_interleave=image_embed_interleave)

    def encode_prompt(self, prompt, images=None, positive=True,
                      clip_sequence_length=77, llm_sequence_length=256,
                      data_type="video", use_template=True,
                      hidden_state_skip_layer=2, use_attention_mask=True,
                      image_embed_interleave=4):
        """Ref :236-275 -> (prompt_emb, pooled_prompt_emb, attention_mask)."""
        if not positive and not prompt:
            prompt = NEGATIVE_PROMPT
        template = (self.prompt_template_video if data_type == "video"
                    else self.prompt_template)
        prompt_formated = (self.apply_text_to_template(
            prompt, template["template"]) if use_template else prompt)
        crop_start = template.get("crop_start", 0)

        pooled = self.encode_prompt_using_clip(prompt, clip_sequence_length)
        if images is None:
            emb, mask = self.encode_prompt_using_llm(
                prompt_formated, llm_sequence_length, crop_start,
                hidden_state_skip_layer, use_attention_mask)
        else:
            emb, mask = self.encode_prompt_using_mllm(
                prompt_formated, images, llm_sequence_length, crop_start,
                hidden_state_skip_layer, use_attention_mask,
                image_embed_interleave)
        return emb, pooled, mask
