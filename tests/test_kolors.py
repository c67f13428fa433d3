"""Kolors ChatGLM text-encoder golden parity vs the reference torch module
(tiny config), incl. the left-padding mask/position-id path the prompter
uses, and the hidden-state indexing of KolorsPrompter.encode_prompt."""

import numpy as np
import torch

import jax.numpy as jnp

from svi_tpu.models import kolors

from reference_loader import load_ref_module


def _tiny_ref_model():
    ref = load_ref_module("diffsynth.models.kolors_text_encoder")
    cfg = ref.ChatGLMConfig(
        num_layers=2, padded_vocab_size=50, hidden_size=64,
        ffn_hidden_size=96, kv_channels=16, num_attention_heads=4,
        seq_length=32, multi_query_attention=True, multi_query_group_num=2,
        add_qkv_bias=True, torch_dtype=torch.float32, use_cache=False,
        original_rope=True, output_hidden_states=False)
    model = ref.ChatGLMModel(cfg, empty_init=False).eval()
    torch.manual_seed(0)
    state = model.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    model.load_state_dict(state)
    params = kolors.chatglm_params_from_torch(
        {k: v.clone() for k, v in state.items()})
    return ref, model, params


def test_chatglm_parity_causal():
    _, model, params = _tiny_ref_model()
    torch.manual_seed(1)
    ids = torch.randint(0, 50, (2, 10))
    with torch.no_grad():
        out = model(ids, output_hidden_states=True, return_dict=True)
    final, hs = kolors.chatglm_encode(
        params, jnp.asarray(ids.numpy()), num_heads=4, num_groups=2,
        kv_channels=16)
    # ref hidden states are (S, B, H)
    assert hs.shape[0] == len(out.hidden_states)
    for i, ref_h in enumerate(out.hidden_states):
        np.testing.assert_allclose(np.asarray(hs[i]).transpose(1, 0, 2),
                                   ref_h.numpy(), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(final).transpose(1, 0, 2),
        out.last_hidden_state.numpy(), rtol=3e-4, atol=3e-4)


def test_chatglm_parity_left_padded():
    _, model, params = _tiny_ref_model()
    torch.manual_seed(2)
    ids = torch.randint(0, 50, (2, 12))
    mask = torch.ones(2, 12, dtype=torch.long)
    mask[0, :3] = 0  # left padding
    pos = torch.stack([
        torch.tensor([0, 0, 0] + list(range(9))),
        torch.tensor(list(range(12)))])
    with torch.no_grad():
        out = model(ids, attention_mask=mask, position_ids=pos,
                    output_hidden_states=True, return_dict=True)
    _, hs = kolors.chatglm_encode(
        params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(pos.numpy()), num_heads=4, num_groups=2, kv_channels=16)
    # only the unpadded positions are meaningful; compare those
    ref_last = out.hidden_states[-1].numpy().transpose(1, 0, 2)
    ours_last = np.asarray(hs[-1])
    np.testing.assert_allclose(ours_last[0, 3:], ref_last[0, 3:],
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ours_last[1], ref_last[1],
                               rtol=3e-4, atol=3e-4)


def test_kolors_encode_prompt_indexing():
    """KolorsPrompter.encode_prompt (ref kolors_prompter.py:321-354):
    prompt_emb from hidden_states[-clip_skip_2], pooled from the final
    pre-norm state's last token."""
    _, model, params = _tiny_ref_model()
    torch.manual_seed(3)
    ids = torch.randint(0, 50, (1, 8))
    with torch.no_grad():
        out = model(ids, output_hidden_states=True, return_dict=True)
    ref_emb = out.hidden_states[-2].permute(1, 0, 2).numpy()
    ref_pooled = out.hidden_states[-1][-1, :, :].numpy()
    pooled, emb = kolors.kolors_encode_prompt(
        params, jnp.asarray(ids.numpy()), clip_skip_2=2, num_heads=4,
        num_groups=2, kv_channels=16)
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               rtol=3e-4, atol=3e-4)


def test_kolors_tokenize_layout():
    class FakeTok:
        special_tokens = {"[gMASK]": 40, "sop": 41}
        pad_id = 0

        def encode(self, s):
            return [5, 6, 7]

    ids, mask, pos = kolors.kolors_tokenize(["x"], FakeTok(), max_length=8)
    assert ids.tolist() == [[0, 0, 0, 40, 41, 5, 6, 7]]
    assert mask.tolist() == [[0, 0, 0, 1, 1, 1, 1, 1]]
    assert pos.tolist() == [[0, 0, 0, 0, 1, 2, 3, 4]]


def test_sdxl_pipeline_kolors_switch():
    """Ref sdxl_image.py:64-68: Kolors swaps prompter and scheduler."""
    from svi_tpu.pipelines.sdxl_image import (KolorsPrompter,
                                              SDXLImagePipeline)

    _, _, params = _tiny_ref_model()
    pipe = SDXLImagePipeline(unet_params={}, chatglm_params=params)
    assert isinstance(pipe.prompter, KolorsPrompter)
    assert pipe.scheduler.num_train_timesteps == 1100
