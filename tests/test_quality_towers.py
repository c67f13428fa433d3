"""Golden parity for the native image-quality feature towers
(svi_tpu/extensions/quality_towers.py):

- CLIP tower vs transformers CLIPModel (the Aesthetic/PickScore towers,
  ref aesthetic.py / pickscore.py load transformers CLIP checkpoints);
- open_clip tower vs the reference's vendored open_clip CLIP (the
  CLIPScore / HPSv2 towers, ref clip.py / hps.py);
- BLIP ViT + cross-attention BERT vs transformers Blip models, which are
  HF's ports of the exact vendored BLIP/vit.py + BLIP/med.py modules the
  ImageReward tower uses (state-dict names mapped to the vendored naming,
  so the converter is exercised on the checkpoint format it will load).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.extensions import quality_towers as qt


def _randomize(model, seed, scale=0.05):
    torch.manual_seed(seed)
    sd = model.state_dict()
    for k in sd:
        if sd[k].dtype.is_floating_point:
            sd[k] = torch.randn_like(sd[k]) * scale
    model.load_state_dict(sd)
    return model.eval()


def test_clip_tower_vs_transformers():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    cfg = CLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=77,
            vocab_size=99, hidden_act="quick_gelu",
            # real CLIP vocabularies put EOT at the highest id, which makes
            # HF's eos-search pooling equal to the argmax pooling our tower
            # (and open_clip) use — mirror that in the tiny vocab
            eos_token_id=98, bos_token_id=0, pad_token_id=1),
        vision_config=dict(
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=2, image_size=16, patch_size=8,
            hidden_act="quick_gelu"),
        projection_dim=24,
    )
    model = _randomize(CLIPModel(cfg), 0)
    vis, txt, scale = qt.clip_params_from_hf(
        {k: v.numpy() for k, v in model.state_dict().items()})

    torch.manual_seed(1)
    px = torch.randn(2, 3, 16, 16)
    ids = torch.randint(2, 97, (2, 9))
    ids[:, -1] = 98  # EOT: highest id = pooled position
    with torch.no_grad():
        ref_im = model.get_image_features(px).numpy()
        ref_tx = model.get_text_features(input_ids=ids).numpy()
    got_im, _ = qt.clip_vision_forward(vis, jnp.asarray(px.numpy()), 2,
                                       quick_gelu=True)
    got_tx = qt.clip_text_forward(txt, ids.numpy(), 2, quick_gelu=True)
    np.testing.assert_allclose(np.asarray(got_im), ref_im, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_tx), ref_tx, rtol=2e-4, atol=2e-5)


def test_open_clip_tower_vs_vendored():
    import importlib

    from reference_loader import load_reference_package

    # a plain import (not load_ref_module) so the package __init__ finishes
    # before coca_model's `from .model import ...` resolves
    load_reference_package()
    oc = importlib.import_module(
        "diffsynth.extensions.ImageQualityMetric.open_clip.model")
    model = oc.CLIP(
        embed_dim=24,
        vision_cfg=oc.CLIPVisionCfg(layers=2, width=48, head_width=24,
                                    patch_size=8, image_size=16),
        text_cfg=oc.CLIPTextCfg(context_length=16, vocab_size=99, width=32,
                                heads=2, layers=2),
        quick_gelu=False,
    )
    model = _randomize(model, 2)
    vis, txt, scale = qt.clip_params_from_open_clip(
        {k: v.numpy() for k, v in model.state_dict().items()})

    torch.manual_seed(3)
    px = torch.randn(2, 3, 16, 16)
    ids = torch.randint(1, 98, (2, 16))
    ids[:, -1] = 98
    with torch.no_grad():
        ref_im = model.encode_image(px).numpy()
        ref_tx = model.encode_text(ids).numpy()
    got_im, _ = qt.clip_vision_forward(vis, jnp.asarray(px.numpy()), 2)
    got_tx = qt.clip_text_forward(txt, ids.numpy(), 2)
    np.testing.assert_allclose(np.asarray(got_im), ref_im, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_tx), ref_tx, rtol=2e-4, atol=2e-5)


def _hf_blip_vision_to_vendored(sd):
    """transformers BlipVisionModel names -> vendored BLIP/vit.py names
    (BlipVisionModel state dicts carry no 'vision_model.' prefix)."""
    out = {}
    ren = [
        ("embeddings.class_embedding", "visual_encoder.cls_token"),
        ("embeddings.position_embedding", "visual_encoder.pos_embed"),
        ("embeddings.patch_embedding.weight",
         "visual_encoder.patch_embed.proj.weight"),
        ("embeddings.patch_embedding.bias",
         "visual_encoder.patch_embed.proj.bias"),
        ("post_layernorm.weight", "visual_encoder.norm.weight"),
        ("post_layernorm.bias", "visual_encoder.norm.bias"),
    ]
    for a, b in ren:
        if a in sd:
            out[b] = sd[a]
    for k, v in sd.items():
        if "encoder.layers." not in k:
            continue
        nk = ("visual_encoder.blocks." + k.split("encoder.layers.", 1)[1])
        nk = (nk.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
              .replace("self_attn.qkv", "attn.qkv")
              .replace("self_attn.projection", "attn.proj"))
        out[nk] = v
    return out


def test_blip_vit_vs_transformers():
    from transformers import BlipVisionConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel

    cfg = BlipVisionConfig(hidden_size=48, intermediate_size=96,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8)
    model = _randomize(BlipVisionModel(cfg), 4)
    sd = _hf_blip_vision_to_vendored(
        {k: v.numpy() for k, v in model.state_dict().items()})
    sd.update({"text_encoder.embeddings.word_embeddings.weight": np.zeros((5, 8), np.float32),
               "text_encoder.embeddings.position_embeddings.weight": np.zeros((5, 8), np.float32),
               "text_encoder.embeddings.LayerNorm.weight": np.ones(8, np.float32),
               "text_encoder.embeddings.LayerNorm.bias": np.zeros(8, np.float32)})
    vit, _bert = qt.blip_params_from_torch(sd)

    torch.manual_seed(5)
    px = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = model(px).last_hidden_state.numpy()
    _, got = qt.clip_vision_forward(vit, jnp.asarray(px.numpy()), 2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_blip_bert_cross_vs_transformers():
    from transformers.models.blip.configuration_blip import BlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    cfg = BlipTextConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=60, max_position_embeddings=40,
                         encoder_hidden_size=48, is_decoder=True)
    model = _randomize(BlipTextModel(cfg, add_pooling_layer=False), 6)
    sd = {f"text_encoder.{k}": v.numpy() for k, v in model.state_dict().items()}
    sd.update({"visual_encoder.cls_token": np.zeros((1, 1, 48), np.float32),
               "visual_encoder.pos_embed": np.zeros((1, 5, 48), np.float32),
               "visual_encoder.patch_embed.proj.weight": np.zeros((48, 3, 8, 8), np.float32),
               "visual_encoder.patch_embed.proj.bias": np.zeros(48, np.float32),
               "visual_encoder.norm.weight": np.ones(48, np.float32),
               "visual_encoder.norm.bias": np.zeros(48, np.float32)})
    _vit, bert = qt.blip_params_from_torch(sd)
    assert all("cross" in layer for layer in bert["layers"])

    torch.manual_seed(7)
    ids = torch.randint(1, 59, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 7:] = 0
    enc = torch.randn(2, 5, 48)
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask,
                    encoder_hidden_states=enc, is_decoder=False,
                    ).last_hidden_state.numpy()
    got = qt.bert_cross_forward(bert, ids.numpy(), mask.numpy(),
                                jnp.asarray(enc.numpy()), 2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_feature_fns_shapes():
    """The scorer-facing feature functions produce the shapes the scoring
    heads consume (image_quality.AestheticScore & co.)."""
    from PIL import Image
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         vocab_size=99),
        vision_config=dict(hidden_size=48, intermediate_size=96,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=16, patch_size=8),
        projection_dim=24,
    )
    model = _randomize(CLIPModel(cfg), 8)
    vis, txt, scale = qt.clip_params_from_hf(
        {k: v.numpy() for k, v in model.state_dict().items()})

    class Tok:
        def __call__(self, prompt, **kw):
            class R:
                input_ids = np.array([[1, 5, 98]] + [[0, 0, 0]] * 0)
            return R()

    im_fn, tx_fn, feat_fn = qt.make_clip_feature_fns(
        vis, txt, 2, 2, Tok(), quick_gelu=True, logit_scale=scale, size=16)
    img = Image.fromarray(np.zeros((20, 24, 3), np.uint8))
    assert im_fn(img).shape == (1, 24)
    assert tx_fn("hello").shape == (1, 24)
    i, t, s = feat_fn(img, "hello")
    assert i.shape == (1, 24) and t.shape == (1, 24) and s == pytest.approx(scale)


def test_mps_cross_model_vs_vendored():
    """Cross_model (trainer/models/cross_modeling.py:261-292) golden parity:
    multi-query cross-attn w/ parallel SwiGLU FF + rotary PaLM block."""
    import importlib

    from reference_loader import load_reference_package

    load_reference_package()
    cm = importlib.import_module(
        "diffsynth.extensions.ImageQualityMetric.trainer.models.cross_modeling")
    model = cm.Cross_model(dim=32, layer_num=2, dim_head=8, heads=4, ff_mult=2)
    model = _randomize(model, 5, scale=0.2)
    params = qt.cross_model_params_from_torch(
        {"cross_model." + k: v.numpy() for k, v in model.state_dict().items()})

    torch.manual_seed(6)
    q = torch.randn(2, 9, 32)
    ctx = torch.randn(2, 7, 32)
    mask = torch.where(torch.rand(2, 9, 7) > 0.3,
                       torch.tensor(0.0), torch.tensor(float("-inf")))
    with torch.no_grad():
        ref = model(q, ctx, mask).numpy()
    got = np.asarray(qt.cross_model_forward(params, q.numpy(), ctx.numpy(),
                                            mask.numpy()))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_mps_score_end_to_end_vs_reference_math():
    """Full MPScore path (mps.py:45-97) on a tiny CLIP: our converters +
    token-feature forwards + cross_model + mask vs a direct torch
    transcription using the vendored Cross_model."""
    import importlib

    from reference_loader import load_reference_package
    from transformers import CLIPConfig, CLIPModel

    from svi_tpu.extensions import image_quality as iq

    load_reference_package()
    cm = importlib.import_module(
        "diffsynth.extensions.ImageQualityMetric.trainer.models.cross_modeling")

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=99, hidden_act="gelu",
                         eos_token_id=98, bos_token_id=0, pad_token_id=1),
        vision_config=dict(hidden_size=48, intermediate_size=96,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8, hidden_act="gelu"),
        projection_dim=24,
    )
    clip = _randomize(CLIPModel(cfg), 7)
    cross = _randomize(cm.Cross_model(dim=24, layer_num=2, dim_head=8,
                                      heads=3, ff_mult=2), 9, scale=0.2)

    ids = torch.tensor([[0, 5, 9, 98]])
    cond_ids = torch.tensor([[0, 7, 3, 98]])
    torch.manual_seed(10)
    px = torch.randn(1, 3, 16, 16)

    # ---- reference math (mps.py:66-97 w/ clip_model.py XCLIPModel feats) ----
    with torch.no_grad():
        t_out = clip.text_model(input_ids=ids)
        text_f = clip.text_projection(t_out[0])
        text_features = clip.text_projection(t_out[1])
        c_out = clip.text_model(input_ids=cond_ids)
        condition_f = clip.text_projection(c_out[0])
        image_f = clip.visual_projection(clip.vision_model(pixel_values=px)[0])
        sim_tc = torch.einsum("bid,bjd->bji", text_f, condition_f)
        sim_tc = torch.max(sim_tc, dim=1, keepdim=True)[0]
        sim_tc = sim_tc / sim_tc.max()
        mask = torch.where(sim_tc > 0.3, 0.0, float("-inf"))
        mask = mask.repeat(1, image_f.shape[1], 1)
        img_feat = cross(image_f, text_f, mask)[:, 0, :]
        img_feat = img_feat / img_feat.norm(dim=-1, keepdim=True)
        txt_feat = text_features / text_features.norm(dim=-1, keepdim=True)
        ref_score = float((clip.logit_scale.exp() * txt_feat @ img_feat.T)[0, 0])

    # ---- ours through the converters + MPScore ----
    sd = {k: v.numpy() for k, v in clip.state_dict().items()}
    vis, txt, _ = qt.clip_params_from_hf(sd)
    # MPScore exponentiates the raw logit_scale (mps.py:96)
    scale = float(sd["logit_scale"])
    cparams = qt.cross_model_params_from_torch(
        {"cross_model." + k: v.numpy() for k, v in cross.state_dict().items()})

    tok_map = {"prompt": ids.numpy(), iq.MPS_CONDITIONS["overall"]: cond_ids.numpy()}

    def text_features_fn(prompt):
        toks, pooled = qt.clip_text_token_features(txt, tok_map[prompt], 2)
        return np.asarray(toks), np.asarray(pooled)

    def image_features_fn(_image):
        return np.asarray(qt.clip_image_token_features(
            vis, jnp.asarray(px.numpy()), 2))

    def cross_fn(image_f, text_f, m):
        return qt.cross_model_forward(cparams, image_f, text_f, m)

    scorer = iq.MPScore(text_features_fn, image_features_fn, cross_fn, scale)
    got = scorer.score("ignored.png", "prompt")[0]
    assert got == pytest.approx(ref_score, rel=2e-3, abs=2e-4)
