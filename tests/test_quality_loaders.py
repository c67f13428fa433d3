"""End-to-end native-engine tests for load_preference_model: synthetic tiny
checkpoints on disk -> native towers -> scorer classes, plus BPE-tokenizer
golden parity vs the vendored open_clip SimpleTokenizer on a synthetic
merges file."""

import gzip
import json
import os

import numpy as np
import pytest
import torch

from svi_tpu.extensions import image_quality as iq
from svi_tpu.extensions import quality_towers as qt


def _save_safetensors(path, arrays):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in arrays.items()}, path)


def _tiny_hf_clip_sd(seed, vis_width=48, txt_width=32, proj=24):
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config=dict(hidden_size=txt_width, intermediate_size=2 * txt_width,
                         num_hidden_layers=1, num_attention_heads=2,
                         vocab_size=99, hidden_act="quick_gelu",
                         eos_token_id=98, bos_token_id=0, pad_token_id=1),
        vision_config=dict(hidden_size=vis_width, intermediate_size=2 * vis_width,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=16, patch_size=8, hidden_act="quick_gelu"),
        projection_dim=proj,
    )
    model = CLIPModel(cfg)
    torch.manual_seed(seed)
    sd = model.state_dict()
    for k in sd:
        if sd[k].dtype.is_floating_point:
            sd[k] = torch.randn_like(sd[k]) * 0.05
    return {k: v.numpy() for k, v in sd.items()}


def test_aesthetic_native_loader(tmp_path):
    """Aesthetic via engine='jax': CLIP dir weights + head safetensors ->
    a finite score, no transformers model construction."""
    clip_dir = tmp_path / "clip-vit-large-patch14"
    clip_dir.mkdir()
    _save_safetensors(str(clip_dir / "model.safetensors"), _tiny_hf_clip_sd(0))
    torch.manual_seed(1)
    head = {}
    dims = [(24, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    for name, (i, o) in zip(("0", "2", "4", "6", "7"), dims):
        head[f"layers.{name}.weight"] = (torch.randn(o, i) * 0.05).numpy()
        head[f"layers.{name}.bias"] = np.zeros(o, np.float32)
    _save_safetensors(str(tmp_path / "aesthetic.safetensors"), head)

    scorer = iq.load_preference_model(
        "Aesthetic", path={"aesthetic_predictor": str(tmp_path / "aesthetic.safetensors"),
                           "clip-large": str(clip_dir)})

    # the loader wires the real 224 preprocess; the tiny tower was built for
    # 16x16 inputs, so rebuild its feature fn at size=16 for the smoke run
    sd = iq._load_state_dict_any(str(clip_dir))
    vis, txt, scale = qt.clip_params_from_hf(sd)
    fn, _, _ = qt.make_clip_feature_fns(vis, txt, 2, 2, None, quick_gelu=True,
                                        logit_scale=scale, size=16)
    scorer.image_features_fn = fn

    from PIL import Image

    img = Image.fromarray(np.random.default_rng(2).integers(
        0, 255, (20, 24, 3), dtype=np.uint8).astype(np.uint8))
    out = scorer.score([img])
    assert len(out) == 1 and np.isfinite(out[0])


def test_imagereward_native_loader(tmp_path):
    """ImageReward via engine='jax': a synthetic BLIP-format checkpoint
    (blip.visual_encoder + blip.text_encoder + mlp) and a local bert
    tokenizer dir."""
    from transformers import BlipVisionConfig
    from transformers.models.blip.configuration_blip import BlipTextConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    torch.manual_seed(3)
    vmodel = BlipVisionModel(BlipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=1,
        num_attention_heads=2, image_size=16, patch_size=8))
    tmodel = BlipTextModel(BlipTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=2, vocab_size=30522, max_position_embeddings=64,
        encoder_hidden_size=48, is_decoder=True), add_pooling_layer=False)
    sd = {}
    vis_sd = {k: v.numpy() for k, v in vmodel.state_dict().items()}
    ren = {"embeddings.class_embedding": "visual_encoder.cls_token",
           "embeddings.position_embedding": "visual_encoder.pos_embed",
           "embeddings.patch_embedding.weight": "visual_encoder.patch_embed.proj.weight",
           "embeddings.patch_embedding.bias": "visual_encoder.patch_embed.proj.bias",
           "post_layernorm.weight": "visual_encoder.norm.weight",
           "post_layernorm.bias": "visual_encoder.norm.bias"}
    for k, v in vis_sd.items():
        if k in ren:
            sd["blip." + ren[k]] = v
        elif "encoder.layers." in k:
            nk = "visual_encoder.blocks." + k.split("encoder.layers.", 1)[1]
            nk = (nk.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
                  .replace("self_attn.qkv", "attn.qkv")
                  .replace("self_attn.projection", "attn.proj"))
            sd["blip." + nk] = v
    for k, v in tmodel.state_dict().items():
        sd["blip.text_encoder." + k] = v.numpy()
    torch.manual_seed(4)
    dims = [(64, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    for name, (i, o) in zip(("0", "2", "4", "6", "7"), dims):
        sd[f"mlp.layers.{name}.weight"] = (torch.randn(o, i) * 0.05).numpy()
        sd[f"mlp.layers.{name}.bias"] = np.zeros(o, np.float32)
    _save_safetensors(str(tmp_path / "ImageReward.safetensors"), sd)

    bert_dir = tmp_path / "bert-base-uncased"
    bert_dir.mkdir()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "on",
             "the", "mat", "hello", "world"]
    (bert_dir / "vocab.txt").write_text("\n".join(vocab))
    (bert_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "BertTokenizer", "do_lower_case": True}))

    scorer = iq.load_preference_model(
        "ImageReward",
        path={"imagereward": str(tmp_path / "ImageReward.safetensors"),
              "med_config": "", "bert_model_path": str(bert_dir)})
    # rebuild the feature fn at the tiny tower's input size
    sd_loaded = iq._load_state_dict_any(str(tmp_path / "ImageReward.safetensors"))
    vit, bert = qt.blip_params_from_torch(sd_loaded)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(bert_dir))
    scorer.text_features_fn = qt.make_blip_feature_fn(vit, bert, 2, 2, tok,
                                                      size=16)
    from PIL import Image

    img = Image.fromarray(np.random.default_rng(5).integers(
        0, 255, (18, 18, 3), dtype=np.uint8).astype(np.uint8))
    out = scorer.score([img], "a cat on the mat")
    assert len(out) == 1 and np.isfinite(out[0])


def _synthetic_bpe_gz(path):
    """A tiny well-formed bpe vocab: header line + merges over ascii pairs."""
    merges = ["t h</w>", "th e</w>", "h e", "l l", "ll o</w>", "c a",
              "ca t</w>", "w o", "wo r", "wor l", "worl d</w>"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges))
        f.write("\n")


def test_clip_bpe_vs_vendored_tokenizer(tmp_path):
    import importlib

    from reference_loader import load_reference_package

    from svi_tpu.utils.clip_bpe import SimpleTokenizer

    bpe = str(tmp_path / "bpe.txt.gz")
    _synthetic_bpe_gz(bpe)
    ours = SimpleTokenizer(bpe)

    load_reference_package()
    voc = importlib.import_module(
        "diffsynth.extensions.ImageQualityMetric.open_clip.tokenizer")
    theirs = voc.SimpleTokenizer(bpe)

    for text in ["hello world", "The cat!", "weird  spacing\tand CAPS",
                 "punctuation, marks... and 123 numbers"]:
        ref = theirs(text, context_length=20).numpy()[0]
        got = ours([text], context_length=20)[0]
        np.testing.assert_array_equal(got, ref)


def test_open_clip_native_clipscore(tmp_path):
    """CLIPScore via engine='jax': synthetic open_clip checkpoint + bpe."""
    import importlib

    from reference_loader import load_reference_package

    load_reference_package()
    oc = importlib.import_module(
        "diffsynth.extensions.ImageQualityMetric.open_clip.model")
    model = oc.CLIP(
        embed_dim=24,
        vision_cfg=oc.CLIPVisionCfg(layers=1, width=48, head_width=24,
                                    patch_size=8, image_size=16),
        text_cfg=oc.CLIPTextCfg(context_length=20, vocab_size=49408, width=32,
                                heads=2, layers=1),
        quick_gelu=False,
    )
    torch.manual_seed(6)
    msd = model.state_dict()
    for k in msd:
        if msd[k].dtype.is_floating_point:
            msd[k] = torch.randn_like(msd[k]) * 0.05
    _save_safetensors(str(tmp_path / "open_clip.safetensors"),
                      {k: v.numpy() for k, v in msd.items()})
    bpe = str(tmp_path / "bpe.txt.gz")
    _synthetic_bpe_gz(bpe)

    scorer = iq.load_preference_model(
        "CLIP", path={"open_clip": str(tmp_path / "open_clip.safetensors"),
                      "open_clip_bpe": bpe})
    # tiny tower input size is 16 and heads are 2 — rebuild encode_fn
    sd = iq._load_state_dict_any(str(tmp_path / "open_clip.safetensors"))
    vis, txt, _ = qt.clip_params_from_open_clip(sd)
    from svi_tpu.utils.clip_bpe import SimpleTokenizer

    tok = SimpleTokenizer(bpe)

    def encode_fn(image, prompt):
        import jax.numpy as jnp

        px = jnp.asarray(qt.clip_preprocess(image, 16))
        img_f, _ = qt.clip_vision_forward(vis, px, 2)
        txt_f = qt.clip_text_forward(txt, tok([prompt], 20), 2)
        n = lambda a: np.asarray(a) / np.linalg.norm(np.asarray(a), axis=-1,
                                                     keepdims=True)
        return n(img_f), n(txt_f)

    scorer.encode_fn = encode_fn
    from PIL import Image

    img = Image.fromarray(np.random.default_rng(7).integers(
        0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8))
    out = scorer.score([img], "hello world")
    assert len(out) == 1 and np.isfinite(out[0]) and -1.01 <= out[0] <= 1.01
