"""Image quality / preference metrics (offline eval tooling).

Behavioral reference: diffsynth/extensions/ImageQualityMetric/ —
AestheticScore (aesthetic.py:10-148: CLIP ViT-L image features -> 5-layer
linear MLP), ImageRewardScore (imagereward.py:24-212: BLIP cross-attended
text features -> same MLP, normalized by fixed mean/std), PickScore
(pickscore.py:22-57: normalized CLIP-H dot with optional
logit-scale softmax), CLIPScore / HPScore_v2 (clip.py / hps.py: open_clip
ViT-H normalized feature dot), MPScore (mps.py:45-97: condition-masked
cross-attention head), and the model registry (__init__.py:12-148).

The scoring heads are first-party math and run in JAX. The feature towers
(CLIP / open_clip / BLIP) also run natively by default —
`load_preference_model(engine="jax")` loads the checkpoint state dicts
straight into extensions/quality_towers.py forwards (golden-tested vs
transformers / the vendored open_clip+BLIP); only tokenizer files go through
transformers, and the open_clip BPE runs on utils/clip_bpe.py.
engine="torch" keeps transformers models as the towers. Zero-egress: nothing
downloads here; pass the paths the reference's modelscope snapshot
(__init__.py:21-123) would have produced.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models.sd import _dense, _lin_from

# fixed normalization of the ImageReward head (ref imagereward.py:62-64)
IMAGE_REWARD_MEAN = 0.16717362830052426
IMAGE_REWARD_STD = 1.0333394966054072

# ref __init__.py:12-21
PREFERENCE_MODEL_IDS = ("ImageReward", "Aesthetic", "PickScore", "CLIP",
                        "HPSv2", "HPSv2.1", "MPS")


def score_mlp_forward(params, x):
    """The 768->1024->128->64->16->1 linear stack shared by the Aesthetic
    and ImageReward heads (aesthetic.py:10-32 / imagereward.py:24-52; the
    dropouts are eval no-ops, there are no activations)."""
    for key in ("0", "2", "4", "6", "7"):
        x = _dense(params[key], x)
    return x


def score_mlp_params_from_torch(sd: dict):
    return {k: _lin_from(sd, f"layers.{k}") for k in ("0", "2", "4", "6",
                                                      "7")}


def _normalize(x):
    xf = jnp.asarray(x, jnp.float32)
    return xf / jnp.linalg.norm(xf, axis=-1, keepdims=True)


class AestheticScore:
    """ref aesthetic.py:52-148. `image_features_fn(pil_image) -> (1, 768)`
    CLIP ViT-L projected image features (e.g. transformers
    CLIPModel.get_image_features)."""

    def __init__(self, mlp_params, image_features_fn):
        self.mlp_params = mlp_params
        self.image_features_fn = image_features_fn

    def score(self, images, prompt=""):
        if not isinstance(images, list):
            images = [images]
        out = []
        for image in images:
            emb = _normalize(np.asarray(self.image_features_fn(image)))
            out.append(float(score_mlp_forward(self.mlp_params, emb)[0, 0]))
        return out


class ImageRewardScore:
    """ref imagereward.py:54-212. `text_features_fn(pil_image, prompt) ->
    (1, 768)` — BLIP text encoder CLS state cross-attended on the image."""

    def __init__(self, mlp_params, text_features_fn,
                 mean=IMAGE_REWARD_MEAN, std=IMAGE_REWARD_STD):
        self.mlp_params = mlp_params
        self.text_features_fn = text_features_fn
        self.mean, self.std = mean, std

    def score(self, images, prompt):
        if not isinstance(images, list):
            images = [images]
        out = []
        for image in images:
            feat = jnp.asarray(np.asarray(self.text_features_fn(image,
                                                                prompt)),
                               jnp.float32)
            r = score_mlp_forward(self.mlp_params, feat)
            out.append(float((r[0, 0] - self.mean) / self.std))
        return out


class PickScore:
    """ref pickscore.py:8-111. `features_fn(pil_image, prompt) ->
    (image_features (1,D), text_features (1,D), logit_scale float)` from a
    CLIP-H checkpoint (transformers CLIPModel)."""

    def __init__(self, features_fn):
        self.features_fn = features_fn

    def _calculate_score(self, image, prompt, softmax=False):
        img, txt, logit_scale = self.features_fn(image, prompt)
        img, txt = _normalize(img), _normalize(txt)
        s = (txt @ img.T)[0]
        if softmax:
            s = jax.nn.softmax(float(np.exp(logit_scale)) * s, axis=-1)
        return float(s[0])

    def score(self, images, prompt, softmax=False):
        if not isinstance(images, list):
            images = [images]
        return [self._calculate_score(im, prompt, softmax) for im in images]


class CLIPScore:
    """ref clip.py:7-97 (and hps.py:9-118 — HPS differs only in checkpoint):
    diagonal of image@text^T over features the encoder already normalized
    (open_clip output_dict)."""

    def __init__(self, encode_fn):
        self.encode_fn = encode_fn  # (pil_image, prompt) -> (img_f, txt_f)

    def _calculate_score(self, image, prompt):
        img, txt = self.encode_fn(image, prompt)
        logits = jnp.asarray(np.asarray(img), jnp.float32) \
            @ jnp.asarray(np.asarray(txt), jnp.float32).T
        return float(jnp.diagonal(logits)[0])

    def score(self, images, prompt):
        if not isinstance(images, list):
            images = [images]
        return [self._calculate_score(im, prompt) for im in images]


HPScore_v2 = CLIPScore  # ref hps.py: same scoring math, HPS checkpoint

MPS_CONDITIONS = {
    "overall": "light, color, clarity, tone, style, ambiance, artistry, "
               "shape, face, hair, hands, limbs, structure, instance, "
               "texture, quantity, attributes, position, number, location, "
               "word, things",
    "aesthetics": "light, color, clarity, tone, style, ambiance, artistry",
    "quality": "shape, face, hair, hands, limbs, structure, instance, "
               "texture",
    "semantic": "quantity, attributes, position, number, location",
}


def mps_condition_mask(text_f, condition_f, threshold=0.3):
    """ref mps.py:84-89: token-level text/condition similarity -> additive
    -inf mask where below 30% of the max. text_f (B,S,D), condition_f
    (B,Sc,D); returns (B, 1, S) f32 additive mask."""
    sim = jnp.einsum("bid,bjd->bji", jnp.asarray(text_f, jnp.float32),
                     jnp.asarray(condition_f, jnp.float32))
    sim = jnp.max(sim, axis=1, keepdims=True)
    sim = sim / jnp.max(sim)
    return jnp.where(sim > threshold, 0.0, -jnp.inf).astype(jnp.float32)


class MPScore:
    """ref mps.py:27-129. The CLIP towers + cross_model head live in the MPS
    checkpoint (vendored trainer module); injected as callables:
    `text_features_fn(prompt) -> (token_states, pooled)`,
    `image_features_fn(pil_image) -> token_states`,
    `cross_fn(image_f, text_f, mask) -> (B, S, D)` and `logit_scale`."""

    def __init__(self, text_features_fn, image_features_fn, cross_fn,
                 logit_scale, condition="overall"):
        self.text_features_fn = text_features_fn
        self.image_features_fn = image_features_fn
        self.cross_fn = cross_fn
        self.logit_scale = logit_scale
        self.condition_prompt = MPS_CONDITIONS[condition]

    def _calculate_score(self, image, prompt):
        text_f, text_features = self.text_features_fn(prompt)
        image_f = self.image_features_fn(image)
        condition_f, _ = self.text_features_fn(self.condition_prompt)
        mask = mps_condition_mask(text_f, condition_f)
        mask = jnp.repeat(mask, np.asarray(image_f).shape[1], axis=1)
        image_features = np.asarray(self.cross_fn(image_f, text_f,
                                                  mask))[:, 0, :]
        image_features = _normalize(image_features)
        text_features = _normalize(text_features)
        s = float(np.exp(self.logit_scale)) * text_features \
            @ image_features.T
        return float(s[0, 0])

    def score(self, images, prompt):
        if not isinstance(images, list):
            images = [images]
        return [self._calculate_score(im, prompt) for im in images]


def _load_state_dict_any(p):
    """State dict from a .safetensors file, a torch .pt/.bin file, or an HF
    model directory (model.safetensors / pytorch_model.bin)."""
    import os

    if os.path.isdir(p):
        for name in ("model.safetensors", "open_clip_pytorch_model.bin",
                     "pytorch_model.bin", "pytorch_model.pt"):
            cand = os.path.join(p, name)
            if os.path.exists(cand):
                p = cand
                break
        else:
            raise FileNotFoundError(f"no model weights found in {p}")
    if p.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(p, framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


# transformer width -> head count for the CLIP-family towers these metrics
# ship (ViT-B/L/H vision + their text towers); head_dim is not uniform
# across them (ViT-H vision uses 80), so a divide-by-64 heuristic is wrong
_WIDTH_TO_HEADS = {512: 8, 640: 10, 768: 12, 896: 14, 1024: 16, 1280: 16}


def _heads(sd, key):
    width = int(np.asarray(sd[key]).shape[-1])
    return _WIDTH_TO_HEADS.get(width, max(1, width // 64))


def load_preference_model(model_name, device="cpu", path=None, engine="jax"):
    """ref __init__.py:124-148 API. `path` is the reference snapshot's
    load_path dict resolved to local files (modelscope download layout,
    __init__.py:21-123; this environment has no egress, so paths must exist
    locally).

    engine="jax" (default) runs the feature towers natively
    (extensions/quality_towers.py) — only tokenizer/config files go through
    transformers; engine="torch" uses transformers models as the towers."""
    if model_name not in PREFERENCE_MODEL_IDS:
        raise ValueError(f"unknown preference model {model_name!r}; "
                         f"expected one of {PREFERENCE_MODEL_IDS}")
    if path is None:
        raise FileNotFoundError(
            f"no local checkpoint paths for {model_name!r}: this build has "
            "no network egress; download the reference's modelscope "
            "snapshot and pass its load_path dict")
    from . import quality_towers as qt

    if model_name == "Aesthetic":
        mlp_params = score_mlp_params_from_torch(
            _load_state_dict_any(path["aesthetic_predictor"]))
        if engine == "torch":
            from transformers import AutoModel, AutoProcessor

            clip = AutoModel.from_pretrained(path["clip-large"]).eval()
            proc = AutoProcessor.from_pretrained(path["clip-large"])

            def image_features_fn(image):
                import torch

                with torch.no_grad():
                    px = proc(images=image, return_tensors="pt").pixel_values
                    return clip.get_image_features(px).numpy()

        else:
            sd = _load_state_dict_any(path["clip-large"])
            vis, txt, scale = qt.clip_params_from_hf(sd)
            hv = _heads(sd, "vision_model.embeddings.class_embedding")
            ht = _WIDTH_TO_HEADS.get(int(txt["tok"].shape[1]),
                                     max(1, txt["tok"].shape[1] // 64))
            image_features_fn, _, _ = qt.make_clip_feature_fns(
                vis, txt, hv, ht, None, quick_gelu=True, logit_scale=scale)
        return AestheticScore(mlp_params, image_features_fn)

    if model_name == "PickScore":
        if engine == "torch":
            from transformers import AutoModel, AutoProcessor

            clip = AutoModel.from_pretrained(path["pickscore"]).eval()
            proc = AutoProcessor.from_pretrained(path["clip"])

            def features_fn(image, prompt):
                import torch

                with torch.no_grad():
                    px = proc(images=image, return_tensors="pt").pixel_values
                    tx = proc(text=prompt, padding=True, truncation=True,
                              max_length=77, return_tensors="pt")
                    return (clip.get_image_features(pixel_values=px).numpy(),
                            clip.get_text_features(**tx).numpy(),
                            float(clip.logit_scale))

        else:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(path["clip"])
            sd = _load_state_dict_any(path["pickscore"])
            vis, txt, scale = qt.clip_params_from_hf(sd)
            hv = _heads(sd, "vision_model.embeddings.class_embedding")
            ht = _heads(sd, "text_model.embeddings.token_embedding.weight")
            # PickScore is CLIP-H: gelu (not quick_gelu) activations
            _, _, features_fn = qt.make_clip_feature_fns(
                vis, txt, hv, ht, tok, quick_gelu=False, logit_scale=scale)
        return PickScore(features_fn)

    if model_name in ("CLIP", "HPSv2", "HPSv2.1"):
        from ..utils.clip_bpe import SimpleTokenizer

        key = {"CLIP": "open_clip", "HPSv2": "hpsv2", "HPSv2.1": "hpsv2.1"}[model_name]
        sd = _load_state_dict_any(path[key])
        vis, txt, scale = qt.clip_params_from_open_clip(sd)
        tok = SimpleTokenizer(path["open_clip_bpe"])
        hv = _heads(sd, "visual.class_embedding")
        ht = _heads(sd, "positional_embedding")

        def encode_fn(image, prompt, _vis=vis, _txt=txt, _hv=hv, _ht=ht):
            px = jnp.asarray(qt.clip_preprocess(image, 224))
            img_f, _ = qt.clip_vision_forward(_vis, px, _hv)
            ids = tok([prompt])
            txt_f = qt.clip_text_forward(_txt, ids, _ht)
            return (np.asarray(_normalize(img_f)),
                    np.asarray(_normalize(txt_f)))

        return CLIPScore(encode_fn)

    if model_name == "ImageReward":
        from transformers import AutoTokenizer

        sd = _load_state_dict_any(path["imagereward"])
        mlp_params = score_mlp_params_from_torch(
            {k[4:]: v for k, v in sd.items() if k.startswith("mlp.")})
        vit, bert = qt.blip_params_from_torch(sd)
        tok = AutoTokenizer.from_pretrained(path["bert_model_path"])
        hv = _heads(sd, next(k for k in sd if k.endswith("cls_token")))
        ht = _WIDTH_TO_HEADS.get(int(bert["word"].shape[1]),
                                 max(1, bert["word"].shape[1] // 64))
        text_features_fn = qt.make_blip_feature_fn(vit, bert, hv, ht, tok)
        return ImageRewardScore(mlp_params, text_features_fn)

    if model_name == "MPS":
        # ref mps.py:27-43: one safetensors file holding the full
        # trainer/models/clip_model.py CLIPModel — `model.*` is a
        # transformers CLIPModel (CLIP-H: plain gelu), `cross_model.*` the
        # CoCa-style multi-query head (cross_modeling.py) — scored with
        # token-level projected features (clip_model.py:21-91)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path["clip"])
        sd = _load_state_dict_any(path["mps"])
        clip_sd = {k[len("model."):]: v for k, v in sd.items()
                   if k.startswith("model.")}
        vis, txt, _ = qt.clip_params_from_hf(clip_sd)
        # MPScore exponentiates (mps.py:96 logit_scale.exp()); feed the raw
        # parameter, not the exp'd scale clip_params_from_hf returns
        scale = float(np.asarray(clip_sd["logit_scale"]))
        cross = qt.cross_model_params_from_torch(sd)
        hv = _heads(clip_sd, "vision_model.embeddings.class_embedding")
        ht = _WIDTH_TO_HEADS.get(int(txt["tok"].shape[1]),
                                 max(1, txt["tok"].shape[1] // 64))
        max_len = min(int(getattr(tok, "model_max_length", 77)), 77)

        def text_features_fn(prompt):
            ids = tok(prompt, max_length=max_len, padding="max_length",
                      truncation=True, return_tensors="np").input_ids
            toks, pooled = qt.clip_text_token_features(txt, ids, ht)
            return np.asarray(toks), np.asarray(pooled)

        def image_features_fn(image):
            px = jnp.asarray(qt.clip_preprocess(image, 224))
            return np.asarray(qt.clip_image_token_features(vis, px, hv))

        def cross_fn(image_f, text_f, mask):
            return qt.cross_model_forward(cross, image_f, text_f, mask)

        return MPScore(text_features_fn, image_features_fn, cross_fn, scale)

    raise NotImplementedError(f"{model_name!r} has no loader wired")
