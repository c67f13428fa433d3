"""Native JAX feature towers for the image-quality metrics.

Behavioral reference: diffsynth/extensions/ImageQualityMetric/ — the vendored
BLIP (BLIP/vit.py timm-style ViT + BLIP/med.py cross-attention BERT, used by
ImageReward), the vendored open_clip (open_clip/transformer.py
VisionTransformer/TextTransformer, used by CLIPScore and HPSv2/v2.1), and the
transformers CLIPModel towers (Aesthetic / PickScore). All three are the same
family of pre-LN transformer towers; one forward implementation covers them,
with converters from each checkpoint's torch state-dict naming.

Everything here is offline eval tooling (SURVEY §2.1 "ImageQualityMetric");
the forwards run eagerly as XLA ops on whatever backend JAX has.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _dense(p, x):
    y = x @ p["w"]
    if "b" in p and p["b"] is not None:
        y = y + p["b"]
    return y


def _gelu(x, quick=False):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _mha(p, q_in, kv_in, heads, mask=None):
    """Standard multi-head attention. q_in (B,Lq,D); kv_in (B,Lk,Dkv);
    mask additive (..., Lq, Lk) or None."""
    B, Lq, _ = q_in.shape
    Lk = kv_in.shape[1]
    q = _dense(p["q"], q_in).reshape(B, Lq, heads, -1).transpose(0, 2, 1, 3)
    k = _dense(p["k"], kv_in).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    v = _dense(p["v"], kv_in).reshape(B, Lk, heads, -1).transpose(0, 2, 1, 3)
    logits = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(q.shape[-1])
    if mask is not None:
        logits = logits + mask
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Lq, -1)
    return _dense(p["o"], out)


def _pre_ln_block(p, x, heads, mask=None, quick_gelu=False, ln_eps=1e-5):
    """CLIP/ViT residual block: x += attn(ln1(x)); x += mlp(ln2(x))."""
    h = _ln(p["ln1"], x, ln_eps)
    x = x + _mha(p, h, h, heads, mask)
    h = _ln(p["ln2"], x, ln_eps)
    x = x + _dense(p["fc2"], _gelu(_dense(p["fc1"], h), quick_gelu))
    return x


# ---------------------------------------------------------------------------
# CLIP-family towers (transformers CLIPModel / open_clip / BLIP ViT)
# ---------------------------------------------------------------------------


def clip_vision_forward(p, pixels, heads, quick_gelu=False, ln_eps=1e-5):
    """pixels (B,3,H,W) normalized. Returns (projected_pooled | None,
    tokens): pooled = ln_post(cls) @ proj when a projection exists
    (transformers CLIPModel.get_image_features / open_clip
    VisionTransformer); tokens = the full final hidden sequence with
    ln_post applied to every token when `ln_post_all` (BLIP vit.py's final
    norm), else pre-ln_post tokens."""
    B = pixels.shape[0]
    patch = jax.lax.conv_general_dilated(
        pixels, p["patch_w"],
        window_strides=(p["patch_w"].shape[-2], p["patch_w"].shape[-1]),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if p.get("patch_b") is not None:
        patch = patch + p["patch_b"].reshape(1, -1, 1, 1)
    tokens = patch.reshape(B, patch.shape[1], -1).transpose(0, 2, 1)
    cls = jnp.broadcast_to(p["cls"].reshape(1, 1, -1),
                           (B, 1, tokens.shape[-1]))
    x = jnp.concatenate([cls, tokens], axis=1) + p["pos"][None]
    if p.get("ln_pre") is not None:
        x = _ln(p["ln_pre"], x, ln_eps)
    for blk in p["blocks"]:
        x = _pre_ln_block(blk, x, heads, quick_gelu=quick_gelu, ln_eps=ln_eps)
    if p.get("ln_post_all"):
        x = _ln(p["ln_post"], x, ln_eps)
        return None, x
    pooled = _ln(p["ln_post"], x[:, 0], ln_eps)
    if p.get("proj") is not None:
        pooled = pooled @ p["proj"]
    return pooled, x


def clip_text_forward(p, ids, heads, quick_gelu=False, ln_eps=1e-5):
    """ids (B,L) int32. Causal transformer; pooled at the argmax token id
    (the EOT token has the highest id in the CLIP vocab — transformers
    CLIPTextModel pooling / open_clip TextTransformer both do this), then
    the text projection."""
    ids = jnp.asarray(ids)
    B, L = ids.shape
    x = p["tok"][ids] + p["pos"][:L][None]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, x.dtype), k=1)[None, None]
    for blk in p["blocks"]:
        x = _pre_ln_block(blk, x, heads, mask=mask, quick_gelu=quick_gelu,
                          ln_eps=ln_eps)
    x = _ln(p["ln_final"], x, ln_eps)
    pooled = x[jnp.arange(B), ids.argmax(axis=-1)]
    if p.get("proj") is not None:
        pooled = pooled @ p["proj"]
    return pooled


# ---------------------------------------------------------------------------
# BLIP med BERT with per-layer cross-attention (ImageReward text encoder)
# ---------------------------------------------------------------------------


def bert_cross_forward(p, ids, attn_mask, enc_states, heads, ln_eps=1e-12):
    """BLIP/med.py BertModel in encoder mode with add_cross_attention: word +
    position embeddings -> LN (:44-88), then per layer: post-LN self-attn,
    post-LN cross-attn onto the image tokens (:320-366), post-LN FFN.
    Returns last_hidden_state; ImageReward pools [:, 0, :]
    (imagereward.py:76-89)."""
    ids = jnp.asarray(ids)
    B, L = ids.shape
    x = p["word"][ids] + p["pos"][:L][None]
    x = _ln(p["emb_ln"], x, ln_eps)
    if attn_mask is None:
        mask = None
    else:
        mask = (1.0 - jnp.asarray(attn_mask, jnp.float32))[:, None, None, :] * -1e4
    for layer in p["layers"]:
        h = _mha(layer["self"], x, x, heads, mask)
        x = _ln(layer["self"]["out_ln"], x + _dense(layer["self"]["od"], h),
                ln_eps)
        if "cross" in layer:
            h = _mha(layer["cross"], x, enc_states, heads)
            x = _ln(layer["cross"]["out_ln"],
                    x + _dense(layer["cross"]["od"], h), ln_eps)
        h = _gelu(_dense(layer["fc1"], x))
        x = _ln(layer["out_ln"], x + _dense(layer["fc2"], h), ln_eps)
    return x


# `_mha` expects q/k/v/o; the BERT layers store their output dense separately
# (post-LN), so give it an identity "o"
def _identity_o(dim, dtype=np.float32):
    return {"w": jnp.eye(dim, dtype=dtype), "b": None}


# ---------------------------------------------------------------------------
# state-dict converters
# ---------------------------------------------------------------------------


def _t(a):
    return jnp.asarray(np.asarray(a, np.float32))


def _lin(sd, prefix, transpose=True):
    w = _t(sd[f"{prefix}.weight"])
    if transpose:
        w = w.T
    b = _t(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return {"w": w, "b": b}


def _ln_p(sd, prefix):
    return {"w": _t(sd[f"{prefix}.weight"]), "b": _t(sd[f"{prefix}.bias"])}


def clip_params_from_hf(sd):
    """transformers CLIPModel state dict -> (vision_params, text_params,
    logit_scale). Names per modeling_clip.py (incl. HF's 'pre_layrnorm'
    spelling)."""
    sd = {k: v for k, v in sd.items()}
    nv = len({k.split(".")[3] for k in sd
              if k.startswith("vision_model.encoder.layers.")})
    vis = {
        "cls": _t(sd["vision_model.embeddings.class_embedding"]),
        "patch_w": _t(sd["vision_model.embeddings.patch_embedding.weight"]),
        "patch_b": (_t(sd["vision_model.embeddings.patch_embedding.bias"])
                    if "vision_model.embeddings.patch_embedding.bias" in sd else None),
        "pos": _t(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": (_ln_p(sd, "vision_model.pre_layrnorm")
                   if "vision_model.pre_layrnorm.weight" in sd else
                   _ln_p(sd, "vision_model.pre_layernorm")
                   if "vision_model.pre_layernorm.weight" in sd else None),
        "ln_post": _ln_p(sd, "vision_model.post_layernorm"),
        "proj": _t(sd["visual_projection.weight"]).T,
        "blocks": [],
    }
    for i in range(nv):
        pre = f"vision_model.encoder.layers.{i}"
        vis["blocks"].append({
            "ln1": _ln_p(sd, f"{pre}.layer_norm1"),
            "q": _lin(sd, f"{pre}.self_attn.q_proj"),
            "k": _lin(sd, f"{pre}.self_attn.k_proj"),
            "v": _lin(sd, f"{pre}.self_attn.v_proj"),
            "o": _lin(sd, f"{pre}.self_attn.out_proj"),
            "ln2": _ln_p(sd, f"{pre}.layer_norm2"),
            "fc1": _lin(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        })
    nt = len({k.split(".")[3] for k in sd
              if k.startswith("text_model.encoder.layers.")})
    txt = {
        "tok": _t(sd["text_model.embeddings.token_embedding.weight"]),
        "pos": _t(sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": _ln_p(sd, "text_model.final_layer_norm"),
        "proj": _t(sd["text_projection.weight"]).T,
        "blocks": [],
    }
    for i in range(nt):
        pre = f"text_model.encoder.layers.{i}"
        txt["blocks"].append({
            "ln1": _ln_p(sd, f"{pre}.layer_norm1"),
            "q": _lin(sd, f"{pre}.self_attn.q_proj"),
            "k": _lin(sd, f"{pre}.self_attn.k_proj"),
            "v": _lin(sd, f"{pre}.self_attn.v_proj"),
            "o": _lin(sd, f"{pre}.self_attn.out_proj"),
            "ln2": _ln_p(sd, f"{pre}.layer_norm2"),
            "fc1": _lin(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        })
    scale = float(np.exp(np.asarray(sd["logit_scale"]).item())) if "logit_scale" in sd else 100.0
    return vis, txt, scale


def _split_qkv(sd, prefix, dim):
    """torch MultiheadAttention in_proj (3D, D) -> q/k/v dicts."""
    w = _t(sd[f"{prefix}.in_proj_weight"])
    b = _t(sd[f"{prefix}.in_proj_bias"])
    return (
        {"w": w[:dim].T, "b": b[:dim]},
        {"w": w[dim:2 * dim].T, "b": b[dim:2 * dim]},
        {"w": w[2 * dim:].T, "b": b[2 * dim:]},
    )


def clip_params_from_open_clip(sd):
    """Vendored open_clip CLIP state dict -> (vision, text, logit_scale)
    (open_clip/model.py + transformer.py naming: visual.conv1,
    transformer.resblocks.N.attn.in_proj_*, mlp.c_fc/c_proj, text branch at
    the top level)."""
    width = sd["visual.class_embedding"].shape[0]
    nv = len({k.split(".")[3] for k in sd
              if k.startswith("visual.transformer.resblocks.")})
    vis = {
        "cls": _t(sd["visual.class_embedding"]),
        "patch_w": _t(sd["visual.conv1.weight"]),
        "patch_b": None,
        "pos": _t(sd["visual.positional_embedding"]),
        "ln_pre": _ln_p(sd, "visual.ln_pre"),
        "ln_post": _ln_p(sd, "visual.ln_post"),
        "proj": _t(sd["visual.proj"]),
        "blocks": [],
    }
    for i in range(nv):
        pre = f"visual.transformer.resblocks.{i}"
        q, k, v = _split_qkv(sd, f"{pre}.attn", width)
        vis["blocks"].append({
            "ln1": _ln_p(sd, f"{pre}.ln_1"), "q": q, "k": k, "v": v,
            "o": _lin(sd, f"{pre}.attn.out_proj"),
            "ln2": _ln_p(sd, f"{pre}.ln_2"),
            "fc1": _lin(sd, f"{pre}.mlp.c_fc"),
            "fc2": _lin(sd, f"{pre}.mlp.c_proj"),
        })
    twidth = sd["positional_embedding"].shape[1]
    nt = len({k.split(".")[2] for k in sd
              if k.startswith("transformer.resblocks.")})
    txt = {
        "tok": _t(sd["token_embedding.weight"]),
        "pos": _t(sd["positional_embedding"]),
        "ln_final": _ln_p(sd, "ln_final"),
        "proj": _t(sd["text_projection"]),
        "blocks": [],
    }
    for i in range(nt):
        pre = f"transformer.resblocks.{i}"
        q, k, v = _split_qkv(sd, f"{pre}.attn", twidth)
        txt["blocks"].append({
            "ln1": _ln_p(sd, f"{pre}.ln_1"), "q": q, "k": k, "v": v,
            "o": _lin(sd, f"{pre}.attn.out_proj"),
            "ln2": _ln_p(sd, f"{pre}.ln_2"),
            "fc1": _lin(sd, f"{pre}.mlp.c_fc"),
            "fc2": _lin(sd, f"{pre}.mlp.c_proj"),
        })
    scale = float(np.exp(np.asarray(sd["logit_scale"]).item())) if "logit_scale" in sd else 100.0
    return vis, txt, scale


def blip_params_from_torch(sd):
    """Vendored BLIP state dict (ImageReward checkpoint naming:
    blip.visual_encoder.* timm ViT with fused qkv, blip.text_encoder.* med
    BERT) -> (vit_params, bert_params). Accepts either with or without the
    leading 'blip.'."""
    if any(k.startswith("blip.") for k in sd):
        sd = {k[5:]: v for k, v in sd.items() if k.startswith("blip.")}
    width = sd["visual_encoder.cls_token"].shape[-1]
    nv = len({k.split(".")[2] for k in sd
              if k.startswith("visual_encoder.blocks.")})
    vit = {
        "cls": _t(sd["visual_encoder.cls_token"]).reshape(-1),
        "patch_w": _t(sd["visual_encoder.patch_embed.proj.weight"]),
        "patch_b": _t(sd["visual_encoder.patch_embed.proj.bias"]),
        "pos": _t(sd["visual_encoder.pos_embed"]).reshape(-1, width),
        "ln_pre": None,
        "ln_post": _ln_p(sd, "visual_encoder.norm"),
        "ln_post_all": True,
        "proj": None,
        "blocks": [],
    }
    for i in range(nv):
        pre = f"visual_encoder.blocks.{i}"
        qkv_w = _t(sd[f"{pre}.attn.qkv.weight"])
        qkv_b_key = f"{pre}.attn.qkv.bias"
        qkv_b = _t(sd[qkv_b_key]) if qkv_b_key in sd else jnp.zeros(3 * width)
        vit["blocks"].append({
            "ln1": _ln_p(sd, f"{pre}.norm1"),
            "q": {"w": qkv_w[:width].T, "b": qkv_b[:width]},
            "k": {"w": qkv_w[width:2 * width].T, "b": qkv_b[width:2 * width]},
            "v": {"w": qkv_w[2 * width:].T, "b": qkv_b[2 * width:]},
            "o": _lin(sd, f"{pre}.attn.proj"),
            "ln2": _ln_p(sd, f"{pre}.norm2"),
            "fc1": _lin(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        })
    hid = sd["text_encoder.embeddings.word_embeddings.weight"].shape[1]
    nl = len({k.split(".")[3] for k in sd
              if k.startswith("text_encoder.encoder.layer.")})
    bert = {
        "word": _t(sd["text_encoder.embeddings.word_embeddings.weight"]),
        "pos": _t(sd["text_encoder.embeddings.position_embeddings.weight"]),
        "emb_ln": _ln_p(sd, "text_encoder.embeddings.LayerNorm"),
        "layers": [],
    }
    eye = _identity_o(hid)
    for i in range(nl):
        pre = f"text_encoder.encoder.layer.{i}"
        layer = {
            "self": {
                "q": _lin(sd, f"{pre}.attention.self.query"),
                "k": _lin(sd, f"{pre}.attention.self.key"),
                "v": _lin(sd, f"{pre}.attention.self.value"),
                "o": eye,
                "od": _lin(sd, f"{pre}.attention.output.dense"),
                "out_ln": _ln_p(sd, f"{pre}.attention.output.LayerNorm"),
            },
            "fc1": _lin(sd, f"{pre}.intermediate.dense"),
            "fc2": _lin(sd, f"{pre}.output.dense"),
            "out_ln": _ln_p(sd, f"{pre}.output.LayerNorm"),
        }
        if f"{pre}.crossattention.self.query.weight" in sd:
            layer["cross"] = {
                "q": _lin(sd, f"{pre}.crossattention.self.query"),
                "k": _lin(sd, f"{pre}.crossattention.self.key"),
                "v": _lin(sd, f"{pre}.crossattention.self.value"),
                "o": eye,
                "od": _lin(sd, f"{pre}.crossattention.output.dense"),
                "out_ln": _ln_p(sd, f"{pre}.crossattention.output.LayerNorm"),
            }
        bert["layers"].append(layer)
    return vit, bert


# ---------------------------------------------------------------------------
# preprocessing + feature functions for the scorer classes
# ---------------------------------------------------------------------------

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(image, size=224):
    """CLIP _transform: bicubic resize of the short side to `size`, center
    crop, normalize. -> (1, 3, size, size) f32."""
    from PIL import Image

    if not isinstance(image, Image.Image):
        image = Image.open(image)
    image = image.convert("RGB")
    w, h = image.size
    s = size / min(w, h)
    image = image.resize((round(w * s), round(h * s)), Image.BICUBIC)
    w, h = image.size
    left, top = (w - size) // 2, (h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    x = np.asarray(image, np.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    return x.transpose(2, 0, 1)[None]


def make_clip_feature_fns(vision, text, heads_v, heads_t, tokenizer,
                          quick_gelu=False, logit_scale=100.0, size=224):
    """(image_features_fn, text_features_fn, features_fn) over the native
    towers — the injection points of AestheticScore / PickScore / CLIPScore."""

    def image_features_fn(image):
        px = jnp.asarray(clip_preprocess(image, size))
        pooled, _ = clip_vision_forward(vision, px, heads_v, quick_gelu)
        return np.asarray(pooled)

    def text_features_fn(prompt):
        ids = tokenizer(prompt, return_tensors="np", padding="max_length",
                        max_length=77, truncation=True).input_ids
        return np.asarray(clip_text_forward(text, ids, heads_t, quick_gelu))

    def features_fn(image, prompt):
        return image_features_fn(image), text_features_fn(prompt), logit_scale

    return image_features_fn, text_features_fn, features_fn


def make_blip_feature_fn(vit, bert, heads_v, heads_t, tokenizer, size=224):
    """ImageReward text_features_fn: BLIP visual tokens cross-attended by the
    med BERT; returns last_hidden_state[:, 0, :]
    (ref imagereward.py:76-89)."""

    def text_features_fn(image, prompt):
        px = jnp.asarray(clip_preprocess(image, size))
        # vendored BLIP/vit.py builds LayerNorm with eps=1e-6 (timm default)
        _, image_embeds = clip_vision_forward(vit, px, heads_v, ln_eps=1e-6)
        tok = tokenizer(prompt, padding="max_length", truncation=True,
                        max_length=35, return_tensors="np")
        out = bert_cross_forward(bert, tok.input_ids, tok.attention_mask,
                                 image_embeds, heads_t)
        return np.asarray(out[:, 0, :])

    return text_features_fn


# ---------------------------------------------------------------------------
# MPS cross-model (trainer/models/cross_modeling.py): CoCa-style multi-query
# cross-attention head that re-reads the image tokens under a text-condition
# mask. Used only by MPScore (mps.py:90).
# ---------------------------------------------------------------------------


def _swiglu(x):
    """cross_modeling.py:69-72: chunk(2) -> silu(gate) * x."""
    a, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * a


def _rotary_table(n, dim_head, inv_freq=None):
    """cross_modeling.py:43-52: freqs (n, d/2) duplicated to (n, d)."""
    if inv_freq is None:
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2,
                                                dtype=np.float32) / dim_head))
    seq = jnp.arange(n, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", seq, jnp.asarray(inv_freq, jnp.float32))
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half_mps(t):
    """cross_modeling.py:55-58: split the last dim in two halves, (-x2, x1).
    (NOT the interleaved GPT-NeoX layout.)"""
    x1, x2 = jnp.split(t, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary_mps(pos, t):
    return t * jnp.cos(pos) + _rotate_half_mps(t) * jnp.sin(pos)


def cross_model_forward(p, query_tokens, context_tokens, mask):
    """Cross_model.forward (cross_modeling.py:261-292): layer_num x
    [residual multi-query CrossAttention w/ parallel SwiGLU FF onto the
    context, then a residual PaLM-style ParallelTransformerBlock].

    query_tokens (B,N,D) image features, context_tokens (B,M,D) text
    features, mask additive (B,N,M) (0 / -inf). All math f32."""
    x = jnp.asarray(query_tokens, jnp.float32)
    ctx = jnp.asarray(context_tokens, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)[:, None]  # (B,1,N,M) per-head bcast
    for layer in p["layers"]:
        ca, sa = layer["cross"], layer["self"]
        # --- Residual(CrossAttention(parallel_ff=True)) (:172-258) ---
        h = ca["heads"]
        xn = _ln(ca["norm"], x)
        d_head = ca["to_kv"]["w"].shape[-1] // 2
        B, N, _ = xn.shape
        q = _dense(ca["to_q"], xn).reshape(B, N, h, d_head).transpose(0, 2, 1, 3)
        q = q * (d_head ** -0.5)
        k, v = jnp.split(_dense(ca["to_kv"], ctx), 2, axis=-1)
        sim = jnp.einsum("bhid,bjd->bhij", q, k) + mask
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = _dense(ca["to_out"], out.transpose(0, 2, 1, 3).reshape(B, N, -1))
        out = out + _dense(ca["ff2"], _swiglu(_dense(ca["ff1"], xn)))
        x = x + out
        # --- Residual(ParallelTransformerBlock) (:78-168) ---
        h = sa["heads"]
        xn = _ln(sa["norm"], x)
        d_head = sa["dim_head"]
        fused = _dense(sa["fused"], xn)
        qd = h * d_head
        q = fused[..., :qd].reshape(B, N, h, d_head).transpose(0, 2, 1, 3)
        k = fused[..., qd:qd + d_head]
        v = fused[..., qd + d_head:qd + 2 * d_head]
        ff = fused[..., qd + 2 * d_head:]
        pos = _rotary_table(N, d_head, sa.get("inv_freq"))
        q = _apply_rotary_mps(pos, q)
        k = _apply_rotary_mps(pos, k)
        q = q * (d_head ** -0.5)
        sim = jnp.einsum("bhid,bjd->bhij", q, k)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = _dense(sa["attn_out"], out.transpose(0, 2, 1, 3).reshape(B, N, -1))
        x = x + out + _dense(sa["ff_out"], _swiglu(ff))
    return x


def cross_model_params_from_torch(sd, prefix="cross_model."):
    """Cross_model state dict (keys `layers.{i}.{0,1}.fn.*` under `prefix`,
    Residual wrappers adding the `.fn`) -> forward params. The LayerNorm
    bias is a registered zero buffer (cross_modeling.py:18-25) — loaded, not
    assumed."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("layers."))
    layers = []
    for i in range(n_layers):
        c, s = f"layers.{i}.0.fn", f"layers.{i}.1.fn"
        to_kv = _lin(sd, f"{c}.to_kv")
        d_head = to_kv["w"].shape[-1] // 2
        cross = {
            "norm": _ln_p(sd, f"{c}.norm"),
            "to_q": _lin(sd, f"{c}.to_q"),
            "to_kv": to_kv,
            "to_out": _lin(sd, f"{c}.to_out"),
            "ff1": _lin(sd, f"{c}.ff.0"),
            "ff2": _lin(sd, f"{c}.ff.2"),
            "heads": _lin(sd, f"{c}.to_q")["w"].shape[-1] // d_head,
        }
        fused = _lin(sd, f"{s}.fused_attn_ff_proj")
        attn_out = _lin(sd, f"{s}.attn_out")
        dim = attn_out["w"].shape[-1]
        # fused splits = (h*d, d, d, ff_inner*2); ParallelTransformerBlock
        # shares dim_head across attn branches of the layer
        self_p = {
            "norm": _ln_p(sd, f"{s}.norm"),
            "fused": fused,
            "attn_out": attn_out,
            "ff_out": _lin(sd, f"{s}.ff_out.1"),
            "heads": attn_out["w"].shape[0] // d_head,
            "dim_head": d_head,
        }
        if f"{s}.rotary_emb.inv_freq" in sd:
            self_p["inv_freq"] = _t(sd[f"{s}.rotary_emb.inv_freq"])
        layers.append({"cross": cross, "self": self_p})
    return {"layers": layers}


def clip_text_token_features(text, ids, heads_t, quick_gelu=False,
                             ln_eps=1e-5):
    """XCLIPModel.get_text_features (trainer/models/clip_model.py:21-59):
    token-level projected features instead of pooled-only — the full
    post-final-LN hidden sequence through text_projection, plus the usual
    EOT-pooled projection. Returns (text_tokens, text_pooled)."""
    ids = jnp.asarray(ids)
    B, L = ids.shape
    x = text["tok"][ids] + text["pos"][:L][None]
    cmask = jnp.triu(jnp.full((L, L), -jnp.inf, x.dtype), k=1)[None, None]
    for blk in text["blocks"]:
        x = _pre_ln_block(blk, x, heads_t, mask=cmask, quick_gelu=quick_gelu,
                          ln_eps=ln_eps)
    x = _ln(text["ln_final"], x, ln_eps)
    pooled = x[jnp.arange(B), ids.argmax(axis=-1)]
    if text.get("proj") is not None:
        x = x @ text["proj"]
        pooled = pooled @ text["proj"]
    return x, pooled


def clip_image_token_features(vision, px, heads_v, quick_gelu=False,
                              ln_eps=1e-5):
    """XCLIPModel.get_image_features (trainer/models/clip_model.py:61-91):
    the raw encoder last_hidden_state (transformers applies NO
    post_layernorm to it, only to the pooled CLS) through
    visual_projection. Returns (B, 1+patches, proj_dim) tokens."""
    _, img_tokens = clip_vision_forward(vision, px, heads_v,
                                        quick_gelu=quick_gelu, ln_eps=ln_eps)
    if vision.get("proj") is not None:
        img_tokens = img_tokens @ vision["proj"]
    return img_tokens
