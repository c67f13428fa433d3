"""Wav2Vec2 audio encoder tower in JAX (chinese-wav2vec2-base for SVI-Talk).

Behavioral reference: utils/src/audio_analysis/wav2vec2.py (the reference's
Wav2Vec2Model wrapper :1-35, linear_interpolation :38-45) driving
transformers' torch Wav2Vec2Model. This is the native tower so talk
inference / data preprocessing never needs torch: 7-layer conv feature
extractor (group-norm first layer), linear interpolation of conv features
to the 25fps video length, feature projection, and the 12-layer post-norm
transformer encoder with grouped conv positional embeddings. Returns ALL 12
encoder hidden states — SVI-Talk's AudioProjModel consumes the full stack.

Layout: channels-last activations (B, S, C); conv weights (k, in, out);
linear weights (in, out). f32 throughout — the tower runs once per audio
file and is numerically upstream of every talk clip.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def _lin(sd, key):
    return {"w": jnp.asarray(_t(sd[f"{key}.weight"]).T),
            "b": jnp.asarray(_t(sd[f"{key}.bias"]))}


def _norm(sd, key):
    return {"w": jnp.asarray(_t(sd[f"{key}.weight"])),
            "b": jnp.asarray(_t(sd[f"{key}.bias"]))}


def params_from_torch(sd: dict) -> dict:
    """transformers Wav2Vec2Model state dict -> pytree (handles both the
    legacy weight_g/weight_v and the parametrizations.* weight-norm keys on
    the positional conv)."""
    sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
    convs = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        entry = {"w": jnp.asarray(  # torch conv1d (out, in, k) -> (k, in, out)
            _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]).transpose(2, 1, 0))}
        gn = f"feature_extractor.conv_layers.{i}.layer_norm"
        if f"{gn}.weight" in sd:
            entry["group_norm"] = _norm(sd, gn)
        convs.append(entry)
        i += 1

    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = _t(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
        v = _t(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
    else:
        g = _t(sd["encoder.pos_conv_embed.conv.weight_g"])
        v = _t(sd["encoder.pos_conv_embed.conv.weight_v"])
    # torch weight_norm(dim=2): per-kernel-position norm over (out, in)
    w = g * v / np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    pos_conv = {"w": jnp.asarray(w.transpose(2, 1, 0)),
                "b": jnp.asarray(_t(sd["encoder.pos_conv_embed.conv.bias"]))}

    def layer(j):
        pre = f"encoder.layers.{j}"
        return {
            "q": _lin(sd, f"{pre}.attention.q_proj"),
            "k": _lin(sd, f"{pre}.attention.k_proj"),
            "v": _lin(sd, f"{pre}.attention.v_proj"),
            "o": _lin(sd, f"{pre}.attention.out_proj"),
            "ln1": _norm(sd, f"{pre}.layer_norm"),
            "fc1": _lin(sd, f"{pre}.feed_forward.intermediate_dense"),
            "fc2": _lin(sd, f"{pre}.feed_forward.output_dense"),
            "ln2": _norm(sd, f"{pre}.final_layer_norm"),
        }

    n = 0
    while f"encoder.layers.{n}.attention.q_proj.weight" in sd:
        n += 1
    layers = [layer(j) for j in range(n)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "conv_layers": convs,
        "feature_projection": {
            "layer_norm": _norm(sd, "feature_projection.layer_norm"),
            "projection": _lin(sd, "feature_projection.projection"),
        },
        "pos_conv": pos_conv,
        "encoder_layer_norm": _norm(sd, "encoder.layer_norm"),
        "layers": stacked,
    }


def _layer_norm(p, x, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _conv1d(w, x, stride=1, padding=0, groups=1):
    """x: (B, S, Cin), w: (k, in/groups, out)."""
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)


def feature_extractor(params, cfg: Wav2Vec2Config, input_values):
    """(B, S) raw normalized waveform -> (B, S', 512) conv features
    (transformers Wav2Vec2FeatureEncoder, 'group' norm variant)."""
    x = input_values[:, :, None]
    for i, p in enumerate(params["conv_layers"]):
        x = _conv1d(p["w"], x, stride=cfg.conv_stride[i])
        if "group_norm" in p:
            # GroupNorm(num_groups=C, C): per-channel instance norm over S
            gp = p["group_norm"]
            mu = x.mean(axis=1, keepdims=True)
            var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = x * gp["w"] + gp["b"]
        x = jax.nn.gelu(x, approximate=False)
    return x


def linear_interpolate(feats, out_len: int):
    """torch F.interpolate(mode='linear', align_corners=True) along axis 1."""
    s = feats.shape[1]
    if s == out_len:
        return feats
    pos = jnp.arange(out_len, dtype=jnp.float32) * ((s - 1) / max(out_len - 1, 1))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, s - 1)
    w = (pos - lo)[None, :, None]
    return feats[:, lo] * (1.0 - w) + feats[:, hi] * w


def encoder(params, cfg: Wav2Vec2Config, hidden):
    """Post-norm transformer stack; returns the 12 per-layer hidden states
    stacked as (L, B, S, H) (= transformers output_hidden_states[1:])."""
    k = cfg.num_conv_pos_embeddings
    pos = _conv1d(params["pos_conv"]["w"], hidden, padding=k // 2,
                  groups=cfg.num_conv_pos_embedding_groups)
    pos = pos + params["pos_conv"]["b"]
    if k % 2 == 0:  # Wav2Vec2SamePadLayer trims the extra right column
        pos = pos[:, :-1]
    hidden = hidden + jax.nn.gelu(pos, approximate=False)
    hidden = _layer_norm(params["encoder_layer_norm"], hidden, cfg.layer_norm_eps)

    heads = cfg.num_attention_heads
    head_dim = cfg.hidden_size // heads
    scale = head_dim ** -0.5

    def one_layer(x, p):
        b, s, h = x.shape
        q = (_dense(p["q"], x) * scale).reshape(b, s, heads, head_dim)
        kk = _dense(p["k"], x).reshape(b, s, heads, head_dim)
        v = _dense(p["v"], x).reshape(b, s, heads, head_dim)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, kk)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, h)
        x = _layer_norm(p["ln1"], x + _dense(p["o"], o), cfg.layer_norm_eps)
        y = jax.nn.gelu(_dense(p["fc1"], x), approximate=False)
        x = _layer_norm(p["ln2"], x + _dense(p["fc2"], y), cfg.layer_norm_eps)
        return x, x

    _, states = jax.lax.scan(one_layer, hidden, params["layers"])
    return states


@partial(jax.jit, static_argnames=("video_length",))
def _forward_jit(params, input_values, video_length: int):
    cfg = Wav2Vec2Config()
    feats = feature_extractor(params, cfg, input_values)
    feats = linear_interpolate(feats, video_length)
    fp = params["feature_projection"]
    hidden = _layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
    hidden = _dense(fp["projection"], hidden)
    return encoder(params, cfg, hidden)


def forward(params, input_values, video_length: int) -> jax.Array:
    """(B, S) normalized waveform -> (L=12, B, video_length, 768)."""
    return _forward_jit(params, input_values, int(video_length))


def normalize_input(speech: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor(do_normalize=True): zero-mean unit-variance
    over the utterance (transformers feature_extraction_wav2vec2.py)."""
    speech = np.asarray(speech, np.float32)
    return (speech - speech.mean()) / np.sqrt(speech.var() + 1e-7)


def load_params(path: str) -> dict:
    """Read a local wav2vec2 checkpoint dir (model.safetensors or
    pytorch_model.bin) without constructing a torch module."""
    import os

    st = os.path.join(path, "model.safetensors")
    if os.path.isfile(st):
        from safetensors.numpy import load_file

        return params_from_torch(load_file(st))
    import torch

    sd = torch.load(os.path.join(path, "pytorch_model.bin"),
                    map_location="cpu", weights_only=True)
    return params_from_torch(sd)
