"""Unfused LoRA adapters for training (behavioral ref: train_svi.py:942-986
add_lora_to_model: peft LoraConfig r=128 α=128 on q,k,v,o,ffn.0,ffn.2,
kaiming init on A / zeros on B, params upcast to fp32).

The adapter pytree mirrors the DiT block structure, stacked over layers, and
feeds wan_dit.forward(lora=...) as a side path (y = xW + scale·(xA)B). Export
produces peft-naming safetensors that the inference loader fuses back
(models/model_io.fuse_lora_into_dit_params) — same round trip as the
reference's utils/extract_lora.py."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan_dit import WanDiTConfig

DEFAULT_TARGETS = ("q", "k", "v", "o", "ffn.0", "ffn.2")

# peft target_modules match by module-name suffix: "q" hits BOTH self_attn.q
# and cross_attn.q (train_svi.py uses "q,k,v,o,ffn.0,ffn.2").
_ATTN_KEYS = ("q", "k", "v", "o")


def _target_dims(cfg: WanDiTConfig, module: str, key: str):
    d, f = cfg.dim, cfg.ffn_dim
    if module in ("self_attn", "cross_attn"):
        return d, d
    if module == "ffn":
        return (d, f) if key == "0" else (f, d)
    raise ValueError(module)


def init_lora_params(key, cfg: WanDiTConfig, rank: int = 128,
                     targets=DEFAULT_TARGETS, dtype=jnp.float32):
    """Stacked per-block adapters. A: kaiming-uniform (fan_in = in_dim),
    B: zeros — so the initial delta is exactly 0 (peft init_lora_weights=True)."""
    targets = set(targets)
    L = cfg.num_layers

    def make(key, fi, fo):
        bound = math.sqrt(3.0) * math.sqrt(2.0) / math.sqrt(fi)  # kaiming_uniform a=sqrt(5) on (r, fi): gain*sqrt(3/fan_in)
        # torch kaiming_uniform_(a=math.sqrt(5)) on lora_A (r, in): fan_in=in,
        # gain = sqrt(2/(1+5)) = 1/sqrt(3) -> bound = sqrt(3)*gain/sqrt(fan_in) = 1/sqrt(fan_in)
        bound = 1.0 / math.sqrt(fi)
        a = jax.random.uniform(key, (L, fi, rank), jnp.float32, -bound, bound).astype(dtype)
        b = jnp.zeros((L, rank, fo), dtype)
        return {"a": a, "b": b}

    keys = jax.random.split(key, 16)
    ki = iter(range(16))
    lora = {}
    for module in ("self_attn", "cross_attn"):
        sub = {}
        for k in _ATTN_KEYS:
            if k in targets:
                fi, fo = _target_dims(cfg, module, k)
                sub[k] = make(keys[next(ki)], fi, fo)
        if sub:
            lora[module] = sub
    ffn = {}
    for k in ("0", "2"):
        if f"ffn.{k}" in targets:
            fi, fo = _target_dims(cfg, "ffn", k)
            ffn[k] = make(keys[next(ki)], fi, fo)
    if ffn:
        lora["ffn"] = ffn
    return lora


def lora_scale(rank: int, alpha: float) -> float:
    """peft scaling = alpha / r."""
    return alpha / rank


def num_lora_params(lora) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))


def to_peft_state_dict(lora, prefix: str = "") -> dict:
    """Export to peft-style numpy state dict (torch weight layout):
    blocks.{i}.{module}.{key}.lora_A.default.weight (r, in) etc. — the format
    the reference's inference loader and ours both fuse."""
    out = {}

    def emit(module_path, leaf):
        a = np.asarray(leaf["a"], np.float32)  # (L, in, r)
        b = np.asarray(leaf["b"], np.float32)  # (L, r, out)
        L = a.shape[0]
        for i in range(L):
            base = f"{prefix}blocks.{i}.{module_path}"
            out[f"{base}.lora_A.default.weight"] = a[i].T.copy()  # (r, in)
            out[f"{base}.lora_B.default.weight"] = b[i].T.copy()  # (out, r)

    for module, sub in lora.items():
        for k, leaf in sub.items():
            emit(f"{module}.{k}", leaf)
    return out


def from_peft_state_dict(sd: dict, cfg: WanDiTConfig, rank=None, dtype=jnp.float32):
    """Load a peft LoRA state dict (e.g. a reference checkpoint) into the
    stacked adapter pytree. Keys may carry a 'pipe.dit.' prefix
    (train_svi.py:968-981)."""
    clean = {}
    for k, v in sd.items():
        if "pipe.dit." in k:
            k = k.split("pipe.dit.")[1]
        if k.startswith("diffusion_model."):
            k = k[len("diffusion_model."):]
        clean[k] = np.asarray(v, np.float32)

    lora: dict = {}
    L = cfg.num_layers
    for k in clean:
        if ".lora_A." not in k or not k.startswith("blocks."):
            continue
        parts = k.split(".")
        layer = int(parts[1])
        mod_path = parts[2:-3]  # between layer idx and lora_A
        a = clean[k]  # (r, in)
        b = clean[k.replace(".lora_A.", ".lora_B.")]  # (out, r)
        node = lora
        for p in mod_path[:-1]:
            node = node.setdefault(p, {})
        leaf_key = mod_path[-1]
        if leaf_key not in node:
            r, fi = a.shape
            fo = b.shape[0]
            node[leaf_key] = {
                "a": np.zeros((L, fi, r), np.float32),
                "b": np.zeros((L, r, fo), np.float32),
            }
        node[leaf_key]["a"][layer] = a.T
        node[leaf_key]["b"][layer] = b.T
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), lora)
