"""ControlNets for the SD / SDXL families.

Behavioral reference: diffsynth/models/sd_controlnet.py (SDControlNet :25-141
— the SD UNet down+mid path with a conv conditioning stack and 13 1x1 output
convs), sdxl_controlnet.py (SDXLControlNetUnion :43-219 — union ControlNet
with task embeddings fused through a 2-token CLIP-style attention block,
control-type embedding, 10 output convs) and
controlnets/controlnet_unit.py (ControlNetConfigUnit/MultiControlNetManager
:1-63 — per-unit conditioning processors and scales).

Residual injection points (ref pipelines/dancer.py:32, :146): SD inserts after
UNet block 30, SDXL after block 22 — handled by the controlnet_res argument
of sd.sd_unet_forward / sdxl.sdxl_unet_forward.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sd import (
    Params,
    SD_UNET_PLAN,
    _block_from,
    _conv2d,
    _conv_from,
    _dense,
    _layer_norm,
    _lin_from,
    _norm_from,
    _run_plan,
    _t,
    timestep_embedding,
)
from .sdxl import SDXL_UNET_PLAN

# down+mid sub-plans (ref sd_controlnet.py:38-77, sdxl_controlnet.py:71-104):
# identical structure to the corresponding UNet prefix plus a final push.
SD_CONTROLNET_PLAN = SD_UNET_PLAN[:28] + [
    ("res", 1280, 1280), ("attn", 8, 160, 1280), ("res", 1280, 1280), ("push",)
]
SDXL_CONTROLNET_PLAN = SDXL_UNET_PLAN[:20] + [
    ("res", 1280, 1280), ("attn", 20, 64, 1280), ("res", 1280, 1280), ("push",)
]


class ControlNetConfigUnit:
    """Ref controlnet_unit.py:6-11."""

    def __init__(self, processor_id, model_path=None, scale=1.0,
                 skip_processor=False):
        self.processor_id = processor_id
        self.model_path = model_path
        self.scale = scale
        self.skip_processor = skip_processor


class Annotator:
    """Condition-image preprocessor (ref controlnets/processors.py:8-62).
    tile/none/inpaint are pass-through; the detector processors (canny,
    depth, softedge, lineart, openpose, normal) need the controlnet_aux
    package and its checkpoints — gated, since this environment has neither
    (they are host-side preprocessing, not TPU compute)."""

    PASSTHROUGH = ("tile", "none", "inpaint")
    DETECTORS = ("canny", "depth", "softedge", "lineart", "lineart_anime",
                 "openpose", "normal")

    def __init__(self, processor_id, model_path="models/Annotators",
                 detect_resolution=None, device=None, skip_processor=False):
        if processor_id not in self.PASSTHROUGH + self.DETECTORS:
            raise ValueError(f"Unsupported processor_id: {processor_id}")
        self.processor_id = processor_id
        self.detect_resolution = detect_resolution
        self.processor = None
        if not skip_processor and processor_id in self.DETECTORS:
            try:
                import controlnet_aux.processor as cap
            except ImportError as e:
                raise ImportError(
                    "controlnet_aux is required for the "
                    f"'{processor_id}' annotator (host-side preprocessing; "
                    "pass skip_processor=True to feed pre-annotated frames)"
                ) from e
            ctor = {"canny": lambda: cap.CannyDetector(),
                    "depth": lambda: cap.MidasDetector.from_pretrained(model_path),
                    "softedge": lambda: cap.HEDdetector.from_pretrained(model_path),
                    "lineart": lambda: cap.LineartDetector.from_pretrained(model_path),
                    "lineart_anime": lambda: cap.LineartAnimeDetector.from_pretrained(model_path),
                    "openpose": lambda: cap.OpenposeDetector.from_pretrained(model_path),
                    "normal": lambda: cap.NormalBaeDetector.from_pretrained(model_path)}
            self.processor = ctor[processor_id]()

    def __call__(self, image, mask=None):
        width, height = image.size
        if self.processor is not None:
            kwargs = ({"include_body": True, "include_hand": True,
                       "include_face": True}
                      if self.processor_id == "openpose" else {})
            detect_resolution = self.detect_resolution or min(width, height)
            image = self.processor(image, detect_resolution=detect_resolution,
                                   image_resolution=min(width, height),
                                   **kwargs)
        return image.resize((width, height))


def _conditioning_layer(p, x):
    """ControlNetConditioningLayer (ref sd_controlnet.py:6-22):
    conv-silu chain downsampling /8. x: (B,H,W,3) channels-last."""
    x = jax.nn.silu(_conv2d(p["0"], x))
    for i in range(3):
        x = jax.nn.silu(_conv2d(p[f"{2 + i * 4}"], x))
        x = jax.nn.silu(_conv2d(p[f"{4 + i * 4}"], x, stride=2))
    return _conv2d(p["14"], x)


def sd_controlnet_forward(params: Params, sample, timestep,
                          encoder_hidden_states, conditioning,
                          global_pool=False, tiled=False, tile_size=64,
                          tile_stride=32):
    """SDControlNet.forward (ref sd_controlnet.py:96-137). sample NCHW
    latents; conditioning NCHW image in [-1,1]; returns 13 NCHW residuals."""
    x = jnp.moveaxis(sample, 1, -1)
    cond = jnp.moveaxis(conditioning, 1, -1)
    t = timestep_embedding(jnp.atleast_1d(timestep), 320).astype(x.dtype)
    t = _dense(params["time_embedding"]["2"],
               jax.nn.silu(_dense(params["time_embedding"]["0"], t)))
    t = jnp.broadcast_to(t, (x.shape[0], t.shape[-1]))
    x = _conv2d(params["conv_in"], x) \
        + _conditioning_layer(params["controlnet_conv_in"], cond)

    res_stack = [x]
    for desc, p in zip(SD_CONTROLNET_PLAN, params["blocks"]):
        if desc[0] == "res":
            from .sd import _resnet_block

            x = _resnet_block(p, x, t)
        elif desc[0] == "attn":
            from .sd import _attention_block

            x = _attention_block(p, x, t, encoder_hidden_states,
                                 desc[1], desc[2], tiled=tiled,
                                 tile_size=tile_size, tile_stride=tile_stride)
        elif desc[0] == "push":
            res_stack.append(x)
        elif desc[0] == "down":
            x = _conv2d(p["conv"], x, stride=2, padding=desc[2])
    out = [_conv2d(cp, r, padding=0)
           for cp, r in zip(params["controlnet_blocks"], res_stack)]
    if global_pool:
        out = [r.mean(axis=(1, 2), keepdims=True) for r in out]
    return [jnp.moveaxis(r, -1, 1) for r in out]


def _residual_attention_block(p, x):
    """ResidualAttentionBlock (ref sdxl_controlnet.py:17-39): CLIP-style MHA
    (fused in-proj) + quickGELU MLP. x: (B, S, D)."""
    b, s, d = x.shape
    y = _layer_norm(p["ln_1"], x)
    qkv = y @ p["in_proj_w"].astype(x.dtype).T + p["in_proj_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    n = p["num_heads"]
    hd = d // n
    q = q.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, n, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bnsd,bnkd->bnsk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnsk,bnkd->bnsd", probs, v).transpose(0, 2, 1, 3)
    x = x + _dense(p["out_proj"], o.reshape(b, s, d))
    y = _dense(p["c_fc"], _layer_norm(p["ln_2"], x))
    y = y * jax.nn.sigmoid(1.702 * y.astype(jnp.float32)).astype(y.dtype)
    return x + _dense(p["c_proj"], y)


SDXL_CONTROLNET_TASK_IDS = {
    "openpose": 0, "depth": 1, "softedge": 2, "canny": 3, "lineart": 3,
    "lineart_anime": 3, "tile": 6, "inpaint": 7,
}


def sdxl_controlnet_forward(params: Params, sample, timestep,
                            encoder_hidden_states, conditioning, processor_id,
                            add_time_id, add_text_embeds, global_pool=False,
                            tiled=False, tile_size=64, tile_stride=32):
    """SDXLControlNetUnion.forward (ref sdxl_controlnet.py:151-219)."""
    task_id = SDXL_CONTROLNET_TASK_IDS[processor_id]
    x = jnp.moveaxis(sample, 1, -1)
    cond = jnp.moveaxis(conditioning, 1, -1)
    dtype = x.dtype
    b = x.shape[0]

    t = timestep_embedding(jnp.atleast_1d(timestep), 320).astype(dtype)
    t = _dense(params["time_embedding"]["2"],
               jax.nn.silu(_dense(params["time_embedding"]["0"], t)))
    add_embeds = timestep_embedding(add_time_id.reshape(-1), 256)
    add_embeds = add_embeds.reshape(add_text_embeds.shape[0], -1)
    add_embeds = jnp.concatenate(
        [add_text_embeds, add_embeds.astype(add_text_embeds.dtype)],
        axis=-1).astype(dtype)
    add_embeds = _dense(params["add_time_embedding"]["2"],
                        jax.nn.silu(_dense(params["add_time_embedding"]["0"],
                                           add_embeds)))
    control_type = jnp.zeros((b, 8), dtype).at[:, task_id].set(1)
    control_embeds = timestep_embedding(control_type.reshape(-1), 256)
    control_embeds = control_embeds.reshape(b, -1).astype(dtype)
    control_embeds = _dense(
        params["control_type_embedding"]["2"],
        jax.nn.silu(_dense(params["control_type_embedding"]["0"],
                           control_embeds)))
    temb = t + add_embeds + control_embeds

    x = _conv2d(params["conv_in"], x)
    # fuse_condition_to_input (ref :137-148)
    ccond = _conditioning_layer(params["controlnet_conv_in"], cond)
    feat_seq = ccond.mean(axis=(1, 2)) + params["task_embedding"][task_id].astype(dtype)
    seq = jnp.stack([feat_seq, x.mean(axis=(1, 2))], axis=1)
    seq = _residual_attention_block(params["controlnet_transformer"], seq)
    alpha = _dense(params["spatial_ch_projs"], seq[:, 0])[:, None, None]
    x = x + (ccond + alpha)

    res_stack = [x]
    for desc, p in zip(SDXL_CONTROLNET_PLAN, params["blocks"]):
        if desc[0] == "res":
            from .sd import _resnet_block

            x = _resnet_block(p, x, temb)
        elif desc[0] == "attn":
            from .sd import _attention_block

            x = _attention_block(p, x, temb, encoder_hidden_states,
                                 desc[1], desc[2], tiled=tiled,
                                 tile_size=tile_size, tile_stride=tile_stride)
        elif desc[0] == "push":
            res_stack.append(x)
        elif desc[0] == "down":
            x = _conv2d(p["conv"], x, stride=2, padding=desc[2])
    out = [_conv2d(cp, r, padding=0)
           for cp, r in zip(params["controlnet_blocks"], res_stack)]
    if global_pool:
        out = [r.mean(axis=(1, 2), keepdims=True) for r in out]
    return [jnp.moveaxis(r, -1, 1) for r in out]


class MultiControlNetManager:
    """Ref controlnet_unit.py:21-63: run each unit's model and sum the scaled
    residual stacks. Units: (forward_fn, params, scale[, processor_id]).
    `processors`: optional Annotator list aligned with units
    (for process_image, ref :39-47)."""

    def __init__(self, units=(), processors=None):
        self.units = list(units)
        self.processors = list(processors) if processors else None

    def process_image(self, image, processor_id=None):
        """PIL -> (num_units, 3, H, W) float conditioning stack
        (ref controlnet_unit.py:39-47)."""
        import numpy as np

        procs = (self.processors if processor_id is None
                 else [self.processors[processor_id]])
        return np.stack([
            np.asarray(proc(image), np.float32).transpose(2, 0, 1) / 255.0
            for proc in procs
        ], axis=0)

    def __call__(self, sample, timestep, encoder_hidden_states,
                 conditionings, **kwargs):
        total = None
        for unit, conditioning in zip(self.units, conditionings):
            fn, params, scale = unit[0], unit[1], unit[2]
            res = fn(params, sample, timestep, encoder_hidden_states,
                     conditioning, **kwargs)
            res = [r * scale for r in res]
            total = res if total is None else [a + b
                                               for a, b in zip(total, res)]
        return total


# ---------------------------------------------------------------------------
# torch checkpoint ingestion (diffsynth naming)
# ---------------------------------------------------------------------------


def _cond_layer_from(sd, prefix):
    return {str(i): _conv_from(sd, f"{prefix}.blocks.{i}")
            for i in (0, 2, 4, 6, 8, 10, 12, 14)}


def sd_controlnet_params_from_torch(sd: dict) -> Params:
    n_out = 0
    while f"controlnet_blocks.{n_out}.weight" in sd:
        n_out += 1
    return {
        "time_embedding": {"0": _lin_from(sd, "time_embedding.0"),
                           "2": _lin_from(sd, "time_embedding.2")},
        "conv_in": _conv_from(sd, "conv_in"),
        "controlnet_conv_in": _cond_layer_from(sd, "controlnet_conv_in"),
        "blocks": [_block_from(sd, i, d)
                   for i, d in enumerate(SD_CONTROLNET_PLAN)],
        "controlnet_blocks": [
            {"w": jnp.asarray(np.transpose(
                _t(sd[f"controlnet_blocks.{i}.weight"]), (2, 3, 1, 0))),
             "b": jnp.asarray(_t(sd[f"controlnet_blocks.{i}.bias"]))
             if f"controlnet_blocks.{i}.bias" in sd
             else jnp.zeros(_t(sd[f"controlnet_blocks.{i}.weight"]).shape[0])}
            for i in range(n_out)],
    }


def sdxl_controlnet_params_from_torch(sd: dict) -> Params:
    n_out = 0
    while f"controlnet_blocks.{n_out}.weight" in sd:
        n_out += 1
    return {
        "time_embedding": {"0": _lin_from(sd, "time_embedding.0"),
                           "2": _lin_from(sd, "time_embedding.2")},
        "add_time_embedding": {"0": _lin_from(sd, "add_time_embedding.0"),
                               "2": _lin_from(sd, "add_time_embedding.2")},
        "control_type_embedding": {
            "0": _lin_from(sd, "control_type_embedding.0"),
            "2": _lin_from(sd, "control_type_embedding.2")},
        "conv_in": _conv_from(sd, "conv_in"),
        "controlnet_conv_in": _cond_layer_from(sd, "controlnet_conv_in"),
        "controlnet_transformer": {
            "num_heads": 8,
            "in_proj_w": jnp.asarray(
                _t(sd["controlnet_transformer.attn.in_proj_weight"])),
            "in_proj_b": jnp.asarray(
                _t(sd["controlnet_transformer.attn.in_proj_bias"])),
            "out_proj": _lin_from(sd, "controlnet_transformer.attn.out_proj"),
            "ln_1": _norm_from(sd, "controlnet_transformer.ln_1"),
            "c_fc": _lin_from(sd, "controlnet_transformer.mlp.c_fc"),
            "c_proj": _lin_from(sd, "controlnet_transformer.mlp.c_proj"),
            "ln_2": _norm_from(sd, "controlnet_transformer.ln_2"),
        },
        "task_embedding": jnp.asarray(_t(sd["task_embedding"])),
        "spatial_ch_projs": _lin_from(sd, "spatial_ch_projs"),
        "blocks": [_block_from(sd, i, d)
                   for i, d in enumerate(SDXL_CONTROLNET_PLAN)],
        "controlnet_blocks": [
            {"w": jnp.asarray(np.transpose(
                _t(sd[f"controlnet_blocks.{i}.weight"]), (2, 3, 1, 0))),
             "b": jnp.asarray(_t(sd[f"controlnet_blocks.{i}.bias"]))}
            for i in range(n_out)],
    }
