"""Checkpoint ingestion: loading, detection, hash parity, LoRA fusion."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax.numpy as jnp

from svi_tpu.models import model_io, wan_dit

ref_dit = load_ref_module("diffsynth.models.wan_video_dit")
ref_utils = load_ref_module("diffsynth.models.utils")

TINY = dict(
    dim=64, in_dim=16, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=2, num_layers=2,
)


def tiny_pair(seed=0):
    torch.manual_seed(seed)
    tm = ref_dit.WanModel(has_image_input=False, **TINY).eval()
    cfg = wan_dit.WanDiTConfig(
        dtype=jnp.float32, **{k: v for k, v in TINY.items() if k != "eps"}
    )
    return tm, cfg


def test_hash_matches_reference():
    tm, _ = tiny_pair()
    sd = tm.state_dict()
    ref_hash = ref_utils.hash_state_dict_keys(sd)
    ours = model_io.hash_state_dict_keys({k: v.numpy() for k, v in sd.items()})
    assert ours == ref_hash


def test_safetensors_roundtrip_and_detection(tmp_path):
    from safetensors.torch import save_file

    tm, cfg = tiny_pair()
    path = str(tmp_path / "dit.safetensors")
    save_file(tm.state_dict(), path)
    sd = model_io.load_state_dict(path)
    assert model_io.detect_model_kind(sd) == "wan_video_dit"
    params = wan_dit.params_from_torch_state_dict(sd, cfg)
    ref_params = wan_dit.params_from_torch_state_dict(tm.state_dict(), cfg)
    for a, b in zip(
        __import__("jax").tree.leaves(params), __import__("jax").tree.leaves(ref_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_pickle_loading(tmp_path):
    tm, _ = tiny_pair()
    path = str(tmp_path / "dit.pth")
    torch.save(tm.state_dict(), path)
    sd = model_io.load_state_dict(path)
    assert model_io.detect_model_kind(sd) == "wan_video_dit"
    assert sd["blocks.0.self_attn.q.weight"].shape == (64, 64)


def make_peft_lora(tm, rank=4, seed=0):
    """Build a peft-style LoRA state dict over q/k/v/o/ffn like train_svi."""
    rng = np.random.default_rng(seed)
    sd = {}
    targets = []
    for i in range(TINY["num_layers"]):
        for mod in ["self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
                    "cross_attn.q", "ffn.0", "ffn.2"]:
            targets.append(f"blocks.{i}.{mod}")
    base_sd = tm.state_dict()
    for t in targets:
        w = base_sd[f"{t}.weight"]
        out_d, in_d = w.shape
        sd[f"{t}.lora_A.default.weight"] = torch.tensor(
            rng.standard_normal((rank, in_d)).astype(np.float32) * 0.05
        )
        sd[f"{t}.lora_B.default.weight"] = torch.tensor(
            rng.standard_normal((out_d, rank)).astype(np.float32) * 0.05
        )
    return sd


def test_lora_fusion_matches_reference():
    tm, cfg = tiny_pair(1)
    lora_sd = make_peft_lora(tm, seed=2)

    # reference fusion
    ref_lora = load_ref_module("diffsynth.models.lora")
    loader = ref_lora.GeneralLoRAFromPeft()
    import copy

    tm_fused = copy.deepcopy(tm)
    loader.load(tm_fused, lora_sd, alpha=1.0)
    ref_params = wan_dit.params_from_torch_state_dict(tm_fused.state_dict(), cfg)

    # ours
    params = wan_dit.params_from_torch_state_dict(tm.state_dict(), cfg)
    lora_np = {k: v.numpy() for k, v in lora_sd.items()}
    fused, n = model_io.fuse_lora_into_dit_params(params, lora_np, alpha=1.0)
    assert n == len(model_io.lora_name_map(lora_np))

    import jax

    for a, b in zip(jax.tree.leaves(fused), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_side_module_extraction():
    sd = {
        "dwpose_embedding.0.weight": np.zeros(3),
        "blocks.0.self_attn.q.lora_A.default.weight": np.zeros((4, 8)),
        "randomref_embedding_pose.1.bias": np.ones(2),
    }
    side = model_io.extract_side_modules(sd)
    assert set(side) == {"dwpose_embedding.0.weight", "randomref_embedding_pose.1.bias"}


def test_model_manager_end_to_end(tmp_path):
    from safetensors.torch import save_file

    tm, cfg = tiny_pair(3)
    path = str(tmp_path / "dit.safetensors")
    save_file(tm.state_dict(), path)
    lora_sd = make_peft_lora(tm, seed=4)
    lora_path = str(tmp_path / "lora.safetensors")
    save_file({k: v for k, v in lora_sd.items()}, lora_path)

    mm = model_io.ModelManager(torch_dtype=jnp.float32)
    mm.load_models([path])
    mm.load_lora_v2(lora_path, lora_alpha=1.0)
    (params, loaded_cfg) = mm.fetch_model("wan_video_dit")
    assert loaded_cfg.num_layers == TINY["num_layers"]
    assert mm.lora_log[0][1] == len(model_io.lora_name_map(lora_sd))
    assert mm.fetch_model("wan_video_vae") is None


def test_model_manager_quantize_dit_on_fetch(tmp_path):
    """ModelManager(quantize_dit=...): the DiT stages on host at load, LoRA
    fuses on host, and the first fetch quantizes + ships — the driver-level
    path for the single-chip 14B flagship (--quantize int4_w4a8)."""
    from safetensors.torch import save_file

    big = dict(TINY, dim=256, ffn_dim=512, num_heads=4)  # >= int4 min_size
    torch.manual_seed(5)
    tm = ref_dit.WanModel(has_image_input=False, **big).eval()
    cfg = wan_dit.WanDiTConfig(
        dtype=jnp.float32, **{k: v for k, v in big.items() if k != "eps"})
    path = str(tmp_path / "dit.safetensors")
    save_file(tm.state_dict(), path)
    lora_sd = make_peft_lora(tm, seed=6)
    lora_path = str(tmp_path / "lora.safetensors")
    save_file(dict(lora_sd), lora_path)

    mm = model_io.ModelManager(torch_dtype=jnp.float32,
                               quantize_dit="int4_w4a8")
    mm.load_models([path])
    mm.load_lora_v2(lora_path, lora_alpha=1.0)
    qparams, qcfg = mm.fetch_model("wan_video_dit")
    blk = qparams["blocks"]["self_attn"]["q"]
    assert {"w_q4", "scale_q4", "r_q4", "s8_q4"} <= set(blk)
    # second fetch returns the same (already-quantized) tree
    qparams2, _ = mm.fetch_model("wan_video_dit")
    assert qparams2 is qparams

    # must equal quantize(LoRA-fused bf16 tree) exactly
    mm_ref = model_io.ModelManager(torch_dtype=jnp.float32)
    mm_ref.load_models([path])
    mm_ref.load_lora_v2(lora_path, lora_alpha=1.0)
    fused, _ = mm_ref.fetch_model("wan_video_dit")
    want = wan_dit.quantize_params_for_inference(
        dict(fused), "int4_w4a8")
    np.testing.assert_array_equal(
        np.asarray(qparams["blocks"]["self_attn"]["q"]["w_q4"]),
        np.asarray(want["blocks"]["self_attn"]["q"]["w_q4"]))

    # and the quantized forward tracks the exact forward
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 9, big["text_dim"])), jnp.float32)
    out_q = np.asarray(wan_dit.forward(qparams, qcfg, x, t, ctx))
    out_f = np.asarray(wan_dit.forward(fused, qcfg, x, t, ctx))
    err = np.abs(out_q - out_f).max() / (np.abs(out_f).max() + 1e-9)
    assert err < 0.12, f"int4 forward drift {err}"


def test_model_manager_bf16_sharded_load(tmp_path):
    """The real-checkpoint day-1 path (scripts/rehearse_14b_load.py): bf16
    safetensors SHARDS are staged as bf16 numpy (ml_dtypes view, half the
    host RAM of an f32 upcast), merged across shards, LoRA-fused on host
    with the grouped scatter-add, then quantized on fetch — value-exact vs
    the f32-staged single-file route on the same bf16 weights."""
    from safetensors.torch import save_file

    big = dict(TINY, dim=256, ffn_dim=512, num_heads=4)  # >= int4 min_size
    torch.manual_seed(7)
    tm = ref_dit.WanModel(has_image_input=False, **big).eval()
    sd_bf16 = {k: v.to(torch.bfloat16) for k, v in tm.state_dict().items()}
    items = sorted(sd_bf16)
    half = len(items) // 2
    p1, p2 = str(tmp_path / "shard1.safetensors"), str(tmp_path / "shard2.safetensors")
    save_file({k: sd_bf16[k] for k in items[:half]}, p1)
    save_file({k: sd_bf16[k] for k in items[half:]}, p2)
    lora_sd = make_peft_lora(tm, seed=8)
    lora_path = str(tmp_path / "lora.safetensors")
    save_file(dict(lora_sd), lora_path)

    mm = model_io.ModelManager(torch_dtype=jnp.float32, quantize_dit="int4_w4a8")
    mm.load_model([p1, p2])  # one model from two shards
    mm.load_lora_v2(lora_path, lora_alpha=1.0)
    qparams, qcfg = mm.fetch_model("wan_video_dit")
    assert qcfg.num_layers == TINY["num_layers"]

    # reference route: same bf16 values staged through f32
    cfg = wan_dit.WanDiTConfig(
        dtype=jnp.float32, **{k: v for k, v in big.items() if k != "eps"})
    want = wan_dit.params_from_torch_state_dict(
        {k: v.float() for k, v in sd_bf16.items()}, cfg)
    want, _ = model_io.fuse_lora_into_dit_params(
        want, {k: v.numpy() for k, v in lora_sd.items()}, alpha=1.0)
    want = wan_dit.quantize_params_for_inference(dict(want), "int4_w4a8")
    import jax

    key_fn = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(qparams), key=key_fn),
            sorted(jax.tree_util.tree_leaves_with_path(want), key=key_fn)):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_model_manager_quantize_rejects_unknown_mode():
    with pytest.raises(ValueError):
        model_io.ModelManager(quantize_dit="fp8")
