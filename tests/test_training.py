"""Error-Recycling trainer: LoRA adapters, buffers, full training steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svi_tpu.models import model_io, wan_dit
from svi_tpu.training import ErrorBuffers, ErrorRecyclingTrainer, TrainerConfig
from svi_tpu.training import lora as lora_mod

TINY = wan_dit.WanDiTConfig(
    dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
    num_heads=2, num_layers=2, has_image_input=True, dtype=jnp.float32,
    clip_feature_dim=40,
)
# latent z=4: x(4) + y(4 mask + 4 latent) = 12 in channels


def test_lora_zero_init_is_identity():
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    lora = lora_mod.init_lora_params(jax.random.PRNGKey(1), TINY, rank=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 8, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([100.0])
    ctx = jnp.asarray(rng.standard_normal((1, 7, 48)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((1, 257, 40)), jnp.float32)
    out0 = wan_dit.forward(params, TINY, x, t, ctx, clip_feature=clip, y=y)
    out1 = wan_dit.forward(params, TINY, x, t, ctx, clip_feature=clip, y=y,
                           lora=lora, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_lora_roundtrip_peft_export_and_fusion():
    """train-time side-path LoRA == inference-time fused LoRA == peft export."""
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    lora = lora_mod.init_lora_params(jax.random.PRNGKey(1), TINY, rank=4)
    # make B nonzero so the adapter does something
    lora = jax.tree.map(lambda x: x + 0.02, lora)
    scale = lora_mod.lora_scale(4, 4.0)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 8, 2, 8, 8)), jnp.float32)
    t = jnp.asarray([400.0])
    ctx = jnp.asarray(rng.standard_normal((1, 7, 48)), jnp.float32)
    clip = jnp.asarray(rng.standard_normal((1, 257, 40)), jnp.float32)

    out_side = wan_dit.forward(params, TINY, x, t, ctx, clip_feature=clip, y=y,
                               lora=lora, lora_scale=scale)

    sd = lora_mod.to_peft_state_dict(lora)
    import copy

    fused, n = model_io.fuse_lora_into_dit_params(
        jax.tree.map(lambda v: v, copy.deepcopy(params)), sd, alpha=scale
    )
    assert n == len(sd) // 2
    out_fused = wan_dit.forward(fused, TINY, x, t, ctx, clip_feature=clip, y=y)
    np.testing.assert_allclose(np.asarray(out_side), np.asarray(out_fused), rtol=1e-4, atol=1e-5)

    # import back from peft format
    lora2 = lora_mod.from_peft_state_dict(sd, TINY)
    out2 = wan_dit.forward(params, TINY, x, t, ctx, clip_feature=clip, y=y,
                           lora=lora2, lora_scale=scale)
    np.testing.assert_allclose(np.asarray(out_side), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_error_buffers_grid_and_strategies():
    buf = ErrorBuffers(num_grids=10, buffer_size=3, replacement_strategy="fifo",
                       error_modulate_factor=0.0)
    # grid centers follow the shifted schedule: t=999 -> grid 0 side
    assert buf.grid_index(999.0) == 0
    assert buf.grid_index(0.0) == buf.num_grids - 1
    t = float(buf.grid_timesteps[3])
    for i in range(5):
        buf.add_latent_error(np.full((1, 2), float(i), np.float32), t)
    assert len(buf.latent_error_buffer[3]) == 3
    assert buf.latent_error_buffer[3][0][0, 0] == 2.0  # fifo dropped 0,1
    s = buf.sample_noise_error((1, 2), t)
    assert s.shape == (1, 2) and s[0, 0] in (2.0, 3.0, 4.0)
    # empty grid -> zeros
    z = buf.sample_noise_error((1, 2), float(buf.grid_timesteps[7]))
    assert np.all(z == 0)

    buf2 = ErrorBuffers(num_grids=10, buffer_size=2, replacement_strategy="l2_batch",
                        error_modulate_factor=0.0)
    buf2.add_y_error(np.zeros((2,), np.float32), t)
    buf2.add_y_error(np.ones((2,), np.float32) * 10, t)
    buf2.add_y_error(np.ones((2,), np.float32) * 9.5, t)  # replaces the 10 (closest)
    vals = sorted(float(b[0]) for b in buf2.y_error_buffer[buf2.grid_index(t)])
    assert vals == [0.0, 9.5]


def test_y_error_sample_from_all_grids():
    buf = ErrorBuffers(num_grids=5, buffer_size=3, error_modulate_factor=0.0,
                       y_error_sample_from_all_grids=True)
    buf.add_y_error(np.ones((2,), np.float32), float(buf.grid_timesteps[0]))
    s = buf.sample_y_error((2,), float(buf.grid_timesteps[4]))
    assert np.all(s == 1.0)
    assert buf.has_y_data(float(buf.grid_timesteps[4]))


def make_trainer(**kw):
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    cfg = TrainerConfig(
        lora_rank=4, lora_alpha=4.0, buffer_warmup_iter=2, error_buffer_k=8,
        num_grids=10, seed=0, **kw,
    )
    return ErrorRecyclingTrainer(params, TINY, cfg)


def test_training_steps_reduce_loss_and_fill_buffers():
    trainer = make_trainer()
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)

    metrics = []
    for i in range(6):
        m = trainer.training_step(latents, ctx, y=y, clip_feature=clip)
        metrics.append(m)
        assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"])
    stats = trainer.buffers.stats()
    assert stats["latent_total"] > 0 and stats["y_total"] > 0
    # LoRA params actually moved
    assert float(jnp.abs(trainer.lora["self_attn"]["q"]["b"]).sum()) > 0


def test_sqrt_remat_training_step_identical():
    """remat_granularity only changes the AD save/recompute plan — the loss
    trajectory must be bit-comparable to per-block remat."""
    cfg4 = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=4, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    rng = np.random.default_rng(7)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)

    def run(granularity):
        params = wan_dit.init_params(jax.random.PRNGKey(0), cfg4)
        tc = TrainerConfig(lora_rank=4, lora_alpha=4.0, buffer_warmup_iter=2,
                           error_buffer_k=8, num_grids=10, seed=0,
                           remat_granularity=granularity)
        trainer = ErrorRecyclingTrainer(params, cfg4, tc)
        losses = [trainer.training_step(latents, ctx, y=y, clip_feature=clip)["loss"]
                  for _ in range(2)]
        return losses

    # granularity 0 = auto (pick_remat_group(4) == 2)
    np.testing.assert_allclose(run(1), run(0), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("granularity", [1, 2])
def test_save_attention_training_step_identical(granularity):
    """save_attention_activations only changes the remat plan (flash out/lse
    saved via checkpoint_name instead of recomputed) — the loss trajectory
    must match the default plan at both remat granularities."""
    cfg4 = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=4, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    rng = np.random.default_rng(7)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)

    def run(save_attention):
        params = wan_dit.init_params(jax.random.PRNGKey(0), cfg4)
        tc = TrainerConfig(lora_rank=4, lora_alpha=4.0, buffer_warmup_iter=2,
                           error_buffer_k=8, num_grids=10, seed=0,
                           remat_granularity=granularity,
                           save_attention_activations=save_attention)
        trainer = ErrorRecyclingTrainer(params, cfg4, tc)
        losses = [trainer.training_step(latents, ctx, y=y, clip_feature=clip)["loss"]
                  for _ in range(2)]
        return losses

    np.testing.assert_allclose(run(True), run(False), rtol=1e-5, atol=1e-6)


def test_qlora_int4_base_training_step():
    """LoRA training through an int4-quantized base (the single-chip 14B
    recipe): grads must flow through the packed weights' dequant matmuls to
    the side adapters."""
    cfg = wan_dit.WanDiTConfig(
        dim=128, in_dim=36, ffn_dim=256, out_dim=16, num_heads=1, num_layers=4,
        has_image_input=True, dtype=jnp.float32,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(0), cfg)
    q4 = wan_dit.quantize_params_int4(params, min_size=1024)
    tc = TrainerConfig(lora_rank=4, lora_alpha=4.0, seed=0, remat_granularity=2)
    trainer = ErrorRecyclingTrainer(q4, cfg, tc)
    rng = np.random.default_rng(0)
    m = trainer.training_step(
        rng.standard_normal((1, 16, 2, 8, 8)).astype(np.float32),
        rng.standard_normal((1, 5, 4096)).astype(np.float32),
        y=rng.standard_normal((1, 20, 2, 8, 8)).astype(np.float32),
        clip_feature=rng.standard_normal((1, 257, 1280)).astype(np.float32),
    )
    assert np.isfinite(m["loss"]) and m["grad_norm"] > 0
    assert float(jnp.abs(trainer.lora["self_attn"]["q"]["b"]).sum()) > 0


def test_lora_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer()
    rng = np.random.default_rng(1)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)
    trainer.training_step(latents, ctx, y=y, clip_feature=clip)

    path = str(tmp_path / "lora.safetensors")
    trainer.save_lora_safetensors(path, side_modules={"dwpose_embedding.0.weight": np.ones(3)})
    lora_before = jax.tree.map(np.asarray, trainer.lora)

    trainer2 = make_trainer()
    trainer2.load_lora_safetensors(path)
    for a, b in zip(jax.tree.leaves(lora_before), jax.tree.leaves(trainer2.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # and the inference loader can fuse this exact file
    sd = model_io.load_state_dict(path)
    assert model_io.extract_side_modules(sd)
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINY)
    _, n = model_io.fuse_lora_into_dit_params(params, sd, alpha=1.0)
    assert n == len(model_io.lora_name_map(sd))


def test_clean_prob_disables_injection():
    trainer = make_trainer(clean_prob=1.0)
    # prefill buffers so injection WOULD trigger
    t0 = float(trainer.buffers.grid_timesteps[0])
    for g in range(trainer.buffers.num_grids):
        tg = float(trainer.buffers.grid_timesteps[g])
        trainer.buffers.add_latent_error(np.ones((1, 4, 2, 8, 8), np.float32), tg)
        trainer.buffers.add_y_error(np.ones((1, 4, 2, 8, 8), np.float32), tg)
    latents = np.zeros((1, 4, 2, 8, 8), np.float32)
    y = np.zeros((1, 8, 2, 8, 8), np.float32)
    noise_w_error, latents_w_error, y2, use_clean = trainer.corrupt_inputs(latents, y, t0)
    assert use_clean
    np.testing.assert_array_equal(latents_w_error, latents)
    np.testing.assert_array_equal(y2, y)


def test_injection_applies_when_buffers_full():
    trainer = make_trainer(clean_prob=0.0, noise_prob=1.0, y_prob=1.0, latent_prob=1.0)
    for g in range(trainer.buffers.num_grids):
        tg = float(trainer.buffers.grid_timesteps[g])
        trainer.buffers.add_latent_error(np.ones((1, 4, 2, 8, 8), np.float32), tg)
        trainer.buffers.add_y_error(np.ones((1, 4, 2, 8, 8), np.float32), tg)
    t0 = float(trainer.buffers.grid_timesteps[0])
    latents = np.zeros((1, 4, 2, 8, 8), np.float32)
    y = np.zeros((1, 8, 2, 8, 8), np.float32)
    noise_w_error, latents_w_error, y2, use_clean = trainer.corrupt_inputs(latents, y, t0)
    assert not use_clean
    assert np.abs(latents_w_error).max() > 0  # latent error injected
    assert np.abs(y2[:, 4:, :1]).max() > 0  # y error injected on first frame
    assert np.all(y2[:, :4] == 0)  # mask channels untouched


def test_dataset_on_toy_train():
    import os

    base = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train", "svi-film-shot")
    assert os.path.isdir(base), "repo toy data missing — run scripts/make_toy_data.py"
    from svi_tpu.training.dataset import TextVideoDataset

    ds = TextVideoDataset(base, max_num_frames=9, height=64, width=112, seed=0)
    assert len(ds) >= 2
    item = ds[0]
    assert item["video"].shape == (3, 9, 64, 112)
    assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0
    assert len(item["first_ref_frames"]) >= 1
    assert item["random_ref_frame"].shape == (64, 112, 3)
    assert isinstance(item["text"], str) and len(item["text"]) > 0


def test_prefetch_samples_identical_and_propagates():
    """prefetch_samples: single-worker read-ahead yields exactly the
    synchronous ds[i] sequence (one worker preserves the dataset RNG call
    order) and re-raises dataset exceptions in the consumer."""
    import os

    from svi_tpu.training.dataset import TextVideoDataset, prefetch_samples

    base = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train", "svi-film-shot")
    order = [1, 0, 1]
    ds1 = TextVideoDataset(base, max_num_frames=5, height=32, width=48, seed=3)
    sync = [ds1[i] for i in order]
    ds2 = TextVideoDataset(base, max_num_frames=5, height=32, width=48, seed=3)
    pre = list(prefetch_samples(ds2, order))
    assert len(pre) == len(sync)
    for a, b in zip(pre, sync):
        assert a["text"] == b["text"]
        np.testing.assert_array_equal(a["video"], b["video"])
        np.testing.assert_array_equal(a["random_ref_frame"], b["random_ref_frame"])

    class Boom:
        def __getitem__(self, i):
            raise ValueError("bad sample")

    with pytest.raises(ValueError, match="bad sample"):
        list(prefetch_samples(Boom(), [0]))


def test_full_checkpoint_resume(tmp_path):
    """Orbax full-state save/restore: LoRA + optimizer + buffers + RNG."""
    trainer = make_trainer()
    rng = np.random.default_rng(5)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)
    for _ in range(3):
        trainer.training_step(latents, ctx, y=y, clip_feature=clip)
    ckpt = str(tmp_path / "ckpt")
    trainer.save_checkpoint(ckpt)
    m_ref = trainer.training_step(latents, ctx, y=y, clip_feature=clip)

    trainer2 = make_trainer()
    trainer2.restore_checkpoint(ckpt)
    assert trainer2.iteration_count == 3
    assert trainer2.buffers.stats() == {
        k: v for k, v in trainer.buffers.stats().items()
    } or trainer2.buffers.stats()["latent_total"] > 0
    m2 = trainer2.training_step(latents, ctx, y=y, clip_feature=clip)
    # identical state + RNG -> identical next step
    assert abs(m_ref["loss"] - m2["loss"]) < 1e-5


def test_dance_training_step_pose_trainable():
    """SVI-Dance training: trainable dwpose_embedding moves; pose dropout gates."""
    TINYD = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINYD)
    cfg = TrainerConfig(lora_rank=4, lora_alpha=4.0, num_grids=10, seed=0,
                        train_pose=True, pose_drop_prob1=0.0, pose_drop_prob2=0.0,
                        cond_drop_prob=0.0, clean_prob=0.0)
    trainer = ErrorRecyclingTrainer(params, TINYD, cfg)
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)
    pose = rng.integers(0, 255, (1, 3, 5, 64, 64)).astype(np.float32)

    pose_before = np.asarray(trainer.pose_params[0]["w"]).copy()
    for _ in range(2):
        m = trainer.training_step(latents, ctx, y=y, clip_feature=clip, pose=pose)
        assert np.isfinite(m["loss"])
    assert np.abs(np.asarray(trainer.pose_params[0]["w"]) - pose_before).max() > 0

    # export keeps dwpose_embedding keys (extract_lora.py semantics)
    import tempfile, os
    from svi_tpu.models import model_io

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "lora.safetensors")
        trainer.save_lora_safetensors(path)
        sd = model_io.load_state_dict(path)
        side = model_io.extract_side_modules(sd)
        assert any("dwpose_embedding" in k for k in side)
        # and the dance pipeline can load that exact format
        from svi_tpu.models import pose_embedding as pe

        pose_params = pe.params_from_torch_state_dict(side)
        out = pe.forward(pose_params, jnp.asarray(pose))
        assert out.shape[-1] == TINYD.dim


def test_talk_training_step_audio():
    """SVI-Talk training: audio tuple flows through the jitted step."""
    TINYT = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, enable_multitalk=True,
        dtype=jnp.float32, clip_feature_dim=40,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINYT)
    cfg = TrainerConfig(lora_rank=4, lora_alpha=4.0, num_grids=10, seed=0,
                        audio_drop_prob=0.0, clean_prob=0.0)
    trainer = ErrorRecyclingTrainer(params, TINYT, cfg)
    rng = np.random.default_rng(1)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)
    audio = (rng.standard_normal((1, 1, 5, 12, 768)).astype(np.float32),
             rng.standard_normal((1, 1, 8, 12, 768)).astype(np.float32))
    m = trainer.training_step(latents, ctx, y=y, clip_feature=clip, audio_tuple=audio)
    assert np.isfinite(m["loss"])


def test_talk_dataset_on_toy_train():
    import os

    base = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train", "svi-talk")
    assert os.path.isdir(base), "repo toy data missing — run scripts/make_toy_data.py"
    from svi_tpu.training.dataset import TalkVideoDataset

    ds = TalkVideoDataset(base, max_num_frames=9, height=64, width=64, seed=0)
    assert len(ds) >= 1
    item = ds[0]
    assert item["video"].shape == (3, 9, 64, 64)
    assert item["audio_first"].shape == (1, 1, 5, 12, 768)
    assert item["audio_vf"].shape == (1, 2, 8, 12, 768)


def test_dance_dataset_legacy_pkl():
    """Legacy frame_data.pkl / dw_pose_*.pkl layout (ref train_svi_dance.py
    dataset branch) from the repo-owned fixture (scripts/make_toy_data.py)."""
    import os

    base = os.path.join(os.path.dirname(__file__), "..", "data", "toy_train",
                        "svi-dance", "preprocessed")
    assert os.path.isdir(base), "repo toy data missing — run scripts/make_toy_data.py"
    from svi_tpu.training.dataset import DanceVideoDataset

    ds = DanceVideoDataset(base, max_num_frames=9, height=64, width=64, seed=0)
    assert len(ds) >= 1
    item = ds[0]
    assert item["video"].shape == (3, 9, 64, 64)
    assert item["dwpose_data"].shape == (3, 9, 64, 64)


def test_customtalk_training_mode():
    """train_architecture='customtalk': only the bottleneck FFNs move."""
    TINYC = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=2, has_image_input=True, enable_customtalk=True,
        dtype=jnp.float32, clip_feature_dim=40,
    )
    params = wan_dit.init_params(jax.random.PRNGKey(0), TINYC)
    cfg = TrainerConfig(train_architecture="customtalk", num_grids=10, seed=0,
                        clean_prob=0.0, audio_drop_prob=0.0)
    trainer = ErrorRecyclingTrainer(params, TINYC, cfg)
    assert "customtalk" in trainer.trainable and "lora" not in trainer.trainable

    rng = np.random.default_rng(2)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)
    audio = (rng.standard_normal((1, 1, 5, 12, 768)).astype(np.float32),
             rng.standard_normal((1, 1, 8, 12, 768)).astype(np.float32))
    before = np.asarray(
        trainer.trainable["customtalk"]["customtalk_context_pre_ffns"]["0"]["w"]
    ).copy()
    m = trainer.training_step(latents, ctx, y=y, clip_feature=clip, audio_tuple=audio)
    assert np.isfinite(m["loss"])
    after = np.asarray(
        trainer.trainable["customtalk"]["customtalk_context_pre_ffns"]["0"]["w"]
    )
    assert np.abs(after - before).max() > 0

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ct.safetensors")
        trainer.save_lora_safetensors(path)
        from safetensors.numpy import load_file

        sd = load_file(path)
        assert any("customtalk_context_pre_ffns" in k for k in sd)


@pytest.mark.parametrize("granularity", [1, 2])
def test_offload_carries_training_step_identical(granularity):
    """use_gradient_checkpointing_offload (the TPU analog of the reference's
    torch.utils.checkpoint save_on_cpu, wan_video_dit.py:547-561) only moves
    where block carries are SAVED (pinned_host vs recompute) — the loss
    trajectory must match the default remat plan exactly."""
    cfg4 = wan_dit.WanDiTConfig(
        dim=64, in_dim=12, ffn_dim=128, out_dim=4, text_dim=48, freq_dim=32,
        num_heads=2, num_layers=4, has_image_input=True, dtype=jnp.float32,
        clip_feature_dim=40,
    )
    rng = np.random.default_rng(7)
    latents = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    y = rng.standard_normal((1, 8, 2, 8, 8)).astype(np.float32)
    clip = rng.standard_normal((1, 257, 40)).astype(np.float32)

    def run(offload):
        params = wan_dit.init_params(jax.random.PRNGKey(0), cfg4)
        tc = TrainerConfig(lora_rank=4, lora_alpha=4.0, buffer_warmup_iter=2,
                           error_buffer_k=8, num_grids=10, seed=0,
                           remat_granularity=granularity,
                           use_gradient_checkpointing_offload=offload)
        trainer = ErrorRecyclingTrainer(params, cfg4, tc)
        losses = [trainer.training_step(latents, ctx, y=y, clip_feature=clip)["loss"]
                  for _ in range(2)]
        return losses

    np.testing.assert_allclose(run(True), run(False), rtol=1e-5, atol=1e-6)
