"""SVI-Dance & SVI-Talk variants: golden parity + pipeline integration."""

import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

import jax
import jax.numpy as jnp

from svi_tpu.models import pose_embedding, wan_dit
from svi_tpu.utils import audio as audio_utils

ref_dit = load_ref_module("diffsynth.models.wan_video_dit")


# ---------------------------------------------------------------------------
# Dance: pose embedding conv stack
# ---------------------------------------------------------------------------


def build_ref_dwpose(dim=48):
    import torch.nn as nn

    c = 16
    return nn.Sequential(
        nn.Conv3d(3, c, (3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1)), nn.SiLU(),
        nn.Conv3d(c, c, (3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1)), nn.SiLU(),
        nn.Conv3d(c, c, (3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1)), nn.SiLU(),
        nn.Conv3d(c, c, (3, 3, 3), stride=(1, 2, 2), padding=(1, 1, 1)), nn.SiLU(),
        nn.Conv3d(c, c, 3, stride=(2, 2, 2), padding=1), nn.SiLU(),
        nn.Conv3d(c, c, 3, stride=(2, 2, 2), padding=1), nn.SiLU(),
        nn.Conv3d(c, dim, (1, 2, 2), stride=(1, 2, 2), padding=0),
    )


def test_pose_embedding_parity():
    """vs the reference's dwpose_embedding stack (svi_video_dance.py:254-268
    + the /255, 3-frame prefix, and rearrange at :526-532)."""
    torch.manual_seed(0)
    tm = build_ref_dwpose(dim=48).eval()
    params = pose_embedding.params_from_torch_state_dict(
        {f"dwpose_embedding.{k}": v for k, v in tm.state_dict().items()}
    )
    rng = np.random.default_rng(0)
    F, H, W = 5, 32, 32
    pose = rng.integers(0, 255, (3, F, H, W)).astype(np.float32)
    with torch.no_grad():
        tin = torch.tensor(pose)[None]
        tin = torch.cat([tin[:, :, :1].repeat(1, 1, 3, 1, 1), tin], dim=2) / 255.0
        ref = tm(tin)  # (1, 48, f', h', w')
        ref = ref.flatten(2).transpose(1, 2).numpy()  # b (f h w) c
    ours = np.asarray(pose_embedding.forward(params, jnp.asarray(pose)[None]))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_dance_pipeline_runs():
    from tests_pipeline_helpers import tiny_pipeline_models

    from svi_tpu.pipelines.svi_video_dance import SVIDanceVideoPipeline

    models = tiny_pipeline_models(z=4)
    pipe = SVIDanceVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit, pipe.vae, pipe.image_encoder = models
    pipe.dwpose_embedding = pose_embedding.init_params(
        jax.random.PRNGKey(0), dim=models[0][1].dim
    )
    rng = np.random.default_rng(0)
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    pose = rng.integers(0, 255, (3, 9, 64, 64)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    frames = pipe(
        input_image=img, random_ref_frame=np.array(img),
        humanpose_data=pose, cond_wo_pose=True,
        seed=0, height=64, width=64, num_frames=9, cfg_scale=5.0,
        num_inference_steps=2, tiled=False,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5, ref_pad_num=-1,
    )
    assert len(frames) == 9


# ---------------------------------------------------------------------------
# Talk: audio windows, AudioProjModel, multitalk DiT
# ---------------------------------------------------------------------------


def test_audio_window_slicing_matches_reference_math():
    """slice_audio_windows + regroup vs the reference torch code path
    (svi_video_talk.py:415-446), replicated here in torch."""
    rng = np.random.default_rng(0)
    s = 120
    emb = rng.standard_normal((s, 12, 8)).astype(np.float32)
    num_frames = 9
    start = 4

    # torch replication of :415-430
    indices = (torch.arange(5) - 2) * 1
    centers = torch.arange(start, start + num_frames).unsqueeze(1) + indices.unsqueeze(0)
    centers = torch.clamp(centers, 0, s - 1)
    ref_windows = torch.tensor(emb)[centers][None].numpy()

    ours = audio_utils.slice_audio_windows(emb, num_frames, start)
    np.testing.assert_array_equal(ours, ref_windows)

    # torch replication of preprocess_audio :432-446
    ae = torch.tensor(ref_windows)
    first = ae[:, :1]
    latter = ae[:, 1:]
    b = latter.shape[0]
    latter = latter.reshape(b, 2, 4, 5, 12, 8)
    head = latter[:, :, :1, :3].reshape(b, 2, -1, 12, 8)
    midd = latter[:, :, 1:-1, 2:3].reshape(b, 2, -1, 12, 8)
    tail = latter[:, :, -1:, 2:].reshape(b, 2, -1, 12, 8)
    ref_latter = torch.cat([head, midd, tail], dim=2).numpy()

    f_ours, l_ours = audio_utils.regroup_audio_windows(ours)
    np.testing.assert_array_equal(f_ours, first.numpy())
    np.testing.assert_array_equal(l_ours, ref_latter)
    assert l_ours.shape == (1, 2, 8, 12, 8)


def test_audio_proj_parity():
    torch.manual_seed(1)
    tm = ref_dit.AudioProjModel(
        seq_len=5, seq_len_vf=8, intermediate_dim=512, output_dim=768,
        context_tokens=32, norm_output_audio=True,
    ).eval()
    cfg = wan_dit.WanDiTConfig(
        dim=64, num_heads=2, num_layers=1, enable_multitalk=True, dtype=jnp.float32
    )
    sd = {f"audio_proj.{k}": v for k, v in tm.state_dict().items()}

    import jax

    params = {"audio_proj": {
        "proj1": {"w": jnp.asarray(sd["audio_proj.proj1.weight"].numpy().T),
                  "b": jnp.asarray(sd["audio_proj.proj1.bias"].numpy())},
        "proj1_vf": {"w": jnp.asarray(sd["audio_proj.proj1_vf.weight"].numpy().T),
                     "b": jnp.asarray(sd["audio_proj.proj1_vf.bias"].numpy())},
        "proj2": {"w": jnp.asarray(sd["audio_proj.proj2.weight"].numpy().T),
                  "b": jnp.asarray(sd["audio_proj.proj2.bias"].numpy())},
        "proj3": {"w": jnp.asarray(sd["audio_proj.proj3.weight"].numpy().T),
                  "b": jnp.asarray(sd["audio_proj.proj3.bias"].numpy())},
        "norm": {"w": jnp.asarray(sd["audio_proj.norm.weight"].numpy()),
                 "b": jnp.asarray(sd["audio_proj.norm.bias"].numpy())},
    }}
    rng = np.random.default_rng(2)
    first = rng.standard_normal((1, 1, 5, 12, 768)).astype(np.float32)
    vf = rng.standard_normal((1, 2, 8, 12, 768)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(first), torch.tensor(vf)).numpy()
    ours = np.asarray(
        wan_dit.audio_proj_forward(params, cfg, jnp.asarray(first), jnp.asarray(vf))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_multitalk_dit_forward_parity():
    """Full DiT forward with audio cross-attention vs reference (tiny config)."""
    TINY = dict(
        dim=64, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        eps=1e-6, patch_size=(1, 2, 2), num_heads=2, num_layers=2,
    )
    torch.manual_seed(3)
    tm = ref_dit.WanModel(has_image_input=True, enable_multitalk=True, **TINY).eval()
    cfg = wan_dit.WanDiTConfig(
        has_image_input=True, enable_multitalk=True, dtype=jnp.float32,
        **{k: v for k, v in TINY.items() if k != "eps"},
    )
    params = wan_dit.params_from_torch_state_dict(tm.state_dict(), cfg)

    rng = np.random.default_rng(3)
    b, f, h, w = 1, 3, 8, 12
    x = rng.standard_normal((b, 16, f, h, w)).astype(np.float32)
    y = rng.standard_normal((b, 20, f, h, w)).astype(np.float32)
    t = np.array([123.0], dtype=np.float32)
    ctx = rng.standard_normal((b, 9, 48)).astype(np.float32)
    clip = rng.standard_normal((b, 257, 1280)).astype(np.float32)
    audio_first = rng.standard_normal((b, 1, 5, 12, 768)).astype(np.float32)
    audio_vf = rng.standard_normal((b, f - 1, 8, 12, 768)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
            clip_feature=torch.tensor(clip), y=torch.tensor(y),
            audio_embed_tuple=(torch.tensor(audio_first), torch.tensor(audio_vf)),
        ).numpy()
    ours = np.asarray(
        wan_dit.forward(
            params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            clip_feature=jnp.asarray(clip), y=jnp.asarray(y),
            audio_embed_tuple=(jnp.asarray(audio_first), jnp.asarray(audio_vf)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_talk_pipeline_runs():
    from tests_pipeline_helpers import tiny_pipeline_models

    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline

    models = tiny_pipeline_models(z=4, multitalk=True)
    pipe = SVITalkVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit, pipe.vae, pipe.image_encoder = models
    rng = np.random.default_rng(0)
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    audio_embed = rng.standard_normal((1, 9, 5, 12, 768)).astype(np.float32)
    frames = pipe(
        input_image=img, random_ref_frame=np.array(img),
        audio_embed=audio_embed,
        seed=0, height=64, width=64, num_frames=9,
        cfg_scale=dict(text=5.0, audio=2.0),
        num_inference_steps=2, tiled=False,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5, ref_pad_num=-1,
    )
    assert len(frames) == 9


def test_talk_audio_embedding_cached_per_path(monkeypatch):
    """Multi-clip runs must embed each audio file ONCE (the reference
    recomputes the whole-file wav2vec pass per clip, svi_video_talk.py:548 —
    the inefficiency SURVEY §3.3 flags); per-clip calls only re-slice."""
    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline
    from svi_tpu.utils import audio as audio_utils

    pipe = SVITalkVideoPipeline(torch_dtype=jnp.float32)
    pipe.wav2vec = (object(), object())  # sentinel (never reached on cache hit)
    calls = {"n": 0}
    emb = np.zeros((40, 12, 768), np.float32)
    emb[:, 0, 0] = np.arange(40)

    monkeypatch.setattr(audio_utils, "load_audio", lambda path: np.zeros(16000))
    def fake_embed(speech, fe, model):
        calls["n"] += 1
        return emb
    monkeypatch.setattr(audio_utils, "wav2vec_embedding", fake_embed)

    a = pipe.get_audio_embedding("x.wav", num_frames=9, audio_start_idx=0)
    b = pipe.get_audio_embedding("x.wav", num_frames=9, audio_start_idx=5)
    assert calls["n"] == 1
    assert a.shape == (1, 9, 5, 12, 768)
    # second call really is a different slice of the same cached embedding
    np.testing.assert_array_equal(
        b, audio_utils.slice_audio_windows(emb, 9, 5))
    pipe.get_audio_embedding("y.wav", num_frames=9)
    assert calls["n"] == 2


def test_customtalk_dit_forward_parity():
    """Customtalk variant (wan_video_dit_talk.py): bottleneck FFNs gating
    context/audio attention; add_condition feeds the context gate per block."""
    ref_talk = load_ref_module("diffsynth.models.wan_video_dit_talk")
    TINY = dict(
        dim=64, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48, freq_dim=32,
        eps=1e-6, patch_size=(1, 2, 2), num_heads=2, num_layers=2,
    )
    torch.manual_seed(7)
    tm = ref_talk.WanModel(has_image_input=True, enable_customtalk=True, **TINY).eval()
    cfg = wan_dit.WanDiTConfig(
        has_image_input=True, enable_customtalk=True, dtype=jnp.float32,
        **{k: v for k, v in TINY.items() if k != "eps"},
    )
    params = wan_dit.params_from_torch_state_dict(tm.state_dict(), cfg)

    rng = np.random.default_rng(7)
    b, f, h, w = 1, 3, 8, 12
    s = f * (h // 2) * (w // 2)
    x = rng.standard_normal((b, 16, f, h, w)).astype(np.float32)
    y = rng.standard_normal((b, 20, f, h, w)).astype(np.float32)
    t = np.array([222.0], dtype=np.float32)
    ctx = rng.standard_normal((b, 9, 48)).astype(np.float32)
    clip = rng.standard_normal((b, 257, 1280)).astype(np.float32)
    cond = rng.standard_normal((b, s, TINY["dim"])).astype(np.float32)
    audio_first = rng.standard_normal((b, 1, 5, 12, 768)).astype(np.float32)
    audio_vf = rng.standard_normal((b, f - 1, 8, 12, 768)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
            clip_feature=torch.tensor(clip), y=torch.tensor(y),
            add_condition=torch.tensor(cond),
            audio_embed_tuple=(torch.tensor(audio_first), torch.tensor(audio_vf)),
        ).numpy()
    ours = np.asarray(
        wan_dit.forward(
            params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            clip_feature=jnp.asarray(clip), y=jnp.asarray(y),
            add_condition=jnp.asarray(cond),
            audio_embed_tuple=(jnp.asarray(audio_first), jnp.asarray(audio_vf)),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


def _run_talk_clip(pipe, thresh=None, steps=4):
    rng = np.random.default_rng(0)
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)
    audio_embed = rng.standard_normal((1, 9, 5, 12, 768)).astype(np.float32)
    frames, latents = pipe(
        input_image=img, random_ref_frame=np.array(img),
        audio_embed=audio_embed,
        seed=0, height=64, width=64, num_frames=9,
        cfg_scale=dict(text=5.0, audio=2.0),
        num_inference_steps=steps, tiled=False,
        prompt_emb_posi=ctx, prompt_emb_nega=ctx * 0.5, ref_pad_num=-1,
        tea_cache_l1_thresh=thresh,
        tea_cache_model_id="Wan2.1-I2V-14B-720P" if thresh is not None else "",
        return_latents=True,
    )
    return frames, np.asarray(latents, np.float32)


def test_talk_teacache_matches_cache_off():
    """TeaCache threaded through the talk sampler (ref svi_video_talk.py
    :455-462, :127-148): with a never-skip threshold, the split
    prelude/blocks/head path must reproduce the fused 3-branch forward."""
    from tests_pipeline_helpers import tiny_pipeline_models

    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline

    models = tiny_pipeline_models(z=4, multitalk=True)
    pipe = SVITalkVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit, pipe.vae, pipe.image_encoder = models

    _, lat_off = _run_talk_clip(pipe, thresh=None)
    _, lat_on = _run_talk_clip(pipe, thresh=-1e9)  # never skip: compute every step
    np.testing.assert_allclose(lat_on, lat_off, rtol=2e-5, atol=2e-5)


def test_talk_teacache_skip_accounting():
    """A huge threshold must skip every middle step (first/last always
    compute, ref svi_video.py:47-50) and still produce frames."""
    from tests_pipeline_helpers import tiny_pipeline_models

    from svi_tpu.pipelines.svi_video import TeaCache
    from svi_tpu.pipelines.svi_video_talk import SVITalkVideoPipeline

    models = tiny_pipeline_models(z=4, multitalk=True)
    pipe = SVITalkVideoPipeline(torch_dtype=jnp.float32)
    pipe.dit, pipe.vae, pipe.image_encoder = models

    seen = {}
    orig_check = TeaCache.check

    def spy_check(self, x_tokens, t_mod):
        out = orig_check(self, x_tokens, t_mod)
        seen["cache"] = self
        return out

    TeaCache.check = spy_check
    try:
        steps = 4
        frames, lat = _run_talk_clip(pipe, thresh=1e9, steps=steps)
    finally:
        TeaCache.check = orig_check
    assert len(frames) == 9
    assert np.isfinite(lat).all()
    assert seen["cache"].skipped_steps == steps - 2
