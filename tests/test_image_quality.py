"""ImageQualityMetric golden parity: the scoring heads vs the reference
torch modules (the CLIP/BLIP towers are checkpoint-gated and injected as
callables; the head math is what's first-party)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from svi_tpu.extensions import image_quality as iq

from reference_loader import load_ref_module


def _ref_mlp(module_name, seed):
    ref = load_ref_module(
        f"diffsynth.extensions.ImageQualityMetric.{module_name}")
    mlp = ref.MLP(768).eval()
    torch.manual_seed(seed)
    state = mlp.state_dict()
    for k in state:
        state[k] = torch.randn_like(state[k]) * 0.05
    mlp.load_state_dict(state)
    return mlp, iq.score_mlp_params_from_torch(dict(state))


def test_aesthetic_mlp_parity():
    mlp, params = _ref_mlp("aesthetic", 0)
    torch.manual_seed(1)
    x = torch.randn(3, 768)
    with torch.no_grad():
        ref_out = mlp(x).numpy()
    ours = np.asarray(iq.score_mlp_forward(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_aesthetic_score_end_to_end():
    """AestheticScore.score (ref aesthetic.py:77-93): normalize embedding,
    MLP head."""
    mlp, params = _ref_mlp("aesthetic", 2)
    torch.manual_seed(3)
    emb = torch.randn(1, 768)
    scorer = iq.AestheticScore(params, lambda image: emb.numpy())
    with torch.no_grad():
        ref = float(mlp(emb / emb.norm(dim=-1, keepdim=True))[0, 0])
    got = scorer.score(["fake.png"])
    assert got == pytest.approx([ref], rel=1e-4)


def test_image_reward_normalization():
    """ImageReward._calculate_score (ref imagereward.py:125-148):
    (mlp(feat) - mean) / std with the published constants. The vendored
    BLIP needs a pre-4.40 transformers (apply_chunking_to_forward), so the
    architecturally identical aesthetic.MLP provides the golden head and
    the constants are checked against the imagereward source text."""
    mlp, params = _ref_mlp("aesthetic", 4)
    torch.manual_seed(5)
    feat = torch.randn(1, 768)
    scorer = iq.ImageRewardScore(params, lambda image, prompt: feat.numpy())
    with torch.no_grad():
        ref = float((mlp(feat) - 0.16717362830052426) / 1.0333394966054072)
    assert scorer.score(["x"], "a cat") == pytest.approx([ref], rel=1e-4)
    # the constants are the reference's (imagereward.py:62-64)
    src = open("/root/reference/diffsynth/extensions/ImageQualityMetric/"
               "imagereward.py").read()
    assert "0.16717362830052426" in src and "1.0333394966054072" in src


def test_pickscore_math():
    """PickScore._calculate_score (ref pickscore.py:22-57)."""
    torch.manual_seed(6)
    img = torch.randn(1, 32)
    txt = torch.randn(1, 32)
    logit_scale = 2.0
    scorer = iq.PickScore(lambda image, prompt: (img.numpy(), txt.numpy(),
                                                 logit_scale))
    imn = img / img.norm(dim=-1, keepdim=True)
    txn = txt / txt.norm(dim=-1, keepdim=True)
    ref_plain = float((txn @ imn.T)[0, 0])
    ref_soft = float(torch.softmax(
        torch.tensor(np.exp(logit_scale)) * (txn @ imn.T)[0], dim=-1)[0])
    assert scorer.score(["x"], "p") == pytest.approx([ref_plain], rel=1e-5)
    assert scorer.score(["x"], "p", softmax=True) == pytest.approx(
        [ref_soft], rel=1e-5)


def test_clip_score_math():
    """CLIPScore._calculate_score (ref clip.py:44-64): diagonal of
    image @ text^T."""
    rng = np.random.RandomState(7)
    img = rng.randn(1, 16).astype(np.float32)
    txt = rng.randn(1, 16).astype(np.float32)
    scorer = iq.CLIPScore(lambda image, prompt: (img, txt))
    assert scorer.score(["x"], "p") == pytest.approx(
        [float(img @ txt.T)], rel=1e-5)


def test_mps_condition_mask_parity():
    """mps.py:84-89 mask math vs a direct torch transcription."""
    torch.manual_seed(8)
    text_f = torch.randn(1, 6, 8)
    cond_f = torch.randn(1, 4, 8)
    sim = torch.einsum("bid,bjd->bji", text_f, cond_f)
    sim = torch.max(sim, dim=1, keepdim=True)[0]
    sim = sim / sim.max()
    ref_mask = torch.where(sim > 0.3, 0.0, float("-inf")).numpy()
    ours = np.asarray(iq.mps_condition_mask(text_f.numpy(), cond_f.numpy()))
    np.testing.assert_allclose(ours, ref_mask)


def test_load_preference_model_gating():
    with pytest.raises(ValueError):
        iq.load_preference_model("NotAModel")
    with pytest.raises(FileNotFoundError):
        iq.load_preference_model("Aesthetic")
