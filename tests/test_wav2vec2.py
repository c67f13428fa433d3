"""Native JAX wav2vec2 tower golden parity vs transformers' torch model.

Reference behavior: utils/src/audio_analysis/wav2vec2.py:1-45 (feature
extractor -> linear interpolation to video length -> projection -> encoder
with all hidden states).
"""

import numpy as np
import pytest
import torch

from svi_tpu.models import wav2vec2 as w2v


@pytest.fixture(scope="module")
def torch_model():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    model = Wav2Vec2Model(Wav2Vec2Config()).eval()
    # shrink weight magnitudes for a tight numeric comparison
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.2)
    return model


def test_wav2vec2_hidden_states_parity(torch_model):
    params = w2v.params_from_torch(torch_model.state_dict())
    rng = np.random.default_rng(0)
    speech = rng.standard_normal(16000 // 5).astype(np.float32)  # 0.2s
    video_length = 5

    x = w2v.normalize_input(speech)[None]
    with torch.no_grad():
        tin = torch.from_numpy(x)
        feats = torch_model.feature_extractor(tin)
        feats = torch.nn.functional.interpolate(
            feats, size=video_length, align_corners=True, mode="linear")
        feats = feats.transpose(1, 2)
        hidden, _ = torch_model.feature_projection(feats)
        out = torch_model.encoder(hidden, output_hidden_states=True)
        ref = torch.stack(out.hidden_states[1:], dim=0).numpy()  # (12,1,s,768)

    ours = np.asarray(w2v.forward(params, x, video_length))
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max()
    assert err < 2e-4, err


def test_wav2vec2_feature_extractor_normalization():
    rng = np.random.default_rng(1)
    speech = (rng.standard_normal(4000) * 7 + 3).astype(np.float32)
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(do_normalize=True)
    ref = fe(speech, sampling_rate=16000, return_tensors="np").input_values[0]
    np.testing.assert_allclose(w2v.normalize_input(speech), ref, atol=1e-5)


def test_wav2vec2_linear_interpolate_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 13, 4)).astype(np.float32)
    for out_len in (1, 5, 13, 29):
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).transpose(1, 2), size=out_len,
            align_corners=True, mode="linear").transpose(1, 2).numpy()
        ours = np.asarray(w2v.linear_interpolate(x, out_len))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_audio_utils_jax_engine_matches_torch_path(torch_model):
    """utils/audio.wav2vec_embedding produces identical (s, 12, 768) windows
    through the torch and native-JAX engines."""
    from transformers import Wav2Vec2FeatureExtractor

    from svi_tpu.utils import audio as audio_utils

    fe = Wav2Vec2FeatureExtractor(do_normalize=True)
    rng = np.random.default_rng(3)
    speech = rng.standard_normal(16000 // 2).astype(np.float32)  # 0.5s -> 12f
    ref = audio_utils.wav2vec_embedding(speech, fe, torch_model)
    params = w2v.params_from_torch(torch_model.state_dict())
    ours = audio_utils.wav2vec_embedding(speech, None, ("jax", params))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 2e-4
