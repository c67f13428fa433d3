"""Audio feature pipeline for SVI-Talk (behavioral ref: utils/audio_process.py,
utils/src/audio_analysis/wav2vec2.py, svi_video_talk.py:412-446).

Host-side: wav loading (scipy; librosa/pyloudnorm are optional), wav2vec2
feature extraction through transformers' torch modules with the reference's
linear interpolation of conv features to 25fps video length, then pure-numpy
window slicing / regrouping of per-frame embeddings.
"""

from __future__ import annotations

import numpy as np

AUDIO_SR = 16000
AUDIO_FPS = 25
AUDIO_WINDOW = 5
VAE_SCALE = 4


def load_audio(path: str, sr: int = AUDIO_SR) -> np.ndarray:
    """Load audio -> mono float32 @16kHz, loudness-normalized when pyloudnorm
    is available (ref audio_process.py:10-16, audio_prepare_single :66-75)."""
    try:
        import librosa

        wav, _ = librosa.load(path, sr=sr)
    except ImportError:
        from scipy.io import wavfile
        from scipy.signal import resample_poly

        src_sr, wav = wavfile.read(path)
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=1)
        if wav.dtype.kind != "f":
            wav = wav / 32768.0
        if np.abs(wav).max() > 10:  # int-scaled float
            wav = wav / 32768.0
        if src_sr != sr:
            from math import gcd

            g = gcd(int(src_sr), sr)
            wav = resample_poly(wav, sr // g, int(src_sr) // g).astype(np.float32)
    try:
        import pyloudnorm as pyln

        meter = pyln.Meter(sr)
        loudness = meter.integrated_loudness(wav)
        if abs(loudness) <= 100:
            wav = pyln.normalize.loudness(wav, loudness, -23)
    except ImportError:
        pass
    return np.asarray(wav, np.float32)


def load_wav2vec(path: str, engine: str = "jax"):
    """(feature_extractor, model) from a local chinese-wav2vec2-base dir.

    engine="jax" (default): the native tower (models/wav2vec2.py) — reads the
    checkpoint state dict directly, runs on the accelerator, no torch module.
    engine="torch": transformers' Wav2Vec2Model (golden-parity fallback)."""
    if engine == "jax":
        from ..models import wav2vec2 as w2v

        return None, ("jax", w2v.load_params(path))
    from transformers import Wav2Vec2FeatureExtractor, Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(path, local_files_only=True).eval()
    fe = Wav2Vec2FeatureExtractor.from_pretrained(path, local_files_only=True)
    return fe, model


def wav2vec_embedding(speech: np.ndarray, feature_extractor, model, sr: int = AUDIO_SR) -> np.ndarray:
    """speech -> (video_frames, 12, 768): all 12 encoder hidden states, conv
    features linearly interpolated to 25fps length (ref wav2vec2.py:29-35 +
    audio_process.py:18-41). `model` is either a transformers Wav2Vec2Model
    or the native ("jax", params) pair from load_wav2vec(engine="jax")."""
    video_length = int(len(speech) / sr * AUDIO_FPS)
    if isinstance(model, tuple) and model[0] == "jax":
        from ..models import wav2vec2 as w2v

        x = w2v.normalize_input(speech)[None]
        states = np.asarray(w2v.forward(model[1], x, video_length))  # (12,1,s,768)
        return states[:, 0].transpose(1, 0, 2)  # (s, 12, 768)

    import torch
    import torch.nn.functional as F

    inputs = feature_extractor(speech, sampling_rate=sr, return_tensors="pt").input_values
    with torch.no_grad():
        feats = model.feature_extractor(inputs)  # (1, c, s')
        feats = F.interpolate(feats, size=video_length, align_corners=True, mode="linear")
        feats = feats.transpose(1, 2)  # (1, s, c)
        hidden, _ = model.feature_projection(feats)
        out = model.encoder(hidden, output_hidden_states=True)
        emb = torch.stack(out.hidden_states[1:], dim=1).squeeze(0)  # (12, s, 768)
    return emb.permute(1, 0, 2).float().numpy()  # (s, 12, 768)


def slice_audio_windows(audio_embed: np.ndarray, num_frames: int, audio_start_idx: int = 0) -> np.ndarray:
    """Per-frame ±2-context windows (ref svi_video_talk.py:412-430).

    audio_embed: (s, 12, 768) -> (1, num_frames, 5, 12, 768), clamped at ends."""
    indices = (np.arange(2 * 2 + 1) - 2) * 1
    centers = np.arange(audio_start_idx, audio_start_idx + num_frames)[:, None] + indices[None, :]
    centers = np.clip(centers, 0, audio_embed.shape[0] - 1)
    return audio_embed[centers][None, ...]


def regroup_audio_windows(audio_embed: np.ndarray, audio_window: int = AUDIO_WINDOW,
                          vae_scale: int = VAE_SCALE):
    """(1, F, 5, 12, 768) -> (first (1,1,5,12,768), latter (1,(F-1)/4,8,12,768))
    — the reference's preprocess_audio grouping (svi_video_talk.py:432-446):
    per 4-frame latent group: first frame's leading half-window ‖ middle
    frames' centers ‖ last frame's trailing half-window."""
    first = audio_embed[:, :1]
    latter = audio_embed[:, 1:]
    b, fm1, w, blk, c = latter.shape
    n_t = fm1 // vae_scale
    latter = latter.reshape(b, n_t, vae_scale, w, blk, c)
    mid = audio_window // 2
    head = latter[:, :, :1, : mid + 1].reshape(b, n_t, -1, blk, c)
    middle = latter[:, :, 1:-1, mid : mid + 1].reshape(b, n_t, -1, blk, c)
    tail = latter[:, :, -1:, mid:].reshape(b, n_t, -1, blk, c)
    latter_s = np.concatenate([head, middle, tail], axis=2)
    return first, latter_s


def cut_audio_embedding(audio_embed: np.ndarray, num_frames: int, audio_start_idx: int = 0,
                        audio_end_idx: int = 81):
    """Training-side slicing+grouping (ref utils/audio_process.py:79-108).
    audio_embed: (12, s, 768) as stored in audio_embedding.pkl (the reference
    rearranges 'b s d -> s b d' first). Returns (first (1,5,12,768),
    latter (n_t,8,12,768)) — squeezed like the reference (the dataloader adds
    the batch dim)."""
    audio_embed = np.asarray(audio_embed, np.float32)
    if audio_embed.shape[0] == 12 and audio_embed.shape[1] != 12:
        audio_embed = np.transpose(audio_embed, (1, 0, 2))  # -> (s, 12, 768)
    windows = slice_audio_windows(audio_embed, num_frames, audio_start_idx)
    first, latter = regroup_audio_windows(windows)
    return first[0], latter[0]
