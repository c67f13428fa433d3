"""Offline audio preprocessing for SVI-Talk training.

Behavioral reference: scripts/data_preprocess/prepare_video_audio.py —
per-sample: extract frames into frame_data.pkl (JPEG bytes dict) and run
wav2vec2 over the audio track into audio_embedding.pkl ((12, s, 768) tensor,
the format TalkVideoDataset/cut_audio_embedding consume).
"""

import argparse
import io
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", type=str, required=True,
                   help="dir of mp4s (audio read from paired .wav when no ffmpeg)")
    p.add_argument("--audio_dir", type=str, default=None,
                   help="dir of .wav files named like the videos")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--wav2vec_path", type=str, default="./weights/chinese-wav2vec2-base/")
    args = p.parse_args()

    from PIL import Image

    from svi_tpu.utils import audio as audio_utils
    from svi_tpu.utils.video import load_video_frames

    fe, model = audio_utils.load_wav2vec(args.wav2vec_path)
    os.makedirs(args.out_dir, exist_ok=True)

    for fname in sorted(os.listdir(args.video_dir)):
        if not fname.lower().endswith((".mp4", ".mov", ".avi", ".mkv")):
            continue
        stem = os.path.splitext(fname)[0]
        out = os.path.join(args.out_dir, stem)
        os.makedirs(out, exist_ok=True)

        frames = load_video_frames(os.path.join(args.video_dir, fname))
        frame_data = {}
        for i, frame in enumerate(frames):
            buf = io.BytesIO()
            Image.fromarray(frame).save(buf, format="JPEG", quality=90)
            frame_data[f"{i:06d}.jpg"] = buf.getvalue()
        with open(os.path.join(out, "frame_data.pkl"), "wb") as f:
            pickle.dump(frame_data, f)

        wav = None
        if args.audio_dir:
            wav_path = os.path.join(args.audio_dir, stem + ".wav")
            if os.path.exists(wav_path):
                wav = audio_utils.load_audio(wav_path)
        if wav is None:
            print(f"[{stem}] no audio found — skipped embedding")
            continue
        emb = audio_utils.wav2vec_embedding(wav, fe, model)  # (s, 12, 768)
        emb_stored = np.transpose(emb, (1, 0, 2))  # (12, s, 768) pkl layout
        with open(os.path.join(out, "audio_embedding.pkl"), "wb") as f:
            pickle.dump(emb_stored, f)
        print(f"[{stem}] {len(frames)} frames, audio embedding {emb_stored.shape}")


if __name__ == "__main__":
    main()
