"""Generate the repo-owned demo/toy datasets (deterministic, synthetic).

The reference ships data/toy_test/{shot,film,tom,dance,talk} and
data/toy_train/{svi-film-shot,svi-dance,svi-talk} so its drivers run out of
the box. This script procedurally synthesizes equivalents (no reference
assets are copied) in the same directory layout the drivers and datasets
expect:

  data/toy_test/shot|film|tom : frame.jpg + prompt.txt (python-literal
                                `prompts = [...]` stream, ref test_svi.py:31-60)
  data/toy_test/dance         : image.png + pose.mp4
  data/toy_test/talk          : portrait.png + speech.wav (16 kHz)
  data/toy_train/svi-film-shot: category dirs with mp4s + {category}.csv
  data/toy_train/svi-dance    : sample dirs with video.mp4 + dwpose.mp4
  data/toy_train/svi-talk     : sample dirs with video.mp4 +
                                audio_embedding.pkl ((12, s, 768) wav2vec-
                                layout hidden states)

Everything is tiny (<10MB total) and generated from fixed seeds; re-running
reproduces identical content.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")


def scene_frame(t, h, w, seed=0, style="shot"):
    """Procedural scene: sky gradient, sun, drifting shapes."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # gradient sky
    img[..., 0] = 60 + 120 * yy / h
    img[..., 1] = 90 + 100 * yy / h
    img[..., 2] = 160 + 60 * (1 - yy / h)
    # sun / moon disc drifting with t
    cx = (0.2 + 0.6 * ((t * 3) % 100) / 100) * w
    cy = 0.25 * h + 10 * np.sin(t * 0.3)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    disc = np.exp(-d2 / (2 * (0.06 * h) ** 2))
    img[..., 0] += 180 * disc
    img[..., 1] += 150 * disc
    # rolling hills
    hill = yy > (0.7 * h + 0.05 * h * np.sin(xx / w * 6 + seed))
    img[hill] = np.array([40, 120 + 30 * np.sin(seed), 60], np.float32)
    # a walking blob (the "character")
    bx = (0.1 + 0.8 * ((t * 5) % 120) / 120) * w
    by = 0.75 * h + 6 * np.sin(t * 0.9)
    b2 = ((xx - bx) / (0.04 * w)) ** 2 + ((yy - by) / (0.1 * h)) ** 2
    img[b2 < 1] = np.array([200, 80, 60], np.float32)
    if style == "tom":  # second character chasing
        b2 = ((xx - bx + 0.12 * w) / (0.05 * w)) ** 2 + ((yy - by) / (0.08 * h)) ** 2
        img[b2 < 1] = np.array([90, 90, 200], np.float32)
    noise = rng.normal(0, 3, (h, w, 3)).astype(np.float32)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def pose_frame(t, h, w):
    """OpenPose-style stick figure on black, limbs swinging with t."""
    img = np.zeros((h, w, 3), np.uint8)
    cx, cy = w // 2, int(h * 0.35)
    ang = 0.6 * np.sin(t * 0.4)

    def line(p0, p1, color):
        n = 60
        for i in range(n):
            a = i / (n - 1)
            x = int(p0[0] * (1 - a) + p1[0] * a)
            y = int(p0[1] * (1 - a) + p1[1] * a)
            img[max(0, y - 2):y + 3, max(0, x - 2):x + 3] = color

    hip = (cx, int(h * 0.6))
    line((cx, cy), hip, (0, 255, 85))  # spine
    line((cx, cy), (int(cx - 0.15 * w * np.cos(ang)), int(cy + 0.18 * h + 20 * np.sin(ang))),
         (255, 85, 0))  # left arm
    line((cx, cy), (int(cx + 0.15 * w * np.cos(ang)), int(cy + 0.18 * h - 20 * np.sin(ang))),
         (255, 170, 0))  # right arm
    line(hip, (int(cx - 0.08 * w - 15 * np.sin(ang)), int(h * 0.9)), (0, 85, 255))  # left leg
    line(hip, (int(cx + 0.08 * w + 15 * np.sin(ang)), int(h * 0.9)), (85, 0, 255))  # right leg
    img[cy - 10:cy + 2, cx - 6:cx + 7] = (255, 0, 85)  # head
    return img


def portrait(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.full((h, w, 3), 50, np.float32)
    face = ((xx - w / 2) / (0.28 * w)) ** 2 + ((yy - 0.45 * h) / (0.35 * h)) ** 2 < 1
    img[face] = np.array([210, 170, 140], np.float32)
    for ex in (-0.1, 0.1):
        eye = ((xx - w / 2 - ex * w) / (0.04 * w)) ** 2 + ((yy - 0.38 * h) / (0.025 * h)) ** 2 < 1
        img[eye] = 30
    mouth = ((xx - w / 2) / (0.08 * w)) ** 2 + ((yy - 0.58 * h) / (0.02 * h)) ** 2 < 1
    img[mouth] = np.array([150, 60, 60], np.float32)
    img += rng.normal(0, 2, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


SHOT_PROMPTS = [
    "A lone explorer walks across rolling green hills under a warm evening sun.",
    "The explorer pauses at the hilltop, wind rippling through the tall grass.",
    "Clouds drift past as the explorer descends toward a quiet valley.",
    "At the valley floor, the explorer sets up a small camp as dusk settles.",
]
FILM_PROMPTS = [
    "Wide establishing shot: a red-cloaked traveler crosses a sunlit meadow.",
    "The traveler follows a winding path as the light turns golden.",
    "A gentle breeze carries leaves past the traveler's shoulders.",
    "The traveler reaches a ridge and gazes at the horizon.",
]
TOM_PROMPTS = [
    "A blue cat chases an orange mouse across a cartoon meadow.",
    "The mouse ducks behind a hill while the cat skids past.",
    "The cat doubles back; the mouse sprints toward the setting sun.",
    "Both tumble down the hillside in a cloud of dust.",
]


def main():
    from PIL import Image

    from svi_tpu.utils.video import save_video

    # ---- toy_test ----
    for name, prompts, style in [("shot", SHOT_PROMPTS, "shot"),
                                 ("film", FILM_PROMPTS, "film"),
                                 ("tom", TOM_PROMPTS, "tom")]:
        d = os.path.join(ROOT, "toy_test", name)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(scene_frame(0, 480, 832, seed=hash(name) % 97, style=style)).save(
            os.path.join(d, "frame.jpg"), quality=90
        )
        with open(os.path.join(d, "prompt.txt"), "w") as f:
            f.write("prompts = [\n")
            for p in prompts:
                f.write(f"    {p!r},\n")
            f.write("]\n")

    d = os.path.join(ROOT, "toy_test", "dance")
    os.makedirs(d, exist_ok=True)
    Image.fromarray(scene_frame(0, 448, 256, seed=11)).save(os.path.join(d, "image.png"))
    save_video([pose_frame(t, 448, 256) for t in range(96)],
               os.path.join(d, "pose.mp4"), fps=24)

    d = os.path.join(ROOT, "toy_test", "talk")
    os.makedirs(d, exist_ok=True)
    Image.fromarray(portrait(448, 448)).save(os.path.join(d, "portrait.png"))
    # 6 s of speech-like audio: vowel-ish harmonics with syllable envelope
    sr, secs = 16000, 6
    t = np.arange(sr * secs) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    wave = sum(a * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
               for k, a in [(1, 0.6), (2, 0.25), (3, 0.1)])
    envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, 1) ** 0.5
    pcm = (wave * envelope * 0.6 * 32767).astype(np.int16)
    import wave as wave_mod

    with wave_mod.open(os.path.join(d, "speech.wav"), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())

    # ---- toy_train ----
    for cat, seed in [("hills", 1), ("meadow", 2)]:
        d = os.path.join(ROOT, "toy_train", "svi-film-shot", cat)
        os.makedirs(d, exist_ok=True)
        rows = []
        for vi in range(2):
            fn = f"{cat}_{vi:02d}.mp4"
            frames = [scene_frame(t, 144, 256, seed=seed * 10 + vi) for t in range(100)]
            save_video(frames, os.path.join(d, fn), fps=24)
            rows.append((fn, f"A synthetic {cat} scene with a drifting sun, clip {vi}."))
        with open(os.path.join(d, f"{cat}.csv"), "w") as f:
            f.write("Filename,Video Description\n")
            for fn, desc in rows:
                f.write(f'{fn},"{desc}"\n')

    d = os.path.join(ROOT, "toy_train", "svi-dance", "00001")
    os.makedirs(d, exist_ok=True)
    save_video([scene_frame(t, 144, 256, seed=21) for t in range(96)],
               os.path.join(d, "video.mp4"), fps=24)
    save_video([pose_frame(t, 144, 256) for t in range(96)],
               os.path.join(d, "dwpose.mp4"), fps=24)

    # legacy preprocessed layout (ref train_svi_dance.py dataset branch):
    # dicts of per-frame JPEG bytes in frame_data.pkl + dw_pose_*.pkl
    d = os.path.join(ROOT, "toy_train", "svi-dance", "preprocessed", "00001")
    os.makedirs(d, exist_ok=True)
    import io

    from PIL import Image

    def jpeg_bytes(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=70)
        return buf.getvalue()

    frame_data = {f"{t:05d}": jpeg_bytes(scene_frame(t, 96, 128, seed=23))
                  for t in range(24)}
    dw_pose = {f"{t:05d}": jpeg_bytes(pose_frame(t, 96, 128)) for t in range(24)}
    with open(os.path.join(d, "frame_data.pkl"), "wb") as f:
        pickle.dump(frame_data, f)
    with open(os.path.join(d, "dw_pose_with_foot_wo_face.pkl"), "wb") as f:
        pickle.dump(dw_pose, f)

    d = os.path.join(ROOT, "toy_train", "svi-talk", "00001")
    os.makedirs(d, exist_ok=True)
    save_video([portrait(144, 144, seed=t % 7) for t in range(96)],
               os.path.join(d, "video.mp4"), fps=24)
    rng = np.random.default_rng(31)
    # (12 wav2vec blocks, s frames, 768 ch) — f16 keeps the repo small
    emb = rng.standard_normal((12, 100, 768)).astype(np.float16)
    with open(os.path.join(d, "audio_embedding.pkl"), "wb") as f:
        pickle.dump(emb, f)

    total = 0
    for root, _, files in os.walk(ROOT):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    print(f"toy data written under {os.path.abspath(ROOT)} ({total / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
