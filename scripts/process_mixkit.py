"""Mixkit video curation (behavioral ref:
scripts/data_preprocess/process_mixkit.py): filter to ~16:9 clips, resize to
the training resolution, trim to 81 frames, write category dirs + metadata.csv
— producing the layout TextVideoDataset consumes. cv2-based (no moviepy here).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def is_16_9_ratio(width: int, height: int, tolerance: float = 0.1) -> bool:
    target = 16 / 9
    return abs(width / height - target) <= target * tolerance


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--caption_dir", type=str, default=None)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--category", type=str, default="mixkit")
    args = p.parse_args()

    import cv2

    from svi_tpu.utils.project_utils import generate_metadata_with_captions
    from svi_tpu.utils.video import load_video_frames, save_video

    out_cat = os.path.join(args.output_dir, args.category)
    os.makedirs(out_cat, exist_ok=True)
    kept, skipped = 0, 0
    for fname in sorted(os.listdir(args.input_dir)):
        if not fname.lower().endswith((".mp4", ".mov", ".avi", ".mkv")):
            continue
        path = os.path.join(args.input_dir, fname)
        cap = cv2.VideoCapture(path)
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        cap.release()
        if not is_16_9_ratio(w, h):
            skipped += 1
            continue
        frames = load_video_frames(path)[: args.num_frames]
        if len(frames) < args.num_frames:
            skipped += 1
            continue
        resized = [cv2.resize(f, (args.width, args.height), interpolation=cv2.INTER_AREA)
                   for f in frames]
        save_video(resized, os.path.join(out_cat, fname), fps=args.fps)
        kept += 1
    if args.caption_dir:
        generate_metadata_with_captions(
            out_cat, args.caption_dir, os.path.join(out_cat, f"{args.category}.csv")
        )
    print(f"kept {kept}, skipped {skipped} -> {out_cat}")


if __name__ == "__main__":
    main()
