"""Offline DWPose preprocessing for SVI-Dance training.

Behavioral reference: scripts/data_preprocess/prepare_video_pose.py /
run_align_pose.py — per video: detect people (YOLOX) + whole-body keypoints
(DWPose) per frame, render OpenPose-style skeleton frames, write paired
video.mp4 + dwpose.mp4 sample dirs (DanceVideoDataset's preferred format).

Requires the YOLOX/DWPose ONNX weight files; inference runs through
onnxruntime when installed, else through the repo's native ONNX-to-JAX
executor (svi_tpu.utils.onnx_jax) on the JAX backend.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--det_onnx", type=str, default="./weights/UniAnimate-DiT/yolox_l.onnx")
    p.add_argument("--pose_onnx", type=str, default="./weights/UniAnimate-DiT/dw-ll_ucoco_384.onnx")
    p.add_argument("--fps", type=int, default=25)
    args = p.parse_args()

    from svi_tpu.dwpose import Wholebody, draw_pose_frame
    from svi_tpu.utils.video import load_video_frames, save_video

    extractor = Wholebody(args.det_onnx, args.pose_onnx)
    os.makedirs(args.out_dir, exist_ok=True)

    for fname in sorted(os.listdir(args.video_dir)):
        if not fname.lower().endswith((".mp4", ".mov", ".avi", ".mkv")):
            continue
        stem = os.path.splitext(fname)[0]
        out = os.path.join(args.out_dir, stem)
        os.makedirs(out, exist_ok=True)
        frames = load_video_frames(os.path.join(args.video_dir, fname))
        h, w = frames[0].shape[:2]
        pose_frames = []
        for frame in frames:
            kpts, scores = extractor(frame)
            norm = kpts / np.array([w, h], np.float32)
            pose = {
                "bodies": norm[:, :18],
                "body_scores": scores[:, :18],
                # DWPose 134: body 18 | feet 6 | face 68 | hands 2x21
                "hands": norm[:, 92:134].reshape(-1, 21, 2),
                "faces": norm[:, 24:92],
            }
            pose_frames.append(draw_pose_frame(pose, h, w))
        save_video(frames, os.path.join(out, "video.mp4"), fps=args.fps)
        save_video(pose_frames, os.path.join(out, "dwpose.mp4"), fps=args.fps)
        print(f"[{stem}] {len(frames)} frames -> {out}")


if __name__ == "__main__":
    main()
