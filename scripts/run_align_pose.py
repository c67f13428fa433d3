"""Pose alignment / retargeting driver (behavioral ref: utils/run_align_pose.py).

Extracts DWPose skeletons from a driving video (ONNX, CPU — offline
preprocessing), retargets every frame to the reference image's body
proportions (svi_tpu.dwpose.align), and writes the rendered skeleton frames
(0000.jpg ... + pose.jpg for the reference) the SVI-Dance data pipeline
consumes. Flag-for-flag with the reference script.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="DWPose extraction + retargeting")
    p.add_argument("--ref_name", type=str, required=True, help="reference image")
    p.add_argument("--source_video_paths", type=str, required=True,
                   help="driving video (.mp4) or a directory of videos")
    p.add_argument("--saved_pose_dir", type=str, required=True)
    p.add_argument("--det_onnx", type=str, default="./weights/UniAnimate-DiT/yolox_l.onnx")
    p.add_argument("--pose_onnx", type=str, default="./weights/UniAnimate-DiT/dw-ll_ucoco_384.onnx")
    p.add_argument("--height", type=int, default=768, help="render height (ref: 768)")
    p.add_argument("--width", type=int, default=512, help="render width (ref: 512)")
    return p.parse_args()


def main():
    args = parse_args()
    from PIL import Image

    from svi_tpu.dwpose.align import align_pose_sequence, pose_from_openpose
    from svi_tpu.dwpose.draw import draw_pose_frame
    from svi_tpu.dwpose.wholebody import Wholebody
    from svi_tpu.utils.video import load_video_frames

    if args.source_video_paths.endswith(".mp4"):
        video_paths = [args.source_video_paths]
    else:
        video_paths = [os.path.join(args.source_video_paths, f)
                       for f in sorted(os.listdir(args.source_video_paths))]

    model = Wholebody(det_onnx=args.det_onnx, pose_onnx=args.pose_onnx)

    poses = []
    for path in video_paths:
        print(f"extracting poses: {path}")
        for frame in load_video_frames(path):
            kpts, scores = model(frame[..., :3])
            poses.append(pose_from_openpose(kpts, scores, frame.shape[0], frame.shape[1]))

    ref_img = np.asarray(Image.open(args.ref_name).convert("RGB"))
    kpts, scores = model(ref_img)
    pose_ref = pose_from_openpose(kpts, scores, ref_img.shape[0], ref_img.shape[1])

    aligned = align_pose_sequence(poses, pose_ref)

    os.makedirs(args.saved_pose_dir, exist_ok=True)
    H, W = args.height, args.width
    for i, pose in enumerate(aligned):
        canvas = draw_pose_frame(_to_draw_dict(pose), H, W)
        Image.fromarray(canvas).save(os.path.join(args.saved_pose_dir, f"{i:04d}.jpg"))
    Image.fromarray(draw_pose_frame(_to_draw_dict(pose_ref), H, W)).save(
        os.path.join(args.saved_pose_dir, "pose.jpg")
    )
    print(f"wrote {len(aligned)} aligned pose frames to {args.saved_pose_dir}")


def _to_draw_dict(pose):
    """align.py pose dict -> draw.draw_pose_frame inputs (body-18 subset)."""
    cand = np.asarray(pose["bodies"]["candidate"])[None, :18]
    subset = np.asarray(pose["bodies"]["subset"])[:, :18]
    return {
        "bodies": cand,
        "body_scores": np.where(subset >= 0, 1.0, -1.0),
        "hands": np.asarray(pose["hands"]),
        "faces": np.asarray(pose["faces"]),
    }


if __name__ == "__main__":
    main()
