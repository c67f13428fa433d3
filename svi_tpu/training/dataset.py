"""Training dataset (behavioral ref: train_svi.py:368-624
TextVideoDataset_onestage).

Host-side numpy/PIL pipeline: scan category dirs with {category}.csv captions,
per item sample a random-stride 81-frame window, aspect-ratio random crop,
resize, normalize to [-1,1]; emit 12 candidate motion frames + 1 random anchor
frame. Read failures fall back to a different random video (ref :521-526).
"""

from __future__ import annotations

import csv
import os
import random
from typing import Optional

import numpy as np


class TextVideoDataset:
    def __init__(self, base_path, max_num_frames=81, frame_interval=1, num_frames=81,
                 height=480, width=832, steps_per_epoch=1, seed=None, args=None):
        self.max_frames = max_num_frames
        self.sample_fps = frame_interval
        self.height = height
        self.width = width
        self.steps_per_epoch = steps_per_epoch
        self.rng = random.Random(seed)
        self.video_list = []

        if os.path.isdir(base_path):
            subdirs = [d for d in sorted(os.listdir(base_path))
                       if os.path.isdir(os.path.join(base_path, d))]
            for subdir in subdirs:
                subdir_path = os.path.join(base_path, subdir)
                captions = {}
                csv_file = os.path.join(subdir_path, f"{subdir}.csv")
                if os.path.exists(csv_file):
                    with open(csv_file, "r", encoding="utf-8") as f:
                        for row in csv.DictReader(f):
                            if "Filename" in row and "Video Description" in row:
                                captions[row["Filename"]] = row["Video Description"]
                for file in sorted(os.listdir(subdir_path)):
                    if file.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
                        self.video_list.append({
                            "path": os.path.join(subdir_path, file),
                            "description": captions.get(file, f"A video from {subdir} category"),
                            "category": subdir,
                        })
            if not subdirs:
                for root, dirs, files in os.walk(base_path):
                    for file in sorted(files):
                        if file.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
                            self.video_list.append({
                                "path": os.path.join(root, file),
                                "description": "The video", "category": "unknown",
                            })
        elif base_path.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
            self.video_list.append({"path": base_path, "description": "The video", "category": "single"})
        self.rng.shuffle(self.video_list)

    def __len__(self):
        return len(self.video_list)

    def _read_window(self, path):
        from ..utils.video import load_video_frames, video_frame_count

        total = video_frame_count(path)
        if total <= 0:
            raise IOError(f"empty video: {path}")
        stride = self.rng.randint(1, self.sample_fps)
        cover = stride * self.max_frames
        if total < cover + 1:
            start = 0
            stride = max(total // self.max_frames, 1)
            end = min(stride * self.max_frames, total - 1)
        else:
            max_start = max(0, total - cover - 5)
            start = self.rng.randint(0, max_start) if max_start > 0 else 0
            end = start + cover
        idxs = list(range(start, min(end, total), stride))
        while len(idxs) < self.max_frames:
            idxs.append(idxs[-1] if idxs else 0)
        idxs = idxs[: self.max_frames]
        return [f[..., :3] for f in load_video_frames(path, idxs)]

    def _random_crop_box(self, w, h):
        """Aspect-ratio random crop (ref :568-605)."""
        target_ar = self.height / self.width
        if w * target_ar <= h:
            cw = self.rng.randint(w - w // 14, w)
            ch = int(cw * target_ar)
        else:
            ch = self.rng.randint(h - h // 14, h)
            cw = int(ch / target_ar)
        cw, ch = min(cw, w), min(ch, h)
        x1 = self.rng.randint(0, w - cw) if w > cw else 0
        y1 = self.rng.randint(0, h - ch) if h > ch else 0
        return x1, y1, x1 + cw, y1 + ch

    def __getitem__(self, index, _retries=8):
        from PIL import Image

        item = self.video_list[index % len(self.video_list)]
        try:
            frames = self._read_window(item["path"])
        except (OSError, IOError, ValueError):
            # skip unreadable videos by resampling (ref :521-526), bounded
            if _retries <= 0:
                raise
            return self.__getitem__(self.rng.randint(0, len(self.video_list) - 1),
                                    _retries=_retries - 1)

        h, w = frames[0].shape[:2]
        x1, y1, x2, y2 = self._random_crop_box(w, h)

        def to_target(arr):
            img = Image.fromarray(arr).crop((x1, y1, x2, y2)).resize(
                (self.width, self.height), Image.BILINEAR
            )
            return np.asarray(img)

        proc = np.stack([to_target(f) for f in frames])  # (T, H, W, 3) uint8
        video = proc.astype(np.float32) * (2 / 255) - 1
        video = np.transpose(video, (3, 0, 1, 2))  # (3, T, H, W)

        num_ref = min(12, len(frames))
        first_ref_frames = [proc[i] for i in range(num_ref)]  # HWC uint8
        random_ref_frame = proc[self.rng.randint(0, len(frames) - 1)]
        return {
            "text": item["description"],
            "video": video,
            "path": item["path"],
            "first_ref_frames": first_ref_frames,
            "random_ref_frame": random_ref_frame,
        }


class DanceVideoDataset(TextVideoDataset):
    """SVI-Dance training data (ref train_svi_dance.py:505-660): per-sample
    dirs with paired video.mp4 + dwpose.mp4, or legacy frame_data.pkl +
    dw_pose_with_foot_wo_face.pkl (dicts of JPEG bytes). Emits the aligned
    pose window as raw (3, T, H, W) in [0, 255]."""

    def __init__(self, base_path, **kw):
        super().__init__(base_path, **kw)
        # sample dirs: contain video.mp4 or frame_data.pkl
        self.video_list = []
        for root, dirs, files in os.walk(base_path):
            if "video.mp4" in files or "frame_data.pkl" in files:
                self.video_list.append({"path": root, "description": "the person is dancing",
                                        "category": "dance"})
        self.video_list.sort(key=lambda d: d["path"])
        self.rng.shuffle(self.video_list)

    def _load_pair(self, path_dir):
        import io
        import pickle

        from PIL import Image as PILImage

        video_path = os.path.join(path_dir, "video.mp4")
        if os.path.exists(video_path):
            from ..utils.video import load_video_frames

            frames = load_video_frames(video_path)
            poses = load_video_frames(os.path.join(path_dir, "dwpose.mp4"))
        else:
            frames_all = pickle.load(open(os.path.join(path_dir, "frame_data.pkl"), "rb"))
            dw = pickle.load(
                open(os.path.join(path_dir, "dw_pose_with_foot_wo_face.pkl"), "rb")
            )
            keys = list(frames_all.keys())
            frames = [np.asarray(PILImage.open(io.BytesIO(frames_all[k])).convert("RGB"))
                      for k in keys]
            poses = [np.asarray(PILImage.open(io.BytesIO(dw[k])).convert("RGB"))
                     for k in keys if k in dw]
        n = min(len(frames), len(poses))
        return frames[:n], poses[:n]

    def __getitem__(self, index, _retries=4):
        from PIL import Image

        item = self.video_list[index % len(self.video_list)]
        try:
            frames, poses = self._load_pair(item["path"])
        except (OSError, IOError, ValueError, KeyError):
            if _retries <= 0:
                raise
            return self.__getitem__(self.rng.randint(0, len(self.video_list) - 1),
                                    _retries=_retries - 1)
        total = len(frames)
        stride = self.rng.randint(1, self.sample_fps)
        cover = stride * self.max_frames
        if total < cover + 1:
            start = 0
            stride = max(total // self.max_frames, 1)
            end = min(stride * self.max_frames, total - 1)
        else:
            max_start = max(0, total - cover - 5)
            start = self.rng.randint(0, max_start) if max_start > 0 else 0
            end = start + cover
        idxs = list(range(start, min(max(end, start + 1), total), stride))
        while len(idxs) < self.max_frames:
            idxs.append(idxs[-1] if idxs else 0)
        idxs = idxs[: self.max_frames]

        h, w = frames[0].shape[:2]
        x1, y1, x2, y2 = self._random_crop_box(w, h)

        def to_target(arr):
            img = Image.fromarray(arr).crop((x1, y1, x2, y2)).resize(
                (self.width, self.height), Image.BILINEAR
            )
            return np.asarray(img)

        proc = np.stack([to_target(frames[i][..., :3]) for i in idxs])
        pose_proc = np.stack([to_target(poses[i][..., :3]) for i in idxs])
        video = np.transpose(proc.astype(np.float32) * (2 / 255) - 1, (3, 0, 1, 2))
        dwpose = np.transpose(pose_proc.astype(np.float32), (3, 0, 1, 2))  # raw 0..255
        num_ref = min(12, len(idxs))
        return {
            "text": item["description"],
            "video": video,
            "dwpose_data": dwpose,
            "path": item["path"],
            "first_ref_frames": [proc[i] for i in range(num_ref)],
            "random_ref_frame": proc[self.rng.randint(0, len(idxs) - 1)],
        }


class TalkVideoDataset(TextVideoDataset):
    """SVI-Talk training data (ref train_svi_talk.py:462-540): per-sample dirs
    with frame_data.pkl (JPEG bytes) or video.mp4 + audio_embedding.pkl
    ((12, s, 768) wav2vec hidden states). Emits the cut/grouped audio tuple
    aligned to the sampled frame window."""

    def __init__(self, base_path, **kw):
        super().__init__(base_path, **kw)
        self.video_list = []
        for root, dirs, files in os.walk(base_path):
            if "audio_embedding.pkl" in files and (
                "frame_data.pkl" in files or "video.mp4" in files
            ):
                self.video_list.append({"path": root, "description": "the person is talking",
                                        "category": "talk"})
        self.video_list.sort(key=lambda d: d["path"])
        self.rng.shuffle(self.video_list)

    def __getitem__(self, index, _retries=4):
        import io
        import pickle

        from PIL import Image

        from ..utils.audio import cut_audio_embedding

        item = self.video_list[index % len(self.video_list)]
        path_dir = item["path"]
        try:
            fd_path = os.path.join(path_dir, "frame_data.pkl")
            if os.path.exists(fd_path):
                frames_all = pickle.load(open(fd_path, "rb"))
                keys = list(frames_all.keys())
                frames = [
                    np.asarray(Image.open(io.BytesIO(frames_all[k])).convert("RGB"))
                    for k in keys
                ]
            else:
                from ..utils.video import load_video_frames

                frames = load_video_frames(os.path.join(path_dir, "video.mp4"))
            audio_embed = pickle.load(open(os.path.join(path_dir, "audio_embedding.pkl"), "rb"))
            if hasattr(audio_embed, "detach"):
                audio_embed = audio_embed.detach().float().numpy()
        except (OSError, IOError, ValueError, KeyError):
            if _retries <= 0:
                raise
            return self.__getitem__(self.rng.randint(0, len(self.video_list) - 1),
                                    _retries=_retries - 1)

        total = len(frames)
        stride = self.rng.randint(1, self.sample_fps)
        cover = stride * self.max_frames
        if total < cover + 1:
            start = 0
            stride = max(total // self.max_frames, 1)
            end = min(stride * self.max_frames, total - 1)
        else:
            max_start = max(0, total - cover - 5)
            start = self.rng.randint(0, max_start) if max_start > 0 else 0
            end = start + cover
        audio_first, audio_vf = cut_audio_embedding(
            audio_embed, self.max_frames, audio_start_idx=start, audio_end_idx=end
        )
        idxs = list(range(start, min(max(end, start + 1), total), stride))
        while len(idxs) < self.max_frames:
            idxs.append(idxs[-1] if idxs else 0)
        idxs = idxs[: self.max_frames]

        h, w = frames[0].shape[:2]
        x1, y1, x2, y2 = self._random_crop_box(w, h)

        def to_target(arr):
            img = Image.fromarray(arr).crop((x1, y1, x2, y2)).resize(
                (self.width, self.height), Image.BILINEAR
            )
            return np.asarray(img)

        proc = np.stack([to_target(frames[i][..., :3]) for i in idxs])
        video = np.transpose(proc.astype(np.float32) * (2 / 255) - 1, (3, 0, 1, 2))
        num_ref = min(12, len(idxs))
        return {
            "text": item["description"],
            "video": video,
            "audio_first": audio_first[None],  # (1, 1, 5, 12, 768)
            "audio_vf": audio_vf[None],        # (1, n_t-1, 8, 12, 768)
            "path": path_dir,
            "first_ref_frames": [proc[i] for i in range(num_ref)],
            "random_ref_frame": proc[self.rng.randint(0, len(idxs) - 1)],
        }


def prefetch_samples(ds, indices, depth: int = 2):
    """Yield ``ds[i]`` for each index, read ahead on ONE background thread.

    Host-side video decode (cv2 frame reads + crop/resize, the dominant
    per-sample host cost) overlaps the device train step — the TPU-side
    analog of the reference's Lightning ``DataLoader(num_workers=...)``
    (ref train_svi.py:1408-1414). A single worker preserves the dataset's
    RNG call order, so the yielded samples are bit-identical to the
    synchronous ``for i in indices: ds[i]`` loop. Exceptions raised by the
    dataset (after its own bounded resampling) propagate to the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, int(depth)))
    done = object()

    def _worker():
        try:
            for i in indices:
                q.put(ds[i])
        except BaseException as ex:  # noqa: BLE001 — re-raised in consumer
            q.put(ex)
            return
        q.put(done)

    threading.Thread(target=_worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
