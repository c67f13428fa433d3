"""Video I/O (behavioral ref: diffsynth/data/video.py save_video :138).

Uses OpenCV (the only video backend in this environment — no ffmpeg binary /
imageio-ffmpeg); falls back to imageio when an ffmpeg backend exists.
"""

from __future__ import annotations

import numpy as np


def _cv2():
    import cv2

    return cv2


def save_video(frames, save_path: str, fps: int = 24, quality: int = 8):
    """List of PIL images (or HWC uint8 arrays) -> mp4."""
    frames = [np.asarray(f) for f in frames]
    try:
        import imageio

        writer = imageio.get_writer(save_path, fps=fps, quality=quality)
        for frame in frames:
            writer.append_data(frame)
        writer.close()
        return
    except Exception:
        pass
    cv2 = _cv2()
    h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(save_path, fourcc, fps, (w, h))
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


class AsyncVideoSaver:
    """Run the per-clip cumulative mp4 write off the clip loop's critical
    path.

    The inference drivers re-save the growing stitched video after every
    clip (ref test_svi.py:478-483); done inline, the host mp4 encode stalls
    the device between clips. submit() joins the previous write first (one
    write in flight: bounded memory, no same-path races), then runs the
    callable on a background thread so the encode overlaps the next clip's
    denoise. Exceptions surface on the next submit()/close(). Always
    close() before exiting so the final write completes.
    """

    def __init__(self):
        self._thread = None
        self._err = None

    def _join(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, fn):
        """Join the in-flight write, then run fn() on a background thread.
        Snapshot mutable state (e.g. ``list(video_list)``) before capturing
        it in fn — the caller keeps mutating between clips."""
        import threading

        self._join()

        def _run():
            try:
                fn()
            except BaseException as ex:  # noqa: BLE001 — re-raised in _join
                self._err = ex

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def close(self):
        self._join()


def load_video_frames(path: str, indices=None):
    """mp4 -> list of HWC uint8 RGB numpy frames (all, or the given indices)."""
    cv2 = _cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    try:
        if indices is None:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        else:
            for idx in indices:
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
                ok, frame = cap.read()
                if not ok:
                    raise IOError(f"cannot read frame {idx} of {path}")
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    return frames


def video_frame_count(path: str) -> int:
    cv2 = _cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        return int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()


# ---------------------------------------------------------------------------
# Lazy frame sources (behavioral ref: diffsynth/data/video.py:7-135)
# ---------------------------------------------------------------------------


class LowMemoryVideo:
    """Random-access mp4 frames as PIL images (ref data/video.py:7-18;
    cv2-backed here — no imageio-ffmpeg in this environment)."""

    def __init__(self, file_name):
        self.file_name = file_name
        self._len = video_frame_count(file_name)

    def __len__(self):
        return self._len

    def __getitem__(self, item):
        from PIL import Image

        return Image.fromarray(load_video_frames(self.file_name, [item])[0])


def split_file_name(file_name):
    """Digit-aware sort key ('frame10.png' after 'frame2.png',
    ref data/video.py:21-37)."""
    result, number = [], -1
    for ch in file_name:
        if "0" <= ch <= "9":
            number = max(number, 0) * 10 + ord(ch) - ord("0")
        else:
            if number != -1:
                result.append(number)
                number = -1
            result.append(ch)
    if number != -1:
        result.append(number)
    return tuple(result)


def search_for_images(folder):
    import os

    files = [f for f in os.listdir(folder)
             if f.endswith(".jpg") or f.endswith(".png")]
    files = sorted(files, key=split_file_name)
    return [os.path.join(folder, f) for f in files]


class LowMemoryImageFolder:
    """Ref data/video.py:48-62."""

    def __init__(self, folder, file_list=None):
        import os

        if file_list is None:
            self.file_list = search_for_images(folder)
        else:
            self.file_list = [os.path.join(folder, f) for f in file_list]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, item):
        from PIL import Image

        return Image.open(self.file_list[item]).convert("RGB")


def crop_and_resize(image, height, width):
    """Aspect-preserving center crop + resize (ref data/video.py:65-78)."""
    from PIL import Image

    arr = np.array(image)
    ih, iw = arr.shape[:2]
    if ih / iw < height / width:
        cw = int(ih / height * width)
        left = (iw - cw) // 2
        arr = arr[:, left:left + cw]
    else:
        ch = int(iw / width * height)
        top = (ih - ch) // 2
        arr = arr[top:top + ch, :]
    return Image.fromarray(arr).resize((width, height))


class VideoData:
    """Ref data/video.py:81-135: uniform lazy view over an mp4 or an image
    folder, optionally cropped/resized and length-clamped."""

    def __init__(self, video_file=None, image_folder=None, height=None,
                 width=None, **kwargs):
        if video_file is not None:
            self.data_type = "video"
            self.data = LowMemoryVideo(video_file, **kwargs)
        elif image_folder is not None:
            self.data_type = "images"
            self.data = LowMemoryImageFolder(image_folder, **kwargs)
        else:
            raise ValueError("Cannot open video or image folder")
        self.length = None
        self.set_shape(height, width)

    def raw_data(self):
        return [self[i] for i in range(len(self))]

    def set_length(self, length):
        self.length = length

    def set_shape(self, height, width):
        self.height = height
        self.width = width

    def __len__(self):
        return len(self.data) if self.length is None else self.length

    def shape(self):
        if self.height is not None and self.width is not None:
            return self.height, self.width
        frame = self[0]
        return frame.size[1], frame.size[0]

    def __getitem__(self, item):
        frame = self.data[item]
        width, height = frame.size
        if self.height is not None and self.width is not None \
                and (self.height != height or self.width != width):
            frame = crop_and_resize(frame, self.height, self.width)
        return frame

    def save_images(self, folder):
        import os

        os.makedirs(folder, exist_ok=True)
        for i in range(len(self)):
            self[i].save(os.path.join(folder, f"{i}.png"))


def save_frames(frames, save_path):
    """Ref data/video.py:145-148."""
    import os

    os.makedirs(save_path, exist_ok=True)
    for i, frame in enumerate(frames):
        frame.save(os.path.join(save_path, f"{i}.png"))
