"""AsyncVideoSaver + save/load roundtrip (svi_tpu/utils/video.py)."""

import os

import numpy as np
import pytest

from svi_tpu.utils.video import AsyncVideoSaver, load_video_frames, save_video


def test_async_saver_overlapped_cumulative_saves(tmp_path):
    """Driver pattern: re-save the growing clip list after every clip; the
    final file must contain the full sequence (ref test_svi.py:478-483)."""
    path = str(tmp_path / "out.mp4")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8) for _ in range(6)]

    saver = AsyncVideoSaver()
    video_list = []
    for clip in (frames[:2], frames[2:4], frames[4:]):
        video_list += clip
        snapshot = list(video_list)
        saver.submit(lambda f=snapshot: save_video(f, path, fps=4, quality=8))
    saver.close()

    assert len(load_video_frames(path)) == 6


def test_async_saver_propagates_errors_and_is_reusable(tmp_path):
    saver = AsyncVideoSaver()

    def boom():
        raise RuntimeError("disk full")

    saver.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        saver.close()

    # the saver stays usable after a failed write
    path = str(tmp_path / "ok.mp4")
    frame = np.zeros((16, 16, 3), np.uint8)
    saver.submit(lambda: save_video([frame, frame], path, fps=4))
    saver.close()
    assert os.path.exists(path)
