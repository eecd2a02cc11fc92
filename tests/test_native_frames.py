"""Native C++ frame-stack reader (native/framestack.cpp).

The reference decodes video frames host-side via opencv/ffmpeg
(SURVEY.md §2.1 "Audio-visual dataset", §2.4 native boundary); our
fast path reads npy stacks / uncompressed AVIs, selects the
audio-aligned window, and resizes natively (~20x the PIL path on a
224x224 stack). These tests pin parity with the Python path and the
fallback contract.
"""

import numpy as np
import pytest

from viai_tpu.data.av import (_load_frames_npy, _resample_frames,
                              load_frames_for)
from viai_tpu.data.avi import write_avi

try:
    from viai_tpu.native import load_frames

    _ = load_frames  # probe registration below
    from viai_tpu.native import _load

    NATIVE = _load() is not None and hasattr(_load(), "viai_load_frames")
except Exception:  # pragma: no cover - toolchain-less environments
    NATIVE = False

pytestmark = pytest.mark.skipif(not NATIVE, reason="native lib unavailable")


@pytest.fixture()
def npy_stack(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (20, 48, 36, 3), np.uint8)
    path = tmp_path / "clip.npy"
    np.save(path, arr)
    return str(path), arr


@pytest.mark.parametrize("size,window", [
    (48, None), (16, (0.1, 0.9)), (64, (0.0, 1.0)), (9, (0.3, 0.35)),
])
def test_npy_matches_python_path(npy_stack, size, window):
    path, _ = npy_stack
    nat = load_frames(path, 8, size, window)
    py = _load_frames_npy(path, 8, size, window)
    assert nat.shape == py.shape == (8, size, size, 3)
    assert nat.dtype == np.float32
    # Python path quantizes to uint8 after the PIL resize; the native
    # path stays float — agree to 1/255.
    np.testing.assert_allclose(nat, py, atol=1.5 / 255.0)


def test_avi_rgba_profile_matches(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (12, 32, 40, 3), np.uint8)
    path = str(tmp_path / "clip.avi")
    write_avi(path, frames, fps=8, audio=np.zeros(8000, np.float32))
    nat = load_frames(path, 6, 24, (0.0, 1.0))
    py = _resample_frames(frames, 6, 24, (0.0, 1.0))
    np.testing.assert_allclose(nat, py, atol=1.5 / 255.0)


def test_window_selection_matches_np_round(npy_stack):
    """Index selection uses round-half-even like np.round — pin via a
    no-resize window read compared against direct indexing."""
    path, arr = npy_stack
    nat = load_frames(path, 5, 48, (0.25, 0.75))
    hi = arr.shape[0] - 1
    idx = np.clip(np.linspace(0.25 * hi, 0.75 * hi, 5).round().astype(int),
                  0, hi)
    # W=36 -> resized; compare against Python resize of the same frames.
    py = _resample_frames(arr[idx], 5, 48, None)
    np.testing.assert_allclose(nat, py, atol=1.5 / 255.0)


def test_unsupported_npy_falls_back(tmp_path):
    """float32 npy is not native-decodable -> load_frames raises, and
    load_frames_for transparently uses the Python path."""
    arr = np.random.default_rng(2).random((6, 8, 8, 3)).astype(np.float32)
    np.save(tmp_path / "f.npy", arr)
    with pytest.raises(ValueError):
        load_frames(str(tmp_path / "f.npy"), 4, 8)
    out = load_frames_for(str(tmp_path / "f"), 4, 8)
    assert out.shape == (4, 8, 8, 3)


def test_load_frames_for_uses_native_for_npy(npy_stack, monkeypatch):
    """The dataset path goes through the native reader for npy stems."""
    path, _ = npy_stack
    stem = path[:-4]
    called = {}

    import viai_tpu.data.av as av_mod

    real = av_mod._native_frames

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.setattr(av_mod, "_native_frames", spy)
    out = load_frames_for(stem, 4, 16, (0.0, 1.0))
    assert called.get("yes") and out.shape == (4, 16, 16, 3)


def test_missing_file_raises():
    with pytest.raises(ValueError):
        load_frames("/nonexistent/nope.npy", 4, 8)


def test_truncated_avi_chunk_skipped(tmp_path):
    """A frame chunk whose declared size is smaller than a full frame
    (e.g. the last chunk of a cut-short file) must be dropped, not read
    out of bounds (ADVICE r2 medium #1) — native output then matches the
    Python resample over the surviving frames."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (4, 16, 16, 3), np.uint8)
    path = str(tmp_path / "trunc.avi")
    write_avi(path, frames, fps=8)
    buf = bytearray(open(path, "rb").read())
    import struct

    # Patch the LAST real 00dc chunk's size field to half a frame
    # (match tag+size so idx1 index entries are not mistaken for chunks).
    frame_bytes = 16 * 16 * 4
    last = buf.rfind(b"00dc" + struct.pack("<I", frame_bytes))
    assert last > 0
    struct.pack_into("<I", buf, last + 4, frame_bytes // 2)
    open(path, "wb").write(bytes(buf))
    nat = load_frames(path, 3, 16, (0.0, 1.0))
    py = _resample_frames(frames[:3], 3, 16, (0.0, 1.0))
    np.testing.assert_allclose(nat, py, atol=1.5 / 255.0)


def test_all_chunks_truncated_errors(tmp_path):
    """If every frame chunk is undersized the native path returns an
    error code (→ ValueError) instead of reading past the buffer."""
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    path = str(tmp_path / "allshort.avi")
    write_avi(path, frames, fps=8)
    buf = bytearray(open(path, "rb").read())
    import struct

    sig = b"00dc" + struct.pack("<I", 8 * 8 * 4)
    pos = buf.find(sig)
    while pos != -1:
        struct.pack_into("<I", buf, pos + 4, 8)
        pos = buf.find(sig, pos + 4)
    open(path, "wb").write(bytes(buf))
    with pytest.raises(ValueError):
        load_frames(path, 2, 8, (0.0, 1.0))
