"""ctypes bindings for the native host runtime (libviai_native.so).

Builds the shared library on first import if missing (g++ is in the
image; pybind11 is not, hence ctypes — see task environment notes).
Falls back gracefully: `AVAILABLE` is False if the toolchain or build
fails, and data pipelines then use the pure-NumPy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libviai_native.so")

AVAILABLE = False
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _stale() -> bool:
    """True if any source is newer than the built .so (e.g. after a
    pull that added framestack.cpp next to an old wavio-only build)."""
    try:
        so_m = os.path.getmtime(_SO)
        return any(
            os.path.getmtime(os.path.join(_DIR, f)) > so_m
            for f in os.listdir(_DIR) if f.endswith(".cpp")
        )
    except OSError:
        return False


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO) or _stale()) and not _build():
        # A stale-but-loadable .so beats no native path at all (e.g. a
        # toolchain-less host after a pull touched a .cpp): keep it and
        # rely on the hasattr() guards for any missing new symbols
        # (ADVICE r2 low #3).
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.viai_decode_wav.restype = ctypes.c_int64
    lib.viai_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.viai_resample_linear.restype = None
    lib.viai_resample_linear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
    ]
    lib.viai_loader_create.restype = ctypes.c_void_p
    lib.viai_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.viai_loader_next.restype = ctypes.c_int32
    lib.viai_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
    ]
    lib.viai_loader_destroy.restype = None
    lib.viai_loader_destroy.argtypes = [ctypes.c_void_p]
    try:
        # Absent in a pre-framestack build when the rebuild failed.
        lib.viai_load_frames.restype = ctypes.c_int32
        lib.viai_load_frames.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
    except AttributeError:
        pass
    _lib = lib
    AVAILABLE = True
    return lib


def decode_wav(data: bytes, max_samples: int = 16000 * 600):
    """WAV bytes → (mono float32 array, sample_rate). Raises on error."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(max_samples, np.float32)
    sr = ctypes.c_int32(0)
    n = lib.viai_decode_wav(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        raise ValueError("not a decodable WAV buffer")
    return out[:n].copy(), int(sr.value)


def load_frames(path: str, n_frames: int, size: int,
                window: tuple[float, float] | None = None) -> np.ndarray:
    """Native frame-stack read: `.npy` uint8 (T,H,W,3) stack or
    uncompressed AVI → (n_frames, size, size, 3) float32 in [0,1],
    frames selected over the fractional `window` of the source and
    resized with Pillow-compatible triangle filtering (framestack.cpp;
    threaded over frames). Raises on unsupported input — callers fall
    back to the PIL/cv2 path (viai_tpu/data/av.py::load_frames_for)."""
    lib = _load()
    if lib is None or not hasattr(lib, "viai_load_frames"):
        raise RuntimeError("native library unavailable")
    w0, w1 = (0.0, 1.0) if window is None else window
    out = np.empty((n_frames, size, size, 3), np.float32)
    rc = lib.viai_load_frames(
        path.encode(), n_frames, size, ctypes.c_float(w0),
        ctypes.c_float(w1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"native frame decode failed ({rc}) for {path}")
    return out


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    n_out = int(len(x) * sr_out / sr_in)
    out = np.empty(n_out, np.float32)
    lib.viai_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out, sr_out,
    )
    return out


class NativeClipLoader:
    """Threaded random-crop WAV batch loader (C++ worker pool).

    Replaces torch DataLoader(num_workers=nThreads) for the audio-only
    pipeline (SURVEY.md §2.2 "Async data loading").

    Determinism contract (VERDICT.md round-1 weak #7): each worker's
    file/crop stream is a pure function of (seed, worker_id) and each
    worker assembles whole batches, so `n_workers=1` yields a fully
    deterministic, reproducible batch sequence (pinned by test). With
    n_workers>1 the per-worker streams stay deterministic but the
    BATCH interleaving depends on thread scheduling — use 1 worker for
    exact-reproduction runs, more for throughput. There is no epoch
    boundary: the stream samples files with replacement, forever.
    """

    def __init__(self, paths, clip_samples: int, target_sr: int = 16000,
                 batch: int = 16, n_workers: int = 4, queue_depth: int = 8,
                 seed: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        blob = "\n".join(str(p) for p in paths).encode()
        self._lib = lib
        self._handle = lib.viai_loader_create(
            blob, clip_samples, target_sr, batch, n_workers, queue_depth, seed
        )
        if not self._handle:
            raise ValueError("no usable paths given to NativeClipLoader")
        self.batch = batch
        self.clip_samples = clip_samples

    def next(self) -> np.ndarray:
        out = np.empty((self.batch, self.clip_samples), np.float32)
        rc = self._lib.viai_loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise StopIteration
        return out

    def __iter__(self):
        return self

    def __next__(self):
        return self.next()

    def close(self):
        if self._handle:
            self._lib.viai_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# Attempt load at import so AVAILABLE reflects reality.
_load()
