"""Audio-visual dataset — aligned wav + video frames.

Reference capability (SURVEY.md §2.1 "Audio-visual dataset"): MUSIC
instrument clips [B:8] with opencv/ffmpeg frame decode, indexed by the
MUSICES.json manifest the paper released. Host-side codec decode stays
on CPU (SURVEY.md §2.4 — "raw codec decode has no TPU equivalent");
resize/normalize and all feature extraction happen on device.

Supported frame layouts per audio clip `<stem>.wav`:
  * `<stem>.npy`       — (T, H, W, 3) uint8/float array
  * `<stem>/NNNNN.jpg` — directory of frames (PIL decode)
  * `<stem>.mp4/.avi`  — video file (cv2 decode, if opencv present)
A MUSICES-style JSON manifest {split: [{"audio":..., "frames":...}]}
is also accepted (see MusicesManifest).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .audio import AudioFolderDataset, crop_or_pad, crop_with_info, load_wav


def _window_indices(total: int, n_frames: int, window) -> np.ndarray:
    """Frame indices spanning `window` = (t0_frac, t1_frac) of the source.

    window=None → the whole source (legacy behavior, correct only when
    the clip covers the full source)."""
    w0, w1 = (0.0, 1.0) if window is None else window
    hi = max(total - 1, 0)
    return np.clip(
        np.linspace(w0 * hi, w1 * hi, n_frames).round().astype(int), 0, hi
    )


def _load_frames_npy(path, n_frames, size, window=None):
    arr = np.load(path)
    return _resample_frames(arr, n_frames, size, window=window)


def _load_frames_dir(path, n_frames, size, window=None):
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not files:
        raise FileNotFoundError(f"no frames in {path}")
    idx = _window_indices(len(files), n_frames, window)
    frames = []
    for i in idx:
        img = Image.open(os.path.join(path, files[i])).convert("RGB")
        img = img.resize((size, size), Image.BILINEAR)
        frames.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(frames)


def _load_frames_video(path, n_frames, size, window=None):
    if path.lower().endswith(".avi"):
        # Uncompressed AVIs decode via the zero-dependency demuxer —
        # measured: this image's cv2/ffmpeg heap-crashes on raw DIB
        # AVIs (see data/avi.py); compressed ones fall through to cv2.
        try:
            from .avi import read_avi

            frames, _fps, _audio, _sr = read_avi(path)
            return _resample_frames(frames, n_frames, size, window=window)
        except ValueError:
            pass
    import cv2

    cap = cv2.VideoCapture(path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    idx = set(_window_indices(total, n_frames, window).tolist())
    got = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i in idx:
            frame = cv2.resize(frame, (size, size))
            got.append(frame[..., ::-1].astype(np.float32) / 255.0)
        i += 1
    cap.release()
    if not got:
        raise ValueError(f"no frames decoded from {path}")
    arr = np.stack(got)
    return _resample_frames(arr, n_frames, size)


def _resample_frames(arr, n_frames, size, window=None):
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if window is not None or arr.shape[0] != n_frames:
        arr = arr[_window_indices(arr.shape[0], n_frames, window)]
    if arr.shape[1] != size or arr.shape[2] != size:
        from PIL import Image

        out = np.empty((n_frames, size, size, 3), np.float32)
        for k in range(n_frames):
            img = Image.fromarray((arr[k] * 255).astype(np.uint8))
            out[k] = (
                np.asarray(img.resize((size, size), Image.BILINEAR), np.float32)
                / 255.0
            )
        arr = out
    return arr


def _native_frames(path, n_frames, size, window):
    """C++ fast path (native/framestack.cpp) for npy stacks and
    uncompressed AVIs; returns None when the native lib is missing or
    the container is unsupported (compressed video, non-u8 npy)."""
    try:
        from ..native import load_frames

        return load_frames(path, n_frames, size, window)
    except Exception:
        return None


def load_frames_for(stem: str, n_frames: int, size: int,
                    window: tuple[float, float] | None = None) -> np.ndarray:
    """Try the supported frame layouts for `<stem>` in priority order.

    `window` = (t0_frac, t1_frac) of the SOURCE duration: selects the
    frames temporally aligned with the audio crop (ADVICE.md medium #1).

    npy stacks and uncompressed AVIs decode through the native C++
    reader when available (select + resize + normalize, threaded);
    jpeg dirs and compressed video keep the PIL/cv2 path.
    """
    if os.path.exists(stem + ".npy"):
        out = _native_frames(stem + ".npy", n_frames, size, window)
        if out is not None:
            return out
        return _load_frames_npy(stem + ".npy", n_frames, size, window)
    if os.path.isdir(stem):
        return _load_frames_dir(stem, n_frames, size, window)
    for ext in (".mp4", ".avi", ".mkv", ".webm"):
        if os.path.exists(stem + ext):
            if ext == ".avi":
                out = _native_frames(stem + ext, n_frames, size, window)
                if out is not None:
                    return out
            return _load_frames_video(stem + ext, n_frames, size, window)
    raise FileNotFoundError(f"no frame source for {stem}")


def _crop_window(start: int, clip_samples: int, total: int):
    """Audio crop (start, clip_samples, source total) → frame-window
    fractions. Short sources (total ≤ clip) span the whole video."""
    if total <= 0 or total <= clip_samples:
        return (0.0, 1.0)
    return (start / total, min((start + clip_samples) / total, 1.0))


class AVFolderDataset(AudioFolderDataset):
    """idx → {'wav': (S,), 'frames': (T, H, W, 3) float32 in [0,1]}."""

    def __init__(self, root: str, clip_samples: int = 32000,
                 sample_rate: int = 16000, n_frames: int = 16,
                 frame_size: int = 64, seed: int = 0):
        super().__init__(root, clip_samples, sample_rate, seed)
        self.n_frames = n_frames
        self.frame_size = frame_size

    def __getitem__(self, idx: int):
        item, start, total = self.load_cropped(idx)
        stem = os.path.splitext(self.paths[int(idx) % len(self.paths)])[0]
        item["frames"] = load_frames_for(
            stem, self.n_frames, self.frame_size,
            window=_crop_window(start, self.clip_samples, total),
        )
        return item


class MusicesManifest:
    """MUSICES.json-style manifest (SURVEY.md §2.1): split → clip list.

    Schema: {"train": [{"audio": path, "frames": path}, ...], "test": [...]}
    Paths are resolved relative to the manifest's directory.
    """

    def __init__(self, manifest_path: str, split: str = "train",
                 clip_samples: int = 32000, sample_rate: int = 16000,
                 n_frames: int = 16, frame_size: int = 64, seed: int = 0):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if split not in manifest:
            raise KeyError(f"split {split!r} not in manifest")
        base = os.path.dirname(os.path.abspath(manifest_path))
        self.entries = [
            {
                "audio": os.path.join(base, e["audio"]),
                "frames": os.path.join(base, e["frames"]) if "frames" in e else None,
            }
            for e in manifest[split]
        ]
        self.clip_samples = clip_samples
        self.sample_rate = sample_rate
        self.n_frames = n_frames
        self.frame_size = frame_size
        self.seed = seed

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        e = self.entries[int(idx) % len(self.entries)]
        wav = load_wav(e["audio"], self.sample_rate)
        rng = np.random.default_rng((self.seed, int(idx)))
        clip, start, total = crop_with_info(wav, self.clip_samples, rng)
        item = {"wav": clip}
        if e["frames"]:
            stem = os.path.splitext(e["frames"])[0]
            item["frames"] = load_frames_for(
                stem, self.n_frames, self.frame_size,
                window=_crop_window(start, self.clip_samples, total),
            )
        return item
