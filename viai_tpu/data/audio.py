"""Audio dataset — wav files under a dataroot, random 2 s crops.

Reference capability (SURVEY.md §2.1 "Audio dataset"): index wav
clips, random crop, tensorize. Decode uses the native C++ library
(viai_tpu.native) with a scipy fallback; spectrogram/mask computation
happens ON DEVICE inside the train step (train/step.py preprocess), so
this host layer only hands over raw waveforms — that is the whole
point of the TPU redesign (SURVEY.md §3.1 "both move on-device").
"""

from __future__ import annotations

import os

import numpy as np

from .. import native


def find_wavs(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(".wav"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode + resample a wav to mono float32 at target_sr."""
    with open(path, "rb") as f:
        data = f.read()
    if native.AVAILABLE:
        wav, sr = native.decode_wav(data)
        if sr != target_sr:
            wav = native.resample_linear(wav, sr, target_sr)
        return wav
    import io

    import scipy.io.wavfile as wavfile

    sr, wav = wavfile.read(io.BytesIO(data))
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483648.0
    else:
        wav = wav.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    if sr != target_sr:
        n_out = int(len(wav) * target_sr / sr)
        x_old = np.linspace(0.0, 1.0, len(wav))
        x_new = np.linspace(0.0, 1.0, n_out)
        wav = np.interp(x_new, x_old, wav).astype(np.float32)
    return wav


def crop_with_info(
    wav: np.ndarray, clip_samples: int, rng
) -> tuple[np.ndarray, int, int]:
    """Random crop → (clip, crop_start, source_length).

    The (start, length) pair lets AV datasets select the video frames
    spanning EXACTLY the cropped audio window (ADVICE.md round-1
    medium #1: frames sampled over the whole source are temporally
    desynchronized from a random audio crop)."""
    out = np.zeros(clip_samples, np.float32)
    total = len(wav)
    start = 0
    if total >= clip_samples:
        start = int(rng.integers(0, total - clip_samples + 1))
        out[:] = wav[start : start + clip_samples]
    else:
        out[:total] = wav
    return out, start, total


def crop_or_pad(wav: np.ndarray, clip_samples: int, rng) -> np.ndarray:
    """Random clip_samples crop (zero-pad short signals) — the
    reference datasets' 2 s crop behavior (SURVEY.md §2.1)."""
    return crop_with_info(wav, clip_samples, rng)[0]


class AudioFolderDataset:
    """Random-access dataset: idx → {'wav': (clip_samples,) float32}.

    Deterministic per (seed, idx) crop position, so grain can
    shard/replay it. The RAW grain index seeds the crop rng (not
    idx % len), so wrapping the source with loader.EpochVariedSource
    gives fresh crops every epoch while staying replayable
    (ADVICE.md round-1 low #3).
    """

    def __init__(self, root: str, clip_samples: int = 32000,
                 sample_rate: int = 16000, seed: int = 0):
        self.paths = find_wavs(root)
        if not self.paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        self.clip_samples = clip_samples
        self.sample_rate = sample_rate
        self.seed = seed

    def __len__(self):
        return len(self.paths)

    def load_cropped(self, idx: int):
        """idx → ({'wav': clip}, crop_start, source_samples)."""
        idx = int(idx)
        wav = load_wav(self.paths[idx % len(self.paths)], self.sample_rate)
        rng = np.random.default_rng((self.seed, idx))
        clip, start, total = crop_with_info(wav, self.clip_samples, rng)
        return {"wav": clip}, start, total

    def __getitem__(self, idx: int):
        return self.load_cropped(idx)[0]
