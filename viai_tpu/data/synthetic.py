"""Synthetic audio(+video) source — CI / bench / CPU-runnable config.

Reference capability (SURVEY.md §4, §7.2): the rebuild needs a
synthetic-data pipeline for self-consistency training tests since the
reference's MUSIC/MUSICES data cannot ship with the repo. Clips are
deterministic functions of their index: harmonic stacks with a random
fundamental, AM/FM modulation, and (for the AV mode) frames of a moving
bright blob whose vertical position tracks the instantaneous pitch —
so vision genuinely carries information about the audio, exercising the
fusion path.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticConfig:
    sample_rate: int = 16000
    clip_seconds: float = 2.0
    n_harmonics: int = 4
    with_video: bool = False
    video_frames: int = 16
    video_size: int = 64
    # Mixed audio-visual batches [B:11]: fraction of clips whose video
    # is missing (frames zeroed, frames_valid=0).
    video_dropout: float = 0.0
    size: int = 10000   # virtual dataset length

    @property
    def clip_samples(self) -> int:
        return int(self.sample_rate * self.clip_seconds)


class SyntheticBatchIterator:
    """Vectorized, background-threaded batch generator.

    The per-item grain path costs ~104 ms/batch-32 (measured, TPU train
    loop is data-bound at 7.8 steps/s vs 16.8 steps/s device-only);
    vectorizing the waveform/blob math over the batch and double-
    buffering in one worker thread hides generation behind device
    compute. Item VALUES are identical to SyntheticAVDataset[idx]
    (same per-index rng draw order; pinned by test)."""

    def __init__(self, cfg: SyntheticConfig, batch: int, seed: int = 0,
                 depth: int = 2):
        import queue
        import threading

        self.cfg = cfg
        self.batch = batch
        self.epoch_batches = max(cfg.size // batch, 1)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._idx = seed * cfg.size  # distinct streams per seed
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- vectorized generation (values == SyntheticAVDataset) -------------
    def _gen(self, idx0: int) -> dict:
        cfg, B = self.cfg, self.batch
        n, H = cfg.clip_samples, cfg.n_harmonics
        f0 = np.empty(B)
        vib = np.empty(B)
        vib_depth = np.empty(B)
        amps = np.empty((B, H))
        env_f = np.empty(B)
        has_video = np.ones(B, bool)
        for b in range(B):
            rng = np.random.default_rng((0xA11D10, int(idx0 + b)))
            f0[b] = rng.uniform(110.0, 880.0)
            vib[b] = rng.uniform(0.0, 6.0)
            vib_depth[b] = rng.uniform(0.0, 0.02)
            for h in range(1, H + 1):
                amps[b, h - 1] = rng.uniform(0.1, 1.0) / h
            env_f[b] = rng.uniform(0.3, 2.0)
            if cfg.with_video:
                has_video[b] = rng.uniform() >= cfg.video_dropout
        t = np.arange(n) / cfg.sample_rate
        inst_f = f0[:, None] * (
            1.0 + vib_depth[:, None] * np.sin(2 * np.pi * vib[:, None] * t)
        )
        phase = 2 * np.pi * np.cumsum(inst_f, axis=1) / cfg.sample_rate
        wav = np.zeros((B, n), np.float64)
        for h in range(1, H + 1):
            wav += amps[:, h - 1 : h] * np.sin(h * phase)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * env_f[:, None] * t)
        wav = (wav * env).astype(np.float32)
        wav *= (0.5 / np.maximum(np.abs(wav).max(axis=1, keepdims=True),
                                 1e-6)).astype(np.float32)
        item = {"wav": wav}
        if cfg.with_video:
            T, S = cfg.video_frames, cfg.video_size
            fidx = np.linspace(0, n - 1, T).astype(int)
            y = (np.log2(inst_f[:, fidx] / 110.0) / 3.0 * (S - 8)).clip(
                0, S - 8)                                     # (B, T)
            x = (env[:, fidx] * (S - 8)).clip(0, S - 8)
            yy, xx = np.mgrid[0:S, 0:S]
            d2 = ((yy[None, None] - y[..., None, None]) ** 2
                  + (xx[None, None] - x[..., None, None]) ** 2)
            blob = np.exp(-(d2 / 18.0)).astype(np.float32)    # (B, T, S, S)
            frames = np.zeros((B, T, S, S, 3), np.float32)
            frames[..., 0] = blob
            frames[..., 1] = blob * env[:, fidx, None, None]
            frames[..., 2] = 0.2
            frames[~has_video] = 0.0
            item["frames"] = frames
            item["frames_valid"] = has_video.astype(np.float32)
        return item

    def _worker(self):
        import queue

        while not self._stop.is_set():
            batch = self._gen(self._idx)
            self._idx += self.batch
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


class SyntheticAVDataset:
    """Deterministic random-access source: idx → {'wav', 'frames'?}."""

    def __init__(self, cfg: SyntheticConfig = SyntheticConfig()):
        self.cfg = cfg

    def __len__(self):
        return self.cfg.size

    def __getitem__(self, idx: int):
        cfg = self.cfg
        rng = np.random.default_rng((0xA11D10, int(idx)))
        n = cfg.clip_samples
        t = np.arange(n) / cfg.sample_rate
        f0 = rng.uniform(110.0, 880.0)
        vib = rng.uniform(0.0, 6.0)          # vibrato Hz
        vib_depth = rng.uniform(0.0, 0.02)
        inst_f = f0 * (1.0 + vib_depth * np.sin(2 * np.pi * vib * t))
        phase = 2 * np.pi * np.cumsum(inst_f) / cfg.sample_rate
        wav = np.zeros(n, np.float64)
        for h in range(1, cfg.n_harmonics + 1):
            amp = rng.uniform(0.1, 1.0) / h
            wav += amp * np.sin(h * phase)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t)
        wav = (wav * env).astype(np.float32)
        wav *= 0.5 / max(np.abs(wav).max(), 1e-6)
        item = {"wav": wav}
        if cfg.with_video:
            has_video = rng.uniform() >= cfg.video_dropout
            T, S = cfg.video_frames, cfg.video_size
            frames = np.zeros((T, S, S, 3), np.float32)
            # Blob y-position tracks log-pitch; x sweeps with the envelope.
            fidx = (np.linspace(0, n - 1, T)).astype(int)
            y = (np.log2(inst_f[fidx] / 110.0) / 3.0 * (S - 8)).clip(0, S - 8)
            x = (env[fidx] * (S - 8)).clip(0, S - 8)
            yy, xx = np.mgrid[0:S, 0:S]
            for k in range(T):
                blob = np.exp(
                    -(((yy - y[k]) ** 2 + (xx - x[k]) ** 2) / 18.0)
                )
                frames[k, :, :, 0] = blob
                frames[k, :, :, 1] = blob * env[fidx[k]]
                frames[k, :, :, 2] = 0.2
            if not has_video:
                frames[:] = 0.0
            item["frames"] = frames
            item["frames_valid"] = np.float32(1.0 if has_video else 0.0)
        return item
