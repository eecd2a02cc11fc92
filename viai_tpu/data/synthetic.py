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
