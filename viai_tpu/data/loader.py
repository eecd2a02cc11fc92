"""Loader factory — the reference's `CreateDataLoader(opt)` surface.

Reference capability (SURVEY.md §2.1 "Loader factory"): dispatch a
dataset by `opt.dataset_mode` and wrap it with multi-worker batching
(torch DataLoader(num_workers=nThreads)). TPU equivalent
(SURVEY.md §2.2 "Async data loading"): grain multi-worker pipelines;
for the pure-audio path a zero-Python-worker native C++ loader
(viai_tpu.native.NativeClipLoader) is used when available — decode,
resample, crop and batch assembly all happen in C++ threads.
"""

from __future__ import annotations

import typing as tp

from .audio import AudioFolderDataset, find_wavs
from .av import AVFolderDataset, MusicesManifest
from .synthetic import (
    SyntheticAVDataset,
    SyntheticBatchIterator,
    SyntheticConfig,
)


class EpochVariedSource:
    """Virtual-epoch multiplier for grain sources.

    grain's IndexSampler hands data sources record keys in [0, len) on
    EVERY epoch, so a source seeding its crop rng with (seed, idx)
    re-reads the same crop position per file each epoch (ADVICE.md
    round-1 low #3). Multiplying the advertised length by
    `virtual_epochs` makes the raw key encode (epoch, record): the
    wrapped source's `idx % n_files` still picks the file while
    (seed, idx) now varies per epoch — fresh crops, fully replayable.
    """

    def __init__(self, src, virtual_epochs: int = 1024):
        self.src = src
        self.virtual_epochs = virtual_epochs

    def __len__(self):
        return len(self.src) * self.virtual_epochs

    def __getitem__(self, idx):
        return self.src[int(idx)]


def _grain_loader(source, batch_size: int, n_workers: int, seed: int,
                  shuffle: bool = True, num_epochs: int | None = None,
                  vary_epochs: bool = False):
    import grain.python as grain

    epoch_records = len(source)
    if vary_epochs and shuffle and num_epochs is None:
        source = EpochVariedSource(source)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.NoSharding(),
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=n_workers,
    )
    # TRUE epoch length (files, not virtual records) for epoch-addressed
    # lr schedules (VERDICT.md round-1 weak #5 / ADVICE.md low #5).
    loader.epoch_batches = max(epoch_records // batch_size, 1)
    return loader


class NativeAudioIterator:
    """Wraps NativeClipLoader to yield {'wav': (B, S)} dicts forever."""

    def __init__(self, root: str, batch_size: int, clip_samples: int,
                 sample_rate: int, n_workers: int, seed: int):
        from .. import native

        paths = find_wavs(root)
        if not paths:
            raise FileNotFoundError(f"no .wav files under {root}")
        self._loader = native.NativeClipLoader(
            paths, clip_samples=clip_samples, target_sr=sample_rate,
            batch=batch_size, n_workers=max(n_workers, 1), seed=seed,
        )
        self.epoch_batches = max(len(paths) // batch_size, 1)

    def __iter__(self):
        return self

    def __next__(self):
        return {"wav": self._loader.next()}

    def close(self):
        self._loader.close()


def create_dataloader(
    dataset_mode: str,
    dataroot: str | None = None,
    batch_size: int = 16,
    clip_samples: int = 32000,
    sample_rate: int = 16000,
    n_threads: int = 4,
    n_frames: int = 16,
    frame_size: int = 64,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: int | None = None,
    prefer_native: bool = True,
    split: str = "train",
) -> tp.Iterable[dict]:
    """→ iterable of batch dicts {'wav': (B, S) [, 'frames': (B,T,H,W,3)]}.

    dataset_mode: 'audio' | 'av' | 'musices' | 'synthetic' | 'synthetic_av'
    (the reference's `--dataset_mode` option, SURVEY.md §2.1).
    """
    if dataset_mode.startswith("synthetic"):
        cfg = SyntheticConfig(
            sample_rate=sample_rate,
            clip_seconds=clip_samples / sample_rate,
            with_video="_av" in dataset_mode,
            video_frames=n_frames,
            video_size=frame_size,
            style=("av_cue" if dataset_mode.endswith("_cue")
                   else "notes_grid" if dataset_mode.endswith("_notes_grid")
                   else "notes" if dataset_mode.endswith("_notes")
                   else "harmonic"),
        )
        if prefer_native and shuffle and num_epochs is None:
            # Training fast path: vectorized threaded generator — the
            # per-item grain path is 10x slower and data-binds the TPU
            # train loop (see SyntheticBatchIterator).
            return SyntheticBatchIterator(cfg, batch_size, seed=seed)
        return _grain_loader(
            SyntheticAVDataset(cfg), batch_size, n_threads, seed,
            shuffle=shuffle, num_epochs=num_epochs,
        )
    if dataset_mode == "audio":
        from .. import native

        if prefer_native and native.AVAILABLE and shuffle and num_epochs is None:
            return NativeAudioIterator(
                dataroot, batch_size, clip_samples, sample_rate,
                n_threads, seed,
            )
        src = AudioFolderDataset(dataroot, clip_samples, sample_rate, seed)
        return _grain_loader(src, batch_size, n_threads, seed,
                             shuffle=shuffle, num_epochs=num_epochs,
                             vary_epochs=True)
    if dataset_mode == "av":
        src = AVFolderDataset(
            dataroot, clip_samples, sample_rate, n_frames, frame_size, seed
        )
        return _grain_loader(src, batch_size, n_threads, seed,
                             shuffle=shuffle, num_epochs=num_epochs,
                             vary_epochs=True)
    if dataset_mode == "musices":
        src = MusicesManifest(
            dataroot, split, clip_samples, sample_rate, n_frames,
            frame_size, seed,
        )
        return _grain_loader(src, batch_size, n_threads, seed,
                             shuffle=shuffle, num_epochs=num_epochs,
                             vary_epochs=True)
    raise ValueError(f"unknown dataset_mode: {dataset_mode}")
