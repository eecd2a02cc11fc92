"""AV dataset + MUSICES manifest tests using generated media files."""

import json
import os

import numpy as np
import pytest

from viai_tpu.data import AVFolderDataset, MusicesManifest, create_dataloader
from viai_tpu.data.synthetic import SyntheticAVDataset, SyntheticConfig
from viai_tpu.utils.visualizer import write_wav


@pytest.fixture(scope="module")
def av_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("av")
    cfg = SyntheticConfig(with_video=True, video_frames=6, video_size=24,
                          clip_seconds=1.0)
    ds = SyntheticAVDataset(cfg)
    for i in range(3):
        item = ds[i]
        stem = d / f"clip{i}"
        write_wav(str(stem) + ".wav", item["wav"], 16000)
        np.save(str(stem) + ".npy", (item["frames"] * 255).astype(np.uint8))
    return d


def test_av_folder_dataset(av_dir):
    ds = AVFolderDataset(str(av_dir), clip_samples=8000, n_frames=4,
                         frame_size=16)
    item = ds[0]
    assert item["wav"].shape == (8000,)
    assert item["frames"].shape == (4, 16, 16, 3)
    assert 0.0 <= item["frames"].min() and item["frames"].max() <= 1.0


def test_musices_manifest(av_dir):
    manifest = {
        "train": [
            {"audio": f"clip{i}.wav", "frames": f"clip{i}.npy"}
            for i in range(2)
        ],
        "test": [{"audio": "clip2.wav", "frames": "clip2.npy"}],
    }
    path = av_dir / "MUSICES.json"
    with open(path, "w") as f:
        json.dump(manifest, f)
    ds = MusicesManifest(str(path), "train", clip_samples=8000, n_frames=4,
                         frame_size=16)
    assert len(ds) == 2
    item = ds[1]
    assert item["wav"].shape == (8000,)
    assert item["frames"].shape == (4, 16, 16, 3)


def test_av_grain_loader(av_dir):
    it = create_dataloader(
        "av", str(av_dir), batch_size=2, clip_samples=8000, n_threads=0,
        n_frames=4, frame_size=16, num_epochs=1,
    )
    batch = next(iter(it))
    assert batch["wav"].shape == (2, 8000)
    assert batch["frames"].shape == (2, 4, 16, 16, 3)


def test_musices_split_selection(av_dir):
    """test.py must read the 'test' split of a MUSICES manifest."""
    from viai_tpu.data import create_dataloader

    it = create_dataloader(
        "musices", str(av_dir / "MUSICES.json"), batch_size=1,
        clip_samples=8000, n_threads=0, n_frames=4, frame_size=16,
        num_epochs=1, shuffle=False, split="test",
    )
    batches = list(it)
    assert len(batches) == 1  # the manifest's test split has one clip
