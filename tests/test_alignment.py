"""AV temporal alignment + epoch-varied crops + epoch-length plumbing
(ADVICE.md round-1 medium #1, low #3, low #5; VERDICT.md weak #4/#5).
"""

import numpy as np
import pytest

from viai_tpu.data import AVFolderDataset, create_dataloader
from viai_tpu.data.audio import AudioFolderDataset, crop_with_info
from viai_tpu.data.loader import EpochVariedSource
from viai_tpu.utils.visualizer import write_wav

SR = 16000
CLIP = 32000           # 2 s
TOTAL_S = 10           # 10 s source → crops cover 20% of the timeline
N_SRC_FRAMES = 50


@pytest.fixture(scope="module")
def long_av_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("longav")
    rng = np.random.default_rng(0)
    for i in range(2):
        wav = rng.normal(0, 0.1, SR * TOTAL_S).astype(np.float32)
        write_wav(str(d / f"clip{i}.wav"), wav, SR)
        # Frame k is a constant image of value k/(T-1): the decoded
        # frame VALUES reveal which source times were selected.
        ramp = np.linspace(0, 1, N_SRC_FRAMES, dtype=np.float32)
        frames = np.broadcast_to(
            ramp[:, None, None, None], (N_SRC_FRAMES, 8, 8, 3)
        )
        np.save(str(d / f"clip{i}.npy"), (frames * 255).astype(np.uint8))
    return d


def test_av_frames_span_the_audio_crop_window(long_av_dir):
    ds = AVFolderDataset(str(long_av_dir), clip_samples=CLIP,
                         sample_rate=SR, n_frames=4, frame_size=8, seed=3)
    for idx in (0, 1, 5, 11):
        item, start, total = ds.load_cropped(idx)
        w0, w1 = start / total, (start + CLIP) / total
        frames = ds[idx]["frames"]
        vals = frames.mean(axis=(1, 2, 3))          # ≈ source-time fraction
        expect = np.linspace(w0, w1, 4)
        tol = 1.5 / (N_SRC_FRAMES - 1) + 1 / 255
        np.testing.assert_allclose(vals, expect, atol=tol)
        # And crops genuinely move around the 10 s timeline.
        assert total == SR * TOTAL_S
    starts = [ds.load_cropped(i)[1] for i in range(8)]
    assert len(set(starts)) > 3, starts


def test_frames_not_sampled_beyond_crop(long_av_dir):
    """Regression for ADVICE medium #1: without the window, the last
    frame would always be ~1.0 regardless of the crop position."""
    ds = AVFolderDataset(str(long_av_dir), clip_samples=CLIP,
                         sample_rate=SR, n_frames=4, frame_size=8, seed=3)
    item, start, total = ds.load_cropped(0)
    frames = ds[0]["frames"]
    if (start + CLIP) / total < 0.8:   # crop ends well before the source
        assert frames.mean(axis=(1, 2, 3)).max() < 0.9


def test_epoch_varied_source_gives_fresh_crops(long_av_dir):
    ds = AudioFolderDataset(str(long_av_dir), clip_samples=CLIP,
                            sample_rate=SR, seed=0)
    n = len(ds)
    src = EpochVariedSource(ds, virtual_epochs=4)
    assert len(src) == 4 * n
    # Same file (idx ≡ idx+n mod n), different virtual epoch → crop moves.
    a = src[0]["wav"]
    b = src[n]["wav"]
    assert not np.allclose(a, b), "epoch 0 and 1 crops identical"
    # Replayable: the same raw index always yields the same crop.
    np.testing.assert_array_equal(a, src[0]["wav"])


def test_loader_epoch_batches_reflects_true_dataset_size(long_av_dir):
    loader = create_dataloader(
        "audio", str(long_av_dir), batch_size=2, clip_samples=CLIP,
        n_threads=0, prefer_native=False,
    )
    assert loader.epoch_batches == 1    # 2 files // batch 2
    loader_av = create_dataloader(
        "av", str(long_av_dir), batch_size=1, clip_samples=CLIP,
        n_threads=0, n_frames=4, frame_size=8,
    )
    assert loader_av.epoch_batches == 2


def test_step_mask_key_matches_train_step_split():
    import jax

    from viai_tpu.train.step import step_mask_key

    key = jax.random.key(42)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(step_mask_key(key))),
        np.asarray(jax.random.key_data(jax.random.split(key, 3)[0])),
    )


def test_get_current_visuals_shows_trained_mask(tmp_path):
    """The displayed triplet must be internally consistent: `masked`
    equals `real` exactly where observed, and a hole exists."""
    from viai_tpu.config.options import TrainOptions
    from viai_tpu.model import create_model

    opt = TrainOptions().parse(
        ["--name", "vis", "--checkpoints_dir", str(tmp_path),
         "--dataset_mode", "synthetic", "--ngf", "8", "--ndf", "8",
         "--batchSize", "8", "--gl_iters", "2"],
        save=False,
    )
    m = create_model(opt)
    wav = np.random.default_rng(0).normal(
        0, 0.1, (8, 32000)).astype(np.float32)
    m.set_input({"wav": wav})
    m.optimize_parameters()
    vis = m.get_current_visuals()
    assert set(vis) == {"real", "masked", "inpainted"}
    real, masked = vis["real"], vis["masked"]
    diff_cols = np.where(np.abs(real - masked).max(axis=0) > 1e-6)[0]
    assert len(diff_cols) > 0, "no hole visible in the displayed mask"
    # Observed columns agree exactly (same preprocess, same mask).
    obs = np.setdiff1d(np.arange(real.shape[1]), diff_cols)
    np.testing.assert_array_equal(real[:, obs], masked[:, obs])
