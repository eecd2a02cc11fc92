"""style="notes_grid": the deterministic twin of the notes corpus.

Round-3 attribution corpus (BENCHMARKS.md oracle rows): onsets sit on a
strict per-clip beat grid and pitches repeat a short arpeggio cycle, so
everything inside a hole is fully inferable from the observed context.
The matched-training score gap notes_grid - notes measures how much of
the notes plateau is irreducible onset/pitch ambiguity rather than
model capacity (SURVEY.md §2.1 "Losses" quality frontier).
"""

import numpy as np
import pytest

from viai_tpu.data.loader import create_dataloader
from viai_tpu.data.synthetic import (
    SyntheticAVDataset,
    SyntheticBatchIterator,
    SyntheticConfig,
    _draw_notes_grid,
)


def test_grid_contract_uniform_onsets_shared_decay():
    """The structural invariants that make the hole predictable."""
    cfg = SyntheticConfig(style="notes_grid")
    for idx in range(8):
        rng = np.random.default_rng((0xA11D10, idx))
        onset, f0, decay, amp, inharm, _ = _draw_notes_grid(rng, cfg)
        d = np.diff(onset)
        # Uniform beat grid, entirely inside the clip.
        assert d.size >= 4
        np.testing.assert_allclose(d, d[0], atol=1e-12)
        assert onset[-1] < cfg.clip_seconds
        # One decay / inharmonicity per clip; pitches + amps repeat a
        # cycle of length 3..5 (slot k == slot k+cycle).
        assert decay.min() == decay.max()
        assert inharm.min() == inharm.max()
        for cycle in range(3, 6):
            if np.allclose(f0[cycle:], f0[:-cycle]):
                assert np.allclose(amp[cycle:], amp[:-cycle])
                break
        else:
            pytest.fail("pitch sequence does not repeat a 3-5 cycle")


def test_deterministic_and_distinct_clips():
    ds = SyntheticAVDataset(SyntheticConfig(style="notes_grid"))
    a, b = ds[3]["wav"], ds[3]["wav"]
    assert np.array_equal(a, b)
    assert a.shape == (ds.cfg.clip_samples,) and a.dtype == np.float32
    assert not np.array_equal(ds[3]["wav"], ds[4]["wav"])


def test_batch_iterator_matches_dataset():
    cfg = SyntheticConfig(style="notes_grid")
    it = SyntheticBatchIterator(cfg, batch=4, seed=0)
    got = next(iter(it))
    it.close()
    ref = np.stack([SyntheticAVDataset(cfg)[i]["wav"] for i in range(4)])
    np.testing.assert_array_equal(got["wav"], ref)


def test_cli_accepts_mode():
    """The argparse choices gate must list the new mode (the unit-level
    loader test can't catch this — caught by the verify recipe)."""
    from viai_tpu.config.options import TrainOptions

    opt = TrainOptions().parse(
        ["--name", "t", "--dataset_mode", "synthetic_notes_grid",
         "--checkpoints_dir", "/tmp/t_nogrid_opt"])
    assert opt.dataset_mode == "synthetic_notes_grid"


def test_loader_dispatch_suffix():
    """`--dataset_mode synthetic_notes_grid` must not fall into the
    plain notes branch (suffix order in data/loader.py)."""
    loader = create_dataloader(
        dataset_mode="synthetic_notes_grid", batch_size=2,
        shuffle=False, num_epochs=1,
    )
    ref = SyntheticAVDataset(SyntheticConfig(style="notes_grid"))[0]["wav"]
    batch = next(iter(loader))
    np.testing.assert_allclose(np.asarray(batch["wav"])[0], ref)
