"""Multi-host helpers (single-process degenerate case on the CPU mesh)."""

import numpy as np

from viai_tpu.train import make_mesh
from viai_tpu.train.mesh import (
    global_batch_from_local,
    maybe_initialize_distributed,
)


def test_maybe_initialize_noop_single_process():
    assert maybe_initialize_distributed() is False


def test_global_batch_from_local_single_process():
    mesh = make_mesh(8)
    batch = {"wav": np.random.default_rng(0).standard_normal(
        (8, 128)).astype(np.float32)}
    arr = global_batch_from_local(batch, mesh)["wav"]
    assert arr.shape == (8, 128)  # 1 process → local == global
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), batch["wav"])
