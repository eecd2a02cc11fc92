"""Device prefetcher tests."""

import numpy as np

from viai_tpu.data.prefetch import device_prefetch
from viai_tpu.train import batch_sharding, make_mesh


def test_prefetch_yields_all_on_device():
    mesh = make_mesh(8)
    batches = [{"wav": np.full((8, 16), i, np.float32), "n": i}
               for i in range(5)]
    out = list(device_prefetch(iter(batches), batch_sharding(mesh), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert b["n"] == i
        assert len(b["wav"].sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(b["wav"]),
                                      batches[i]["wav"])


def test_prefetch_short_iterator():
    mesh = make_mesh(8)
    batches = [{"wav": np.zeros((8, 16), np.float32)}]
    out = list(device_prefetch(iter(batches), batch_sharding(mesh), depth=4))
    assert len(out) == 1
