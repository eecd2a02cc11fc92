"""Host→device prefetching iterator.

Reference capability (SURVEY.md §2.2 "Async data loading"): torch
DataLoader overlaps worker decode with GPU compute via pinned-memory
prefetch. TPU equivalent: while step N runs (JAX dispatch is async),
batch N+1 is already decoded AND transferred; `jax.device_put` with a
NamedSharding starts the copy immediately, so the train loop never
blocks on H2D.
"""

from __future__ import annotations

import collections
import typing as tp

import jax


def device_prefetch(
    iterator: tp.Iterable[dict],
    sharding,
    depth: int = 2,
) -> tp.Iterator[dict]:
    """Yield batches already placed on device, `depth` batches ahead.

    `sharding` is applied to every array leaf (e.g. batch_sharding(mesh)).
    """
    it = iter(iterator)
    buf: collections.deque = collections.deque()

    def put(batch):
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if hasattr(x, "shape") else x,
            batch,
        )

    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
