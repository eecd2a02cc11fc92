"""Device mesh + sharding helpers (SURVEY.md §2.2/§2.3).

The reference's only parallelism is intra-process DataParallel over
`opt.gpu_ids`. TPU-native equivalent: a `jax.sharding.Mesh` with a
`data` axis; batches are sharded over it, parameters replicated, and
XLA inserts the gradient psum over ICI automatically from sharding
propagation — no hand-written collectives in model code.

A `model` axis is reserved in the mesh API so parameter sharding can be
added without changing call sites (SURVEY.md §2.2 TP row), but DP-only
is the supported configuration for this model size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, devices=None, n_model: int = 1
) -> Mesh:
    """Mesh over all (or the first n_data·n_model) devices: ('data','model')."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree of arrays on the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_params(tree, mesh: Mesh, min_shard: int = 8):
    """Shard a param/opt-state pytree over the reserved 'model' axis.

    The optional param-sharding mode of BASELINE config 5 [B:11]
    ("generator + discriminator sharded over ICI"; SURVEY.md §2.2 TP
    row — replicated DP is the default, this is the opt-in). Policy:
    each leaf's LAST axis (conv HWIO output channels, bias features) is
    sharded over 'model' when divisible by the axis size and at least
    `min_shard` per device; everything else (scalars, tiny leaves) is
    replicated. Gradients/optimizer moments inherit the same placement
    because Adam's m/v mirror param shapes, so per-device optimizer
    state and HBM scale down with the axis — a ZeRO-style memory win.
    XLA/GSPMD inserts the all-gathers for forward use and the
    reduce-scatters for gradients from sharding propagation alone; no
    collective appears in model code, exactly like the DP psum.

    Numerics are unchanged (same math, different placement) — pinned by
    tests/test_sharding.py::test_model_axis_param_sharding.
    """
    n = mesh.shape["model"]
    if n == 1:
        return replicate(tree, mesh)
    repl = replicated(mesh)

    def place(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[-1] % n == 0 and shape[-1] // n >= min_shard:
            spec = P(*([None] * (len(shape) - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


# ---------------------------------------------------------------------------
# Multi-host (pod-scale) support — SURVEY.md §2.3 / BASELINE.json [B:11]:
# "pod-scale data-parallel GAN training on v4-32". Same binary on every
# host; jax.distributed wires the coordinator, the mesh spans all
# devices, and each host contributes its process-local batch shard.
# ---------------------------------------------------------------------------

def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-ops (returns False) in single-process runs, so the same train.py
    works on one chip and on a pod. Env vars (JAX_COORDINATOR_ADDRESS /
    standard TPU metadata) are honored when args are None.
    """
    import os

    # Probe WITHOUT touching the backend: jax.process_count() would
    # initialize XLA and make a later distributed.initialize() fail
    # (caught by tests/test_multihost.py's real 2-process run).
    if jax.distributed.is_initialized():
        return True
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_batch_from_local(local_batch, mesh: Mesh):
    """Per-host numpy shard → global device array sharded over 'data'.

    Each process passes its LOCAL rows; the result is the logical global
    batch of size local_rows * process_count, batch-sharded over the
    mesh (jax.make_array_from_process_local_data handles placement).
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )
