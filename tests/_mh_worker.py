"""Subprocess worker for the 2-process distributed test (NOT a test).

Launched twice by tests/test_multihost.py. Each process owns 2 virtual
CPU devices; jax.distributed + gloo collectives wire them into one
4-device mesh. Runs ONE GAN train step on the global batch assembled
via global_batch_from_local and dumps G-param leaf sums + metrics.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outfile = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from viai_tpu.train.mesh import maybe_initialize_distributed  # noqa: E402

assert maybe_initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc

import numpy as np  # noqa: E402

from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch  # noqa: E402
from viai_tpu.train import (  # noqa: E402
    global_batch_from_local,
    init_state,
    make_mesh,
    make_train_step,
    replicate,
)

import optax  # noqa: E402

G, D, V = tiny_models()
# SGD isolation (as in tests/test_sharding.py): Adam's rsqrt
# normalization amplifies fp32 psum-ordering noise into full update-
# sized differences, so exact DP==single-process equality is only
# checkable with a linear optimizer. with_extra_args_support because
# the train step always passes value= (plateau support).
g_tx = optax.with_extra_args_support(optax.sgd(2e-2))
d_tx = optax.with_extra_args_support(optax.sgd(2e-2))
(g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
mesh = make_mesh()                      # all 4 global devices
state = replicate(state, mesh)
step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)

wav_global = tone_batch(4, seed=7)      # deterministic on every process
local = wav_global[pid * 2 : (pid + 1) * 2]
garr = global_batch_from_local({"wav": local}, mesh)["wav"]
assert garr.shape == (4, wav_global.shape[1])

state, metrics = step(state, garr, None, jax.random.key(0))


def _host(x):
    return np.asarray(x.addressable_data(0) if hasattr(x, "addressable_data")
                      else x)


g_sums = [float(_host(leaf).sum()) for leaf in jax.tree.leaves(state["g"])]
with open(f"{outfile}.{pid}", "w") as f:
    json.dump({
        "metrics": {k: float(_host(v)) for k, v in metrics.items()},
        "g_sums": g_sums,
        "process_count": jax.process_count(),
    }, f)
print(f"worker {pid} done", flush=True)
