"""Multi-host: single-process degenerate cases + a REAL 2-process run.

VERDICT.md round-1 missing #7: jax.distributed.initialize and
global_batch_from_local with process_count > 1 were never executed.
The 2-process test below launches two CPU subprocesses (2 virtual
devices each), wires them with gloo collectives into one 4-device
mesh, runs one GAN train step on the globally-assembled batch, and
checks both processes agree with each other and with a single-process
run of identical math.
"""

import json
import os
import socket
import subprocess
import sys

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


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    """Two real processes → one mesh → one GAN step → identical state."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mh_worker.py")
    out = str(tmp_path / "mh")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), out],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    res = [json.load(open(f"{out}.{pid}")) for pid in range(2)]
    assert res[0]["process_count"] == 2
    # Both processes hold the SAME post-step replicated state.
    np.testing.assert_allclose(res[0]["g_sums"], res[1]["g_sums"],
                               rtol=1e-6)
    for k in res[0]["metrics"]:
        np.testing.assert_allclose(res[0]["metrics"][k],
                                   res[1]["metrics"][k], rtol=1e-6)

    # And the distributed step matches identical single-process math
    # (4-device mesh, same global batch, same key, SGD — see the
    # worker's note on Adam amplifying psum-ordering noise). fp32
    # reduction order still differs between gloo and in-process psum,
    # hence tolerance rather than equality.
    import jax
    import optax

    from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
    from viai_tpu.train import init_state, make_train_step, replicate

    G, D, V = tiny_models()
    g_tx = optax.with_extra_args_support(optax.sgd(2e-2))
    d_tx = optax.with_extra_args_support(optax.sgd(2e-2))
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    mesh = make_mesh(4)
    state = replicate(state, mesh)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    from viai_tpu.train.mesh import shard_batch

    wav = shard_batch({"wav": tone_batch(4, seed=7)}, mesh)["wav"]
    state, metrics = step(state, wav, None, jax.random.key(0))
    ref_sums = [float(np.asarray(x).sum())
                for x in jax.tree.leaves(state["g"])]
    np.testing.assert_allclose(res[0]["g_sums"], ref_sums,
                               rtol=2e-4, atol=1e-5)
