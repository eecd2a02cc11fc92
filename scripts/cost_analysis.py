#!/usr/bin/env python
"""Analytic cost report for the main compiled programs.

Uses XLA's compile-time cost model (flops / bytes accessed) so perf
work has a roofline to compare measurements against; runs on the CPU
backend (the cost model is platform-agnostic enough for attribution).

Usage: python scripts/cost_analysis.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def report(name, lowered):
    try:
        cost = lowered.compile().cost_analysis()
    except Exception as e:  # cost model availability varies by backend
        print(f"{name}: cost analysis unavailable ({e})")
        return
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    print(json.dumps({
        "program": name,
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_ / 1e9, 3),
        "arithmetic_intensity": round(flops / max(bytes_, 1), 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from viai_tpu.nn import define_D, define_G
    from viai_tpu.train import TrainConfig, adam, init_state, \
        make_infer_fn, make_train_step
    from viai_tpu.train.step import _g_input, preprocess

    cfg = TrainConfig()
    wav = jnp.zeros((args.batch, 32000), jnp.float32)
    key = jax.random.key(0)

    G = define_G(dtype="bfloat16")
    g_def, g_state = nnx.split(G)

    def g_fwd(g_state, wav):
        return nnx.merge(g_def, g_state)(_g_input(preprocess(wav, key, cfg)))

    report("G forward + preprocess",
           jax.jit(g_fwd).lower(g_state, wav))

    infer = make_infer_fn(g_def, None, cfg, n_gl_iter=32)
    v = nnx.State({})
    report("full inference chain (G + GL32, XLA GL)",
           jax.jit(lambda g, w: infer(g, v, w, key)).lower(g_state, wav))

    D = define_D(input_nc=3, dtype="bfloat16")
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def2, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx, cfg)
    step = make_train_step(g_def2, d_def, v_def, g_tx, d_tx, cfg)
    tb = min(args.batch, 32)
    report(f"train step (batch {tb})",
           jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                   else step).lower(
               state, jnp.zeros((tb, 32000), jnp.float32), None, key))


if __name__ == "__main__":
    main()
