#!/usr/bin/env python
"""One-compile-per-run TPU micro-benchmarks (axon tunnel friendly).

Usage: python scripts/tpu_probe.py <experiment> [args...]
Each experiment compiles exactly one program, runs it chained (output
feeds input) to amortize the ~260 ms relay RTT, fetches once, and
appends a JSON line to scripts/tpu_results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "tpu_results.jsonl")


def log(rec):
    rec["t"] = time.time()
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def chain_timed(fn, x, n, batch):
    import jax

    y = fn(x)
    np.asarray(y)  # compile + first exec + fetch
    t0 = time.perf_counter()
    w = x
    for _ in range(n):
        w = fn(w)
    np.asarray(w)
    dt = time.perf_counter() - t0
    return batch * n / dt, dt / n * 1000.0


def main():
    exp = sys.argv[1]
    from viai_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    wav = jnp.asarray(
        rng.standard_normal((batch, 32000)).astype(np.float32) * 0.1
    )

    if exp.startswith("gl_"):
        # gl_<precision>[_pallas]: Griffin-Lim 32 iters alone.
        from viai_tpu.signal import STFTConfig, griffin_lim, stft_magnitude
        from viai_tpu.signal.pallas_gl import griffin_lim_pallas

        parts = exp.split("_")
        prec = parts[1]
        use_pallas = len(parts) > 2 and parts[2] == "pallas"
        cfg = STFTConfig(precision=prec)

        import jax.numpy as _jnp

        mm_dt = _jnp.bfloat16 if "bf16mm" in parts else _jnp.float32
        ola = ("fused" if "fused" in parts
               else "split" if "split" in parts else "chain")
        fola = "matmul" if "fout" in parts else "auto"
        n_iter = 32
        for p in parts:                     # e.g. gl_f32_pallas_fused_it64
            if p.startswith("it") and p[2:].isdigit():
                n_iter = int(p[2:])

        def gl_chain(w):
            mag = stft_magnitude(w, cfg)
            if use_pallas:
                return griffin_lim_pallas(mag, cfg, n_iter=n_iter,
                                          length=32000,
                                          matmul_dtype=mm_dt, ola_mode=ola,
                                          final_ola=fola)
            return griffin_lim(mag, cfg, n_iter=n_iter, length=32000)

        f = jax.jit(gl_chain)
        cps, ms = chain_timed(f, wav, 20, batch)
        log({"exp": exp, "batch": batch, "clips_per_s": round(cps, 1),
             "ms_per_call": round(ms, 2)})

    elif exp.startswith("g_fwd"):
        # g_fwd_<dtype>: generator forward + preprocess alone.
        from flax import nnx

        from viai_tpu.nn import define_G
        from viai_tpu.signal import istft
        from viai_tpu.train import TrainConfig
        from viai_tpu.train.step import _g_input, preprocess

        parts = exp.split("_")
        dtype = parts[2]
        upsample = "resize" if "resize" in parts else "deconv"
        norm = "none" if "nonorm" in parts else "instance"
        cfg = TrainConfig()
        G = define_G(dtype=dtype, upsample=upsample, norm=norm)
        g_def, g_state = nnx.split(G)
        key = jax.random.key(0)

        def fwd(w):
            b = preprocess(w, key, cfg)
            out = nnx.merge(g_def, g_state)(_g_input(b))
            # keep chainable: collapse back to (B, 32000) cheaply
            return jnp.repeat(out[:, 0, :125, 0], 256, axis=-1)

        f = jax.jit(fwd)
        cps, ms = chain_timed(f, wav, 20, batch)
        log({"exp": exp, "batch": batch, "clips_per_s": round(cps, 1),
             "ms_per_call": round(ms, 2)})

    elif exp.startswith("full_"):
        # full_<gdtype>_<glprec>[_pallas][_b<batch>]
        import dataclasses

        from flax import nnx

        from viai_tpu.nn import define_G
        from viai_tpu.signal import STFTConfig
        from viai_tpu.train import TrainConfig, make_infer_fn

        parts = exp.split("_")
        gdtype, glprec = parts[1], parts[2]
        use_pallas = "pallas" in parts
        cfg = TrainConfig(stft=STFTConfig(precision=glprec))
        if use_pallas:
            cfg = dataclasses.replace(cfg, gl_backend="pallas")
        G = define_G(dtype=gdtype)
        g_def, g_state = nnx.split(G)
        infer = make_infer_fn(g_def, None, cfg, n_gl_iter=32)
        key = jax.random.key(0)
        v = nnx.State({})

        def fwd(w):
            return infer(g_state, v, w, key)

        cps, ms = chain_timed(fwd, wav, 20, batch)
        log({"exp": exp, "batch": batch, "clips_per_s": round(cps, 1),
             "ms_per_call": round(ms, 2)})

    elif exp == "serving":
        # End-to-end InpaintService: bucketed batched inpaint through
        # the PRODUCT surface (pad-to-bucket, mask build, host round
        # trip each call — the realistic serving number, unlike the
        # chained device-only probes above).
        import dataclasses

        from flax import nnx

        from viai_tpu.nn import define_G
        from viai_tpu.serving import InpaintService
        from viai_tpu.train import TrainConfig

        cfg = dataclasses.replace(TrainConfig(), gl_backend="pallas")
        G = define_G(dtype="bfloat16")
        g_def, g_state = nnx.split(G)
        svc = InpaintService(g_def, g_state, cfg, buckets=(8, 32, batch))
        wavs = np.asarray(wav)
        out = svc.inpaint(wavs, gap_start_s=0.8, gap_end_s=1.2)  # warmup
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = svc.inpaint(wavs, gap_start_s=0.8, gap_end_s=1.2)
        dt = time.perf_counter() - t0
        log({"exp": exp, "batch": batch,
             "clips_per_s": round(batch * n / dt, 1),
             "ms_per_call": round(dt / n * 1000, 2),
             "note": "includes host<->device transfer each call"})

    elif exp == "train_av":
        # Full AV GAN train step: G+D+V, frames resident on device.
        from flax import nnx

        from viai_tpu.nn import define_D, define_G, define_V
        from viai_tpu.train import TrainConfig, adam, init_state, \
            make_train_step
        import dataclasses

        cfg = dataclasses.replace(TrainConfig(), use_video=True)
        G = define_G(dtype="bfloat16", fusion_channels=128)
        D = define_D(input_nc=3, dtype="bfloat16")
        V = define_V(128, 16, dtype="bfloat16")
        g_tx, d_tx = adam(2e-4), adam(2e-4)
        (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx, cfg)
        step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
        frames = jnp.asarray(rng.standard_normal(
            (batch, 16, 64, 64, 3)).astype(np.float32))
        key = jax.random.key(0)
        state, m = step(state, wav, frames, key)
        np.asarray(m["loss_G"])
        t0 = time.perf_counter()
        n = 30
        for i in range(n):
            state, m = step(state, wav, frames,
                            jax.random.fold_in(key, i))
        np.asarray(m["loss_G"])
        dt = time.perf_counter() - t0
        log({"exp": exp, "batch": batch,
             "steps_per_s": round(n / dt, 3),
             "clips_per_s": round(batch * n / dt, 1),
             "ms_per_step": round(dt / n * 1000, 2)})

    elif exp.startswith("train_"):
        # train_<dtype>[_seq]: full GAN train step (G 29M + D 2.8M).
        from flax import nnx

        from viai_tpu.nn import define_D, define_G
        from viai_tpu.train import TrainConfig, adam, init_state, \
            make_train_step
        import dataclasses

        parts = exp.split("_")
        dtype = parts[1]
        order = "sequential" if "seq" in parts else "simultaneous"
        cfg = dataclasses.replace(TrainConfig(), update_order=order,
                                  remat="remat" in parts)
        G = define_G(dtype=dtype)
        D = define_D(input_nc=3, dtype=dtype)
        g_tx, d_tx = adam(2e-4), adam(2e-4)
        (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx,
                                                  cfg)
        step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
        key = jax.random.key(0)
        state, m = step(state, wav, None, key)
        np.asarray(m["loss_G"])  # force
        t0 = time.perf_counter()
        n = 30
        for i in range(n):
            state, m = step(state, wav, None, jax.random.fold_in(key, i))
        np.asarray(m["loss_G"])
        dt = time.perf_counter() - t0
        log({"exp": exp, "batch": batch,
             "steps_per_s": round(n / dt, 3),
             "clips_per_s": round(batch * n / dt, 1),
             "ms_per_step": round(dt / n * 1000, 2)})

    else:
        raise SystemExit(f"unknown experiment {exp}")


if __name__ == "__main__":
    main()
