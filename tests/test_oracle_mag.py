"""--oracle_mag: the pipeline-ceiling attribution mode.

With the ground-truth magnitude substituted in the hole, the only
remaining error sources are the compress/decompress image round-trip
and phase recovery — so on a stationary tone with phase-vocoder init,
the hole must reconstruct far better than an untrained G's prediction,
and the flag must leave the observed region untouched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train import adam, init_state, make_infer_fn


def _hole_slice(hole, cfg, n):
    hop, n_fft = cfg.stft.hop_length, cfg.stft.n_fft
    pad = n_fft // 2
    lo = max(0, hole[0] * hop - pad)
    hi = min(n, (hole[1] - 1) * hop - pad + n_fft)
    return slice(lo, hi)


def test_oracle_mag_hole_far_above_untrained_g():
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    wav = jnp.asarray(tone_batch(2, seed=3))
    hole = (20, 32)
    tmask = jnp.ones(
        (2, TINY_CFG.image_frames)
    ).at[:, hole[0]:hole[1]].set(0.0)

    outs = {}
    for oracle in (False, True):
        infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=8,
                              external_mask=True, oracle_mag=oracle)
        outs[oracle] = np.asarray(
            infer(state["g"], state["v"], wav, tmask)
        )

    x = np.asarray(wav)
    sl = _hole_slice(hole, TINY_CFG, x.shape[-1])
    ref = x[:, sl]

    def hole_err(o):
        return np.linalg.norm(o[:, sl] - ref) / np.linalg.norm(ref)

    e_model = hole_err(outs[False])   # untrained G: garbage magnitudes
    e_oracle = hole_err(outs[True])   # true magnitudes, recovered phase
    assert e_oracle < e_model / 3.0, (e_oracle, e_model)
    assert e_oracle < 0.35, e_oracle  # tone: phase extrapolation locks on


def test_oracle_mag_observed_region_unchanged():
    """The flag only swaps the HOLE magnitude — observed frames come
    from the composite either way, so outputs agree outside the hole."""
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    wav = jnp.asarray(tone_batch(1, seed=5))
    hole = (22, 30)
    tmask = jnp.ones(
        (1, TINY_CFG.image_frames)
    ).at[:, hole[0]:hole[1]].set(0.0)

    outs = {}
    for oracle in (False, True):
        infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=4,
                              external_mask=True, oracle_mag=oracle)
        outs[oracle] = np.asarray(
            infer(state["g"], state["v"], wav, tmask)
        )
    n = outs[True].shape[-1]
    sl = _hole_slice(hole, TINY_CFG, n)
    obs = np.ones(n, bool)
    obs[sl] = False
    # Phase-aware GL keeps observed complex bins verbatim; hole-frame
    # differences leak into observed samples only through OLA overlap at
    # the boundary, already excluded by the window-width margin in sl.
    np.testing.assert_allclose(outs[True][:, obs], outs[False][:, obs],
                               atol=5e-4)
