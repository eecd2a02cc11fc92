"""Pre-GL magnitude sharpening (round-2 VERDICT "what's weak" #2).

The long-gap conditioner: G's predicted magnitudes inside 75–150-frame
holes are over-smooth, and GL spreads phase energy across the smear.
`sharpen_mag` raises each frame to gamma then renormalizes its L2
energy. These tests pin:
  * gamma=1 identity, per-frame energy preservation, contrast growth
  * zero-frame safety (no NaN from the 0-energy renorm)
  * the infer chain applies it to the HOLE only (observed region and
    composite mask semantics unchanged)
"""

import jax.numpy as jnp
import numpy as np

from viai_tpu.signal import sharpen_mag
from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train import adam, init_state, make_infer_fn


def _mag(batch=2, bins=16, frames=12, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.0, 2.0, (batch, bins, frames))
                       .astype(np.float32))


def test_gamma_one_is_identity():
    m = _mag()
    assert sharpen_mag(m, 1.0) is m


def test_energy_preserved_per_frame():
    m = _mag(seed=3)
    out = sharpen_mag(m, 2.0, axis=-2)
    e_in = np.sum(np.square(np.asarray(m)), axis=-2)
    e_out = np.sum(np.square(np.asarray(out)), axis=-2)
    np.testing.assert_allclose(e_out, e_in, rtol=1e-5)


def test_contrast_increases():
    m = _mag(seed=4)
    out = np.asarray(sharpen_mag(m, 2.0, axis=-2))
    # Peak-to-mean ratio per frame must grow for gamma > 1.
    pm_in = np.max(np.asarray(m), axis=-2) / np.mean(np.asarray(m), axis=-2)
    pm_out = np.max(out, axis=-2) / (np.mean(out, axis=-2) + 1e-12)
    assert np.all(pm_out > pm_in)


def test_zero_frame_is_safe():
    m = np.array(_mag())
    m[:, :, 0] = 0.0
    out = np.asarray(sharpen_mag(jnp.asarray(m), 1.5, axis=-2))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[:, :, 0], 0.0, atol=1e-12)


def test_infer_chain_sharpen_touches_hole_only():
    """mag_sharpen changes the hole region; the phase-aware observed
    region stays pinned to the verbatim complex STFT."""
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    wav = jnp.asarray(tone_batch(2, seed=7))
    hole = (20, 36)
    tmask = (jnp.ones((2, TINY_CFG.image_frames))
             .at[:, hole[0]:hole[1]].set(0.0))

    outs = {}
    for gamma in (1.0, 2.0):
        infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=4,
                              external_mask=True, mag_sharpen=gamma)
        outs[gamma] = np.asarray(infer(state["g"], state["v"], wav, tmask))

    # Sharpening must actually change the output somewhere...
    assert not np.allclose(outs[1.0], outs[2.0], atol=1e-6)
    # ...but the early observed region (no hole-window overlap) is a
    # function of the verbatim observed STFT only, hence unchanged.
    pad = TINY_CFG.stft.n_fft // 2
    first_hole = hole[0] * TINY_CFG.stft.hop_length - pad
    safe = max(first_hole - TINY_CFG.stft.n_fft, 0)
    assert safe > 64, "test geometry: need a non-trivial observed span"
    np.testing.assert_allclose(outs[1.0][:, :safe], outs[2.0][:, :safe],
                               atol=1e-5, rtol=1e-4)
