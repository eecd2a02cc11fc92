"""Bayes-ceiling analysis utilities (round-4 attribution closer).

The script upper-bounds what ANY magnitude-domain predictor can score
on the notes corpus by Monte-Carlo over generator-posterior re-renders.
These tests pin the hidden-window geometry, the identification
hierarchy (harmonic-ratio dating / fundamental-only onset<->amp family
/ invisible prior redraw), the likelihood-equivalence of the family
(a resampled note must reproduce the audible post-gap evidence), and
the end-to-end smoke at tiny scale.
"""

import importlib.util
import os

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "bayes_ceiling",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "bayes_ceiling.py"),
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def test_hidden_window_geometry():
    """Hole frames [a, b) at hop 128 / n_fft 510: the hidden sample
    window is what no observed frame's +-n_fft/2 window reaches."""
    tmask = np.ones(256, np.float32)
    tmask[100:130] = 0.0
    a, b, H_lo, H_hi = bc.hidden_window(tmask, 128, 510, 16000)
    assert (a, b) == (100, 130)
    assert H_lo == (99 * 128 + 255 + 1) / 16000
    assert H_hi == (130 * 128 - 255 - 1) / 16000
    # Every hidden sample is > n_fft/2 away from every observed frame
    # center (frames 99 and 130 are the nearest observed).
    assert H_lo * 16000 - 99 * 128 > 255
    assert 130 * 128 - H_hi * 16000 > 255


def _one_note(onset, f0=220.0, decay=3.0, amp=0.6):
    return (np.array([onset]), np.array([f0]), np.array([decay]),
            np.array([amp]), np.array([0.0]), 0.0)


def test_identified_note_kept_exactly():
    """>=2 harmonics above the floor at H_hi -> harmonic-ratio dating
    pins the onset: the resample must keep the true parameters."""
    params = _one_note(0.9)
    H_lo, H_hi = 0.85, 1.1
    # tail2 = (0.6/2) e^{-6*0.2} = 0.09 -> tau below that = identified.
    rng = np.random.default_rng(0)
    p2, nid, nfa, ninv = bc.posterior_resample(
        rng, params, H_lo, H_hi, tau=1e-3, onset_prior_hi=1.7)
    assert (nid, nfa, ninv) == (1, 0, 0)
    assert float(p2[0][0]) == 0.9 and float(p2[3][0]) == 0.6


def test_family_resample_preserves_postgap_evidence():
    """Fundamental-only regime (tau between harmonic-2 and fundamental
    tails): the onset<->amp family must (a) actually explore, (b) keep
    amp' in the prior support, (c) reproduce the audible post-gap
    energy envelope - windowed RMS of the FUNDAMENTAL-only rendering
    is phase-blind evidence and must match exactly; the full rendering
    matches up to sub-floor harmonic residue."""
    from viai_tpu.data.synthetic import render_note_events

    sr, n = 16000, 32000
    t = np.arange(n) / sr
    params = _one_note(0.9)
    H_lo, H_hi = 0.85, 1.1
    tau = 0.15        # tail2 = 0.09 < tau < tail1 = 0.329
    rng = np.random.default_rng(0)
    moved = 0
    for _ in range(8):
        p2, nid, nfa, ninv = bc.posterior_resample(
            rng, params, H_lo, H_hi, tau=tau, onset_prior_hi=1.7)
        assert (nid, nfa, ninv) == (0, 1, 0)
        o2, a2, d2 = (float(p2[0][0]), float(p2[3][0]), float(p2[2][0]))
        assert H_lo < o2 < H_hi and 0.2 <= a2 <= 1.0
        moved += abs(o2 - 0.9) > 1e-6
        # Fundamental tail equivalence at H_hi (exact).
        np.testing.assert_allclose(
            a2 * np.exp(-d2 * (H_hi - o2)),
            0.6 * np.exp(-3.0 * (H_hi - 0.9)), rtol=1e-10)
        # Harmonic 2 of the variant stays sub-floor (else it would be
        # distinguishable).
        assert (a2 / 2.0) * np.exp(-2.0 * d2 * (H_hi - o2)) <= tau + 1e-12
        # Phase-blind audible evidence: fundamental-only windowed RMS
        # matches through the whole post-gap region.
        w1 = render_note_events(params, np.zeros(n), t, 1)
        w2 = render_note_events(p2, np.zeros(n), t, 1)
        seg = 2048
        for s in range(int(H_hi * sr), n - seg, 1024):
            r1 = np.sqrt(np.mean(w1[s:s + seg] ** 2))
            r2 = np.sqrt(np.mean(w2[s:s + seg] ** 2))
            np.testing.assert_allclose(r2, r1, rtol=0.02, atol=1e-6)
    assert moved >= 1      # the degeneracy family is actually explored


def test_invisible_resample_stays_invisible():
    rng = np.random.default_rng(3)
    onset = np.array([0.9, 0.5])
    params = (onset, np.array([220.0, 330.0]), np.array([8.0, 2.0]),
              np.array([0.9, 0.8]), np.zeros(2), 0.0)
    H_lo, H_hi = 0.85, 1.3
    # note 0 fundamental tail: 0.9 e^{-8*0.4} ~ 0.037 < tau=0.05 ->
    # invisible -> prior redraw conditioned on staying sub-floor.
    p2, nid, nfa, ninv = bc.posterior_resample(
        rng, params, H_lo, H_hi, tau=0.05, onset_prior_hi=1.7)
    assert (nid, nfa, ninv) == (0, 0, 1)
    o2, d2, a2 = float(p2[0][0]), float(p2[2][0]), float(p2[3][0])
    assert H_lo < o2 < H_hi
    assert a2 * np.exp(-d2 * (H_hi - o2)) < 0.05
    # the out-of-H note is untouched
    assert float(p2[0][1]) == 0.5 and float(p2[3][1]) == 0.8


def test_run_smoke_tiny():
    rec = bc.run(n_clips=2, n_variants=4, seed=5)
    assert np.isfinite(rec["ceiling_hole_psnr_mean"])
    assert 15.0 < rec["ceiling_hole_psnr_mean"] < 90.0
    assert np.isfinite(rec["sample_hole_psnr_mean"])


def test_run_notes_grid_keeps_all_params():
    """Deterministic twin: the posterior keeps every note (identified
    only; no family/invisible draws) and only resamples in-gap noise."""
    rec = bc.run(n_clips=2, n_variants=4, seed=5, style="notes_grid")
    assert rec["dataset_mode"] == "synthetic_notes_grid"
    assert rec["family_hidden_notes_per_clip"] == 0.0
    assert rec["invisible_hidden_notes_per_clip"] == 0.0
    assert np.isfinite(rec["ceiling_hole_psnr_mean"])
