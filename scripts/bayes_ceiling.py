"""Monte-Carlo Bayes ceiling for hole-PSNR on the 'notes' corpus.

THE question left open by the round-3 attribution matrix: the
--oracle_mag eval put a 58.5 dB "ceiling" on notes hole-PSNR vs the
38.8-39.6 achieved, and the ~20 dB gap was attributed to the objective
family. But the oracle KNOWS the realized in-gap notes — content that
the corpus generator draws AT RANDOM, independent of the observable
context. The achievable ceiling for ANY predictor is the posterior-mean
score under the true generative posterior, which this script computes
by Monte-Carlo, exploiting that we own the generator
(viai_tpu/data/synthetic.py::_draw_notes / render_note_events):

For each clip + eval-protocol hole (MaskConfig 25-50 frames @ hop 128):
  1. The truly-hidden sample window H is what no observed STFT frame's
     n_fft window sees: [(a-1)*hop + n_fft/2, b*hop - n_fft/2) for hole
     frames [a, b).
  2. Notes with onset outside H are (at least partly) observed: the
     posterior pins them; keep the true parameters.
  3. Notes with onset inside H sit in an identification hierarchy set
     by the renderer's physics (harmonic h carries envelope
     (amp/h) e^{-h*decay*(t-onset)}, so harmonic RATIOS at the gap's
     end date the note): >=2 harmonics above the clip's noise floor at
     H's end -> onset pinned exactly (keep true parameters); only the
     fundamental above the floor -> the one-parameter onset<->amp
     family amp' = amp*e^{-decay*(onset'-onset)} reproduces the
     identical audible tail (sampled uniformly where amp' stays in the
     prior's [0.2, 1.0] support and harmonic 2 stays sub-floor).
  4. Notes with no harmonic above the floor by H's end are
     unidentifiable: resample (onset, pitch, decay, amp, inharm) from
     the prior conditioned on onset-in-H and invisibility-at-H-end
     (the clip's chord-root lattice rides along - it is identified by
     the observed notes).
  5. The in-H slice of the per-clip noise stream (attack bursts +
     noise floor) is resampled.
Average M such posterior re-renders in COMPRESSED-MAGNITUDE space (the
metric's own space) -> the posterior-mean predictor; its masked_psnr
against the true image, averaged over clips, is the Bayes ceiling.

Every approximation is chosen to bias the ceiling UP (count of hidden
notes known, root known, f0/decay of visible notes exactly known, true
normalization scale reused), so the reported number upper-bounds what
any magnitude-domain predictor - regression, GAN, or diffusion
posterior mean - can score on this corpus under this eval protocol.
Also reported: the mean single-posterior-sample score (what a PERFECT
generative sampler would score, the refiner-family bound) and the
oracle-composited variant (GL tax) context.

CPU-only by construction (runs while the TPU queues train).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def hidden_window(tmask: np.ndarray, hop: int, n_fft: int, sr: int):
    """Hole frames [a, b) -> (H_lo, H_hi) seconds of truly-hidden samples."""
    hole = np.where(tmask < 0.5)[0]
    a, b = int(hole.min()), int(hole.max()) + 1
    lo_s = (a - 1) * hop + n_fft // 2 + 1
    hi_s = b * hop - n_fft // 2 - 1
    return a, b, lo_s / sr, hi_s / sr


def posterior_resample(rng, params, H_lo, H_hi, tau, onset_prior_hi):
    """One posterior-equivalent parameter set given phase-blind context.

    Identification hierarchy for an in-H-onset note (the renderer gives
    harmonic h the envelope (amp/h) e^{-h*decay*(t-onset)}, so harmonic
    RATIOS at the gap's end date the note):
      - >=2 harmonics above the floor at H_hi: the decay-ratio evidence
        pins onset exactly -> keep the true parameters (identified).
      - only the fundamental above the floor: one-parameter
        onset<->amp degeneracy family amp' = amp e^{-d (o'-o)} (the
        identical fundamental tail), constrained to amp' in the prior's
        [0.2, 1] support and to harmonic-2 STAYING below the floor.
      - nothing above the floor: unidentifiable -> prior draw
        conditioned on invisibility.
    Returns (params', n_identified, n_family, n_invisible).
    """
    onset, f0, decay, amp, inharm, namp = (x.copy() if hasattr(x, "copy")
                                           else x for x in params)
    from viai_tpu.data.synthetic import _INTERVALS

    hidden = (onset > H_lo) & (onset < H_hi) & (amp > 0)
    dt = np.maximum(H_hi - onset, 0.0)
    tail1 = amp * np.exp(-decay * dt)                 # fundamental @ H_hi
    tail2 = (amp / 2.0) * np.exp(-2.0 * decay * dt)   # 2nd harmonic @ H_hi
    ident = hidden & (tail2 > tau)
    fam = hidden & ~ident & (tail1 > tau)
    invis = hidden & ~ident & ~fam

    for j in np.where(fam)[0]:
        # Fundamental-tail equivalence: amp' e^{-d(t-o')} == the true
        # tail for t past both onsets => amp' = amp e^{-d (o'-o)} (a
        # later onset has decayed less by any t, so it starts quieter).
        # amp' decreases in o': o' >= o + ln(amp)/d keeps amp' <= 1,
        # o' <= o + ln(amp/0.2)/d keeps amp' >= 0.2. Harmonic 2 of the
        # resample, (amp'/2) e^{-2d(H_hi-o')}, must also stay below the
        # floor (else the variant would be distinguishable):
        # substituting the family, it equals tail1[j]*amp'/(2*amp[j]) *
        # ... monotone in o', so enforce by rejection.
        lo = max(H_lo, onset[j] + np.log(amp[j]) / decay[j])
        hi = min(H_hi - 0.005, onset[j] + np.log(amp[j] / 0.2) / decay[j])
        if hi > lo:
            for _ in range(50):
                o2 = rng.uniform(lo, hi)
                a2 = amp[j] * np.exp(-decay[j] * (o2 - onset[j]))
                if (a2 / 2.0) * np.exp(
                        -2.0 * decay[j] * (H_hi - o2)) <= tau:
                    amp[j], onset[j] = a2, o2
                    break

    root = None
    if invis.any():
        # The chord root's lattice is identified by the non-hidden
        # notes (just-intonation intervals x octaves); any anchor in
        # the right octave band works since invisible-note pitch is a
        # fresh interval x octave draw around it anyway.
        known = (amp > 0) & ~invis
        root = (np.min(f0[known]) / 2.0 if known.any() else
                float(rng.uniform(110.0, 440.0)))
    for j in np.where(invis)[0]:
        ok = False
        o_hi = min(H_hi, onset_prior_hi)
        for _ in range(300):
            o2 = rng.uniform(H_lo, o_hi)
            d2 = rng.uniform(1.5, 8.0)
            a2 = rng.uniform(0.2, 1.0)
            if a2 * np.exp(-d2 * (H_hi - o2)) < tau:
                ok = True
                break
        if not ok:     # corner: force a maximally-decayed inaudible draw
            o2, d2, a2 = H_lo, 8.0, 0.2
        onset[j], decay[j], amp[j] = o2, d2, a2
        f0[j] = root * _INTERVALS[rng.integers(0, len(_INTERVALS))] * (
            2.0 ** rng.integers(-1, 2))
        inharm[j] = rng.uniform(0.0, 1e-3)
    return ((onset, f0, decay, amp, inharm, namp), int(ident.sum()),
            int(fam.sum()), int(invis.sum()))


def run(n_clips: int, n_variants: int, seed: int, style: str = "notes"):
    import jax

    from viai_tpu.data.synthetic import (SyntheticConfig, _draw_notes,
                                         _draw_notes_grid,
                                         render_note_events)
    from viai_tpu.signal import stft_magnitude
    from viai_tpu.signal.mask import MaskConfig, sample_time_mask
    from viai_tpu.signal.mel import compress
    from viai_tpu.signal.stft import STFTConfig
    from viai_tpu.utils.metrics import masked_psnr

    scfg = SyntheticConfig(style=style)
    stft = STFTConfig()                 # n_fft 510, hop 128 (eval default)
    mcfg = MaskConfig()                 # 25-50 frames, random position
    sr, n = scfg.sample_rate, scfg.clip_samples
    t = np.arange(n) / sr
    n_frames = stft.num_frames(n)
    image_frames = 256
    onset_prior_hi = 0.85 * scfg.clip_seconds
    kmask = jax.random.key(seed)

    def mag_img(wavs):                  # (B, n) -> (B, bins, frames, 1)
        m = stft_magnitude(np.stack(wavs).astype(np.float32), stft)
        return np.asarray(compress(np.swapaxes(np.asarray(m), -1, -2)))[
            ..., None]

    ceil_psnr, samp_psnr = [], []
    n_ident_tot, n_fam_tot, n_invis_tot = 0, 0, 0
    draw = _draw_notes_grid if style == "notes_grid" else _draw_notes
    for i in range(n_clips):
        rng = np.random.default_rng(seed * 100003 + i)
        params = draw(rng, scfg)
        noise = rng.standard_normal(n)
        raw = render_note_events(params, noise, t, scfg.n_harmonics)
        scale = 0.5 / max(np.abs(raw).max(), 1e-6)
        wav_true = (raw * scale).astype(np.float32)

        kmask, ki = jax.random.split(kmask)
        tmask = np.array(sample_time_mask(ki, image_frames, mcfg))
        tmask[n_frames:] = 1.0          # pad region is observed
        a, b, H_lo, H_hi = hidden_window(tmask, stft.hop_length,
                                         stft.n_fft, sr)
        tau = max(params[5], 1e-3)      # clip noise floor
        lo_s, hi_s = int(H_lo * sr) + 1, int(H_hi * sr)

        vrng = np.random.default_rng(seed * 7919 + 31 * i + 7)
        variants = []
        for m in range(n_variants):
            if style == "notes_grid":
                # The deterministic twin: every in-H note is the
                # continuation of the observed beat grid/arpeggio, so
                # the posterior keeps ALL parameters and only the
                # in-gap noise (attack bursts + floor) is random -> the
                # ceiling isolates the pure burst-noise cost, a method
                # validation + the irreducible-noise term of 'notes'.
                p2 = params
                nid = int(((params[0] > H_lo) & (params[0] < H_hi)
                           & (params[3] > 0)).sum())
                nfa = ninv = 0
            else:
                p2, nid, nfa, ninv = posterior_resample(
                    vrng, params, H_lo, H_hi, tau, onset_prior_hi)
            if m == 0:
                n_ident_tot += nid
                n_fam_tot += nfa
                n_invis_tot += ninv
            noise2 = noise.copy()
            noise2[lo_s:hi_s] = vrng.standard_normal(max(hi_s - lo_s, 0))
            variants.append(render_note_events(
                p2, noise2, t, scfg.n_harmonics) * scale)

        imgs = mag_img([wav_true] + variants)       # (1+M, bins, F, 1)
        true_img, var_imgs = imgs[:1], imgs[1:]
        mask_img = np.broadcast_to(
            tmask[None, None, :n_frames, None],
            true_img.shape).astype(np.float32)
        post_mean = var_imgs.mean(axis=0, keepdims=True)
        ceil_psnr.append(float(masked_psnr(post_mean, true_img, mask_img)[0]))
        samp = masked_psnr(var_imgs, np.repeat(true_img, n_variants, 0),
                           np.repeat(mask_img, n_variants, 0))
        samp_psnr.append(float(np.mean(np.asarray(samp))))
        if (i + 1) % 8 == 0:
            print(f"clip {i+1}/{n_clips}: ceiling so far "
                  f"{np.mean(ceil_psnr):.2f} dB "
                  f"(sample {np.mean(samp_psnr):.2f})", flush=True)

    return {
        "exp": "bayes_ceiling",
        "dataset_mode": f"synthetic_{style}",
        "n_clips": n_clips,
        "n_variants": n_variants,
        "seed": seed,
        "ceiling_hole_psnr_mean": round(float(np.mean(ceil_psnr)), 3),
        "ceiling_hole_psnr_sem": round(
            float(np.std(ceil_psnr) / np.sqrt(len(ceil_psnr))), 3),
        "sample_hole_psnr_mean": round(float(np.mean(samp_psnr)), 3),
        "identified_hidden_notes_per_clip": round(n_ident_tot / n_clips, 2),
        "family_hidden_notes_per_clip": round(n_fam_tot / n_clips, 2),
        "invisible_hidden_notes_per_clip": round(n_invis_tot / n_clips, 2),
        "note": ("posterior-MEAN upper bound for ANY magnitude-domain "
                 "predictor under the eval protocol; 'sample' = what a "
                 "perfect posterior SAMPLER scores (refiner-family "
                 "bound). Optimistic approximations throughout "
                 "(identified notes keep exact true parameters, known "
                 "hidden-note count/root, noiseless harmonic-ratio "
                 "dating) - the true ceiling is lower."),
        "t": time.time(),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=64)
    ap.add_argument("--variants", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--style", choices=["notes", "notes_grid"],
                    default="notes",
                    help="notes_grid = the deterministic twin: only "
                         "in-gap noise is random, so the ceiling "
                         "isolates the irreducible attack-burst cost")
    ap.add_argument("--log_results", action="store_true",
                    help="append to scripts/quality_results.jsonl")
    args = ap.parse_args()
    rec = run(args.clips, args.variants, args.seed, style=args.style)
    print(json.dumps(rec))
    if args.log_results:
        path = os.path.join(os.path.dirname(__file__),
                            "quality_results.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
