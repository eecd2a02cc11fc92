"""GAN + reconstruction losses.

Reference capability (SURVEY.md §2.1 "Losses"): `GANLoss` with
lsgan/vanilla switch + weighted L1 spectrogram loss (lambda_L1).
Pure functions over logits — no modules, no state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def gan_loss(logits, target_is_real: bool, mode: str = "lsgan"):
    """Patch logits → scalar adversarial loss.

    lsgan: MSE to 1/0 targets. vanilla: sigmoid BCE. hinge: SA-GAN hinge
    (D side only; generator hinge = -mean(logits)).

    `logits` may be a list/tuple of per-scale logit maps (the
    MultiScaleDiscriminator output) — the loss is then the mean over
    scales, each scale's patches weighted equally within it.
    """
    if isinstance(logits, (list, tuple)):
        return sum(gan_loss(l, target_is_real, mode)
                   for l in logits) / len(logits)
    if mode == "lsgan":
        tgt = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return jnp.mean((logits - tgt) ** 2)
    if mode == "vanilla":
        tgt = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, tgt))
    if mode == "hinge":
        if target_is_real:
            return jnp.mean(jnp.maximum(1.0 - logits, 0.0))
        return jnp.mean(jnp.maximum(1.0 + logits, 0.0))
    raise ValueError(f"unknown gan mode: {mode}")


def generator_gan_loss(logits, mode: str = "lsgan"):
    """The generator-side adversarial loss for every mode.

    hinge's G loss is -mean(logits) (SA-GAN), NOT the D-side hinge with
    flipped targets — kept here so the loss family lives in one module
    (was special-cased in train/step.py, VERDICT r1 weak #9).
    Accepts per-scale logit lists like gan_loss."""
    if isinstance(logits, (list, tuple)):
        return sum(generator_gan_loss(l, mode)
                   for l in logits) / len(logits)
    if mode == "hinge":
        return -jnp.mean(logits)
    return gan_loss(logits, True, mode)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def masked_l1_loss(pred, target, keep_mask, hole_weight: float = 1.0,
                   context_weight: float = 1.0):
    """L1 with separate weighting of hole vs. observed regions.

    keep_mask broadcasts over (B, F, T, C); 1 = observed, 0 = hole.
    hole_weight > context_weight focuses the loss on the inpainted gap.
    """
    err = jnp.abs(pred - target)
    w = keep_mask * context_weight + (1.0 - keep_mask) * hole_weight
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-8)


def masked_l2_loss(pred, target, keep_mask, hole_weight: float = 1.0,
                   context_weight: float = 1.0):
    """Squared-error twin of masked_l1_loss — the ESTIMATOR lever.

    The eval metric (hole-PSNR, utils/metrics.py::masked_psnr) is MSE in
    the same compressed-magnitude space this loss sees; MSE's Bayes-
    optimal predictor is the posterior MEAN, while L1's is the MEDIAN.
    On a multi-modal hole posterior those differ, so an L1-trained G is
    structurally mis-matched to the metric it is judged by. Swapping
    this term in (lambda_l2 > 0, lambda_l1 -> 0) retrains the SAME
    architecture toward the metric's own optimum — the regression-family
    counterpart of the diffusion refiner's --refine_avg posterior mean.
    """
    err = (pred - target) ** 2
    w = keep_mask * context_weight + (1.0 - keep_mask) * hole_weight
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-8)


def hole_spectral_convergence_loss(pred_mag, target_mag, keep_mask):
    """Spectral convergence restricted to the hole, on LINEAR magnitude.

    ‖(1−m)·(|S_pred| − |S_tgt|)‖_F / ‖(1−m)·|S_tgt|‖_F, mean over batch.

    Why (round-2 VERDICT "next round" #2): the notes-corpus plateau was
    attributed to onset prediction inside the hole. The L1 term runs in
    the COMPRESSED (log-like) domain, which deliberately flattens level
    differences — a missed 0 dB attack and a missed −40 dB tail cost
    about the same. Frobenius error on linear magnitude, normalized by
    the hole's own energy, re-weights the objective toward exactly the
    high-energy structure (attacks/onsets) the compressed L1 is blind
    to, per-clip, scale-invariantly.

    pred_mag/target_mag: (B, bins, T) linear magnitudes; keep_mask
    (B, bins, T) with 1 = observed, 0 = hole.
    """
    hole = 1.0 - keep_mask
    axes = tuple(range(1, pred_mag.ndim))
    num = jnp.sqrt(jnp.sum((hole * (pred_mag - target_mag)) ** 2, axis=axes))
    den = jnp.sqrt(jnp.sum((hole * target_mag) ** 2, axis=axes))
    return jnp.mean(num / jnp.maximum(den, 1e-6))


def feature_matching_loss(feats_fake, feats_real):
    """Per-layer L1 between D's intermediate features on fake vs real.

    The GAN-vocoder staple (MelGAN/HiFi-GAN): instead of only pushing
    the patch logits toward "real", match the discriminator's own
    multi-scale feature statistics of the generated spectrogram to the
    target's. Unlike pixel L1 — which rewards the time-blurred mean —
    D's features encode exactly the local structure D uses to tell
    fakes apart (attack transients, harmonic comb sharpness), so the
    regression target is perceptually re-weighted per-layer. This is
    the objective-family lever the round-3 attribution matrix points
    at (quality_results.jsonl notes_grid_attribution_corrected).

    Real features are stop-gradiented: the term shapes G only; D's own
    objective is untouched (its loss would otherwise collapse feature
    distances instead of classifying).
    """
    tot = 0.0
    for ff, fr in zip(feats_fake, feats_real):
        tot = tot + jnp.mean(jnp.abs(ff - jax.lax.stop_gradient(fr)))
    return tot / max(len(feats_fake), 1)


def phase_cosine_loss(pred_cos, pred_sin, true_re_unit, true_im_unit,
                      keep_mask, weight):
    """Magnitude-weighted cosine phase loss over the HOLE.

    The Vocos/iSTFTNet lesson (PAPERS.md): predict phase with the
    network instead of recovering it by Griffin-Lim iteration. Phase is
    circular, so the loss is 1 − cos(φ_pred − φ_true), computed from
    unit phasors without any angle/atan2: with p = (c_p, s_p)/|·| and
    t = (c_t, s_t) already unit, cos(Δφ) = c_p·c_t + s_p·s_t.

    Weighting: phase is meaningless where there is no energy, so each
    bin is weighted by `weight` (the TRUE linear magnitude) and the
    loss is restricted to the hole (keep_mask 0). The measured
    motivation is the long-gap ceiling (BENCHMARKS.md oracle row):
    GL-class recovery caps waveform SNR at 3.82 dB over 75–150-frame
    gaps even with perfect magnitudes — a direct phase prediction is
    the only lever that can move that ceiling.

    pred_cos/pred_sin: raw head outputs (any magnitude; normalized
    here). true_re_unit/true_im_unit: unit phasors of the target STFT.
    All (B, bins, T); keep_mask/weight broadcastable, 1 = observed.
    """
    inv = jax.lax.rsqrt(pred_cos * pred_cos + pred_sin * pred_sin + 1e-8)
    cosd = (pred_cos * true_re_unit + pred_sin * true_im_unit) * inv
    w = (1.0 - keep_mask) * weight
    return jnp.sum(w * (1.0 - cosd)) / (jnp.sum(w) + 1e-8)


def onset_l1_loss(pred, target, keep_mask, hole_weight: float = 1.0):
    """L1 on the TIME-DERIVATIVE of the (compressed) spectrogram image.

    Spectral flux Δ_t S = S[..., t+1] − S[..., t] is the classic onset
    signal; matching it forces the generator to place attacks at the
    right frames instead of emitting the time-blurred average that bare
    L1 rewards. A frame-pair straddling the hole boundary counts as
    hole (min of the two masks) so the entry/exit transients — the
    audibly critical ones — are always covered.

    pred/target: (B, bins, T, C) compressed images; keep_mask same
    shape (broadcastable), 1 = observed.
    """
    dp = pred[..., 1:, :] - pred[..., :-1, :]
    dt = target[..., 1:, :] - target[..., :-1, :]
    m = jnp.minimum(keep_mask[..., 1:, :], keep_mask[..., :-1, :])
    w = m + (1.0 - m) * hole_weight
    return jnp.sum(jnp.abs(dp - dt) * w) / (jnp.sum(w) + 1e-8)
