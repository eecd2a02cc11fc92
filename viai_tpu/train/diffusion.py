"""Diffusion objective + DDIM refinement for hole magnitudes.

This is the round-3 answer to the measured notes-corpus limiter
(DESIGN.md addendum: the L1+GAN objective family caps onset-dense
hole-PSNR at ≈38–39 dB with a 58.5 dB oracle ceiling; every other
lever was individually refuted). A conditional diffusion model over
the SAME compressed magnitude image gives the hole a generative
objective; at serving time it runs as an SDEdit-style truncated
refinement of the regression G's output (few DDIM steps), or as a
full generative inpainter (t_start = 1).

Parameterization: continuous-time cosine ᾱ schedule, v-prediction
(Salimans & Ho 2022) — bounded targets at both schedule ends, so the
few-step DDIM sampler evaluates the network in the regime it trained
on. All of training and sampling runs as ONE jit'd program; the DDIM
loop is a `lax.scan` over precomputed (t, u) pairs — static step
count, no host round-trips (XLA semantics: no data-dependent Python
control flow).

Extension beyond the reference (SURVEY.md §2.1 "Losses" trains L1+GAN
only); off by default everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from ..signal.mel import complex_compress, complex_decompress
from ..signal.stft import istft, stft
from .step import TrainConfig, _g_input, preprocess

# ---------------------------------------------------------------------------
# Schedule + v-parameterization algebra
# ---------------------------------------------------------------------------

_COS_S = 0.008


def alpha_bar(t: jax.Array) -> jax.Array:
    """Cosine ᾱ(t), t ∈ [0, 1]; ᾱ(0) = 1, ᾱ(1) ≈ 0 (Nichol & Dhariwal)."""
    f = lambda u: jnp.cos(((u + _COS_S) / (1.0 + _COS_S)) * (jnp.pi / 2)) ** 2
    return f(t) / f(jnp.zeros_like(t))


def ab_coeffs(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(a, σ) with a = √ᾱ(t), σ = √(1−ᾱ(t))."""
    ab = alpha_bar(t)
    return jnp.sqrt(ab), jnp.sqrt(jnp.clip(1.0 - ab, 0.0, 1.0))


def q_sample(x0: jax.Array, t: jax.Array, eps: jax.Array):
    """Forward process: x_t = a·x0 + σ·ε; also returns the v target."""
    a, s = ab_coeffs(t)
    bshape = (-1,) + (1,) * (x0.ndim - 1)
    a, s = a.reshape(bshape), s.reshape(bshape)
    x_t = a * x0 + s * eps
    v = a * eps - s * x0
    return x_t, v


def x0_eps_from_v(x_t: jax.Array, v: jax.Array, t: jax.Array):
    """Invert the v-parameterization: x̂0 = a·x_t − σ·v, ε̂ = σ·x_t + a·v."""
    a, s = ab_coeffs(t)
    bshape = (-1,) + (1,) * (x_t.ndim - 1)
    a, s = a.reshape(bshape), s.reshape(bshape)
    return a * x_t - s * v, s * x_t + a * v


# ---------------------------------------------------------------------------
# Stage-2 training (frozen G, refiner R gets the gradients)
# ---------------------------------------------------------------------------

def refiner_cond(batch: dict, g_img: jax.Array) -> jax.Array:
    """Conditioning stack: the G input channels + G's magnitude output.

    Channel layout is fixed per TrainConfig (masked, mask[, lo]) + g_pred,
    so a refiner checkpoint is tied to its G config — same contract as
    the G checkpoint itself.
    """
    return jnp.concatenate([_g_input(batch), g_img], axis=-1)


def make_refiner_train_step(g_def, v_def, r_def, r_tx, cfg: TrainConfig,
                            hole_weight: float = 3.0,
                            observed_weight: float = 1.0,
                            cond_drop: float = 0.0,
                            ema_decay: float = 0.999,
                            self_cond: bool = False):
    """Build jit'd (r_state, r_opt, r_ema, g_state, v_state, wav, key[, frames]).

    One fused program: preprocess (STFT/mask/compress) → frozen-G
    forward → q_sample → R forward → hole-weighted v-MSE → Adam update
    → EMA update. G/V states are inputs (not closure constants) so the
    same compiled step serves any G checkpoint. The EMA weights are
    what get checkpointed — standard diffusion practice, and it costs
    one fused multiply-add per parameter inside the same program.

    Round-4 levers (VERDICT r3 next-round #1/#7):
      * observed_weight=0 → HOLE-ONLY v-MSE: all model capacity goes to
        the region the composite actually uses (the observed region is
        clamped at every DDIM step anyway; pair with clamp_mode='q' at
        sampling so the observed context stays in-distribution).
      * cond_drop>0 → classifier-free-guidance training: with prob p
        per sample the g_pred conditioning channel is zeroed, so
        sampling can extrapolate AWAY from the unconditioned score via
        `guidance` in ddim_refine.
      * use_video (VERDICT #7): the frozen V's fused features feed the
        frozen G exactly as in training/inference; R's conditioning is
        unchanged (it sees G's output, which already carries the visual
        information). Pass `frames` as the extra final argument.

    self_cond=True (round 5, VERDICT r4 next-round #6b — Chen et al.
    2023 "Analog Bits"): R gets ONE extra input channel carrying its
    own previous x̂0 estimate. Training flips a per-batch coin: heads,
    the channel is zeros (matching the first sampler step); tails, R
    is first evaluated with a zero channel, its stop-gradient x̂0 fills
    the channel, and the loss is taken on the second evaluation — the
    network learns to REFINE its own estimate, which few-step DDIM
    exploits by feeding each step's x̂0 into the next (ddim_refine
    self_cond). Requires R built with in_channels+1; a Bayes-ceiling-
    attributed POSTERIOR-QUALITY lever (information exploitation), not
    an estimator change. The lax.cond makes the second branch cost one
    extra R forward only on the runs that take it.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(r_state, r_opt, r_ema, g_state, v_state, wav, key,
                   frames=None):
        kmask, kt, keps, kdrop = jax.random.split(key, 4)
        batch = preprocess(wav, kmask, cfg)
        G = nnx.merge(g_def, g_state)
        feats = None
        if cfg.use_video:
            V = nnx.merge(v_def, v_state)
            feats = V(frames)
        fake = G(_g_input(batch), feats)
        g_img = jax.lax.stop_gradient(fake[..., :1])
        if cond_drop > 0.0:
            keep = (jax.random.uniform(kdrop, (wav.shape[0], 1, 1, 1))
                    >= cond_drop).astype(g_img.dtype)
            g_img = g_img * keep
        x0 = batch["real_img"]
        m = batch["mask_img"]
        t = jax.random.uniform(kt, (wav.shape[0],))
        eps = jax.random.normal(keps, x0.shape)
        x_t, v_target = q_sample(x0, t, eps)
        cond = refiner_cond(batch, g_img)

        def loss_fn(r_state):
            R = nnx.merge(r_def, r_state)
            if self_cond:
                # ksc folded from kdrop (not a 5-way split) so the
                # existing streams stay bitwise-stable for non-SC runs.
                ksc = jax.random.fold_in(kdrop, 1)
                zeros = jnp.zeros_like(x_t)

                def first_pass():
                    v0 = R(jnp.concatenate([x_t, cond, zeros], -1), t)
                    return jax.lax.stop_gradient(
                        x0_eps_from_v(x_t, v0, t)[0])

                sc = jax.lax.cond(jax.random.bernoulli(ksc),
                                  first_pass, lambda: zeros)
                v_hat = R(jnp.concatenate([x_t, cond, sc], axis=-1), t)
            else:
                v_hat = R(jnp.concatenate([x_t, cond], axis=-1), t)
            w = observed_weight * m + hole_weight * (1.0 - m)
            return jnp.sum(w * jnp.square(v_hat - v_target)) / jnp.sum(w)

        loss, grads = jax.value_and_grad(loss_fn)(r_state)
        updates, r_opt = r_tx.update(grads, r_opt, r_state)
        r_state = optax.apply_updates(r_state, updates)
        r_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            r_ema, r_state,
        )
        return r_state, r_opt, r_ema, {"loss_R": loss}

    return train_step


# ---------------------------------------------------------------------------
# DDIM refinement (sampling)
# ---------------------------------------------------------------------------

def ddim_refine(r_def, r_state, g_img: jax.Array, batch: dict,
                key: jax.Array, steps: int = 8, t_start: float = 0.35,
                noise_scale: float = 1.0, guidance: float = 0.0,
                clamp_mode: str = "x0", resample: int = 0,
                self_cond: bool = False):
    """Refine G's compressed magnitude image with truncated DDIM.

    SDEdit: diffuse G's output to t_start (x = a·g_img + σ·ε), then run
    `steps` deterministic DDIM steps to t = 0. At every step the
    OBSERVED region of x̂0 is clamped to the known image (masked_img is
    exact there), so the hole is resampled under real context.
    t_start = 1.0 degenerates to full generation from noise (g_img only
    conditions). Returns the refined image; caller composites the
    observed region verbatim as usual.

    noise_scale scales the initial ε: 1.0 is the SDEdit distribution
    the model trained for; 0.0 makes the whole refinement DETERMINISTIC
    (x = a·g_img — a learned corrector evaluated slightly off its
    training distribution, but variance-free; an informative sweep arm
    for PSNR-style metrics, which punish sampled detail).

    guidance > 0 enables classifier-free guidance over the g_pred
    conditioning channel (requires a refiner trained with cond_drop>0):
    each step evaluates R on a 2B batch — full cond and g_pred-zeroed
    cond — and extrapolates v = (1+g)·v_cond − g·v_uncond. One R call
    per step either way (the two arms ride the same MXU matmuls at 2B).

    clamp_mode: 'x0' (default) clamps the OBSERVED region of x̂0 to the
    known image inside every step — the original SDEdit-style scheme.
    'q' (RePaint-style) instead re-noises the observed region to the
    next step's q(x_u | x0): x_next = m·(a_u·obs + σ_u·ε₀) + hole-DDIM
    — the observed CONTEXT the network sees at time u is exactly its
    training distribution, which is the right pairing for a refiner
    trained with observed_weight=0 (hole-only loss; it never learned
    to denoise the observed region).

    resample > 0 enables RePaint-style time-travel (Lugmayr et al.
    2022): each ladder step (t → u) is preceded by `resample` rounds of
    [denoise t→u, re-noise u→t with fresh ε] before the final descent.
    Re-noising the jointly-evolved x gives the network `resample` extra
    chances to harmonize the hole with its context at every noise
    level — the strongest known eval-time lever for diffusion
    inpainting, at (resample+1)× the network calls. The re-noise ε is
    scaled by noise_scale so noise_scale=0 stays fully deterministic.
    Composes with both clamp modes ('q' re-clamps the observed region
    to q(x_t | x0) after every jump back up).

    self_cond=True (requires a refiner TRAINED with self_cond): each
    step feeds the previous step's (observation-clamped) x̂0 into R's
    extra conditioning channel — zeros at the first step, exactly the
    training distribution. The scan carry becomes (x, x̂0_prev).

    Static `steps` → the loop is a lax.scan over a precomputed (t, u)
    ladder; resampling is an inner lax.fori_loop, so the traced program
    stays two network calls regardless of steps × resample.
    """
    if clamp_mode not in ("x0", "q"):
        raise ValueError(f"unknown clamp_mode: {clamp_mode!r}")
    obs = batch["masked_img"]
    m = batch["mask_img"]
    cond = refiner_cond(batch, g_img)
    B = g_img.shape[0]

    ts = jnp.linspace(t_start, 0.0, steps + 1)
    a0, s0 = ab_coeffs(jnp.full((B,), t_start))
    bshape = (-1,) + (1,) * (g_img.ndim - 1)
    eps0 = noise_scale * jax.random.normal(key, g_img.shape)
    x = a0.reshape(bshape) * g_img + s0.reshape(bshape) * eps0
    if clamp_mode == "q":
        x = m * (a0.reshape(bshape) * obs + s0.reshape(bshape) * eps0) \
            + (1.0 - m) * x

    R = nnx.merge(r_def, r_state)
    if guidance > 0.0:
        # Uncond arm: zero the g_pred channel (the null token cond_drop
        # trained with). cond layout: [g_input..., g_pred] — last chan
        # of cond (the self-cond channel, when present, comes after).
        cond_u = cond.at[..., -1:].set(0.0)
        cond2 = jnp.concatenate([cond, cond_u], axis=0)

    def predict_v(x, tb, sc):
        tail = [sc] if self_cond else []
        if guidance > 0.0:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = [jnp.concatenate([s, s], axis=0) for s in tail]
            v2 = R(jnp.concatenate([x2, cond2] + t2, axis=-1),
                   jnp.concatenate([tb, tb], axis=0))
            v_c, v_u = v2[:B], v2[B:]
            return (1.0 + guidance) * v_c - guidance * v_u
        return R(jnp.concatenate([x, cond] + tail, axis=-1), tb)

    def denoise(x, sc, t, u):
        tb = jnp.full((B,), t)
        v_hat = predict_v(x, tb, sc)
        x0_hat, eps_hat = x0_eps_from_v(x, v_hat, tb)
        au, su = ab_coeffs(jnp.full((B,), u))
        au, su = au.reshape(bshape), su.reshape(bshape)
        if clamp_mode == "x0":
            x0_hat = m * obs + (1.0 - m) * x0_hat
            return au * x0_hat + su * eps_hat, x0_hat
        # 'q': hole evolves by DDIM; observed re-noised to q(x_u|x0)
        x_hole = au * x0_hat + su * eps_hat
        x_obs = au * obs + su * eps0
        return (m * x_obs + (1.0 - m) * x_hole,
                m * obs + (1.0 - m) * x0_hat)

    def step(carry, tui):
        x, sc = carry
        t, u, i = tui
        if resample > 0:
            def travel(j, xs):
                x, sc = xs
                x, sc = denoise(x, sc, t, u)
                # Jump back up u → t: x_t = √(ᾱt/ᾱu)·x_u + √(1−ᾱt/ᾱu)·ε
                ratio = jnp.clip(
                    alpha_bar(t) / jnp.maximum(alpha_bar(u), 1e-12),
                    0.0, 1.0)
                eps = noise_scale * jax.random.normal(
                    jax.random.fold_in(jax.random.fold_in(key, i), j + 1),
                    x.shape)
                x = jnp.sqrt(ratio) * x + jnp.sqrt(1.0 - ratio) * eps
                if clamp_mode == "q":
                    at, st = ab_coeffs(jnp.full((B,), t))
                    x = m * (at.reshape(bshape) * obs
                             + st.reshape(bshape) * eps0) + (1.0 - m) * x
                return x, sc

            x, sc = jax.lax.fori_loop(0, resample, travel, (x, sc))
        x, sc = denoise(x, sc, t, u)
        return (x, sc), None

    sc0 = jnp.zeros_like(g_img)
    (x, _), _ = jax.lax.scan(step, (x, sc0),
                             (ts[:-1], ts[1:],
                              jnp.arange(steps, dtype=jnp.uint32)))
    # At u = 0: a = 1, σ = 0 → x IS x̂0 (already observation-clamped
    # inside the last step via eps_hat's consistency; clamp once more
    # for exactness).
    return m * obs + (1.0 - m) * x


# ---------------------------------------------------------------------------
# Complex-domain refiner (round 4, VERDICT r3 next-round #6) — the
# long-gap phase attack. The measured long-gap ceiling (BENCHMARKS.md
# oracle row) is a property of GL-CLASS PHASE RECOVERY: perfect hole
# magnitudes still yield only 3.82 dB waveform SNR over 75-150-frame
# gaps. A diffusion model over the hole's COMPLEX STFT — (re, im)
# channels, i.e. magnitude and phase jointly — decoded by a single
# iSTFT (no Griffin-Lim for the hole at all) is the one design that
# attacks the ceiling itself rather than the approach to it.
# ---------------------------------------------------------------------------

def complex_image(wav: jax.Array, cfg: TrainConfig) -> jax.Array:
    """(B, T) waveform → (B, bins, image_frames, 2) compressed complex
    STFT image (same layout/padding as preprocess's magnitude images;
    magnitude log1p-compressed, phase exact — signal.mel.complex_compress)."""
    re, im = stft(wav, cfg.stft)                  # (B, F, bins)
    re = jnp.swapaxes(re, -1, -2)                 # (B, bins, F)
    im = jnp.swapaxes(im, -1, -2)
    pad = cfg.image_frames - re.shape[-1]
    re = jnp.pad(re, ((0, 0), (0, 0), (0, pad)))
    im = jnp.pad(im, ((0, 0), (0, 0), (0, pad)))
    cre, cim = complex_compress(re, im, cfg.compress_ceiling)
    return jnp.stack([cre, cim], axis=-1)


def complex_refiner_cond(batch: dict, g_img: jax.Array,
                         cplx: jax.Array) -> jax.Array:
    """Conditioning stack for the complex-domain refiner.

    [G's input channels (masked mag, mask, [lo]), G's magnitude
    prediction, MASKED compressed complex (re, im)] — the observed
    region's exact phase enters through the last two channels, so the
    network can propagate phase across the hole boundary instead of
    inferring it from magnitudes alone.
    """
    m = batch["mask_img"]
    return jnp.concatenate([_g_input(batch), g_img, cplx * m], axis=-1)


def complex_refiner_channels(input_nc: int,
                             self_cond: bool = False) -> tuple[int, int]:
    """(R in_channels, out_channels) for a G with `input_nc` input
    channels: x_t (2) + cond (input_nc + g_pred + masked complex 2)
    [+ 2 self-conditioning channels carrying the previous x̂0]."""
    return 2 + input_nc + 1 + 2 + (2 if self_cond else 0), 2


def make_complex_refiner_train_step(g_def, v_def, r_def, r_tx,
                                    cfg: TrainConfig,
                                    hole_weight: float = 3.0,
                                    observed_weight: float = 1.0,
                                    cond_drop: float = 0.0,
                                    ema_decay: float = 0.999,
                                    self_cond: bool = False):
    """Stage-2 training of the COMPLEX-domain refiner (frozen G).

    Identical schedule/parameterization to the magnitude refiner
    (cosine ᾱ, v-prediction, EMA); x0 is the 2-channel compressed
    complex image and the loss is the hole-weighted v-MSE over both
    channels. The mask is frame-granular, so phase and magnitude are
    equally unknown in the hole — exactly the information the composite
    decode needs.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(r_state, r_opt, r_ema, g_state, v_state, wav, key,
                   frames=None):
        kmask, kt, keps, kdrop = jax.random.split(key, 4)
        batch = preprocess(wav, kmask, cfg)
        G = nnx.merge(g_def, g_state)
        feats = None
        if cfg.use_video:
            V = nnx.merge(v_def, v_state)
            feats = V(frames)
        fake = G(_g_input(batch), feats)
        g_img = jax.lax.stop_gradient(fake[..., :1])
        if cond_drop > 0.0:
            keep = (jax.random.uniform(kdrop, (wav.shape[0], 1, 1, 1))
                    >= cond_drop).astype(g_img.dtype)
            g_img = g_img * keep
        x0 = complex_image(wav, cfg)               # (B, bins, T, 2)
        m = batch["mask_img"]
        t = jax.random.uniform(kt, (wav.shape[0],))
        eps = jax.random.normal(keps, x0.shape)
        x_t, v_target = q_sample(x0, t, eps)
        cond = complex_refiner_cond(batch, g_img, x0)

        def loss_fn(r_state):
            R = nnx.merge(r_def, r_state)
            if self_cond:
                # See make_refiner_train_step: coin-flipped previous-x̂0
                # channel pair (the complex x̂0 is 2-channel).
                ksc = jax.random.fold_in(kdrop, 1)
                zeros = jnp.zeros_like(x_t)

                def first_pass():
                    v0 = R(jnp.concatenate([x_t, cond, zeros], -1), t)
                    return jax.lax.stop_gradient(
                        x0_eps_from_v(x_t, v0, t)[0])

                sc = jax.lax.cond(jax.random.bernoulli(ksc),
                                  first_pass, lambda: zeros)
                v_hat = R(jnp.concatenate([x_t, cond, sc], axis=-1), t)
            else:
                v_hat = R(jnp.concatenate([x_t, cond], axis=-1), t)
            w = observed_weight * m + hole_weight * (1.0 - m)
            return jnp.sum(w * jnp.square(v_hat - v_target)) / jnp.sum(w)

        loss, grads = jax.value_and_grad(loss_fn)(r_state)
        updates, r_opt = r_tx.update(grads, r_opt, r_state)
        r_state = optax.apply_updates(r_state, updates)
        r_ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            r_ema, r_state,
        )
        return r_state, r_opt, r_ema, {"loss_R": loss}

    return train_step


def ddim_refine_complex(r_def, r_state, g_img: jax.Array, batch: dict,
                        cplx: jax.Array, key: jax.Array, steps: int = 8,
                        t_start: float = 1.0, noise_scale: float = 1.0,
                        guidance: float = 0.0, clamp_mode: str = "x0",
                        resample: int = 0, self_cond: bool = False):
    """DDIM over the compressed complex image; → refined complex image.

    `cplx` is the full compressed complex image of the INPUT waveform
    (observed region exact; hole garbage/zero — at eval the input is
    the clean wav and the hole must not leak, so the observed clamp and
    the conditioning both multiply by the mask). t_start defaults to
    1.0 (full generation): unlike the magnitude domain there is no
    G-predicted starting point for phase, so the hole is sampled from
    the prior under observed-context clamping. g_img still conditions
    (magnitude guidance).
    """
    if clamp_mode not in ("x0", "q"):
        raise ValueError(f"unknown clamp_mode: {clamp_mode!r}")
    m = batch["mask_img"]
    obs = cplx * m                              # known region, 0 in hole
    cond = complex_refiner_cond(batch, g_img, cplx)
    B = g_img.shape[0]
    bshape = (-1,) + (1,) * (cplx.ndim - 1)

    ts = jnp.linspace(t_start, 0.0, steps + 1)
    a0, s0 = ab_coeffs(jnp.full((B,), t_start))
    eps0 = noise_scale * jax.random.normal(key, cplx.shape)
    # Start the hole from the magnitude prior G provides: G's predicted
    # magnitude with ZERO phase is the best phase-free x0 estimate; at
    # t_start=1 a0≈0 so this reduces to pure noise anyway.
    x_init = obs + (1.0 - m) * _mag_only_complex(g_img)
    x = a0.reshape(bshape) * x_init + s0.reshape(bshape) * eps0

    R = nnx.merge(r_def, r_state)
    if guidance > 0.0:
        # Uncond arm: zero g_pred (channel right before the 2 masked-
        # complex channels in complex_refiner_cond's layout).
        cond_u = cond.at[..., -3:-2].set(0.0)
        cond2 = jnp.concatenate([cond, cond_u], axis=0)

    def predict_v(x, tb, sc):
        tail = [sc] if self_cond else []
        if guidance > 0.0:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = [jnp.concatenate([s, s], axis=0) for s in tail]
            v2 = R(jnp.concatenate([x2, cond2] + t2, axis=-1),
                   jnp.concatenate([tb, tb], axis=0))
            return (1.0 + guidance) * v2[:B] - guidance * v2[B:]
        return R(jnp.concatenate([x, cond] + tail, axis=-1), tb)

    def denoise(x, sc, t, u):
        tb = jnp.full((B,), t)
        v_hat = predict_v(x, tb, sc)
        x0_hat, eps_hat = x0_eps_from_v(x, v_hat, tb)
        au, su = ab_coeffs(jnp.full((B,), u))
        au, su = au.reshape(bshape), su.reshape(bshape)
        if clamp_mode == "x0":
            x0_hat = m * obs + (1.0 - m) * x0_hat
            return au * x0_hat + su * eps_hat, x0_hat
        x_hole = au * x0_hat + su * eps_hat
        x_obs = au * obs + su * eps0
        return (m * x_obs + (1.0 - m) * x_hole,
                m * obs + (1.0 - m) * x0_hat)

    def step(carry, tui):
        x, sc = carry
        t, u, i = tui
        if resample > 0:  # RePaint time-travel — see ddim_refine
            def travel(j, xs):
                x, sc = xs
                x, sc = denoise(x, sc, t, u)
                ratio = jnp.clip(
                    alpha_bar(t) / jnp.maximum(alpha_bar(u), 1e-12),
                    0.0, 1.0)
                eps = noise_scale * jax.random.normal(
                    jax.random.fold_in(jax.random.fold_in(key, i), j + 1),
                    x.shape)
                x = jnp.sqrt(ratio) * x + jnp.sqrt(1.0 - ratio) * eps
                if clamp_mode == "q":
                    at, st = ab_coeffs(jnp.full((B,), t))
                    x = m * (at.reshape(bshape) * obs
                             + st.reshape(bshape) * eps0) + (1.0 - m) * x
                return x, sc

            x, sc = jax.lax.fori_loop(0, resample, travel, (x, sc))
        x, sc = denoise(x, sc, t, u)
        return (x, sc), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(cplx)),
                             (ts[:-1], ts[1:],
                              jnp.arange(steps, dtype=jnp.uint32)))
    return m * obs + (1.0 - m) * x


def _mag_only_complex(g_img: jax.Array) -> jax.Array:
    """G's [-1,1] compressed magnitude image → zero-phase compressed
    complex channels (re = |c| compressed to [0,1], im = 0)."""
    cmag = jnp.clip((g_img[..., 0] + 1.0) * 0.5, 0.0, 1.0)
    return jnp.stack([cmag, jnp.zeros_like(cmag)], axis=-1)


# ---------------------------------------------------------------------------
# Chunked posterior mean (round-5, VERDICT r4 next-round #1). The naive
# vmap over K sample keys multiplies the DDIM chain's live intermediates
# by K: refine_avg=32 at batch 16 on the 256×256 complex image needed
# 17.31 G of the chip's 15.75 G HBM and killed the round-4 decision arms
# at compile time. Averaging is associative, so the fix is structural:
# scan over key CHUNKS, vmapping at most `chunk` keys at a time and
# accumulating a running sum — peak HBM is chunk×B intermediates for any
# K, and the result is the unchunked mean up to float-sum reordering.
# ---------------------------------------------------------------------------

def avg_keys(knoise: jax.Array, k: int) -> jax.Array:
    """The K sample keys refine_avg uses: fold s=0 IS the base stream
    (so avg1 == the single-sample run), s>=1 folds 0xA76+s. Kept in
    lockstep with the round-4 unchunked implementation so historical
    quality_results entries stay comparable."""
    return jnp.stack([knoise] + [jax.random.fold_in(knoise, 0xA76 + s)
                                 for s in range(1, k)])


def chunked_mean(sample_stats, keys: jax.Array, chunk: int):
    """Mean over `keys` of the pytree `sample_stats(key)` returns,
    evaluated at most `chunk` keys at a time.

    Full chunks run as ONE compiled vmap body inside a lax.scan with a
    running-sum carry; a remainder (K % chunk) runs as one extra vmap
    call. Exact up to summation order — iSTFT/GL-decode linearity is
    NOT assumed here (the caller averages in whatever space it hands
    in), only addition associativity.
    """
    k = int(keys.shape[0])
    chunk = max(1, min(chunk, k))
    vf = jax.vmap(sample_stats)
    n_full, rem = divmod(k, chunk)
    total = None
    if n_full:
        ks = keys[: n_full * chunk].reshape(n_full, chunk, *keys.shape[1:])
        init = jax.tree.map(
            lambda sd: jnp.zeros(sd.shape[1:], sd.dtype),
            jax.eval_shape(vf, ks[0]),
        )

        def body(carry, kc):
            s = vf(kc)
            return jax.tree.map(lambda c, x: c + jnp.sum(x, axis=0),
                                carry, s), None

        total, _ = jax.lax.scan(body, init, ks)
    if rem:
        part = jax.tree.map(lambda x: jnp.sum(x, axis=0), vf(keys[-rem:]))
        total = part if total is None else jax.tree.map(
            jnp.add, total, part)
    return jax.tree.map(lambda t: t / k, total)


def make_complex_refiner_infer_fn(g_def, v_def, r_def, r_state,
                                  cfg: TrainConfig, steps: int = 8,
                                  t_start: float = 1.0,
                                  noise_scale: float = 1.0,
                                  guidance: float = 0.0,
                                  clamp_mode: str = "x0",
                                  resample: int = 0,
                                  refine_avg: int = 1,
                                  refine_chunk: int = 8,
                                  complex_mag: str = "sample",
                                  self_cond: bool = False,
                                  external_mask: bool = False,
                                  noise_fold: int = 0xC0,
                                  runtime_fold: bool = False):
    """jit'd (g_state, v_state, wav, key_or_mask, frames) → waveform.

    The GL-free serving chain: STFT → mask → G (magnitude conditioning)
    → complex-domain DDIM for the hole → composite complex spectrogram
    (observed region VERBATIM — exact magnitude and phase) → one iSTFT.
    Same signature as train.step.make_infer_fn so test.py/serving can
    swap it in via --refiner_domain complex.

    refine_avg > 1 computes the posterior MEAN over K noise streams,
    `refine_chunk` samples at a time (chunked_mean — the round-4 OOM
    fix; peak HBM is chunk×B DDIM intermediates for any K).

    complex_mag — the round-5 HYBRID decode (VERDICT r4 next-round #2).
    The complex posterior mean owns waveform SNR but its magnitude
    SHRINKS toward zero wherever the phase posterior is wide (averaging
    misaligned phasors cancels), collapsing hole-PSNR. Decoupling the
    axes: take the PHASE of the posterior mean (its SNR-winning part)
    and restore the magnitude from a regression-quality estimate:
      'sample' — decode the mean verbatim (round-4 behavior; default);
      'keep'   — hole magnitude from G's prediction (the hole-PSNR
                 owner), phase from the posterior mean;
      'mean'   — hole magnitude = E[|x|] over the K samples in the
                 LINEAR domain (shrinkage-free, unlike |E[x]|), phase
                 from the posterior mean.
    Observed region is verbatim under every mode.

    runtime_fold=True appends a traced int argument `fold` to the
    signature and derives the refiner noise stream from it at RUNTIME —
    one compiled program serves all of test.py --eval_samples' K
    streams (ADVICE r4: K baked folds compiled the full chain K times).
    fold semantics match the baked noise_fold exactly: fold=s ==
    noise_fold=0xC0+s.
    """
    if complex_mag not in ("sample", "keep", "mean"):
        raise ValueError(f"unknown complex_mag: {complex_mag!r}")
    from ..signal.mel import decompress
    from .step import preprocess_with_mask

    @jax.jit
    def infer(g_state, v_state, wav, key_or_mask, frames=None, fold=None):
        # noise_fold: see train.step.make_infer_fn — distinct folds give
        # distinct posterior samples of the same task (--eval_samples).
        nf = fold if runtime_fold else noise_fold - 0xC0
        if external_mask:
            batch = preprocess_with_mask(wav, key_or_mask, cfg)
            knoise = jax.random.key(nf)
        else:
            batch = preprocess(wav, key_or_mask, cfg)
            knoise = jax.random.fold_in(key_or_mask, 0xC0 + nf)
        G = nnx.merge(g_def, g_state)
        feats = None
        if cfg.use_video:
            V = nnx.merge(v_def, v_state)
            feats = V(frames)
        fake = G(_g_input(batch), feats)
        g_img = fake[..., :1]
        cplx = complex_image(wav, cfg)

        # refine_avg > 1: posterior-MEAN in the complex domain. iSTFT
        # is linear in (re, im), so averaging K complex samples equals
        # averaging K waveforms — the MSE/SNR-optimal estimator the
        # sampler can offer (see train.step.make_infer_fn refine_avg).
        def sample_stats(ks):
            x = ddim_refine_complex(
                r_def, r_state, g_img, batch, cplx, ks, steps=steps,
                t_start=t_start, noise_scale=noise_scale,
                guidance=guidance, clamp_mode=clamp_mode,
                resample=resample, self_cond=self_cond,
            )
            stats = {"c": x}
            if complex_mag == "mean":
                sre, sim = complex_decompress(x[..., 0], x[..., 1],
                                              cfg.compress_ceiling)
                stats["mag"] = jnp.sqrt(sre * sre + sim * sim)
            return stats

        if refine_avg <= 1:
            stats = sample_stats(knoise)
        else:
            stats = chunked_mean(sample_stats,
                                 avg_keys(knoise, refine_avg),
                                 refine_chunk)
        refined = stats["c"]
        re, im = complex_decompress(refined[..., 0], refined[..., 1],
                                    cfg.compress_ceiling)
        if complex_mag != "sample":
            # Hybrid recomposition: unit phasor of the posterior mean ×
            # the chosen magnitude, hole only (observed stays verbatim).
            pm = jnp.sqrt(re * re + im * im)
            inv = 1.0 / jnp.maximum(pm, 1e-12)
            if complex_mag == "keep":
                mag_new = decompress(g_img[..., 0], cfg.compress_ceiling)
            else:
                mag_new = stats["mag"]
            hole = 1.0 - batch["mask_img"][..., 0]
            re = jnp.where(hole > 0, re * inv * mag_new, re)
            im = jnp.where(hole > 0, im * inv * mag_new, im)
        n_frames = cfg.stft.num_frames(wav.shape[-1])
        re = jnp.swapaxes(re[..., :n_frames], -1, -2)   # (B, F, bins)
        im = jnp.swapaxes(im[..., :n_frames], -1, -2)
        return istft(re, im, cfg.stft, length=wav.shape[-1])

    return infer
