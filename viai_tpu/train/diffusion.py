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
                            ema_decay: float = 0.999):
    """Build jit'd (r_state, r_opt, r_ema, g_state, v_state, wav, key).

    One fused program: preprocess (STFT/mask/compress) → frozen-G
    forward → q_sample → R forward → hole-weighted v-MSE → Adam update
    → EMA update. G/V states are inputs (not closure constants) so the
    same compiled step serves any G checkpoint. The EMA weights are
    what get checkpointed — standard diffusion practice, and it costs
    one fused multiply-add per parameter inside the same program.
    """
    if cfg.use_video:
        raise NotImplementedError("refiner stage-2 is audio-only for now")

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(r_state, r_opt, r_ema, g_state, v_state, wav, key):
        kmask, kt, keps = jax.random.split(key, 3)
        batch = preprocess(wav, kmask, cfg)
        G = nnx.merge(g_def, g_state)
        fake = G(_g_input(batch), None)
        g_img = jax.lax.stop_gradient(fake[..., :1])
        x0 = batch["real_img"]
        m = batch["mask_img"]
        t = jax.random.uniform(kt, (wav.shape[0],))
        eps = jax.random.normal(keps, x0.shape)
        x_t, v_target = q_sample(x0, t, eps)
        cond = refiner_cond(batch, g_img)

        def loss_fn(r_state):
            R = nnx.merge(r_def, r_state)
            v_hat = R(jnp.concatenate([x_t, cond], axis=-1), t)
            w = m + hole_weight * (1.0 - m)
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
                noise_scale: float = 1.0):
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

    Static `steps` → the loop is a lax.scan over a precomputed (t, u)
    ladder; one compiled program, no host sync.
    """
    obs = batch["masked_img"]
    m = batch["mask_img"]
    cond = refiner_cond(batch, g_img)
    B = g_img.shape[0]

    ts = jnp.linspace(t_start, 0.0, steps + 1)
    a0, s0 = ab_coeffs(jnp.full((B,), t_start))
    bshape = (-1,) + (1,) * (g_img.ndim - 1)
    eps = noise_scale * jax.random.normal(key, g_img.shape)
    x = a0.reshape(bshape) * g_img + s0.reshape(bshape) * eps

    R = nnx.merge(r_def, r_state)

    def step(x, tu):
        t, u = tu
        tb = jnp.full((B,), t)
        v_hat = R(jnp.concatenate([x, cond], axis=-1), tb)
        x0_hat, eps_hat = x0_eps_from_v(x, v_hat, tb)
        x0_hat = m * obs + (1.0 - m) * x0_hat
        au, su = ab_coeffs(jnp.full((B,), u))
        x_next = (au.reshape(bshape) * x0_hat
                  + su.reshape(bshape) * eps_hat)
        return x_next, None

    x, _ = jax.lax.scan(step, x, (ts[:-1], ts[1:]))
    # At u = 0: a = 1, σ = 0 → x IS x̂0 (already observation-clamped
    # inside the last step via eps_hat's consistency; clamp once more
    # for exactness).
    return m * obs + (1.0 - m) * x
