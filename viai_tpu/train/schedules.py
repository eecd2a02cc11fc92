"""Learning-rate policies mirroring the reference's options.

Reference capability (SURVEY.md §2.1 "BaseModel / checkpointing":
"lr schedulers (lambda/step)"): pix2pix exposes --lr_policy
{lambda|step|plateau|cosine}. We provide the closed-form ones as optax
schedules over *epochs* (the reference steps its scheduler per epoch;
we scale by steps_per_epoch so the schedule is step-addressable and
jit-able).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lambda_linear(
    lr: float, niter: int, niter_decay: int, steps_per_epoch: int
) -> optax.Schedule:
    """Constant for `niter` epochs, then linear decay to 0 over `niter_decay`."""

    def sched(step):
        epoch = step / max(steps_per_epoch, 1)
        frac = jnp.clip((epoch - niter) / max(niter_decay, 1), 0.0, 1.0)
        return lr * (1.0 - frac)

    return sched


def step_decay(
    lr: float, lr_decay_iters: int, steps_per_epoch: int, gamma: float = 0.1
) -> optax.Schedule:
    """×gamma every lr_decay_iters epochs (reference 'step' policy)."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * gamma ** (epoch // lr_decay_iters)

    return sched


def cosine(lr: float, niter: int, niter_decay: int, steps_per_epoch: int):
    total = (niter + niter_decay) * steps_per_epoch
    return optax.cosine_decay_schedule(lr, max(total, 1))


def make_schedule(policy: str, lr: float, *, niter: int = 100,
                  niter_decay: int = 100, lr_decay_iters: int = 50,
                  steps_per_epoch: int = 1):
    if policy == "lambda":
        return lambda_linear(lr, niter, niter_decay, steps_per_epoch)
    if policy == "step":
        return step_decay(lr, lr_decay_iters, steps_per_epoch)
    if policy == "cosine":
        return cosine(lr, niter, niter_decay, steps_per_epoch)
    if policy == "constant":
        return lambda _: lr
    raise ValueError(f"unknown lr policy: {policy}")


def adam(lr_schedule, beta1: float = 0.5, beta2: float = 0.999):
    """Adam(β1=0.5) — the pix2pix/GAN convention the reference uses."""
    return optax.adam(lr_schedule, b1=beta1, b2=beta2)
