"""Learning-rate policies mirroring the reference's options.

Reference capability (SURVEY.md §2.1 "BaseModel / checkpointing":
"lr schedulers (lambda/step)"): pix2pix exposes --lr_policy
{lambda|step|plateau|cosine}. The closed-form ones are optax schedules
over *epochs* (the reference steps its scheduler per epoch; we scale
by steps_per_epoch so the schedule is step-addressable and jit-able).

`plateau` needs LOSS feedback, which a pure schedule cannot see — it
is implemented as optax.contrib.reduce_on_plateau chained after Adam,
living entirely inside the compiled train step (the loss value is
already on device; no host round-trip). Reference semantics
(torch ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
patience=5) stepped once per epoch on the epoch loss) map to
factor=0.2 / rtol=0.01 / patience=5 with accumulation_size =
steps_per_epoch (optax averages the per-step losses over that window
and evaluates plateau once per window = once per epoch).
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
    if policy in ("constant", "plateau"):
        # plateau: base lr constant; the loss-reactive scaling lives in
        # the reduce_on_plateau transform (see plateau_kwargs/adam).
        return lambda _: lr
    raise ValueError(f"unknown lr policy: {policy}")


def plateau_kwargs(steps_per_epoch: int) -> dict:
    """Reference ReduceLROnPlateau semantics → optax kwargs."""
    return dict(factor=0.2, patience=5, rtol=0.01, cooldown=0,
                accumulation_size=max(steps_per_epoch, 1))


def adam(lr_schedule, beta1: float = 0.5, beta2: float = 0.999,
         plateau: dict | None = None):
    """Adam(β1=0.5) — the pix2pix/GAN convention the reference uses.

    `plateau` (from plateau_kwargs) chains reduce_on_plateau after
    Adam. The returned transform ALWAYS accepts `value=` in update()
    (ignored when plateau is off) so the train step has one signature.
    """
    tx = optax.adam(lr_schedule, b1=beta1, b2=beta2)
    if plateau:
        tx = optax.chain(
            tx, optax.contrib.reduce_on_plateau(**plateau)
        )
    return optax.with_extra_args_support(tx)


def plateau_scale(opt_state) -> float | None:
    """Current lr scale of a reduce_on_plateau state, if present."""
    import jax

    for leaf_state in jax.tree.leaves(
        opt_state, is_leaf=lambda x: hasattr(x, "scale")
    ):
        if hasattr(leaf_state, "plateau_count"):
            return float(leaf_state.scale)
    return None
