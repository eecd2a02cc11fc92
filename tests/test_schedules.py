"""LR schedule policies (reference --lr_policy semantics) + StepTimer."""

import numpy as np

from viai_tpu.train.schedules import make_schedule
from viai_tpu.utils.profiling import StepTimer


def test_lambda_policy_constant_then_linear_decay():
    s = make_schedule("lambda", 1e-3, niter=10, niter_decay=10,
                      steps_per_epoch=5)
    assert np.isclose(float(s(0)), 1e-3)
    assert float(s(10 * 5 - 1)) > 9.5e-4          # still ~flat at epoch 10
    mid = float(s(15 * 5))                         # halfway through decay
    assert 4e-4 < mid < 6e-4
    assert float(s(20 * 5)) < 1e-9                 # fully decayed


def test_step_policy():
    s = make_schedule("step", 1e-3, lr_decay_iters=50, steps_per_epoch=2)
    assert np.isclose(float(s(0)), 1e-3)
    assert np.isclose(float(s(50 * 2)), 1e-4)      # one ×0.1 step
    assert np.isclose(float(s(100 * 2)), 1e-5)


def test_cosine_policy_endpoints():
    s = make_schedule("cosine", 1e-3, niter=5, niter_decay=5,
                      steps_per_epoch=10)
    assert np.isclose(float(s(0)), 1e-3)
    assert float(s(100)) < 1e-6


def test_constant_policy():
    s = make_schedule("constant", 2e-4)
    assert s(0) == 2e-4 and s(10**6) == 2e-4


def test_step_timer():
    t = StepTimer(ema=0.5)
    assert t.tick() is None                        # first tick: no delta
    import time

    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt > 0
    assert t.throughput(32) > 0


# ---------------------------------------------------------------------------
# plateau policy (VERDICT.md round-1 missing #6): reduce_on_plateau
# chained after Adam, loss fed as value= inside the compiled step.
# ---------------------------------------------------------------------------

def test_plateau_scale_drops_on_stagnant_loss():
    import jax.numpy as jnp

    from viai_tpu.train.schedules import adam, plateau_kwargs, plateau_scale

    tx = adam(1e-3, plateau=dict(plateau_kwargs(1), patience=3))
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    assert plateau_scale(st) == 1.0
    g = {"w": jnp.full(4, 0.1)}
    # Constant loss: first update sets best, then `patience` stagnant
    # updates trigger one ×0.2 reduction.
    for _ in range(4):
        _, st = tx.update(g, st, params, value=jnp.asarray(1.0))
    assert np.isclose(plateau_scale(st), 0.2), plateau_scale(st)
    # Stagnation continues → compounding reductions (0.2^k).
    for _ in range(6):
        _, st = tx.update(g, st, params, value=jnp.asarray(1.0))
    k = np.log(plateau_scale(st)) / np.log(0.2)
    assert k > 1 and np.isclose(k, round(k), atol=1e-3), plateau_scale(st)


def test_plateau_policy_schedule_is_constant_base():
    s = make_schedule("plateau", 2e-4)
    assert float(s(0)) == float(s(10_000)) == 2e-4


def test_adam_without_plateau_ignores_value():
    import jax.numpy as jnp

    from viai_tpu.train.schedules import adam, plateau_scale

    tx = adam(1e-3)
    params = {"w": jnp.ones(2)}
    st = tx.init(params)
    _, st = tx.update({"w": jnp.ones(2)}, st, params,
                      value=jnp.asarray(5.0))
    assert plateau_scale(st) is None


def test_train_step_runs_with_plateau_optimizer():
    import jax
    import jax.numpy as jnp

    from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
    from viai_tpu.train import init_state, make_train_step
    from viai_tpu.train.schedules import adam, plateau_kwargs, plateau_scale

    G, D, V = tiny_models()
    pk = dict(plateau_kwargs(1), patience=2)
    g_tx, d_tx = adam(2e-4, plateau=pk), adam(2e-4, plateau=pk)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(tone_batch(2))
    key = jax.random.key(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wav, None, sub)
    assert np.isfinite(float(metrics["loss_G"]))
    assert plateau_scale(state["g_opt"]) in (1.0, 0.2)  # live state exists


def test_synthetic_loaders_advertise_epoch_batches():
    """The default --dataset_mode synthetic* must drive epoch-addressed
    lr decay from the TRUE virtual dataset size (size // batchSize), not
    a 100-step fallback (VERDICT r2 weak #6)."""
    from viai_tpu.data.loader import create_dataloader
    from viai_tpu.data.synthetic import SyntheticConfig

    size = SyntheticConfig().size
    for mode in ("synthetic", "synthetic_av", "synthetic_notes"):
        loader = create_dataloader(mode, batch_size=16)
        assert getattr(loader, "epoch_batches", None) == size // 16, mode
    # Grain (eval-style, num_epochs bounded) path too.
    loader = create_dataloader("synthetic", batch_size=25, shuffle=False,
                               num_epochs=1)
    assert loader.epoch_batches == size // 25


def test_get_current_lr_uses_construction_time_schedule():
    """get_current_lr must report from the schedule the compiled
    optimizer was BUILT with; mutating opt afterwards (e.g. a stale
    steps_per_epoch) must not change the report (VERDICT r2 weak #7)."""
    from viai_tpu.config.options import TrainOptions
    from viai_tpu.model import create_model

    opt = TrainOptions().parse(
        ["--name", "lrcache", "--dataset_mode", "synthetic",
         "--ngf", "8", "--ndf", "8", "--lr_policy", "lambda",
         "--niter", "1", "--niter_decay", "1",
         "--steps_per_epoch", "4"],
        save=False,
    )
    m = create_model(opt)
    lr0 = m.get_current_lr()
    opt.steps_per_epoch = 400   # stale mutation after construction
    opt.lr = 9.9
    assert m.get_current_lr() == lr0
