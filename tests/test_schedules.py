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
