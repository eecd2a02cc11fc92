"""Metric-matched MSE regression term (round-4 estimator arm).

hole-PSNR (utils/metrics.py::masked_psnr) is MSE in compressed-mag
space; its Bayes-optimal predictor is the posterior MEAN. The default
L1 term targets the MEDIAN — on a multi-modal hole posterior those
differ, so the L1-trained control G is structurally mismatched to the
metric it is judged by. masked_l2_loss (nn/losses.py) is the in-family
fix; these tests pin its semantics, the mean-vs-median estimator
property, and the train-step wiring/gating.
"""

import jax
import jax.numpy as jnp
import numpy as np
from optax import adam

from viai_tpu.nn.losses import masked_l1_loss, masked_l2_loss
from viai_tpu.testing import TINY_CFG, tiny_models as _tiny_models, \
    tone_batch as _wav
from viai_tpu.train.step import TrainConfig, init_state, make_train_step


def test_l2_loss_zero_on_match_and_weighting():
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((2, 8, 16, 1)).astype(np.float32))
    keep = jnp.ones((2, 8, 16, 1))
    keep = keep.at[:, :, 4:9].set(0.0)
    assert float(masked_l2_loss(tgt, tgt, keep)) == 0.0
    # Uniform error e everywhere -> loss = e^2 regardless of weights.
    pred = tgt + 0.5
    np.testing.assert_allclose(float(masked_l2_loss(pred, tgt, keep)),
                               0.25, rtol=1e-5)
    np.testing.assert_allclose(
        float(masked_l2_loss(pred, tgt, keep, hole_weight=3.0)),
        0.25, rtol=1e-5)
    # Error ONLY in the hole: hole_weight scales its share of the
    # normalized total exactly as in masked_l1_loss.
    pred2 = tgt + (1.0 - keep) * 1.0
    n_hole = float(jnp.sum(1.0 - keep))
    n_obs = float(jnp.sum(keep))
    w = 3.0
    expect = (w * n_hole) / (w * n_hole + n_obs)
    np.testing.assert_allclose(
        float(masked_l2_loss(pred2, tgt, keep, hole_weight=w)),
        expect, rtol=1e-5)


def test_l2_optimum_is_mean_l1_optimum_is_median():
    """The estimator property the arm rests on: against a skewed
    two-point target distribution {0 (x3), 1 (x1)}, the L1-optimal
    constant is the median (0) while the L2-optimal is the mean (0.25)
    — minimizing each loss by gradient descent lands on its own
    optimum, and the two differ."""
    tgt = jnp.asarray([0.0, 0.0, 0.0, 1.0]).reshape(4, 1, 1, 1)
    keep = jnp.zeros_like(tgt)          # all-hole: pure estimator test

    def minimize(loss_fn):
        c = jnp.asarray(0.5)
        for _ in range(400):
            g = jax.grad(lambda c: loss_fn(
                jnp.broadcast_to(c, tgt.shape), tgt, keep))(c)
            c = c - 0.01 * g
        return float(c)

    c_l2 = minimize(masked_l2_loss)
    np.testing.assert_allclose(c_l2, 0.25, atol=1e-3)
    c_l1 = minimize(masked_l1_loss)
    assert c_l1 < 0.1, c_l1             # heads to the median (0)
    assert abs(c_l2 - c_l1) > 0.1


def test_train_step_with_l2_term():
    """lambda_l2 > 0 wires the term in (metric reported, finite,
    decreasing on a deterministic batch); lambda_l1=0 disables the L1
    gradient path but still reports the L1 metric."""
    cfg = TrainConfig(**{**TINY_CFG.__dict__,
                         "lambda_l1": 0.0, "lambda_l2": 100.0})
    G, D, V = _tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(_wav())
    key = jax.random.key(0)
    first = None
    for _ in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wav, None, sub)
        m = jax.tree.map(float, metrics)
        assert np.isfinite(m["loss_G_L2"]), m
        if first is None:
            first = m["loss_G_L2"]
    assert m["loss_G_L2"] < first, (m["loss_G_L2"], first)
