"""Discriminator feature-matching G-loss (round-3 objective-family
lever).

The corrected notes attribution (quality_results.jsonl
notes_grid_attribution_corrected) closed every architectural lever —
phase, receptive field, capacity, loss weighting, information
availability, long-range copying — leaving the L1+GAN objective family
itself as the binding constraint on onset-dense corpora. Feature
matching (MelGAN/HiFi-GAN) regresses D's own multi-scale features of
the fake onto the real's, re-weighting the target toward the structure
D discriminates on. These tests pin semantics, the D feature taps, and
the train-step wiring/gating.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from viai_tpu.nn.losses import feature_matching_loss


def test_fm_loss_zero_on_match_positive_otherwise():
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32),
             jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)]
    assert float(feature_matching_loss(feats, feats)) == 0.0
    other = [f + 1.0 for f in feats]
    # Mean |Δ|=1 per layer, averaged over layers -> exactly 1.
    np.testing.assert_allclose(
        float(feature_matching_loss(other, feats)), 1.0, rtol=1e-6)


def test_fm_loss_stops_gradient_on_real_side():
    """Only the fake branch carries gradient — the real features are a
    fixed target (otherwise the term would also try to move the real
    statistics toward the fake)."""
    f = jnp.ones((1, 4, 4, 2))

    g_fake = jax.grad(lambda x: feature_matching_loss([x], [f * 2]))(f)
    g_real = jax.grad(lambda x: feature_matching_loss([f * 2], [x]))(f)
    assert float(jnp.abs(g_fake).sum()) > 0.0
    assert float(jnp.abs(g_real).sum()) == 0.0


def test_discriminator_feature_taps():
    """return_features yields one post-activation map per conv block
    (n_layers+1) and does not perturb the logits path."""
    from viai_tpu.nn import define_D

    D = define_D(1, ndf=8, n_layers_D=3)
    x = jnp.ones((2, 64, 64, 1))
    logits = D(x)
    logits2, feats = D(x, return_features=True)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    assert len(feats) == 4          # first conv + n_layers norm blocks
    # Strides 2,2,2,1: spatial halves three times.
    assert feats[0].shape[1:3] == (32, 32)
    assert feats[-1].shape[1:3] == (8, 8)


def test_train_step_with_fm_term():
    """One jit'd step with lambda_fm on: metric present and finite, G
    params move, and the loss actually contributes (loss_G differs from
    a lambda_fm=0 twin under identical keys/state)."""
    from viai_tpu.nn import define_D, define_G
    from viai_tpu.testing import TINY_CFG, tone_batch
    from viai_tpu.train import init_state, make_train_step
    from viai_tpu.train.schedules import adam

    wav = jnp.asarray(tone_batch(2))
    key = jax.random.key(0)

    def run(lam):
        cfg = dataclasses.replace(TINY_CFG, lambda_fm=lam)
        G = define_G(ngf=8, dtype="float32")
        D = define_D(3, ndf=8, n_layers_D=2)
        g_tx, d_tx = adam(2e-4), adam(2e-4)
        (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
        step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
        state, metrics = step(state, wav, None, key)
        return state, {k: float(v) for k, v in metrics.items()}

    s_fm, m_fm = run(10.0)
    _, m_base = run(0.0)
    assert "loss_G_FM" in m_fm and np.isfinite(m_fm["loss_G_FM"])
    assert "loss_G_FM" not in m_base
    assert m_fm["loss_G_FM"] > 0.0
    # Identical init/keys: the only delta in loss_G is the FM term.
    np.testing.assert_allclose(
        m_fm["loss_G"] - m_base["loss_G"], 10.0 * m_fm["loss_G_FM"],
        rtol=1e-4)
    # GAN/L1 components themselves are untouched by adding the term.
    np.testing.assert_allclose(m_fm["loss_G_L1"], m_base["loss_G_L1"],
                               rtol=1e-6)
    np.testing.assert_allclose(m_fm["loss_G_GAN"], m_base["loss_G_GAN"],
                               rtol=1e-5)
