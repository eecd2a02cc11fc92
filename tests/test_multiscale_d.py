"""Multi-scale discriminator (pix2pixHD/MelGAN ensemble, --num_D).

The round-3 attribution matrix left the objective family as the notes
limiter; the multi-scale D widens what the adversary (and the FM term)
can judge — coarser scales see onset SPACING, not just local texture.
These tests pin the pyramid shapes, the list-aware loss semantics, FM
across scales, and the train-step + checkpoint integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.nn import define_D
from viai_tpu.nn.losses import (
    feature_matching_loss,
    gan_loss,
    generator_gan_loss,
)


def test_multiscale_shapes_and_pyramid():
    D = define_D(1, ndf=8, n_layers_D=3, num_D=3)
    x = jnp.ones((2, 64, 64, 1))
    logits = D(x)
    assert isinstance(logits, list) and len(logits) == 3
    # Each net halves 3x (strides 2,2,2,1); scales start 64/32/16.
    assert logits[0].shape == (2, 8, 8, 1)
    assert logits[1].shape == (2, 4, 4, 1)
    assert logits[2].shape == (2, 2, 2, 1)
    logits2, feats = D(x, return_features=True)
    for a, b in zip(logits, logits2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # 4 feature maps per scale (first conv + 3 norm blocks), flat list.
    assert len(feats) == 12
    assert float(feature_matching_loss(feats, feats)) == 0.0


def test_scales_are_independent_nets():
    """The per-scale nets must not share parameters: on identical
    (scale-invariant) input the coarser net still differs because its
    weights are distinct draws."""
    D = define_D(1, ndf=8, n_layers_D=2, num_D=2)
    g0 = jax.tree.leaves(jax.tree.map(lambda x: x, D.nets[0].convs[0].kernel.value))[0]
    g1 = D.nets[1].convs[0].kernel.value
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_list_aware_gan_losses():
    a = jnp.full((2, 4, 4, 1), 0.5)
    b = jnp.full((2, 2, 2, 1), -0.5)
    for mode in ("lsgan", "vanilla", "hinge"):
        per_scale = [float(gan_loss(x, True, mode)) for x in (a, b)]
        np.testing.assert_allclose(
            float(gan_loss([a, b], True, mode)),
            np.mean(per_scale), rtol=1e-6)
        per_scale_g = [float(generator_gan_loss(x, mode)) for x in (a, b)]
        np.testing.assert_allclose(
            float(generator_gan_loss([a, b], mode)),
            np.mean(per_scale_g), rtol=1e-6)


def test_train_step_with_multiscale_d_and_fm():
    """One jit'd GAN step with num_D=2 + FM: runs, finite metrics, and
    both scales' D params receive gradient (their values move)."""
    from viai_tpu.nn import define_G
    from viai_tpu.testing import TINY_CFG, tone_batch
    from viai_tpu.train import init_state, make_train_step
    from viai_tpu.train.schedules import adam

    wav = jnp.asarray(tone_batch(2))
    cfg = dataclasses.replace(TINY_CFG, lambda_fm=10.0)
    G = define_G(ngf=8, dtype="float32")
    D = define_D(3, ndf=8, n_layers_D=2, num_D=2)
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
    d_before = jax.tree.map(lambda x: np.asarray(x).copy(), state["d"])
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    state, metrics = step(state, wav, None, jax.random.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert metrics["loss_G_FM"] > 0.0
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        d_before, state["d"]))
    assert all(m > 0.0 for m in moved)


def test_multiscale_checkpoint_roundtrip(tmp_path):
    """save_networks/load_networks round-trips the nested nnx.List
    state of the multi-scale D byte-exactly."""
    import argparse

    from viai_tpu.model import VIAIModel

    def mk(name):
        from viai_tpu.config.options import TrainOptions

        opt = TrainOptions().parse([
            "--name", name, "--checkpoints_dir", str(tmp_path),
            "--dataset_mode", "synthetic", "--num_D", "2",
            "--ngf", "8", "--ndf", "8", "--n_layers_D", "2",
            "--seed", "0",
        ])
        return VIAIModel(opt)

    m1 = mk("msd")
    m1.save_networks("ckpt")
    m2 = mk("msd")
    # A fresh-seed twin differs until the checkpoint load... seeds are
    # identical here, so perturb first to make the load observable.
    m2.state["d"] = jax.tree.map(lambda x: x + 1.0, m2.state["d"])
    m2.load_networks("ckpt")
    for a, b in zip(jax.tree.leaves(m1.state["d"]),
                    jax.tree.leaves(m2.state["d"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
