"""Gated convolutions (DeepFill-v2 style, --gated).

The round-3 notes attribution matrix covered phase, receptive field,
capacity, loss weighting, information and copying — but every lever
kept the VANILLA conv, which treats hole and observed pixels
identically past layer 1. Gated convs let each layer re-derive soft
validity for its own receptive field; these tests pin the block
semantics, shape preservation, gradient flow through the gates, and
the CLI/train-step integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.nn import define_G


def test_gated_generator_shapes_match_vanilla():
    x = jnp.ones((2, 256, 256, 2))
    y_van = define_G(ngf=8, dtype="float32")(x)
    y_gat = define_G(ngf=8, dtype="float32", gated=True)(x)
    assert y_van.shape == y_gat.shape == (2, 256, 256, 1)


def test_gated_param_count_roughly_doubles_conv_outputs():
    from flax import nnx

    def n_params(g):
        return sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(nnx.split(g)[1]))

    van = n_params(define_G(ngf=8, dtype="float32"))
    gat = n_params(define_G(ngf=8, dtype="float32", gated=True))
    # Every encoder/decoder conv doubles its out-channels (head and
    # norms don't), so the total sits well below 2x but clearly above.
    assert 1.5 < gat / van < 2.1, gat / van


def test_gate_gradient_flows():
    """The sigmoid-gate half of each conv kernel must receive gradient
    (a dead gate would silently degenerate to a vanilla conv scaled by
    sigmoid(0)=0.5)."""
    G = define_G(ngf=8, dtype="float32", gated=True)
    from flax import nnx

    g_def, g_state = nnx.split(G)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 2)), jnp.float32)

    def loss(state):
        return jnp.sum(nnx.merge(g_def, state)(x) ** 2)

    grads = jax.grad(loss)(g_state)
    k = np.asarray(jax.tree.leaves(grads)[0])
    # First down conv kernel: (4,4,2,2*8): both halves of the output
    # channel axis (features 0:8, gates 8:16) must be non-zero.
    conv0 = None
    for g in jax.tree.leaves(grads):
        if g.ndim == 4 and g.shape[-1] == 16:
            conv0 = np.asarray(g)
            break
    assert conv0 is not None
    assert np.abs(conv0[..., :8]).max() > 0
    assert np.abs(conv0[..., 8:]).max() > 0


def test_train_step_with_gated_generator():
    from viai_tpu.nn import define_D
    from viai_tpu.testing import TINY_CFG, tone_batch
    from viai_tpu.train import init_state, make_train_step
    from viai_tpu.train.schedules import adam

    wav = jnp.asarray(tone_batch(2))
    G = define_G(ngf=8, dtype="float32", gated=True)
    D = define_D(3, ndf=8, n_layers_D=2)
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    state, metrics = step(state, wav, None, jax.random.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_gated_cli_roundtrip(tmp_path):
    """--gated must build the same architecture at train and test time
    (checkpoint save under train options, load under test options)."""
    from viai_tpu.config.options import TestOptions, TrainOptions
    from viai_tpu.model import VIAIModel

    t_opt = TrainOptions().parse([
        "--name", "g1", "--checkpoints_dir", str(tmp_path),
        "--dataset_mode", "synthetic", "--gated",
        "--ngf", "8", "--ndf", "8", "--n_layers_D", "2",
    ])
    m = VIAIModel(t_opt)
    m.save_networks("e")
    e_opt = TestOptions().parse([
        "--name", "g1", "--checkpoints_dir", str(tmp_path),
        "--dataset_mode", "synthetic", "--gated", "--ngf", "8",
        "--ndf", "8", "--n_layers_D", "2",
    ])
    e_opt.isTrain = False
    m2 = VIAIModel(e_opt)
    m2.load_networks("e")  # raises on any shape mismatch
    for a, b in zip(jax.tree.leaves(m.state["g"]),
                    jax.tree.leaves(m2.state["g"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
