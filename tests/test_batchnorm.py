"""norm=batch: stats-free BatchNorm (VERDICT.md round-1 missing #8).

Pins the three claims the implementation makes: correct normalization
semantics, automatic global-batch stats under data parallelism (XLA
psum from sharding propagation — no hand collectives), and a training
step that optimizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from viai_tpu.nn.generator import BatchNorm, GeneratorConfig, UNetGenerator
from viai_tpu.testing import TINY_CFG, tone_batch
from viai_tpu.train import adam, init_state, make_mesh, make_train_step
from viai_tpu.train.mesh import batch_sharding, replicate


def test_batchnorm_normalizes_over_batch_and_space():
    bn = BatchNorm(8, jnp.float32, nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (4, 16, 16, 8)) * 3.0 + 2.0
    y = np.asarray(bn(x))
    # Affine is identity at init → output is standardized per channel.
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-3)


def _tiny_bn_g():
    cfg = GeneratorConfig(ngf=8, strides=((2, 2), (2, 2), (2, 1)),
                          mults=(1, 2, 4), norm="batch")
    return UNetGenerator(cfg, nnx.Rngs(0))


def test_batch_stats_are_global_under_dp():
    """Forward over an 8-way sharded batch == unsharded forward: the
    batch-stat reduction is a GLOBAL mean (XLA inserts the psum)."""
    G = _tiny_bn_g()
    g_def, g_state = nnx.split(G)
    x = jax.random.normal(jax.random.key(1), (8, 64, 64, 2))

    def fwd(state, x):
        return nnx.merge(g_def, state)(x)

    ref = np.asarray(jax.jit(fwd)(g_state, x))

    mesh = make_mesh(8)
    state_r = replicate(g_state, mesh)
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    out = np.asarray(jax.jit(fwd)(state_r, x_sharded))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_train_step_with_batch_norm_optimizes():
    from viai_tpu.nn import DiscriminatorConfig, PatchDiscriminator

    G = _tiny_bn_g()
    D = PatchDiscriminator(
        DiscriminatorConfig(in_channels=3, ndf=8, n_layers=2, norm="batch"),
        nnx.Rngs(1),
    )
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(tone_batch(4))
    key = jax.random.key(0)
    first = None
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wav, None, sub)
        assert np.isfinite(float(metrics["loss_G"]))
        if first is None:
            first = float(metrics["loss_G_L1"])
    assert float(metrics["loss_G_L1"]) < first


def test_cli_accepts_norm_batch(tmp_path):
    from viai_tpu.config.options import TrainOptions
    from viai_tpu.model import create_model

    opt = TrainOptions().parse(
        ["--name", "bn", "--checkpoints_dir", str(tmp_path),
         "--dataset_mode", "synthetic", "--ngf", "8", "--ndf", "8",
         "--norm", "batch"],
        save=False,
    )
    m = create_model(opt)
    G = nnx.merge(m.g_def, m.state["g"])
    assert type(G.downs[1].norm).__name__ == "BatchNorm"
