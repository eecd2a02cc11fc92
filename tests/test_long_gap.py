"""Long-gap / multi-res config tests (BASELINE.json config 3, [B:9])."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.testing import TINY_CFG, tone_batch
from viai_tpu.train import adam, init_state, make_train_step
from viai_tpu.train.step import _g_input, preprocess


def _cfg():
    return dataclasses.replace(TINY_CFG, multi_res=True)


def test_preprocess_adds_multires_channel():
    cfg = _cfg()
    wav = jnp.asarray(tone_batch(2))
    batch = preprocess(wav, jax.random.key(0), cfg)
    assert "masked_lo_img" in batch
    assert batch["masked_lo_img"].shape == batch["masked_img"].shape
    x = _g_input(batch)
    assert x.shape[-1] == 3
    # Coarse channel is a valid [-1,1] image, masked in the same place.
    lo = np.asarray(batch["masked_lo_img"])
    assert lo.min() >= -1 and lo.max() <= 1
    m = np.asarray(batch["mask_img"][..., 0])
    hole = m == 0
    assert np.allclose(lo[..., 0][hole], -1.0, atol=1e-5)


def test_long_gap_train_step():
    from viai_tpu.nn import (
        DiscriminatorConfig,
        GeneratorConfig,
        PatchDiscriminator,
        UNetGenerator,
    )
    from flax import nnx

    cfg = dataclasses.replace(
        _cfg(),
        mask=dataclasses.replace(TINY_CFG.mask, min_gap_frames=20,
                                 max_gap_frames=32),
    )
    rngs = nnx.Rngs(0)
    G = UNetGenerator(
        GeneratorConfig(in_channels=3, ngf=8,
                        strides=((2, 2), (2, 2), (2, 1)), mults=(1, 2, 4)),
        rngs,
    )
    D = PatchDiscriminator(
        DiscriminatorConfig(in_channels=4, ndf=8, n_layers=2), rngs
    )
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(tone_batch(2))
    state, metrics = step(state, wav, None, jax.random.key(0))
    assert np.isfinite(float(metrics["loss_G"]))
    assert np.isfinite(float(metrics["loss_D"]))


def test_long_gap_cli_options():
    from viai_tpu.model import train_config_from_opt
    from viai_tpu.config.options import TrainOptions

    opt = TrainOptions().parse(
        ["--long_gap", "--name", "x", "--checkpoints_dir", "/tmp/lg_test"],
        save=False,
    )
    cfg = train_config_from_opt(opt)
    assert cfg.multi_res
    assert cfg.mask.min_gap_frames == 75
    assert cfg.mask.max_gap_frames == 150
