"""Integration: one train_step on synthetic data — losses finite &
decreasing, D/G alternation correct (SURVEY.md §4 Integration row).

Uses a tiny STFT/model config so the CPU test stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from viai_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    PatchDiscriminator,
    UNetGenerator,
    VideoFeatureNet,
    VideoNetConfig,
)
from viai_tpu.signal import MaskConfig, STFTConfig
from viai_tpu.train import (
    TrainConfig,
    adam,
    init_state,
    make_infer_fn,
    make_train_step,
)

from viai_tpu.testing import TINY_CFG, TINY_STFT, tiny_models as _tiny_models, tone_batch as _wav


@pytest.mark.parametrize("order", ["simultaneous", "sequential"])
def test_train_step_losses_finite_and_decreasing(order):
    cfg = TrainConfig(**{**TINY_CFG.__dict__, "update_order": order})
    G, D, V = _tiny_models()
    g_tx = adam(2e-4)
    d_tx = adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(_wav())
    key = jax.random.key(0)
    first_l1 = None
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wav, None, sub)
        m = jax.tree.map(float, metrics)
        assert all(np.isfinite(v) for v in m.values()), m
        if first_l1 is None:
            first_l1 = m["loss_G_L1"]
    assert int(state["step"]) == 8
    # L1 should drop on a deterministic batch of sines after 8 steps.
    assert m["loss_G_L1"] < first_l1, (m["loss_G_L1"], first_l1)


def test_train_step_with_video_branch():
    G, D, V = _tiny_models(use_video=True)
    cfg = TrainConfig(**{**TINY_CFG.__dict__, "use_video": True})
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(_wav(2))
    frames = jax.random.normal(jax.random.key(7), (2, 8, 16, 16, 3))
    v_before = jax.tree.map(np.asarray, jax.tree.leaves(state["v"]))
    state, metrics = step(state, wav, frames, jax.random.key(1))
    assert np.isfinite(float(metrics["loss_G"]))
    # Video net must receive gradients (trains jointly with G).
    v_after = jax.tree.leaves(state["v"])
    changed = any(
        not np.allclose(b, np.asarray(a)) for b, a in zip(v_before, v_after)
    )
    assert changed, "video net got no gradient"


def test_d_and_g_params_both_update():
    G, D, V = _tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(_wav(2))
    g0 = np.asarray(jax.tree.leaves(state["g"])[0])
    d0 = np.asarray(jax.tree.leaves(state["d"])[0])
    state, _ = step(state, wav, None, jax.random.key(0))
    assert not np.allclose(g0, np.asarray(jax.tree.leaves(state["g"])[0]))
    assert not np.allclose(d0, np.asarray(jax.tree.leaves(state["d"])[0]))


def test_infer_chain_produces_waveform():
    G, D, V = _tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=4)
    wav = jnp.asarray(_wav(2))
    out = infer(state["g"], state["v"], wav, jax.random.key(0))
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()


def test_mixed_av_batch_frames_valid():
    """Mixed audio-visual batches [B:11]: invalid-video clips get zero
    fusion features; the step runs and V still gets gradient from the
    valid clips."""
    G, D, V = _tiny_models(use_video=True)
    cfg = TrainConfig(**{**TINY_CFG.__dict__, "use_video": True})
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(_wav(4))
    frames = jax.random.normal(jax.random.key(3), (4, 8, 16, 16, 3))
    valid = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    state, metrics = step(state, wav, frames, jax.random.key(1), valid)
    assert np.isfinite(float(metrics["loss_G"]))


def test_infer_composite_preserves_observed_region():
    """The inference chain keeps observed spectrogram content verbatim:
    |STFT(output)| in the observed columns must track the input closely
    (up to GL phase-reconstruction error), and the hole must be filled
    with the generator's (untrained → near-silence) content."""
    from viai_tpu.signal import stft_magnitude
    from viai_tpu.train.step import preprocess_with_mask

    G, D, V = _tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=16,
                          external_mask=True)
    wav = jnp.asarray(_wav(2, seed=11))
    tmask = jnp.ones((2, TINY_CFG.image_frames)).at[:, 20:36].set(0.0)
    out = infer(state["g"], state["v"], wav, tmask)
    mag_in = stft_magnitude(wav, TINY_CFG.stft)
    mag_out = stft_magnitude(out, TINY_CFG.stft)
    # Observed frames (away from the hole boundary): relative error
    # bounded by GL convergence, i.e. well under 50%.
    obs = np.asarray(mag_in[:, :16])
    obs_out = np.asarray(mag_out[:, :16])
    rel = np.linalg.norm(obs_out - obs) / np.linalg.norm(obs)
    assert rel < 0.5, rel
    # Energy exists in the output (sanity).
    assert float(jnp.abs(out).max()) > 0.01
