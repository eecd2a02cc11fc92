"""ImagePool semantics tests (SURVEY.md §2.1 ImagePool row)."""

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train import adam, init_state, make_train_step
from viai_tpu.train.pool import init_pool, query_pool


def _item(v, shape=(4, 4, 1)):
    return jnp.full(shape, float(v), jnp.float32)


def test_pool_fills_then_swaps():
    pool = init_pool(4, (4, 4, 1))
    key = jax.random.key(0)
    # Filling phase: items pass through unchanged and land in the pool.
    fakes = jnp.stack([_item(i) for i in range(4)])
    pool, out = query_pool(pool, fakes, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
    assert int(pool["n"]) == 4
    np.testing.assert_array_equal(np.asarray(pool["buf"]), np.asarray(fakes))
    # Full phase: over many queries, some outputs must come from history.
    swapped = 0
    for s in range(20):
        fakes = jnp.stack([_item(100 + s * 4 + i) for i in range(4)])
        pool, out = query_pool(pool, fakes, jax.random.key(s + 1))
        diff = ~np.isclose(
            np.asarray(out).reshape(4, -1)[:, 0],
            np.asarray(fakes).reshape(4, -1)[:, 0],
        )
        swapped += int(diff.sum())
    assert swapped > 0, "pool never returned a stored image"
    # Count never exceeds capacity.
    assert int(pool["n"]) == 4


def test_train_step_with_pool_runs():
    import dataclasses

    cfg = dataclasses.replace(TINY_CFG, pool_size=8, n_bins=64)
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx, cfg)
    assert "pool" in state
    assert state["pool"]["buf"].shape == (8, 64, 64, 3)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    wav = jnp.asarray(tone_batch(4))
    for i in range(3):
        state, metrics = step(state, wav, None, jax.random.key(i))
    assert int(state["pool"]["n"]) == 8  # filled after 2+ steps of batch 4
    assert np.isfinite(float(metrics["loss_D"]))
