"""Distributed DP tests on the virtual 8-device CPU mesh.

SURVEY.md §4 "Distributed" row: DP train step on mesh sizes 1/4/8 —
grads (hence updated params) identical to single-device, since XLA's
psum of per-shard grads must equal the full-batch gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_train_step import TINY_CFG, _tiny_models, _wav
from viai_tpu.train import (
    adam,
    init_state,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
)


def _run_steps(mesh, n_steps=2, batch=8):
    import optax

    G, D, V = _tiny_models(seed=0)
    # SGD, not Adam: Adam's m/rsqrt(v) turns float-reassociation noise on
    # near-zero grads into O(lr) param flips, masking what we verify here
    # — that DP per-shard grads psum to the full-batch gradient. With SGD
    # the param delta IS the gradient (times lr), so the check is direct.
    g_tx, d_tx = optax.sgd(0.05), optax.sgd(0.05)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    state = replicate(state, mesh)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(_wav(batch))
    key = jax.random.key(42)
    with jax.set_mesh(mesh):
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            wav_sharded = jax.device_put(
                wav, NamedSharding(mesh, P("data"))
            )
            state, metrics = step(state, wav_sharded, None, sub)
    return state, jax.tree.map(float, metrics)


def test_device_count():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


@pytest.mark.parametrize("n_data", [4, 8])
def test_dp_matches_single_device(n_data):
    mesh1 = make_mesh(1)
    meshN = make_mesh(n_data)
    s1, m1 = _run_steps(mesh1)
    sN, mN = _run_steps(meshN)
    # Same losses step-for-step...
    for k in m1:
        np.testing.assert_allclose(m1[k], mN[k], rtol=2e-4, atol=2e-5)
    # ...and identical updated params (= identical grads under SGD, up
    # to fp32 reduction-order noise).
    l1 = jax.tree.leaves(s1["g"]) + jax.tree.leaves(s1["d"])
    lN = jax.tree.leaves(sN["g"]) + jax.tree.leaves(sN["d"])
    for a, b in zip(l1, lN):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_batch_is_actually_sharded():
    mesh = make_mesh(8)
    wav = jnp.asarray(_wav(8))
    sharded = shard_batch({"wav": wav}, mesh)["wav"]
    assert len(sharded.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(1, wav.shape[1])}


def _run_adam_steps(mesh, n_steps=20, batch=8, lr=2e-4):
    """Adam-path twin of _run_steps (VERDICT r2 weak #4): the v4-32
    target trains with Adam, so DP equivalence needs evidence beyond
    SGD. Returns per-step loss_G trajectory + final states."""
    G, D, V = _tiny_models(seed=0)
    g_tx, d_tx = adam(lr, beta1=0.5), adam(lr, beta1=0.5)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    state = replicate(state, mesh)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(_wav(batch))
    key = jax.random.key(42)
    traj = []
    with jax.set_mesh(mesh):
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            wav_sharded = jax.device_put(
                wav, NamedSharding(mesh, P("data"))
            )
            state, metrics = step(state, wav_sharded, None, sub)
            traj.append(float(metrics["loss_G"]))
    return state, traj


def test_dp_adam_loss_trajectory_matches_single_device():
    """DP(8) under ADAM tracks the single-device loss trajectory over
    20 steps and ends with closely matching params.

    Tolerance rationale: per-shard grad psum reassociates fp32 sums, an
    O(eps) relative difference in each gradient. Adam normalizes the
    update to m/rsqrt(v+eps), so for NOISE-DOMINATED coordinates (grad
    ≈ fp32 noise) the update direction is the noise's sign: per-step
    drift on such coordinates is up to ±lr no matter how tiny the grad
    — which is exactly why the exact-equality test above uses SGD, and
    why a relative param tolerance is meaningless here. The physically
    meaningful bound is ABSOLUTE: |Δparam| ≤ n_steps·lr = 20·2e-4 =
    4e-3 (observed max ≈ 2e-3). Losses, in contrast, are dominated by
    signal-carrying coordinates and agree tightly (observed
    |Δloss|/loss ≈ 1e-5; band 1e-2). A real DP bug — missed psum
    (per-device param divergence), wrong axis, stale D — derails the
    loss trajectory itself, which the tight trajectory band catches;
    Adam's scale invariance makes grad-SCALE bugs invisible to it,
    but those are exactly what the SGD equality test pins."""
    _, t1 = _run_adam_steps(make_mesh(1))
    s8, t8 = _run_adam_steps(make_mesh(8))
    np.testing.assert_allclose(t1, t8, rtol=1e-2)
    s1, _ = _run_adam_steps(make_mesh(1))  # determinism guard re-run
    l1 = jax.tree.leaves(s1["g"]) + jax.tree.leaves(s1["d"])
    l8 = jax.tree.leaves(s8["g"]) + jax.tree.leaves(s8["d"])
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=6e-3
        )


def test_model_axis_param_sharding_matches_replicated():
    """Params sharded over the 'model' axis (the opt-in BASELINE
    config-5 mode) produce bit-compatible training with replicated DP:
    placement changes, math doesn't. Mesh (4 data x 2 model) vs
    (4 data x 1). SGD so the comparison is exact up to fp32
    reduction-order noise (see the Adam test's rationale)."""
    import optax

    from viai_tpu.train import shard_params

    def run(n_model):
        mesh = make_mesh(4, n_model=n_model)
        G, D, V = _tiny_models(seed=0)
        tx = optax.with_extra_args_support(optax.sgd(0.05))
        (g_def, d_def, v_def), state = init_state(G, D, V, tx, tx)
        state = (shard_params(state, mesh, min_shard=1) if n_model > 1
                 else replicate(state, mesh))
        step = make_train_step(g_def, d_def, v_def, tx, tx, TINY_CFG)
        wav = jnp.asarray(_wav(8))
        key = jax.random.key(3)
        with jax.set_mesh(mesh):
            for _ in range(2):
                key, sub = jax.random.split(key)
                w = jax.device_put(wav, NamedSharding(mesh, P("data")))
                state, metrics = step(state, w, None, sub)
        return state, jax.tree.map(float, metrics)

    s_rep, m_rep = run(1)
    s_shard, m_shard = run(2)
    for k in m_rep:
        np.testing.assert_allclose(m_rep[k], m_shard[k], rtol=2e-4,
                                   atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_rep["g"]),
                    jax.tree.leaves(s_shard["g"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_shard_params_actually_shards():
    """At least the big conv kernels must land sharded over 'model'
    (8 devices see 1/2 of the last axis each on a (4,2) mesh), and the
    Adam moments inherit the same placement."""
    from viai_tpu.train import adam as _adam, shard_params

    mesh = make_mesh(4, n_model=2)
    G, D, V = _tiny_models(seed=0)
    g_tx, d_tx = _adam(2e-4), _adam(2e-4)
    _, state = init_state(G, D, V, g_tx, d_tx)
    state = shard_params(state, mesh, min_shard=1)
    n_sharded = 0
    for leaf in jax.tree.leaves(state["g"]) + jax.tree.leaves(
            state["g_opt"]):
        shards = {s.data.shape for s in leaf.addressable_shards}
        if len(leaf.shape) and leaf.shape[-1] % 2 == 0:
            want = leaf.shape[:-1] + (leaf.shape[-1] // 2,)
            assert shards == {want}, (leaf.shape, shards)
            n_sharded += 1
    assert n_sharded >= 8  # conv kernels + biases + m/v moments


def test_param_sharding_composes_with_bottleneck_attn():
    """The round-3 attention blocks introduce nnx.Linear params; the
    leaf-generic last-axis policy of shard_params must place and train
    them identically to replicated DP (the qkv kernel (C, 3C) and mlp
    kernels are all divisible by the model-axis size). Mirrors
    test_model_axis_param_sharding_matches_replicated with an attn-G."""
    import optax

    from viai_tpu.nn.generator import GeneratorConfig, UNetGenerator
    from viai_tpu.train import shard_params
    from flax import nnx as _nnx

    def models():
        rngs = _nnx.Rngs(0)
        G = UNetGenerator(GeneratorConfig(
            ngf=8, strides=((2, 2), (2, 2), (2, 1)), mults=(1, 2, 4),
            bottleneck_attn=1, attn_heads=4), rngs)
        _, D, _ = _tiny_models(seed=0)
        return G, D, None

    def run(n_model):
        mesh = make_mesh(4, n_model=n_model)
        G, D, V = models()
        tx = optax.with_extra_args_support(optax.sgd(0.05))
        (g_def, d_def, v_def), state = init_state(G, D, V, tx, tx)
        state = (shard_params(state, mesh, min_shard=1) if n_model > 1
                 else replicate(state, mesh))
        step = make_train_step(g_def, d_def, v_def, tx, tx, TINY_CFG)
        wav = jnp.asarray(_wav(8))
        key = jax.random.key(3)
        with jax.set_mesh(mesh):
            for _ in range(2):
                key, sub = jax.random.split(key)
                w = jax.device_put(wav, NamedSharding(mesh, P("data")))
                state, metrics = step(state, w, None, sub)
        return state, jax.tree.map(float, metrics)

    s_rep, m_rep = run(1)
    s_shard, m_shard = run(2)
    for k in m_rep:
        np.testing.assert_allclose(m_rep[k], m_shard[k], rtol=2e-4,
                                   atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_rep["g"]),
                    jax.tree.leaves(s_shard["g"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
