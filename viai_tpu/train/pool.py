"""ImagePool — device-resident fake-spectrogram history buffer for D.

Reference capability (SURVEY.md §2.1 "Visualizer/HTML" row lists
`ImagePool (fake buffer for D)`): the pix2pix ImagePool keeps the last
`pool_size` generated images and, with probability 0.5 per item, feeds
the discriminator an OLD fake instead of the current one (stabilizes
GAN training, Shrivastava et al. 2017).

TPU redesign: the reference's pool is a Python list manipulated on
host. Here it is a fixed-shape device array inside the train state,
updated with gather/scatter under jit — no host round-trip, fully
static shapes, works sharded (pool is replicated; swap decisions are
made from the jit-level PRNG key so every shard agrees).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_pool(pool_size: int, item_shape: tuple[int, ...]) -> dict:
    """Pool state pytree: buffer + count of filled slots."""
    return {
        "buf": jnp.zeros((pool_size, *item_shape), jnp.float32),
        "n": jnp.zeros((), jnp.int32),
    }


def query_pool(pool: dict, fakes: jax.Array, key: jax.Array):
    """(pool, (B, ...) fakes) → (new_pool, (B, ...) images for D).

    Semantics (matching the reference pool):
      * while the pool is not full: insert the fake, return it as-is;
      * once full: with p=0.5 return a random stored image and replace
        it with the incoming fake; otherwise return the fake untouched.
    """
    pool_size = pool["buf"].shape[0]
    batch = fakes.shape[0]
    k_swap, k_idx = jax.random.split(key)
    swap = jax.random.bernoulli(k_swap, 0.5, (batch,))
    rand_idx = jax.random.randint(k_idx, (batch,), 0, pool_size)

    # Slot each incoming fake would fill while the pool is filling up.
    fill_idx = pool["n"] + jnp.arange(batch, dtype=jnp.int32)
    filling = fill_idx < pool_size
    # Target slot: fill slot while filling; else the random slot if
    # swapping, else an out-of-range sentinel (drop scatter below).
    tgt = jnp.where(filling, jnp.minimum(fill_idx, pool_size - 1),
                    jnp.where(swap, rand_idx, pool_size))

    old = pool["buf"][jnp.clip(rand_idx, 0, pool_size - 1)]
    # Returned image: stored one only when pool is full AND swap fired.
    use_old = jnp.logical_and(~filling, swap)
    out = jnp.where(
        use_old.reshape((-1,) + (1,) * (fakes.ndim - 1)), old, fakes
    )

    # Scatter incoming fakes into their target slots ('drop' ignores the
    # out-of-range sentinel rows).
    buf = pool["buf"].at[tgt].set(fakes, mode="drop")
    new_pool = {
        "buf": buf,
        "n": jnp.minimum(pool["n"] + batch, pool_size).astype(jnp.int32),
    }
    return new_pool, out
