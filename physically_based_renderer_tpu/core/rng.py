"""Counter-based RNG for the path tracer.

Design: every random decision is keyed by (frame_seed, pixel, sample, bounce,
stream) through JAX's threefry counter-based PRNG — no mutable state, fully
reproducible, order-independent, and shard-invariant: a pixel's sample
sequence is identical no matter which device renders its tile, which is what
makes multi-host renders bitwise-stable under resharding.

The reference has no RNG (rasterizer); this subsystem is new per the
north-star design (BASELINE.json), but plays the role the fixed sample
pattern of the rasterizer played.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream ids: disjoint random streams per decision point within one bounce.
STREAM_PIXEL_JITTER = 0
STREAM_BSDF = 1
STREAM_LIGHT = 2
STREAM_RR = 3  # Russian roulette


def pixel_keys(base: jax.Array, n_pixels: int) -> jax.Array:
    """One key per pixel; base is a single threefry key."""
    return jax.random.split(base, n_pixels)


def fold(key: jax.Array, *data: int | jnp.ndarray) -> jax.Array:
    """Fold integers into a key (vectorized over key batch dims)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key


def sample_key(base: jax.Array, sample_idx, bounce, stream) -> jax.Array:
    """Key for a given (sample, bounce, stream) from a per-frame base key."""
    return fold(base, sample_idx, bounce, stream)


def uniform2(key: jax.Array, shape) -> jnp.ndarray:
    """U[0,1)^2 of the given batch shape -> f32[*shape, 2]."""
    return jax.random.uniform(key, tuple(shape) + (2,), jnp.float32)


def uniform1(key: jax.Array, shape) -> jnp.ndarray:
    return jax.random.uniform(key, tuple(shape), jnp.float32)


def ray_keys(sample_key_: jax.Array, pixel_ids: jnp.ndarray) -> jax.Array:
    """One key per ray from a per-sample base key and GLOBAL pixel ids.

    Because the key depends only on (frame, sample, pixel), the random
    sequence of a pixel is identical however rays are batched or sharded —
    the property that makes multi-host tiles bitwise-reproducible.
    """
    return jax.vmap(lambda i: jax.random.fold_in(sample_key_, i))(pixel_ids)


def ray_uniform(keys: jax.Array, bounce: int, stream: int,
                m: int) -> jnp.ndarray:
    """m U[0,1) numbers per ray -> f32[N, m], from per-ray keys."""
    def one(k):
        k = jax.random.fold_in(jax.random.fold_in(k, bounce), stream)
        return jax.random.uniform(k, (m,), jnp.float32)
    return jax.vmap(one)(keys)
