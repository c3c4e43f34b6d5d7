"""Intersection op tests: Moller-Trumbore brute force correctness."""

import numpy as np
import jax.numpy as jnp

from physically_based_renderer_tpu.ops.intersect import (
    intersect_brute, occluded_brute)
from physically_based_renderer_tpu.scene.procedural import make_random_tris


def _unit_tri():
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    v1 = jnp.array([[1.0, -1.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    return v0, v1, v2


def test_hit_and_miss():
    v0, v1, v2 = _unit_tri()
    o = jnp.array([[0.0, 0.0, 5.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, v0, v1, v2)
    assert int(hit.tri[0]) == 0
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)
    assert int(hit.tri[1]) == -1


def test_backface_hits_too():
    # Path tracers need double-sided hits (unlike the raster reference's
    # back-face cull, PbrRenderSystem.cpp:181).
    v0, v1, v2 = _unit_tri()
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect_brute(o, d, v0, v1, v2)
    assert int(hit.tri[0]) == 0


def test_barycentrics_interpolate_position():
    v0, v1, v2 = _unit_tri()
    o = jnp.array([[0.2, -0.1, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, v0, v1, v2)
    p = (hit.w[:, None] * v0 + hit.u[:, None] * v1 + hit.v[:, None] * v2)
    np.testing.assert_allclose(np.asarray(p[0]), [0.2, -0.1, 0.0], atol=1e-5)


def test_closest_of_two():
    v0 = jnp.array([[-1.0, -1.0, 0.0], [-1.0, -1.0, 2.0]])
    v1 = jnp.array([[1.0, -1.0, 0.0], [1.0, -1.0, 2.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 2.0]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, v0, v1, v2)
    assert int(hit.tri[0]) == 1  # z=2 plane is closer from z=5
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-5)


def test_chunking_matches_unchunked():
    g = make_random_tris(300, seed=3)
    v0, v1, v2 = g.tri_vertices()
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h1 = intersect_brute(o, d, v0, v1, v2, chunk=64)
    h2 = intersect_brute(o, d, v0, v1, v2, chunk=4096)
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h2.tri))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)


def test_occluded():
    v0, v1, v2 = _unit_tri()
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0], [5.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t_max = jnp.array([10.0, 3.0, 10.0])  # second ray stops before the tri
    occ = occluded_brute(o, d, v0, v1, v2, t_max=t_max)
    assert bool(occ[0]) is True
    assert bool(occ[1]) is False
    assert bool(occ[2]) is False


def test_differentiable_wrt_vertices():
    import jax
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])

    def hit_t(dz):
        v0 = jnp.array([[-1.0, -1.0, 0.0]]) + jnp.array([0.0, 0.0, 1.0]) * dz
        v1 = jnp.array([[1.0, -1.0, 0.0]]) + jnp.array([0.0, 0.0, 1.0]) * dz
        v2 = jnp.array([[0.0, 1.0, 0.0]]) + jnp.array([0.0, 0.0, 1.0]) * dz
        return intersect_brute(o, d, v0, v1, v2).t[0]

    g = jax.grad(hit_t)(0.0)
    # Moving the tri +z by dz shortens t by dz.
    np.testing.assert_allclose(float(g), -1.0, atol=1e-4)
