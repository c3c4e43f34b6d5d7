"""Resident (VMEM-whole-scene) Pallas tracer vs brute-force oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.ops.intersect import (
    intersect_brute, occluded_brute)
from physically_based_renderer_tpu.ops.resident import intersect_resident
from physically_based_renderer_tpu.scene.procedural import make_cornell_box


@pytest.fixture(scope="module")
def cornell():
    return make_cornell_box()


def _rays(n, key):
    ko, kd = jax.random.split(jax.random.key(key))
    o = jax.random.uniform(ko, (n, 3), minval=-0.5, maxval=0.5) + jnp.array(
        [0.0, 1.0, 1.5])
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_resident_matches_brute(cornell):
    g = cornell.geometry
    o, d = _rays(512, 0)
    hit_r = intersect_resident(g, o, d, t_min=1e-3, interpret=True)
    v0, v1, v2 = g.tri_vertices()
    hit_b = intersect_brute(o, d, v0, v1, v2, t_min=1e-3)
    np.testing.assert_array_equal(np.asarray(hit_r.tri), np.asarray(hit_b.tri))
    np.testing.assert_allclose(np.asarray(hit_r.t), np.asarray(hit_b.t),
                               rtol=1e-5)


def test_resident_any_hit(cornell):
    g = cornell.geometry
    o, d = _rays(512, 1)
    occ_r = intersect_resident(g, o, d, t_min=1e-3, t_max=2.0, any_hit=True,
                               interpret=True)
    v0, v1, v2 = g.tri_vertices()
    occ_b = occluded_brute(o, d, v0, v1, v2, t_min=1e-3, t_max=2.0)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_b))


def test_resident_per_ray_tmax(cornell):
    g = cornell.geometry
    o, d = _rays(256, 2)
    t_max = jax.random.uniform(jax.random.key(3), (256,), minval=0.1,
                               maxval=4.0)
    occ_r = intersect_resident(g, o, d, t_min=1e-3, t_max=t_max,
                               any_hit=True, interpret=True)
    v0, v1, v2 = g.tri_vertices()
    occ_b = occluded_brute(o, d, v0, v1, v2, t_min=1e-3, t_max=t_max)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_b))


def test_resident_render_matches_brute(cornell):
    """Full-frame render through tracer=resident == tracer=brute."""
    from physically_based_renderer_tpu.core.camera import Camera
    from physically_based_renderer_tpu.integrator.path import (
        RenderConfig, render)
    cam = Camera.make(position=(0.0, 1.0, 3.9), target=(0.0, 1.0, 0.0),
                      fov_y=0.95)
    base = dict(width=24, height=16, spp=1, max_bounces=2)
    img_b = render(cornell, cam, jax.random.key(5),
                   RenderConfig(**base, tracer="brute")).mean()
    img_r = render(cornell, cam, jax.random.key(5),
                   RenderConfig(**base, tracer="resident")).mean()
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_b),
                               rtol=1e-4, atol=1e-5)
