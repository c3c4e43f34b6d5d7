"""End-to-end slice: BASELINE config #1 — single Lambertian triangle +
directional light, 1 bounce, vs the ANALYTIC image, plus finite-difference
gradient checks (the north-star correctness oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import (
    RenderConfig, render_image, render_sample, trace_radiance)
from physically_based_renderer_tpu.scene.procedural import make_triangle_scene

ALBEDO = (0.8, 0.3, 0.2)
RADIANCE = (3.0, 3.0, 3.0)


@pytest.fixture(scope="module")
def scene():
    return make_triangle_scene(albedo=ALBEDO, light_dir=(0.0, 0.0, -1.0),
                               light_radiance=RADIANCE)


@pytest.fixture(scope="module")
def camera():
    return Camera.make(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                       fov_y=1.2)


def _analytic_pixel():
    """Expected radiance for a hit pixel: albedo/pi * (n.l) * Li, with
    n=(0,0,1), l=(0,0,1) (toward light), so n.l = 1."""
    return np.asarray(ALBEDO) / np.pi * np.asarray(RADIANCE)


def test_hit_pixels_match_analytic(scene, camera):
    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=1)
    img = np.asarray(render_image(scene, camera, 0, cfg))
    expected = _analytic_pixel()
    # center pixel definitely hits the triangle
    center = img[32, 32]
    np.testing.assert_allclose(center, expected, rtol=1e-4)
    # corners miss -> black (no env)
    np.testing.assert_allclose(img[0, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(img[-1, -1], 0.0, atol=1e-7)


def test_image_orientation(scene, camera):
    """Orientation must match the reference: its y-down up-vector
    (CameraData.hpp:28) cancels against Vulkan's y-down framebuffer, so
    world +y appears at the image TOP.  The triangle apex (world y=+1) lands
    in the top half; the wide base (y=-1) in the bottom half."""
    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=1)
    img = np.asarray(render_image(scene, camera, 0, cfg))
    hit_mask = img.sum(-1) > 0
    assert hit_mask.any()
    top_half = hit_mask[:32].sum()
    bottom_half = hit_mask[32:].sum()
    # the wide base has more pixels than the apex -> bottom half dominates
    assert bottom_half > top_half
    # apex reaches higher than any base row: topmost hit row is in top half
    assert np.nonzero(hit_mask.any(axis=1))[0][0] < 32


def test_deterministic(scene, camera):
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=1)
    a = np.asarray(render_image(scene, camera, 7, cfg))
    b = np.asarray(render_image(scene, camera, 7, cfg))
    np.testing.assert_array_equal(a, b)


def test_grad_albedo_matches_finite_difference(scene, camera):
    """d(mean pixel)/d(albedo_r) via autodiff vs central differences."""
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1)
    key = jax.random.key(0)

    def loss(albedo_r):
        bcf = jnp.asarray(
            scene.materials.base_color_factor).at[0, 0].set(albedo_r)
        s = scene.replace(materials=scene.materials.replace(
            base_color_factor=bcf))
        img = render_sample(s, camera, key, cfg)
        return img.sum()

    g = jax.grad(loss)(jnp.float32(0.8))
    eps = 1e-2
    fd = (loss(jnp.float32(0.8 + eps)) - loss(jnp.float32(0.8 - eps))) / (
        2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_grad_light_radiance_matches_fd(scene, camera):
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1)
    key = jax.random.key(0)

    def loss(lr):
        s = scene.replace(directional=scene.directional.replace(
            radiance=jnp.full((3,), lr)))
        return render_sample(s, camera, key, cfg).sum()

    g = jax.grad(loss)(jnp.float32(3.0))
    eps = 1e-2
    fd = (loss(jnp.float32(3.0 + eps)) - loss(jnp.float32(3.0 - eps))) / (
        2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_grad_vertex_positions_finite(scene, camera):
    """Vertex-position gradients exist and are finite (continuous part)."""
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=1)
    key = jax.random.key(0)

    def loss(dz):
        pos = scene.geometry.positions + jnp.array([0.0, 0.0, 1.0]) * dz
        s = scene.replace(geometry=scene.geometry.replace(positions=pos))
        return render_sample(s, camera, key, cfg).sum()

    g = jax.grad(loss)(jnp.float32(0.0))
    assert np.isfinite(float(g))


def test_jit_cache(scene, camera):
    """Second call with same config must not retrace (static cfg hashing)."""
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1)
    from physically_based_renderer_tpu.integrator.path import render
    k = jax.random.key(0)
    render(scene, camera, k, cfg)
    n0 = render._cache_size()
    render(scene, camera, jax.random.key(1), cfg)
    assert render._cache_size() == n0
