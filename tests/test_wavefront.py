"""Wavefront integrator: agreement with the dense integrator."""

import jax
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import (
    RenderConfig, render)
from physically_based_renderer_tpu.integrator.wavefront import (
    render_wavefront)
from physically_based_renderer_tpu.scene.procedural import (
    make_cornell_box, make_triangle_scene)


def test_wavefront_matches_dense_triangle():
    scene = make_triangle_scene()
    cam = Camera.make(position=(0, 0, 3), target=(0, 0, 0), fov_y=1.2)
    cfg = RenderConfig(width=24, height=24, spp=2, max_bounces=1)
    key = jax.random.key(0)
    dense = np.asarray(render(scene, cam, key, cfg).mean())
    wave = np.asarray(render_wavefront(scene, cam, key, cfg).mean())
    # identical sampling decisions -> identical images (permutation only
    # reorders lanes; per-ray keys travel with the queue)
    np.testing.assert_allclose(wave, dense, atol=1e-5)


def test_wavefront_matches_dense_cornell():
    scene = make_cornell_box()
    cam = Camera.make(position=(0, 1, 3.9), target=(0, 1, 0), fov_y=0.95)
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=3)
    key = jax.random.key(1)
    dense = np.asarray(render(scene, cam, key, cfg).mean())
    wave = np.asarray(render_wavefront(scene, cam, key, cfg).mean())
    np.testing.assert_allclose(wave, dense, atol=1e-4)


def test_wavefront_differentiable():
    import jax.numpy as jnp
    scene = jax.device_put(make_cornell_box())
    cam = Camera.make(position=(0, 1, 3.9), target=(0, 1, 0), fov_y=0.95)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1)

    @jax.jit
    def g(scene, bc):
        def loss(bc):
            s = scene.replace(materials=scene.materials.replace(
                base_color_factor=bc))
            return render_wavefront(s, cam, jax.random.key(0), cfg
                                    ).mean().sum()
        return jax.grad(loss)(bc)

    grad = g(scene, scene.materials.base_color_factor)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0
