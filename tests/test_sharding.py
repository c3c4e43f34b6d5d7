"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The JAX analog of multi-node tests without a cluster (SURVEY.md section 4).
Key invariant: an N-device tiled render is BITWISE the 1-device render
(per-ray RNG keys derive from global pixel ids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import (
    RenderConfig, render)
from physically_based_renderer_tpu.parallel.sharding import (
    make_mesh, make_mesh_2d, render_sharded, render_sharded_2d,
    replicate_scene)
from physically_based_renderer_tpu.scene.procedural import make_cornell_box


@pytest.fixture(scope="module")
def scene():
    return make_cornell_box()


@pytest.fixture(scope="module")
def camera():
    return Camera.make(position=(0.0, 1.0, 3.9), target=(0.0, 1.0, 0.0),
                       fov_y=0.95)


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(scene, camera):
    cfg = RenderConfig(width=16, height=32, spp=2, max_bounces=2)
    key = jax.random.key(3)
    single = np.asarray(render(scene, camera, key, cfg).mean())

    mesh = make_mesh(jax.devices()[:4])
    s = replicate_scene(scene, mesh)
    tiled = np.asarray(render_sharded(s, camera, key, cfg, mesh).mean())
    np.testing.assert_allclose(tiled, single, atol=1e-6)


def test_sharded_render_8_devices(scene, camera):
    cfg = RenderConfig(width=16, height=32, spp=1, max_bounces=1)
    mesh = make_mesh(jax.devices())
    s = replicate_scene(scene, mesh)
    key = jax.random.key(0)
    img = render_sharded(s, camera, key, cfg, mesh).mean()
    assert np.isfinite(np.asarray(img)).all()
    single = np.asarray(render(scene, camera, key, cfg).mean())
    np.testing.assert_allclose(np.asarray(img), single, atol=1e-6)


def test_indivisible_height_raises(scene, camera):
    cfg = RenderConfig(width=16, height=30, spp=1, max_bounces=1)
    mesh = make_mesh(jax.devices())
    with pytest.raises(ValueError, match="divide"):
        render_sharded(scene, camera, jax.random.key(0), cfg, mesh)


def test_sharded_2d_matches_single_device(scene, camera):
    cfg = RenderConfig(width=16, height=32, spp=4, max_bounces=2)
    key = jax.random.key(7)
    single = np.asarray(render(scene, camera, key, cfg).mean())

    mesh = make_mesh_2d(4, 2)
    s = replicate_scene(scene, mesh)
    tiled = np.asarray(render_sharded_2d(s, camera, key, cfg, mesh).mean())
    np.testing.assert_allclose(tiled, single, atol=1e-5)


def test_sharded_2d_indivisible_spp_raises(scene, camera):
    cfg = RenderConfig(width=16, height=32, spp=3, max_bounces=1)
    mesh = make_mesh_2d(2, 2)
    with pytest.raises(ValueError, match="spp"):
        render_sharded_2d(scene, camera, jax.random.key(0), cfg, mesh)


def test_mesh_2d_too_few_devices_raises():
    with pytest.raises(ValueError, match="devices"):
        make_mesh_2d(4, 4)


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_ring_exchange_matches_no_exchange(camera):
    """SURVEY 2.10 ring-exchange analog: rotating tail ray slabs around
    the mesh via ppermute (parallel/exchange.py) is semantically invisible
    — per-ray results come back in caller order and match the plain
    sharded render."""
    from physically_based_renderer_tpu.parallel.sharding import (
        render_sample_sharded)
    from physically_based_renderer_tpu.scene.types import with_clusters

    scene = with_clusters(make_cornell_box())
    cfg = RenderConfig(width=16, height=32, spp=1, max_bounces=2,
                       tracer="block")
    mesh = make_mesh(jax.devices()[:4])
    s = replicate_scene(scene, mesh)
    key = jax.random.key(11)

    import functools
    run = functools.partial(render_sample_sharded, s, camera, key, cfg,
                            mesh)
    plain = np.asarray(jax.jit(lambda: run(exchange=False))())
    ring = np.asarray(jax.jit(lambda: run(exchange=True))())
    assert np.isfinite(ring).all()
    np.testing.assert_allclose(ring, plain, atol=1e-5)
