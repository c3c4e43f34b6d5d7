"""Multi-host bootstrap (parallel/distributed.py) on the virtual CPU mesh.

The real jax.distributed.initialize needs peer processes; here we verify
the single-process no-op path, the env-var launch detection, and that the
mesh constructors build the documented shapes over the 8 virtual devices
(tests/conftest.py sets xla_force_host_platform_device_count=8).
"""

import jax
import pytest

from physically_based_renderer_tpu.parallel import distributed


def test_is_multiprocess_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES"):
        monkeypatch.delenv(var, raising=False)
    assert not distributed.is_multiprocess_env()
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert not distributed.is_multiprocess_env()
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    assert distributed.is_multiprocess_env()
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    assert distributed.is_multiprocess_env()


def test_ensure_initialized_single_process_noop(monkeypatch):
    """Single-process runs must NOT call jax.distributed.initialize (it
    would hang waiting for peers)."""
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES"):
        monkeypatch.delenv(var, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert distributed.ensure_initialized() is False
    assert called == []


def test_ensure_initialized_forwards_explicit_args(monkeypatch):
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.setattr(distributed, "_INITIALIZED", False)
    assert distributed.ensure_initialized(
        coordinator_address="10.0.0.1:8476", num_processes=2,
        process_id=0) is True
    assert called == [{"coordinator_address": "10.0.0.1:8476",
                       "num_processes": 2, "process_id": 0}]
    # second call is a no-op (already initialized)
    assert distributed.ensure_initialized() is True
    assert len(called) == 1
    monkeypatch.setattr(distributed, "_INITIALIZED", False)


def test_global_mesh_covers_all_devices():
    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("tiles",)


def test_hosts_chips_mesh_shape():
    mesh = distributed.hosts_chips_mesh()
    assert mesh.axis_names == ("tiles", "spp")
    assert mesh.shape["tiles"] == jax.process_count()
    assert (mesh.shape["tiles"] * mesh.shape["spp"]
            == len(jax.devices()))


def test_hosts_chips_mesh_renders():
    """The (hosts, chips) mesh drives the 2-D sharded render end to end."""
    import jax.numpy as jnp
    import numpy as np

    from physically_based_renderer_tpu.integrator.path import (
        RenderConfig, render)
    from physically_based_renderer_tpu.parallel.sharding import (
        render_sharded_2d)
    from physically_based_renderer_tpu.scene.procedural import (
        make_cornell_box)
    from physically_based_renderer_tpu.scene.types import with_clusters
    from physically_based_renderer_tpu.utils.config import build_scene
    from physically_based_renderer_tpu.core.camera import Camera

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    scene = with_clusters(make_cornell_box())
    cam = Camera.make(position=(0.0, 1.0, 3.9), target=(0.0, 1.0, 0.0),
                      fov_y=0.95)
    # hosts_chips_mesh is (1, n_local) single-process; spp must divide by
    # the chips axis, so render one sample per virtual chip.
    mesh = distributed.hosts_chips_mesh()
    cfg = RenderConfig(width=32, height=32, spp=mesh.shape["spp"],
                       max_bounces=1)
    if cfg.height % mesh.shape["tiles"]:
        pytest.skip("mesh shape incompatible with tiny test config")
    f = render_sharded_2d(scene, cam, jax.random.key(0), cfg, mesh)
    ref = render(scene, cam, jax.random.key(0), cfg)
    np.testing.assert_allclose(np.asarray(f.mean()),
                               np.asarray(ref.mean()), rtol=1e-5,
                               atol=1e-6)
