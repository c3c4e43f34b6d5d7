"""Helmet-class binary asset golden (BASELINE config #4, VERDICT r4 #3).

The bench `helmet` config now renders a REAL .glb authored by
scene/helmet_asset.py and ingested through the full scene/gltf.py loader.
Locks: ingest structure of the full ~100k-tri asset, and image statistics
+ determinism of a scaled-down render through the cluster tracer.
"""

import jax
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import (RenderConfig,
                                                           render)
from physically_based_renderer_tpu.scene.helmet_asset import (
    author_helmet_glb, load_helmet_scene)
from physically_based_renderer_tpu.scene import gltf as G
from physically_based_renderer_tpu.scene.types import (upload_scene,
                                                       with_clusters)


@pytest.fixture(scope="module")
def full_scene(tmp_path_factory):
    cache = tmp_path_factory.mktemp("helmet")
    return load_helmet_scene(cache_dir=cache)


def test_full_asset_structure(full_scene):
    s = full_scene
    # ~100k tris across 3 primitives (shell + visor + collar)
    assert 90_000 <= s.geometry.num_tris <= 110_000
    assert s.materials.num_materials == 3
    # four textures, mixed sizes, all four slots exercised
    assert set(s.textures.shapes) == {(256, 256), (128, 128), (64, 64)}
    assert s.textures.num_textures == 4
    assert s.tex_slots == (True, True, True, True)
    # emissive visor -> area emitters; env map attached; smooth normals
    assert s.has_emitters and s.emitters.num_emitters > 1000
    assert s.env is not None
    assert not s.flat_normals
    # collar node translation baked into world positions
    pos = np.asarray(s.geometry.positions)
    assert pos[:, 1].min() < -0.6   # collar sits below the shell


def test_glb_is_cached_and_deterministic(tmp_path):
    p1 = author_helmet_glb(tmp_path / "a.glb", scale_tris=0.05)
    p2 = author_helmet_glb(tmp_path / "b.glb", scale_tris=0.05)
    assert p1.read_bytes() == p2.read_bytes()


@pytest.fixture(scope="module")
def small_scene(tmp_path_factory):
    cache = tmp_path_factory.mktemp("helmet_small")
    return load_helmet_scene(cache_dir=cache, scale_tris=0.02)


def test_render_golden(small_scene):
    scene = upload_scene(with_clusters(small_scene))
    cam = Camera.make(position=(0.0, 0.1, 3.0), target=(0.0, 0.0, 0.0),
                      fov_y=1.0)
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=2)
    img = np.asarray(render(scene, cam, jax.random.key(7), cfg).mean())
    assert np.all(np.isfinite(img))
    mean = float(img.mean())
    # sky + lit shell; locked loosely against estimator drift
    assert 0.2 < mean < 3.0, mean
    # helmet darker than sky: center rows below top rows on average
    assert img[12:20].mean() < img[:4].mean()
    # determinism
    img2 = np.asarray(render(scene, cam, jax.random.key(7), cfg).mean())
    np.testing.assert_array_equal(img, img2)
