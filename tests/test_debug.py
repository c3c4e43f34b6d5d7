"""--debug-checks / checked_render: the validation-layer analog.

The reference switches `VK_LAYER_KHRONOS_validation` on per CLI flag
(`src/gltf_viewer/Main.cpp:22-23`); here the analog must (a) pass cleanly on
a healthy scene and (b) actually fire when bad data reaches the film.
"""

import dataclasses

import jax
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import RenderConfig
from physically_based_renderer_tpu.scene.procedural import (
    make_triangle_scene)
from physically_based_renderer_tpu.utils.debug import (
    NonFiniteRenderError, checked_render)


def _setup():
    scene = make_triangle_scene()
    camera = Camera.make(position=(0.0, 0.0, 2.5), target=(0.0, 0.0, 0.0),
                         fov_y=0.8)
    cfg = RenderConfig(width=8, height=8, spp=1, max_bounces=1)
    return scene, camera, cfg


def test_checked_render_passes_on_clean_scene():
    scene, camera, cfg = _setup()
    film = checked_render(scene, camera, jax.random.key(0), cfg)
    assert np.isfinite(np.asarray(film.hdr)).all()


def test_checked_render_raises_on_injected_nan():
    scene, camera, cfg = _setup()
    mats = scene.materials
    bad = np.asarray(mats.base_color_factor).copy()
    bad[:] = np.nan  # corrupt albedo: NaN radiance reaches the film
    scene = dataclasses.replace(
        scene, materials=dataclasses.replace(
            mats, base_color_factor=bad))
    with pytest.raises(NonFiniteRenderError, match="non-finite"):
        checked_render(scene, camera, jax.random.key(0), cfg)


def test_cli_rejects_debug_checks_with_tiles():
    from physically_based_renderer_tpu.apps.render import main
    rc = main(["triangle", "--debug-checks", "--tiles", "2",
               "-o", "/tmp/_never.png"])
    assert rc == 2
