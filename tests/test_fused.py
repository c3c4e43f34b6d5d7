"""Fused whole-frame megakernel (ops/fused.py): estimator parity vs the
dense integrator, RNG determinism, applicability gating.

Runs the kernel in interpret mode (CPU); the TPU path compiles the same
program.  The fused kernel uses a different RNG stream than the dense
integrator, so images are compared statistically (means over many
samples), not bitwise — both are unbiased estimators of the same
integral.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.integrator.path import (
    RenderConfig, render)
from physically_based_renderer_tpu.ops.fused import (
    fused_applicable, render_fused_stats)
from physically_based_renderer_tpu.scene import procedural
from physically_based_renderer_tpu.scene.types import (
    DirectionalLight, make_scene)
from physically_based_renderer_tpu.core.camera import Camera


@pytest.fixture(scope="module")
def cornell():
    scene = procedural.make_cornell_box()
    camera = Camera.make(position=(0.0, 1.0, 3.9), target=(0.0, 1.0, 0.0),
                         fov_y=0.95)
    return scene, camera


def test_applicable_cornell(cornell):
    scene, _ = cornell
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=3)
    assert scene.flat_normals
    assert fused_applicable(scene, cfg)
    # Gates: RR in range / NEE off / MIS off disable the fused path.
    assert not fused_applicable(scene, cfg.__class__(
        width=32, height=32, spp=2, max_bounces=3, rr_start=2))
    assert not fused_applicable(scene, cfg.__class__(
        width=32, height=32, spp=2, max_bounces=3, nee=False))


def test_matches_dense_statistically(cornell):
    scene, camera = cornell
    cfg = RenderConfig(width=32, height=32, spp=32, max_bounces=3)
    hdr, count = render_fused_stats(scene, camera, jax.random.key(0), cfg,
                                    interpret=True)
    img_f = np.asarray(hdr) / cfg.spp
    img_d = np.asarray(render(scene, camera, jax.random.key(0),
                              cfg).mean())
    # Whole-image and per-channel means agree within MC noise.
    assert abs(img_f.mean() - img_d.mean()) < 0.01
    np.testing.assert_allclose(img_f.mean(axis=(0, 1)),
                               img_d.mean(axis=(0, 1)), atol=0.02)
    assert np.isfinite(img_f).all()
    # Ray-query accounting close to the dense integrator's count.
    from physically_based_renderer_tpu.integrator.path import (
        _render_with_stats_dense)
    _, count_d = _render_with_stats_dense(scene, camera, jax.random.key(0),
                                          cfg)
    assert abs(float(count) - float(count_d)) / float(count_d) < 0.05


def test_deterministic_and_seed_sensitive(cornell):
    scene, camera = cornell
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=2)
    a, _ = render_fused_stats(scene, camera, jax.random.key(7), cfg,
                              interpret=True)
    b, _ = render_fused_stats(scene, camera, jax.random.key(7), cfg,
                              interpret=True)
    c, _ = render_fused_stats(scene, camera, jax.random.key(8), cfg,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_directional_light_matches_dense():
    """Floor quad + sun: exercises the delta-light branch of the kernel."""
    scene = procedural.make_triangle_scene()
    cfg = RenderConfig(width=32, height=32, spp=16, max_bounces=1)
    if not fused_applicable(scene, cfg):
        pytest.skip("triangle scene not fused-applicable "
                    f"(flat={scene.flat_normals})")
    camera = Camera.make(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                         fov_y=1.2)
    hdr, _ = render_fused_stats(scene, camera, jax.random.key(0), cfg,
                                interpret=True)
    img_f = np.asarray(hdr) / cfg.spp
    img_d = np.asarray(render(scene, camera, jax.random.key(0),
                              cfg).mean())
    np.testing.assert_allclose(img_f.mean(axis=(0, 1)),
                               img_d.mean(axis=(0, 1)), atol=0.02)


def test_non_multiple_block_size(cornell):
    """Width*height not a multiple of the 4096-ray block: padding lanes
    must not contribute radiance or counts."""
    scene, camera = cornell
    cfg = RenderConfig(width=24, height=20, spp=4, max_bounces=2)
    hdr, count = render_fused_stats(scene, camera, jax.random.key(0), cfg,
                                    interpret=True)
    assert hdr.shape == (20, 24, 3)
    assert np.isfinite(np.asarray(hdr)).all()
    n_rays = 24 * 20 * cfg.spp
    # count <= (bounces+1 + bounces shadows) per camera sample
    assert 0 < float(count) <= n_rays * (2 * cfg.max_bounces + 1)


def test_textured_cornell_matches_dense():
    """BASELINE config #3 scene (GGX block + albedo/roughness textures):
    the SMEM-texture path of the kernel must agree with the dense
    integrator's ops/texture.py bilinear fetches statistically."""
    scene = procedural.make_cornell_box(metallic_tall_block=True,
                                        roughness=0.25, textured=True)
    assert scene.has_textures
    cfg = RenderConfig(width=24, height=24, spp=16, max_bounces=2)
    assert fused_applicable(scene, cfg)
    camera = Camera.make(position=(0.0, 1.0, 3.9), target=(0.0, 1.0, 0.0),
                         fov_y=0.95)
    hdr, count = render_fused_stats(scene, camera, jax.random.key(0), cfg,
                                    interpret=True)
    img_f = np.asarray(hdr) / cfg.spp
    img_d = np.asarray(render(scene, camera, jax.random.key(0),
                              cfg).mean())
    assert np.isfinite(img_f).all()
    assert abs(img_f.mean() - img_d.mean()) < 0.015
    np.testing.assert_allclose(img_f.mean(axis=(0, 1)),
                               img_d.mean(axis=(0, 1)), atol=0.03)


def test_textured_gates():
    """Mip chains / big textures / normal maps keep the dense path."""
    from physically_based_renderer_tpu.ops.fused import _fused_tex_ok
    from physically_based_renderer_tpu.scene.types import (
        FILTER_LINEAR, MIP_LINEAR, MIP_NONE, WRAP_REPEAT)
    scene = procedural.make_cornell_box(textured=True)
    assert _fused_tex_ok(scene)
    # trilinear sampler -> not exactly representable in SMEM level-0 fetch
    st = scene.textures
    tril = st.replace(filt=((FILTER_LINEAR, FILTER_LINEAR, MIP_LINEAR),)
                      * st.num_textures)
    assert not _fused_tex_ok(scene.replace(textures=tril))
    # helmet: 256^2 textures blow the SMEM row budget
    helmet = procedural.make_helmet_class_scene(rings=16, sectors=16)
    assert not _fused_tex_ok(helmet)
