"""Textured-emitter NEE consistency.

NEE must evaluate the emissive TEXTURE at the sampled light point: the
emitter-hit path sees factor x texture (integrator/shading.py), and MIS
combines the two estimators of the SAME integrand — a factor-only NEE
radiance (the pre-round-5 behavior) biases every textured emitter.
The test renders a two-tone textured panel light over a diffuse floor
with (a) BSDF sampling only and (b) NEE+MIS; both are unbiased estimators
of the same image, so their means must agree.
"""

import jax
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.integrator.path import (RenderConfig,
                                                           render)
from physically_based_renderer_tpu.models import lights
from physically_based_renderer_tpu.scene.types import (Materials,
                                                       TextureStack,
                                                       make_scene)


def _two_tone_scene():
    # floor quad (mat 0, diffuse) + emissive panel above it (mat 1) whose
    # emissive texture is bright on one half, dark on the other.
    pos = np.array([
        [-2, 0, 2], [2, 0, 2], [2, 0, -2], [-2, 0, -2],      # floor (+y)
        [-1, 1.8, -1], [1, 1.8, -1], [1, 1.8, 1], [-1, 1.8, 1],  # panel (-y)
    ], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    nrm = np.array([[0, 1, 0]] * 4 + [[0, -1, 0]] * 4, np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)
    tan = np.tile(np.array([[1, 0, 0, 1]], np.float32), (8, 1))
    from physically_based_renderer_tpu.scene.types import Geometry
    g = Geometry(positions=pos, normals=nrm, tangents=tan, uvs=uv,
                 indices=idx, tri_material=np.array([0, 0, 1, 1], np.int32))

    em_tex = np.zeros((2, 2, 4), np.float32)
    em_tex[:, 0, :3] = 1.0          # left half emits, right half dark
    em_tex[..., 3] = 1.0
    from physically_based_renderer_tpu.scene.types import (FILTER_NEAREST,
                                                           MIP_NONE,
                                                           WRAP_REPEAT)
    # nearest filter: emission is exactly 0 or factor, so the per-sample
    # radiance assertion below is exact (bilinear would blend the halves)
    stack = TextureStack.from_images(
        [em_tex], wrap=((WRAP_REPEAT, WRAP_REPEAT),),
        filt=((FILTER_NEAREST, FILTER_NEAREST, MIP_NONE),))
    m = Materials.default(2)
    m = m.replace(
        base_color_factor=np.array([[0.7, 0.7, 0.7, 1], [0, 0, 0, 1]],
                                   np.float32),
        specular_factor=np.zeros((2,), np.float32),
        emissive_factor=np.array([[0, 0, 0], [8.0, 6.0, 4.0]], np.float32),
        emissive_tex=np.array([-1, 0], np.int32))
    return make_scene(g, m, textures=stack)


@pytest.fixture(scope="module")
def scene():
    return _two_tone_scene()


def test_emitter_attrs_carry_uv_and_slot(scene):
    attrs = np.asarray(lights.pack_emitter_attrs(scene))
    assert attrs.shape[1] == 20
    assert np.all(attrs[:, 19] == 0.0)        # emissive texture slot id


def test_nee_radiance_matches_texture(scene):
    # sample many points on the panel; radiance must be factor*tex at the
    # sampled uv (bright half) and 0 on the dark half.
    n = 4096
    k = jax.random.split(jax.random.key(0), 3)
    p = np.tile(np.array([[0.0, 0.0, 0.0]], np.float32), (n, 1))
    u1 = jax.random.uniform(k[0], (n,))
    u2 = jax.random.uniform(k[1], (n, 2))
    ls = lights.sample_area_emitters(scene, p, u1, u2)
    rad = np.asarray(ls.radiance)
    bright = rad[:, 0] > 0.5
    assert 0.2 < bright.mean() < 0.8          # both halves get sampled
    want = np.broadcast_to(np.array([8.0, 6.0, 4.0], np.float32),
                           rad[bright].shape)
    np.testing.assert_allclose(rad[bright], want, rtol=1e-4)
    np.testing.assert_allclose(rad[~bright], np.zeros_like(rad[~bright]),
                               atol=1e-5)


def test_alias_pick_matches_cdf_distribution():
    """Emitter-rich scenes pick via the Walker alias table (O(1)); the
    empirical pick distribution must match pdf_tri."""
    from physically_based_renderer_tpu.scene.procedural import make_uv_sphere
    from physically_based_renderer_tpu.scene.types import make_scene
    import numpy as np

    g = make_uv_sphere(radius=1.0, rings=10, sectors=10)   # 200 tris
    m = Materials.default(1)
    m = m.replace(emissive_factor=np.array([[2.0, 2.0, 2.0]], np.float32))
    s = make_scene(g, m)
    em = s.emitters
    assert em.num_emitters > 64          # alias path active
    n = 200_000
    u = np.asarray(jax.random.uniform(jax.random.key(0), (n,)))
    mm = em.num_emitters
    scaled = u * mm
    slot = np.clip(scaled.astype(np.int32), 0, mm - 1)
    frac = scaled - slot
    accept = frac < np.asarray(em.alias_prob)[slot]
    e_idx = np.where(accept, slot, np.asarray(em.alias_idx)[slot])
    counts = np.bincount(e_idx, minlength=mm) / n
    np.testing.assert_allclose(counts, np.asarray(em.pdf_tri), atol=3e-3)


def test_textured_emitter_nee_unbiased(scene):
    cam = Camera.make(position=(0.0, 0.9, 3.2), target=(0.0, 0.5, 0.0),
                      fov_y=1.0)
    kwargs = dict(width=32, height=32, spp=96, max_bounces=1)
    img_bsdf = render(scene, cam, jax.random.key(1),
                      RenderConfig(nee=False, mis=False, **kwargs)).mean()
    img_nee = render(scene, cam, jax.random.key(2),
                     RenderConfig(nee=True, mis=True, **kwargs)).mean()
    a = float(np.asarray(img_bsdf).mean())
    b = float(np.asarray(img_nee).mean())
    assert a > 1e-3
    # Means agree within MC noise; the factor-only-NEE bug showed ~2x.
    assert abs(a - b) / a < 0.08, (a, b)
