"""Visibility (boundary) gradients: silhouette edge sampling vs finite
differences (grad/edge.py).

THE case the interior-only estimator cannot handle (and the one
tests/test_inverse.py historically worked around with a texture ramp):
a flat-colored occluder translating across pixels.  Radiance is piecewise
constant in the translation, so autodiff through the detached-sampling
integrator returns exactly zero; the edge term must supply the whole
gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physically_based_renderer_tpu.core.camera import Camera
from physically_based_renderer_tpu.grad.edge import (build_edge_table,
                                                     edge_boundary_loss)
from physically_based_renderer_tpu.grad.inverse import pixel_loss
from physically_based_renderer_tpu.integrator.path import (RenderConfig,
                                                           render)
from physically_based_renderer_tpu.scene.procedural import \
    _geometry_from_arrays
from physically_based_renderer_tpu.scene.types import Materials, make_scene

sg = jax.lax.stop_gradient

CFG = RenderConfig(width=64, height=64, spp=64, max_bounces=0)


def _scene(base_positions=None):
    # background quad (z=-1, emissive) + dark occluder quad (z=0)
    verts = [
        # background, mat 0
        [-2.0, -2.0, -1.0], [2.0, -2.0, -1.0], [2.0, 2.0, -1.0],
        [-2.0, 2.0, -1.0],
        # occluder, mat 1
        [-0.4, -0.6, 0.0], [0.4, -0.6, 0.0], [0.4, 0.6, 0.0],
        [-0.4, 0.6, 0.0],
    ]
    faces = [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]]
    mats = [0, 0, 1, 1]
    g = _geometry_from_arrays(verts, faces, mats)
    if base_positions is not None:
        g = g.replace(positions=base_positions)
    m = Materials.default(2)
    m = m.replace(
        base_color_factor=np.zeros((2, 4), np.float32),
        emissive_factor=np.asarray([[1.0, 0.8, 0.6], [0.0, 0.0, 0.0]],
                                   np.float32),
        specular_factor=np.zeros((2,), np.float32))
    return make_scene(g, m)


OCC_VTX = jnp.arange(4, 8)


def _loss(theta, scene0, cam, target, key, edges, n_edge):
    base = scene0.geometry.positions
    pos = base.at[OCC_VTX, 0].add(theta)
    s = scene0.replace(geometry=scene0.geometry.replace(positions=pos))
    img = render(s, cam, key, CFG).mean()
    loss = pixel_loss(img, target)
    if edges is not None:
        dLdI = jax.grad(pixel_loss)(sg(img), target)
        loss = loss + edge_boundary_loss(
            s, cam, CFG, dLdI, jax.random.key(7), edges,
            n_samples=n_edge)
    return loss


def test_silhouette_translation_gradient_matches_fd():
    scene0 = _scene()
    scene0 = scene0.replace(geometry=scene0.geometry.replace(
        positions=jnp.asarray(scene0.geometry.positions)))
    cam = Camera.make(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                      fov_y=1.0)
    key = jax.random.key(3)
    # target = occluder shifted right: loss decreases as theta increases
    target = render(
        scene0.replace(geometry=scene0.geometry.replace(
            positions=scene0.geometry.positions.at[OCC_VTX, 0].add(0.25))),
        cam, jax.random.key(9), CFG).mean()
    target = jax.lax.stop_gradient(target)
    edges = build_edge_table(scene0.geometry.indices)

    # interior-only autodiff: exactly zero (the documented failure mode)
    g_interior = jax.grad(_loss)(0.0, scene0, cam, target, key, None, 8)
    assert abs(float(g_interior)) < 1e-8

    g_edge = jax.grad(_loss)(0.0, scene0, cam, target, key, edges, 4096)

    # finite differences over the EXPECTED loss: fixed key, h wide enough
    # that the jittered spp integrate the crossing band
    h = 0.04
    lp = _loss(+h, scene0, cam, target, key, None, 8)
    lm = _loss(-h, scene0, cam, target, key, None, 8)
    g_fd = float(lp - lm) / (2 * h)

    assert abs(g_fd) > 1e-3, "FD gradient should be clearly nonzero"
    assert np.sign(float(g_edge)) == np.sign(g_fd)
    np.testing.assert_allclose(float(g_edge), g_fd, rtol=0.3)


def _sgd_vertex_delta(scene0, cam, target, mesh, n_edge, key):
    """One SGD(lr=1) step -> -gradient of the vertex positions."""
    import optax
    from physically_based_renderer_tpu.grad.inverse import (TrainableParams,
                                                            make_train_step)
    from physically_based_renderer_tpu.grad.edge import build_edge_table
    edges = build_edge_table(scene0.geometry.indices)
    params = TrainableParams(vertex_positions=scene0.geometry.positions)
    opt = optax.sgd(1.0)
    step = make_train_step(scene0, cam, CFG, opt, mesh=mesh, edges=edges,
                           edge_samples=n_edge)
    p2, _, loss = step(params, opt.init(params), key, target)
    assert np.isfinite(float(loss))
    return np.asarray(p2.vertex_positions) - np.asarray(
        scene0.geometry.positions)


def test_spmd_edge_gradients_match_single_device():
    """BASELINE config #5 as specified: vertex recovery WITH the boundary
    term on multi-device sharded tiles.  The 8-device shard_map step
    (edge batch sharded + dLdI all_gather + boundary grad in the psum)
    must produce the same vertex gradient as the single-device step up to
    MC noise (different but equally valid sample streams)."""
    from physically_based_renderer_tpu.parallel.sharding import (
        make_mesh, replicate_scene)
    scene0 = _scene()
    scene0 = scene0.replace(geometry=scene0.geometry.replace(
        positions=jnp.asarray(scene0.geometry.positions)))
    cam = Camera.make(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                      fov_y=1.0)
    target = render(
        scene0.replace(geometry=scene0.geometry.replace(
            positions=scene0.geometry.positions.at[OCC_VTX, 0].add(0.25))),
        cam, jax.random.key(9), CFG).mean()
    target = jax.lax.stop_gradient(target)

    d_single = _sgd_vertex_delta(scene0, cam, target, None, 8192,
                                 jax.random.key(3))
    mesh = make_mesh(jax.devices())
    scene_r = replicate_scene(scene0, mesh)
    d_mesh = _sgd_vertex_delta(scene_r, cam, target, mesh, 8192,
                               jax.random.key(3))

    # gradient concentrates on the occluder's x translation; both
    # estimates must agree in direction and magnitude up to MC noise
    gx_single = d_single[4:8, 0].sum()
    gx_mesh = d_mesh[4:8, 0].sum()
    assert abs(gx_single) > 1e-5
    assert np.sign(gx_single) == np.sign(gx_mesh)
    np.testing.assert_allclose(gx_mesh, gx_single, rtol=0.35)
    # overall vertex-gradient fields correlate
    a = d_single.reshape(-1)
    b = d_mesh.reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    assert cos > 0.8, cos


def test_edge_table_classification():
    scene0 = _scene()
    edges = build_edge_table(scene0.geometry.indices)
    # 2 quads: 5 edges each (4 boundary + 1 shared diagonal)
    assert edges.num_edges == 10
    boundary = np.asarray(edges.faces[:, 1] < 0)
    assert boundary.sum() == 8
