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


def _quad_scene(quads, emissive_rgb=(1.0, 0.8, 0.6), emissive_table=None,
                base_table=None):
    """Scene from a list of (corners4, material) quads.  By default
    material 0 is the emissive background and everything else a black
    occluder; pass emissive_table/base_table [n_mat, 3/4] to override
    (tables must be set HERE — make_scene builds the emitter CDF from
    them)."""
    verts, faces, mats = [], [], []
    for corners, mat in quads:
        b = len(verts)
        verts.extend(corners)
        faces.extend([[b, b + 1, b + 2], [b, b + 2, b + 3]])
        mats.extend([mat, mat])
    g = _geometry_from_arrays(verts, faces, mats)
    g = g.replace(positions=jnp.asarray(g.positions))
    n_mat = max(m for _, m in quads) + 1
    m = Materials.default(n_mat)
    if emissive_table is None:
        emissive_table = np.zeros((n_mat, 3), np.float32)
        emissive_table[0] = emissive_rgb
    if base_table is None:
        base_table = np.zeros((n_mat, 4), np.float32)
    m = m.replace(base_color_factor=np.asarray(base_table, np.float32),
                  emissive_factor=np.asarray(emissive_table, np.float32),
                  specular_factor=np.zeros((n_mat,), np.float32))
    return make_scene(g, m)


BG = ([[-2.0, -2.0, -1.0], [2.0, -2.0, -1.0], [2.0, 2.0, -1.0],
       [-2.0, 2.0, -1.0]], 0)


def _fd_check(scene0, move_vtx, axis_or_rot, cam, n_edge=4096, h=0.04,
              rtol=0.35, expect_nonzero=True, key_seed=3):
    """Shared FD harness: loss(theta) applies the motion to move_vtx,
    compares edge-term autodiff against central finite differences of the
    fixed-key expected loss.  Returns (g_edge, g_fd)."""
    key = jax.random.key(key_seed)
    # target: the same motion advanced, so the loss slope is clearly
    # nonzero at theta=0
    tpos = _apply_motion(scene0.geometry.positions, move_vtx, axis_or_rot,
                         0.25)
    target = render(scene0.replace(geometry=scene0.geometry.replace(
        positions=tpos)), cam, jax.random.key(9), CFG).mean()
    target = jax.lax.stop_gradient(target)
    edges = build_edge_table(scene0.geometry.indices)

    def loss(theta, use_edges):
        pos = _apply_motion(scene0.geometry.positions, move_vtx,
                            axis_or_rot, theta)
        s = scene0.replace(geometry=scene0.geometry.replace(positions=pos))
        img = render(s, cam, key, CFG).mean()
        val = pixel_loss(img, target)
        if use_edges:
            dLdI = jax.grad(pixel_loss)(sg(img), target)
            val = val + edge_boundary_loss(s, cam, CFG, dLdI,
                                           jax.random.key(7), edges,
                                           n_samples=n_edge)
        return val

    g_edge = float(jax.grad(loss)(0.0, True))
    g_fd = float(loss(+h, False) - loss(-h, False)) / (2 * h)
    if expect_nonzero:
        assert abs(g_fd) > 1e-3, g_fd
        assert np.sign(g_edge) == np.sign(g_fd), (g_edge, g_fd)
        np.testing.assert_allclose(g_edge, g_fd, rtol=rtol)
    return g_edge, g_fd


def _apply_motion(base, vtx, axis_or_rot, theta):
    if isinstance(axis_or_rot, int):
        return base.at[vtx, axis_or_rot].add(theta)
    # rotation about the z axis through the selected verts' centroid
    sel = base[vtx]
    c = sg(jnp.mean(sel, axis=0))
    ct, st = jnp.cos(theta), jnp.sin(theta)
    rel = sel - c
    rot = jnp.stack([ct * rel[:, 0] - st * rel[:, 1],
                     st * rel[:, 0] + ct * rel[:, 1],
                     rel[:, 2]], axis=1)
    return base.at[vtx].set(c + rot)


CAM = None


def _cam():
    return Camera.make(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0),
                       fov_y=1.0)


def test_partially_occluded_silhouette():
    """A nearer blocker hides part of the moving occluder's silhouette.
    Edge samples on the hidden part must self-cancel (both probes see the
    blocker — the cancellation claimed at grad/edge.py); the estimator
    must still match FD for the visible remainder."""
    occ = ([[-0.4, -0.6, 0.0], [0.4, -0.6, 0.0], [0.4, 0.6, 0.0],
            [-0.4, 0.6, 0.0]], 1)
    # blocker in front, covering the occluder's whole lower half
    blk = ([[-0.9, -0.8, 0.5], [0.9, -0.8, 0.5], [0.9, 0.0, 0.5],
            [-0.9, 0.0, 0.5]], 2)
    scene0 = _quad_scene([BG, occ, blk])
    # looser rtol: the surviving visible silhouette is half as long, so
    # both the FD slope and the MC edge estimate carry ~2x the relative
    # noise of the unoccluded case
    _fd_check(scene0, jnp.arange(4, 8), 0, _cam(), n_edge=8192, rtol=0.45)


def test_vertical_translation():
    occ = ([[-0.4, -0.5, 0.0], [0.4, -0.5, 0.0], [0.4, 0.5, 0.0],
            [-0.4, 0.5, 0.0]], 1)
    scene0 = _quad_scene([BG, occ])
    _fd_check(scene0, jnp.arange(4, 8), 1, _cam())


def test_rotation():
    # non-square so rotation changes coverage at first order
    occ = ([[-0.7, -0.25, 0.0], [0.7, -0.25, 0.0], [0.7, 0.25, 0.0],
            [-0.7, 0.25, 0.0]], 1)
    scene0 = _quad_scene([BG, occ])
    _fd_check(scene0, jnp.arange(4, 8), "rot_z", _cam(), rtol=0.4)


def test_two_occluders():
    """Both occluders translate together; the boundary term must sum both
    silhouettes."""
    occ1 = ([[-0.9, -0.5, 0.0], [-0.2, -0.5, 0.0], [-0.2, 0.5, 0.0],
             [-0.9, 0.5, 0.0]], 1)
    occ2 = ([[0.25, -0.35, 0.2], [0.85, -0.35, 0.2], [0.85, 0.45, 0.2],
             [0.25, 0.45, 0.2]], 2)
    scene0 = _quad_scene([BG, occ1, occ2])
    _fd_check(scene0, jnp.arange(4, 12), 0, _cam())


def test_secondary_visibility_gap_quantified():
    """Documented scope limit (grad/edge.py): the boundary term covers
    PRIMARY visibility only.  A blocker whose silhouette lies outside the
    camera frustum but which shadows a visible floor produces a clearly
    nonzero FD gradient that the estimator misses entirely.  This test
    QUANTIFIES that bias so the limitation stays measured, not anecdotal
    (VERDICT r4 missing #4)."""
    cfg = RenderConfig(width=48, height=48, spp=48, max_bounces=1)
    # diffuse floor (mat 1), downward-facing emissive panel above (mat 2),
    # opaque blocker between them (mat 3); the camera hovers low over the
    # floor so the blocker's own silhouette is outside the frustum while
    # its SHADOW boundary crosses the view.
    floor = ([[-2.0, -2.0, 0.0], [2.0, -2.0, 0.0], [2.0, 2.0, 0.0],
              [-2.0, 2.0, 0.0]], 1)
    light_dn = ([[-0.6, -0.6, 3.0], [-0.6, 0.6, 3.0], [0.6, 0.6, 3.0],
                 [0.6, -0.6, 3.0]], 2)      # winding -> front face is -z
    blocker = ([[-0.55, -0.6, 1.5], [0.45, -0.6, 1.5], [0.45, 0.6, 1.5],
                [-0.55, 0.6, 1.5]], 3)
    base = np.zeros((4, 4), np.float32)
    base[1, :3] = 0.7                       # diffuse floor
    em = np.asarray([[0, 0, 0], [0, 0, 0], [6.0, 5.0, 4.0], [0, 0, 0]],
                    np.float32)
    scene0 = _quad_scene([floor, light_dn, blocker], emissive_table=em,
                         base_table=base)

    cam = Camera.make(position=(-0.8, 0.0, 1.0), target=(-0.8, 0.0, 0.0),
                      fov_y=0.8)           # sees only floor + shadow edge
    edges = build_edge_table(scene0.geometry.indices)
    blocker_vtx = jnp.arange(8, 12)
    key = jax.random.key(5)
    tpos = scene0.geometry.positions.at[blocker_vtx, 0].add(0.3)
    target = render(scene0.replace(geometry=scene0.geometry.replace(
        positions=tpos)), cam, jax.random.key(9), cfg).mean()
    target = jax.lax.stop_gradient(target)

    def loss(theta, use_edges):
        pos = scene0.geometry.positions.at[blocker_vtx, 0].add(theta)
        s = scene0.replace(geometry=scene0.geometry.replace(positions=pos))
        img = render(s, cam, key, cfg).mean()
        val = pixel_loss(img, target)
        if use_edges:
            dLdI = jax.grad(pixel_loss)(sg(img), target)
            val = val + edge_boundary_loss(s, cam, cfg, dLdI,
                                           jax.random.key(7), edges,
                                           n_samples=2048)
        return val

    h = 0.06
    g_fd = float(loss(+h, False) - loss(-h, False)) / (2 * h)
    g_edge = float(jax.grad(loss)(0.0, True))
    # the shadow boundary clearly moves the loss...
    assert abs(g_fd) > 1e-3, g_fd
    # ...and the primary-only estimator misses (nearly) all of it.  The
    # measured bias IS the full FD slope; grad/edge.py's scope note
    # records this magnitude.
    assert abs(g_edge) < 0.25 * abs(g_fd), (g_edge, g_fd)
    print(f"secondary-visibility gap: FD={g_fd:.4f}, edge-term={g_edge:.4f}")


def test_edge_table_classification():
    scene0 = _scene()
    edges = build_edge_table(scene0.geometry.indices)
    # 2 quads: 5 edges each (4 boundary + 1 shared diagonal)
    assert edges.num_edges == 10
    boundary = np.asarray(edges.faces[:, 1] < 0)
    assert boundary.sum() == 8
