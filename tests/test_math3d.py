"""Unit tests for core.math3d: quats, TRS, camera matrices.

Richer than the reference's test surface (it has no pure-logic unit tests,
SURVEY.md section 4) — these pin the glm-compatible conventions."""

import numpy as np
import jax.numpy as jnp
import pytest

from physically_based_renderer_tpu.core import math3d as m3


def test_normalize_unit_length():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
    n = m3.normalize(v)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1),
                               1.0, rtol=1e-6)


def test_quat_identity_rotation():
    v = jnp.array([1.0, 2.0, 3.0])
    out = m3.quat_rotate(m3.quat_identity(), v)
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 3.0], atol=1e-6)


def test_quat_axis_angle_90deg_z():
    q = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    out = m3.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_mul_composes():
    qa = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.3)
    qb = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.5)
    v = jnp.array([1.0, 0.0, 0.0])
    ab = m3.quat_rotate(m3.quat_mul(qa, qb), v)
    ref = m3.quat_rotate(m3.quat_from_axis_angle(
        jnp.array([0.0, 0.0, 1.0]), 0.8), v)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ref), atol=1e-6)


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m = m3.quat_to_mat3(jnp.asarray(q))
    q2 = np.asarray(m3.mat3_to_quat(m))
    # q and -q are the same rotation.
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_trs_order_translate_rotate_scale():
    # reference ModelPushConstant.hpp:41-44: T * R * S
    t = jnp.array([1.0, 2.0, 3.0])
    q = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    s = jnp.array([2.0, 1.0, 1.0])
    m = m3.trs_to_mat4(t, q, s)
    p = m3.transform_points(m, jnp.array([1.0, 0.0, 0.0]))
    # scale: (2,0,0) -> rotate 90 about z: (0,2,0) -> translate: (1,4,3)
    np.testing.assert_allclose(np.asarray(p), [1.0, 4.0, 3.0], atol=1e-5)


def test_normal_matrix_inverse_transpose():
    t = jnp.zeros(3)
    q = m3.quat_identity()
    s = jnp.array([2.0, 1.0, 1.0])
    m = m3.trs_to_mat4(t, q, s)
    nm = m3.normal_matrix(m)
    # Normal of plane x=0 (1,0,0) under scale(2,1,1) must renormalize to x.
    n = np.array(nm @ jnp.array([1.0, 0.0, 0.0]))
    n /= np.linalg.norm(n)
    np.testing.assert_allclose(n, [1.0, 0.0, 0.0], atol=1e-6)


def test_look_at_rh_matches_glm_semantics():
    eye = jnp.array([0.0, 0.0, 5.0])
    center = jnp.zeros(3)
    up = jnp.array([0.0, 1.0, 0.0])
    v = m3.look_at_rh(eye, center, up)
    # glm::lookAtRH maps eye -> origin, center -> (0,0,-5).
    p = m3.transform_points(v, eye)
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-6)
    p2 = m3.transform_points(v, center)
    np.testing.assert_allclose(np.asarray(p2), [0.0, 0.0, -5.0], atol=1e-6)


def test_perspective_rh_no_depth_range():
    proj = m3.perspective_rh_no(1.0, 1.0, 0.1, 100.0)
    for z, expect in [(-0.1, -1.0), (-100.0, 1.0)]:
        clip = proj @ jnp.array([0.0, 0.0, z, 1.0])
        ndc = np.asarray(clip[2] / clip[3])
        np.testing.assert_allclose(ndc, expect, atol=1e-4)


def test_perspective_rh_zo_depth_range():
    proj = m3.perspective_rh_zo(1.0, 1.0, 0.1, 100.0)
    for z, expect in [(-0.1, 0.0), (-100.0, 1.0)]:
        clip = proj @ jnp.array([0.0, 0.0, z, 1.0])
        ndc = np.asarray(clip[2] / clip[3])
        np.testing.assert_allclose(ndc, expect, atol=1e-4)


def test_orthonormal_basis():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = m3.orthonormal_basis(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(b * n, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(t * b, -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # right-handed: t x b = n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_local_world_roundtrip():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = m3.orthonormal_basis(jnp.asarray(n))
    v = rng.normal(size=(32, 3)).astype(np.float32)
    loc = m3.to_local(jnp.asarray(v), t, b, jnp.asarray(n))
    back = m3.to_world(loc, t, b, jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)
