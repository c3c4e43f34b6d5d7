"""Native (C++) builder tests: availability, bit-equality with the numpy
builders, and speed sanity."""

import time

import numpy as np
import pytest

from physically_based_renderer_tpu.accel import native
from physically_based_renderer_tpu.accel.bvh import build_bvh, validate_bvh
from physically_based_renderer_tpu.accel.clusters import build_clusters
from physically_based_renderer_tpu.scene.procedural import (
    make_random_tris, make_uv_sphere)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


def test_native_builds_or_fallback():
    # build_*_fast must always work (native or numpy fallback)
    g = make_random_tris(100, seed=0)
    bvh = native.build_bvh_fast(g.positions, g.indices)
    validate_bvh(bvh, g.positions, g.indices)


@needs_native
@pytest.mark.parametrize("num_tris", [1, 7, 100, 2048])
def test_native_matches_python_bvh(num_tris):
    g = make_random_tris(num_tris, seed=num_tris)
    a = build_bvh(g.positions, g.indices)
    b = native.build_bvh_native(g.positions, g.indices)
    np.testing.assert_array_equal(np.asarray(a.node_left), b.node_left)
    np.testing.assert_array_equal(np.asarray(a.node_right), b.node_right)
    np.testing.assert_array_equal(np.asarray(a.tri_order), b.tri_order)
    np.testing.assert_allclose(np.asarray(a.node_min), b.node_min, atol=0)
    np.testing.assert_allclose(np.asarray(a.node_max), b.node_max, atol=0)


@needs_native
def test_native_matches_python_clusters():
    g = make_uv_sphere(rings=24, sectors=32)
    a = build_clusters(np.asarray(g.positions), np.asarray(g.indices), k=32)
    b = native.build_clusters_native(np.asarray(g.positions),
                                     np.asarray(g.indices), k=32)
    np.testing.assert_array_equal(np.asarray(a.tri_id), b.tri_id)
    np.testing.assert_allclose(np.asarray(a.aabb_min), b.aabb_min, atol=0)
    np.testing.assert_allclose(np.asarray(a.aabb_max), b.aabb_max, atol=0)


@needs_native
def test_native_faster_on_big_mesh():
    g = make_uv_sphere(rings=128, sectors=128)  # ~32k tris
    pos = np.asarray(g.positions)
    idx = np.asarray(g.indices)
    t0 = time.perf_counter()
    build_bvh(pos, idx)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.build_bvh_native(pos, idx)
    t_cpp = time.perf_counter() - t0
    assert t_cpp < t_py  # typically 20-50x


@needs_native
def test_native_rejects_bad_indices():
    g = make_random_tris(10, seed=0)
    bad = np.asarray(g.indices).copy()
    bad[0, 0] = 10_000  # out of range
    with pytest.raises(ValueError):
        native.build_bvh_native(g.positions, bad)


def test_native_alias_table_matches_python():
    """C++ Walker/Vose build reconstructs the input distribution exactly
    and agrees (reconstruction-wise) with the Python fallback."""
    import numpy as np
    from physically_based_renderer_tpu.accel import native as native_mod
    from physically_based_renderer_tpu.scene.types import _build_alias_table

    if not native_mod.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    p = rng.random(4096) ** 4  # spiky, exercises the small/large stacks
    p /= p.sum()

    def reconstruct(prob, alias):
        rec = prob.astype(np.float64) / p.size
        np.add.at(rec, alias, (1.0 - prob.astype(np.float64)) / p.size)
        return rec

    out = native_mod.build_alias_native(p)
    assert out is not None
    np.testing.assert_allclose(reconstruct(*out), p, atol=1e-7)
    prob_py, alias_py = _build_alias_table(p)  # routes to native too
    np.testing.assert_allclose(reconstruct(prob_py, alias_py), p, atol=1e-7)
