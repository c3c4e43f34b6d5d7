"""Ray-stream tracer: the TPU-native intersection path.

Two dense phases with a compaction between them (see accel/clusters.py for
the rationale and measurements that killed the per-ray stack walk on TPU):

  phase A  [R, C] ray x cluster-AABB slab tests      (VPU, no gathers)
  compact  (ray, cluster) surviving pairs -> fixed-capacity stream
           (jnp.nonzero with static size — the prefix-sum compaction the
           north star prescribes for wavefront queues)
  phase B  [P, K] dense Moller-Trumbore per pair chunk; cluster triangle
           blocks are CONTIGUOUS rows, so the only gathers are big
           sequential reads

Closest-hit resolution: per-pair (min t, argmin k) -> scatter-min over rays
-> winner pair -> one differentiable re-intersection per ray (the detached-
search/attached-finish pattern shared with ops/traverse.py).

Capacity: the pair stream holds `avg_pairs` clusters per ray on average; if
a chunk's true pair count exceeds capacity the overflow pairs are dropped
(intersections missed).  Choose avg_pairs ~ 2x the expected pierced-cluster
count; `count_pairs()` reports the true distribution for tuning.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..accel.clusters import ClusterGrid, cluster_tri_soup
from .intersect import BIG, Hit

sg = jax.lax.stop_gradient


def _slab_matrix(amin, amax, o, inv_d, t_min, t_max):
    """[R,C] slab test. o/inv_d [R,3], amin/amax [C,3], t_max [R]."""
    t0 = (amin[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (amax[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.minimum(t0, t1).max(axis=-1)      # [R,C]
    tf = jnp.maximum(t0, t1).min(axis=-1)
    return (tn <= tf) & (tf >= t_min) & (tn <= t_max[:, None])


def _mt_dense(o, d, v0, e1, e2, t_min, eps=1e-9):
    """[P,K] Moller-Trumbore. o/d [P,3], v0/e1/e2 [P,K,3]."""
    dP = d[:, None, :]
    p = jnp.cross(dP, e2)
    det = jnp.sum(p * e1, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tv = o[:, None, :] - v0
    u = jnp.sum(tv * p, axis=-1) * inv_det
    q = jnp.cross(tv, e1)
    v = jnp.sum(dP * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    ok = ((jnp.abs(det) > eps) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > t_min))
    return t, ok


def _round_up(x, m):
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("any_hit", "ray_chunk", "pair_chunk",
                                   "avg_pairs", "t_min_static"))
def _intersect_stream_impl(grid: ClusterGrid, geometry, o, d, t_max_arr,
                           *, t_min_static: float, any_hit: bool,
                           ray_chunk: int, pair_chunk: int, avg_pairs: int):
    n = o.shape[0]
    c = grid.num_clusters
    k = grid.k
    t_min = t_min_static

    # Detached soup for the search phases.
    v0g, e1g, e2g = cluster_tri_soup(grid, jax.tree.map(sg, geometry))

    r = min(ray_chunk, _round_up(n, 256))
    n_pad = _round_up(n, r)
    pad = n_pad - n
    o_s = jnp.concatenate([sg(o), jnp.full((pad, 3), 3e30, jnp.float32)])
    d_s = jnp.concatenate([sg(d), jnp.tile(
        jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))])
    tm = jnp.concatenate([t_max_arr, jnp.zeros((pad,), jnp.float32)])
    inv = jnp.where(d_s >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d_s), 1e-12)

    cap = min(_round_up(r * avg_pairs, pair_chunk), _round_up(r * c,
                                                              pair_chunk))

    def chunk_body(_, args):
        o_c, d_c, inv_c, tm_c = args
        hit = _slab_matrix(grid.aabb_min, grid.aabb_max, o_c, inv_c,
                           t_min, tm_c)                       # [R,C]
        ray_ids, cl_ids = jnp.nonzero(hit, size=cap, fill_value=0)
        n_pairs = jnp.sum(hit)
        pvalid = jnp.arange(cap) < n_pairs

        op = o_c[ray_ids]
        dp = d_c[ray_ids]
        tmp = tm_c[ray_ids]

        def pair_body(_, pargs):
            opc, dpc, tmpc, clc, pvc = pargs
            v0 = v0g[clc]           # [P,K,3] contiguous-row gather
            e1 = e1g[clc]
            e2 = e2g[clc]
            t, ok = _mt_dense(opc, dpc, v0, e1, e2, t_min)
            ok = ok & pvc[:, None] & (t < tmpc[:, None])
            t = jnp.where(ok, t, BIG)
            if any_hit:
                return None, jnp.any(ok, axis=-1)
            kbest = jnp.argmin(t, axis=-1)
            tbest = jnp.take_along_axis(t, kbest[:, None], axis=-1)[:, 0]
            return None, (tbest, kbest.astype(jnp.int32))

        n_pc = cap // pair_chunk
        resh = lambda x: x.reshape(n_pc, pair_chunk, *x.shape[1:])
        _, pres = jax.lax.scan(
            pair_body, None,
            (resh(op), resh(dp), resh(tmp), resh(cl_ids), resh(pvalid)))

        if any_hit:
            pair_hit = pres.reshape(cap)
            occ = jnp.zeros((o_c.shape[0],), bool).at[ray_ids].max(
                pair_hit & pvalid)
            return None, occ

        t_p = pres[0].reshape(cap)
        k_p = pres[1].reshape(cap)
        best_t = jnp.full((o_c.shape[0],), BIG, jnp.float32).at[
            ray_ids].min(jnp.where(pvalid, t_p, BIG))
        is_win = pvalid & (t_p <= best_t[ray_ids]) & (t_p < BIG)
        win = jnp.full((o_c.shape[0],), -1, jnp.int32).at[ray_ids].max(
            jnp.where(is_win, jnp.arange(cap, dtype=jnp.int32), -1))
        wsafe = jnp.maximum(win, 0)
        tri = grid.tri_id[cl_ids[wsafe], k_p[wsafe]]
        tri = jnp.where(win >= 0, tri, -1)
        return None, (best_t, tri)

    n_rc = n_pad // r
    resh = lambda x: x.reshape(n_rc, r, *x.shape[1:])
    _, out = jax.lax.scan(chunk_body, None,
                          (resh(o_s), resh(d_s), resh(inv), resh(tm)))

    if any_hit:
        return out.reshape(n_pad)[:n]

    best_t = out[0].reshape(n_pad)[:n]
    tri = out[1].reshape(n_pad)[:n]

    # Differentiable finish: re-intersect each ray's winning triangle with
    # attached geometry.
    safe = jnp.maximum(tri, 0)
    idx = geometry.indices[safe]
    p = geometry.positions
    w0 = p[idx[:, 1]] - p[idx[:, 0]]
    w1 = p[idx[:, 2]] - p[idx[:, 0]]
    dN = d
    pv = jnp.cross(dN, w1)
    det = jnp.sum(pv * w0, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tv = o - p[idx[:, 0]]
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    q = jnp.cross(tv, w0)
    v = jnp.sum(dN * q, axis=-1) * inv_det
    t = jnp.sum(w1 * q, axis=-1) * inv_det
    found = tri >= 0
    return Hit(t=jnp.where(found, t, BIG), tri=tri,
               u=jnp.where(found, u, 0.0), v=jnp.where(found, v, 0.0))


def intersect_stream(grid: ClusterGrid, geometry, o, d, t_min: float = 1e-4,
                     t_max=BIG, any_hit: bool = False,
                     ray_chunk: int = 8192, pair_chunk: int = 16384,
                     avg_pairs: int = 32):
    """Closest-hit (Hit) or any-hit (bool[N]) via the ray-stream tracer."""
    n = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    return _intersect_stream_impl(
        grid, geometry, o, d, t_max_arr, t_min_static=float(t_min),
        any_hit=any_hit, ray_chunk=ray_chunk, pair_chunk=pair_chunk,
        avg_pairs=avg_pairs)


def count_pairs(grid: ClusterGrid, o, d, t_min=1e-4, t_max=BIG):
    """Diagnostic: per-ray pierced-cluster counts (for avg_pairs tuning)."""
    n = o.shape[0]
    inv = jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), 1e-12)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    hit = _slab_matrix(grid.aabb_min, grid.aabb_max, o, inv, t_min,
                       t_max_arr)
    return hit.sum(axis=-1)
