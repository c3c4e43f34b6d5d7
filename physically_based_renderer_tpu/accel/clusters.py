"""Cluster grid: the TPU-native acceleration structure.

Per-ray BVH stack walks are hostile to a vector machine (divergent control
flow + per-lane gathers — measured ~0.05M rays/s on a v5e via the XLA
while_loop formulation in ops/traverse.py).  The TPU-native layout instead
follows the ray-STREAM design (see PAPERS.md "ray stream tracing"; SURVEY.md
section 5 long-context analog):

  * triangles are partitioned into C equal-capacity clusters (the spatially
    tight leaf ranges of the accel/bvh.py builder, padded to exactly K tris
    with degenerate triangles), stored DENSE as f32[C, K, 3] blocks;
  * phase A culls rays against all C cluster AABBs as one dense [N, C] slab
    test — pure VPU elementwise work, zero gathers;
  * phase B compacts surviving (ray, cluster) pairs into a fixed-capacity
    stream and runs dense [P, K] Moller-Trumbore per chunk — every gather is
    a CONTIGUOUS ~4.5 KB cluster row, the access pattern HBM likes.

Scaling: work = sum over rays of (clusters pierced) x K, the same asymptotic
as a BVH with K-sized leaves, but in a form that is all dense vector math
with static shapes.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from flax import struct

from .bvh import build_bvh

CLUSTER_K = 128  # triangles per cluster (padded; 128 = TPU lane width,
# and the Pallas kernel requires K to be a multiple of 128 for DMA tiling)


@struct.dataclass
class ClusterGrid:
    aabb_min: jnp.ndarray  # f32[C, 3]
    aabb_max: jnp.ndarray  # f32[C, 3]
    tri_id: jnp.ndarray    # i32[C, K] original triangle ids (-1 = padding)
    # Pre-packed DETACHED triangle soup for the Pallas kernel (built once on
    # the host by pack_soup_host; +1 sentinel cluster).  Rebuilding these
    # per trace call cost ~9 ms/query on the 100k-tri helmet.  Under vertex
    # optimization they go stale — grad/inverse refreshes via refit.
    soup: jnp.ndarray | None = None        # f32[C+1, 9, K]
    tri_packed: jnp.ndarray | None = None  # i32[C+1, 1, K]
    # PARENT boxes over groups of 4 CONSECUTIVE clusters (BVH order makes
    # consecutive clusters spatial neighbors).  Phase A selects parents
    # with a 4x smaller slab/top_k and expands children arithmetically
    # (ids 4p..4p+3) — the hierarchical candidate selection the k=32
    # sub-cluster grid needs (top_k over 4096 sub-clusters was costing
    # more than the finer candidates saved).
    parent_min: jnp.ndarray | None = None  # f32[ceil(C/4), 3]
    parent_max: jnp.ndarray | None = None  # f32[ceil(C/4), 3]

    @property
    def num_clusters(self) -> int:
        return self.aabb_min.shape[0]

    @property
    def k(self) -> int:
        return self.tri_id.shape[1]


def build_clusters(positions: np.ndarray, indices: np.ndarray,
                   k: int = CLUSTER_K) -> ClusterGrid:
    """Partition triangles into <=k-sized spatially tight clusters.

    Uses the BVH builder's leaf ranges (median splits over Morton order) so
    clusters are compact; pads each range to exactly k with id -1.
    """
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    bvh = build_bvh(positions, indices, leaf_size=k)
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    order = np.asarray(bvh.tri_order)

    leaves = np.nonzero(left < 0)[0]
    c = len(leaves)
    tri_id = np.full((c, k), -1, np.int32)
    amin = np.empty((c, 3), np.float32)
    amax = np.empty((c, 3), np.float32)
    for i, nid in enumerate(leaves):
        start = -left[nid] - 1
        count = right[nid]
        tri_id[i, :count] = order[start:start + count]
        amin[i] = nmin[nid]
        amax[i] = nmax[nid]
    pmin, pmax = _parent_boxes(amin, amax)
    return ClusterGrid(aabb_min=amin, aabb_max=amax, tri_id=tri_id,
                       parent_min=pmin, parent_max=pmax)


def _parent_boxes(amin, amax, xp=np):
    """Union boxes over groups of 4 consecutive clusters; the tail group
    pads with inverted (never-hit) boxes."""
    c = amin.shape[0]
    npar = -(-c // 4)
    pad = npar * 4 - c
    big = xp.float32(3e30)
    lo = xp.concatenate(
        [amin, xp.full((pad, 3), big, xp.float32)], axis=0)
    hi = xp.concatenate(
        [amax, xp.full((pad, 3), -big, xp.float32)], axis=0)
    return (lo.reshape(npar, 4, 3).min(axis=1),
            hi.reshape(npar, 4, 3).max(axis=1))


def _soup_components(grid: ClusterGrid, positions, indices, xp):
    """(v0, e1, e2) components [C, 9, K] with degenerate padding; xp is
    numpy (ingest) or jnp (device refit)."""
    tri_id = grid.tri_id if xp is jnp else np.asarray(grid.tri_id)
    safe = xp.maximum(tri_id, 0)
    tri = indices[safe]                                  # [C,K,3]
    v0 = positions[tri[..., 0]]
    v1 = positions[tri[..., 1]]
    v2 = positions[tri[..., 2]]
    pad = (tri_id < 0)[..., None]
    v0 = xp.where(pad, xp.float32(2e30), v0)
    e1 = xp.where(pad, xp.float32(0.0), v1 - v0)
    e2 = xp.where(pad, xp.float32(0.0), v2 - v0)
    return xp.concatenate([xp.moveaxis(v0, -1, 1),
                           xp.moveaxis(e1, -1, 1),
                           xp.moveaxis(e2, -1, 1)], axis=1)  # [C,9,K]


def pack_soup32(grid: ClusterGrid, comp, xp):
    """K=32 sub-cluster soup: f32[(C+1)*4, 16, 128] lane-group variants.

    Mosaic only DMAs lane-aligned (128) slices, so a 32-tri sub-cluster
    cannot be copied into an arbitrary 32-lane slot of the chunk buffer.
    Instead each sub-cluster is stored FOUR times — variant p holds
    component c at row c, lanes [32p, 32p+32), zeros elsewhere — and the
    kernel DMAs variant i for chunk position i ([16,128] aligned tiles).
    Chunk assembly is then 3 vector ADDS per component (zeros don't
    collide), and every MT lane is a real candidate triangle: ~4x less
    wasted intersection math than padding 32-tri clusters to 128 lanes.
    Storage is 4x (32 KB/sub-cluster) — noise next to HBM.
    """
    c, k = comp.shape[0], comp.shape[2]
    assert k == 32
    comp16 = xp.concatenate(
        [comp, xp.zeros((c, 7, k), xp.float32)], axis=1)     # [C,16,32]
    rows = []
    for p in range(4):
        padded = xp.concatenate(
            [xp.zeros((c, 16, 32 * p), xp.float32), comp16,
             xp.zeros((c, 16, 32 * (3 - p)), xp.float32)],
            axis=2)                                          # [C,16,128]
        rows.append(padded)
    soup = xp.stack(rows, axis=1).reshape(c * 4, 16, 128)
    # Sentinel = ALL-ZERO tiles: degenerate (det == 0) triangles self-
    # reject in the kernel.  The sentinel must be zero EVERYWHERE — a
    # partial final chunk mixes sentinel variants with real clusters in
    # the same summed assembly, and any nonzero sentinel value would
    # corrupt the real candidates' lanes.
    sentinel = xp.zeros((4, 16, 128), xp.float32)
    return xp.concatenate([soup, sentinel], axis=0)


def pack_soup_host(grid: ClusterGrid, positions: np.ndarray,
                   indices: np.ndarray) -> ClusterGrid:
    """Attach the packed per-cluster soup (numpy, ingest-time).

    K % 128 == 0: soup f32[C+1, 16, K] rows are (v0 xyz, e1 xyz, e2 xyz,
    zero pad), tri_packed i32[C+1, 1, K]; padding / the sentinel cluster
    carry far-away degenerate triangles (tri id -1).
    K == 32: the lane-group variant layout (pack_soup32).
    """
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    c, k = grid.num_clusters, grid.k
    tri_id = np.asarray(grid.tri_id)
    comp = _soup_components(grid, positions, indices, np)    # [C,9,K]
    tri_packed = np.concatenate(
        [tri_id[:, None, :], np.full((1, 1, k), -1, np.int32)], axis=0)
    if k == 32:
        return grid.replace(soup=pack_soup32(grid, comp, np),
                            tri_packed=tri_packed)
    comp = np.concatenate(
        [comp, np.zeros((c, 7, k), np.float32)], axis=1)     # [C,16,K]
    soup = np.concatenate([comp, np.zeros((1, 16, k), np.float32)], axis=0)
    return grid.replace(soup=soup, tri_packed=tri_packed)


def refit_clusters(grid: ClusterGrid, geometry) -> ClusterGrid:
    """Device-side refit: recompute cluster AABBs + the packed soup from the
    CURRENT vertex positions (detached), keeping the triangle partition.

    The inverse-rendering loop calls this when `vertex_positions` is
    trainable (grad/inverse.py) so an optimized mesh never escapes its
    acceleration structure — the cluster analog of accel/bvh.refit_bvh.
    Cluster quality degrades gracefully if vertices move far (boxes grow,
    never miss).
    """
    sg = jax.lax.stop_gradient
    geometry = jax.tree.map(sg, geometry)
    v0, e1, e2 = cluster_tri_soup(grid, geometry)        # [C,K,3], pad=far
    pad = (grid.tri_id < 0)[..., None]
    v1 = v0 + e1
    v2 = v0 + e2
    big = jnp.float32(3e30)
    lo3 = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi3 = jnp.maximum(jnp.maximum(v0, v1), v2)
    amin = jnp.where(pad, big, lo3).min(axis=1)          # [C,3]
    amax = jnp.where(pad, -big, hi3).max(axis=1)
    c, k = grid.num_clusters, grid.k
    comp9 = jnp.concatenate([jnp.moveaxis(v0, -1, 1),
                             jnp.moveaxis(e1, -1, 1),
                             jnp.moveaxis(e2, -1, 1)], axis=1)  # [C,9,K]
    if k == 32:
        soup = pack_soup32(grid, comp9, jnp)
    else:
        comp = jnp.concatenate(
            [comp9, jnp.zeros((c, 7, k), jnp.float32)], axis=1)
        soup = jnp.concatenate([comp, jnp.zeros((1, 16, k), jnp.float32)],
                               axis=0)
    if grid.soup is None:
        soup = None  # keep the pytree structure stable for jit
    pmin = pmax = None
    if grid.parent_min is not None:
        pmin, pmax = _parent_boxes(amin, amax, xp=jnp)
    return grid.replace(aabb_min=amin, aabb_max=amax, soup=soup,
                        parent_min=pmin, parent_max=pmax)


def cluster_tri_soup(grid: ClusterGrid, geometry):
    """Dense per-cluster triangle data from geometry (differentiable path).

    Padding (-1) becomes a degenerate triangle at a far-away point so it can
    never be hit.  Returns (v0, e1, e2) each f32[C, K, 3].
    """
    safe = jnp.maximum(grid.tri_id, 0)
    tri = geometry.indices[safe]                       # [C,K,3]
    p = geometry.positions
    v0 = p[tri[..., 0]]
    v1 = p[tri[..., 1]]
    v2 = p[tri[..., 2]]
    pad = (grid.tri_id < 0)[..., None]
    far = jnp.float32(2e30)
    v0 = jnp.where(pad, far, v0)
    return v0, jnp.where(pad, 0.0, v1 - v0), jnp.where(pad, 0.0, v2 - v0)
