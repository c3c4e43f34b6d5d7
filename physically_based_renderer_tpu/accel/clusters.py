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
    return ClusterGrid(aabb_min=amin, aabb_max=amax, tri_id=tri_id)


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
