"""VMEM-resident Pallas tracer: small scenes, zero-overhead closest/any hit.

For scenes whose whole (padded) triangle soup fits in VMEM (T' <= ~2k tris),
per-block candidate selection and per-cluster DMA juggling
(ops/blocktrace.py) are pure overhead: the fastest program is one Pallas
kernel whose soup operand is a *constant-index* VMEM block — Mosaic loads it
once and keeps it resident across the whole (NB,) ray-block grid — and which
runs a dense Moller-Trumbore per ray block on the VPU with a reduction for
the winner.

Layout choice (the perf-critical one): triangles live on the SUBLANE axis
(padded to a multiple of 8) and rays on the LANE axis (blocks of B lanes),
so the pairwise work array is [T', B].  Putting triangles on lanes would pad
a 36-tri Cornell box to 128 lanes (3.5x wasted VPU work); sublane padding
wastes at most 7 rows.  The winner reduction is a sublane min + iota-argmin.

This is the headline-bench path (BASELINE config #2 Cornell box: 36 tris ->
T' = 40).  The search is DETACHED (standard detached-search /
attached-finish split); shade_surface re-intersects the winning triangle
differentiably (integrator/shading.py).  The reference's analog of this
module is the fixed-function raster pipeline (`src/pbr_engine/engine/pbr/
PbrRenderSystem.cpp:367-465`) — replaced by ray casting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import BIG, Hit

sg = jax.lax.stop_gradient

# Largest padded triangle count the resident tracer accepts: [T', B] f32
# intermediates with B >= 128 must leave headroom in ~16 MB VMEM.
RESIDENT_MAX_TRIS = 2048
# Auto-dispatch threshold (integrator/path._auto_tracer).  Near the 2048
# cap the kernel holds ~15 live [T', 128] f32 intermediates (~1 MB each)
# plus the soup — VMEM-exhaustion territory — and the dense O(T*N) sweep
# loses to the cluster tracer well before that.  Only small scenes pick
# `resident` automatically; larger sizes are an explicit opt-in
# (tracer="resident").
RESIDENT_AUTO_MAX_TRIS = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(rays, soup, t_out, tri_out, *, t_min: float, any_hit: bool,
            n_tris: int):
    """One ray block vs the whole resident soup.

    rays [1, 8, B]: rows ox oy oz dx dy dz tmax pad; soup [T', 16]: cols
    v0xyz e1xyz e2xyz (pad 7).  Outputs [1, 1, B]: winner t + triangle id
    (-1 miss), or 0/1 occlusion.
    """
    tp = soup.shape[0]
    b = rays.shape[2]

    rox = rays[0, 0, :][None, :]          # [1, B]
    roy = rays[0, 1, :][None, :]
    roz = rays[0, 2, :][None, :]
    rdx = rays[0, 3, :][None, :]
    rdy = rays[0, 4, :][None, :]
    rdz = rays[0, 5, :][None, :]
    rtm = rays[0, 6, :][None, :]

    v0x = soup[:, 0][:, None]             # [T', 1]
    v0y = soup[:, 1][:, None]
    v0z = soup[:, 2][:, None]
    e1x = soup[:, 3][:, None]
    e1y = soup[:, 4][:, None]
    e1z = soup[:, 5][:, None]
    e2x = soup[:, 6][:, None]
    e2y = soup[:, 7][:, None]
    e2z = soup[:, 8][:, None]

    # Moller-Trumbore on [T', B] lanes.
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    tx = rox - v0x
    ty = roy - v0y
    tz = roz - v0z
    uu = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (rdx * qx + rdy * qy + rdz * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = ((jnp.abs(det) > 1e-9) & (uu >= 0.0) & (vv >= 0.0)
          & (uu + vv <= 1.0) & (tt > t_min) & (tt < rtm))
    if n_tris < tp:  # mask padding rows
        row = jax.lax.broadcasted_iota(jnp.int32, (tp, b), 0)
        ok = ok & (row < n_tris)
    if any_hit:
        occ = jnp.max(ok.astype(jnp.int32), axis=0)       # [B]
        t_out[0, 0, :] = occ.astype(jnp.float32)
        tri_out[0, 0, :] = occ
        return
    tt = jnp.where(ok, tt, BIG)
    tmin_row = jnp.min(tt, axis=0, keepdims=True)          # [1, B]
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, b), 0)
    kmin = jnp.min(jnp.where(tt <= tmin_row, row, tp), axis=0)
    t_out[0, 0, :] = tmin_row[0, :]
    tri_out[0, 0, :] = jnp.where(tmin_row[0, :] < BIG, kmin, -1)


def pack_resident_soup(geometry, pad_tris: int):
    """Detached triangle-major soup f32[T', 16]: v0 | e1 | e2 | zeros pad.

    Pad rows carry a far-away degenerate triangle (also masked in-kernel).
    """
    g = jax.tree.map(sg, geometry)
    v0, v1, v2 = g.tri_vertices()
    t = v0.shape[0]
    comp = jnp.concatenate([v0, v1 - v0, v2 - v0,
                            jnp.zeros((t, 7), jnp.float32)], axis=1)
    pad = pad_tris - t
    if pad:
        prow = jnp.concatenate(
            [jnp.full((pad, 3), 2e30, jnp.float32),
             jnp.zeros((pad, 13), jnp.float32)], axis=1)
        comp = jnp.concatenate([comp, prow], axis=0)
    return comp


@functools.partial(jax.jit, static_argnames=("t_min_static", "any_hit",
                                             "interpret"))
def _impl(geometry, o, d, t_max_arr, *, t_min_static: float, any_hit: bool,
          interpret: bool):
    n = o.shape[0]
    t = geometry.indices.shape[0]
    tp = _round_up(max(t, 1), 8)
    soup = pack_resident_soup(geometry, tp)

    # Lane-block size: keep [T', B] f32 intermediates around ~0.5 MB each.
    b = max(128, min(1024, _round_up((1 << 17) // tp, 128)))
    n_pad = _round_up(n, b)
    pad = n_pad - n
    o_s = jnp.concatenate([sg(o), jnp.full((pad, 3), 3e30, jnp.float32)])
    d_s = jnp.concatenate([sg(d), jnp.tile(
        jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))])
    tm = jnp.concatenate([jnp.asarray(t_max_arr, jnp.float32),
                          jnp.zeros((pad,), jnp.float32)])
    nb = n_pad // b

    # One packed ray operand [NB, 8, B]: transpose [n,3] -> rows.
    rays = jnp.concatenate(
        [o_s.reshape(nb, b, 3).transpose(0, 2, 1),
         d_s.reshape(nb, b, 3).transpose(0, 2, 1),
         tm.reshape(nb, 1, b),
         jnp.zeros((nb, 1, b), jnp.float32)], axis=1)       # [NB, 8, B]

    kernel = functools.partial(_kernel, t_min=t_min_static,
                               any_hit=any_hit, n_tris=t)
    best_t, best_tri = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 8, b), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tp, 16), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, b), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb, 1, b), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, b), jnp.int32)],
        interpret=interpret,
    )(rays, soup)

    if any_hit:
        return (best_tri.reshape(n_pad) > 0)[:n]
    tri_win = best_tri.reshape(n_pad)[:n]
    t_win = best_t.reshape(n_pad)[:n]
    found = tri_win >= 0
    return Hit(t=jnp.where(found, t_win, BIG), tri=tri_win,
               u=jnp.zeros((n,), jnp.float32),
               v=jnp.zeros((n,), jnp.float32))


def intersect_resident(geometry, o, d, t_min: float = 1e-4, t_max=BIG,
                       any_hit: bool = False, interpret: bool = False):
    """Closest-hit (detached Hit; u/v zeros — shade_surface re-intersects
    attached) or any-hit occlusion mask via the resident kernel."""
    n = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    return _impl(geometry, o, d, t_max_arr, t_min_static=float(t_min),
                 any_hit=any_hit, interpret=interpret)
