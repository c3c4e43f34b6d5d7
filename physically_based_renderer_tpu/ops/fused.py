"""Fused whole-frame path-tracing megakernel for VMEM/SMEM-resident scenes.

One Pallas kernel renders the ENTIRE frame: camera-ray generation, the full
bounce loop (closest hit -> emitter-hit MIS -> NEE + shadow ray -> BSDF
sampling), spp accumulation, and the ray-query count — per ray block, with
zero HBM round-trips between stages.  This is the logical endpoint of the
wavefront design (integrator/path.py) for small scenes: when the triangle
soup + material table fit in SMEM, splitting the bounce into separate XLA
ops only buys HBM traffic (every [N,3] intermediate is a 12.6 MB round
trip at 512x512); fusing them makes the frame compute-bound on the VPU.

Layout: a ray block is a full [8, LANES] VPU tile (8*LANES rays), every
per-ray scalar one tile — 100% vector-unit utilization (a [1, B] row
layout wastes 7/8 sublanes).  Scene tables live in SMEM and are read as
scalars inside `fori_loop`s over triangles/emitters (the scalar core runs
ahead of the VPU, so table reads pipeline with intersection math).

RNG is a counter-based murmur3-finalizer hash (_make_rng), keyed per
(frame seed, ray id, sample index, static draw site) — pure integer VPU
ops, a different (but equally valid) stream than the threefry keying of
core/rng.py, so images agree with integrator/path.py statistically, not
bitwise.  The kernel is PRIMAL-ONLY (search and shading fused, nothing
differentiable): it backs `render_with_stats` / benchmarks / interactive
preview, while gradient paths keep the dense integrator.

Estimator semantics replicate integrator/path.trace_radiance exactly:
NEE + power-heuristic MIS over area emitters (one-sided emission) and an
optional delta directional light, glTF metallic-roughness BSDF
(models/bsdf.py: GGX + Lambert + Schlick, VNDF sampling), shading normals
= face normals (gated on Scene.flat_normals).

The reference analog is the whole per-frame GPU pipeline in one pass
(`src/pbr_engine/engine/pbr/PbrRenderSystem.cpp:357-365` geometry+lighting
+ `TonemapperSystem.cpp:97-134` compute pass) — here collapsed into a
single device program because the TPU's VMEM/SMEM make the intermediate
"G-buffer" free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
INV_PI = 0.31830988618379067
TWO_PI = 6.283185307179586

_SUB = 8          # sublanes per ray block
_LANES = 512      # lanes per ray block -> 4096 rays per block
_BLOCK = _SUB * _LANES

# SMEM budget gates (f32 words): tri table T*32, emitter table E*14,
# texture quad table R*16.  Validated on v5e at the gate: a 340-tri scene
# WITH both texture slots populated (max tri + tex SMEM footprint
# simultaneously) compiles and renders (tools-level check, round 4).
MAX_FUSED_TRIS = 340
MAX_FUSED_EMITTERS = 32
MAX_FUSED_TEX_ROWS = 160   # total texels across all textures (quad rows)

# Tri-table columns.
_TW = 32   # row width
# 0:3 v0 | 3:6 e1 | 6:9 e2 | 9:12 ng (unit) | 12:15 base_color |
# 15 metallic | 16 roughness | 17 specular | 18:21 emissive | 21 pdf_area |
# 22:24 uv0 | 24:26 uv1 | 26:28 uv2 | 28 material id (texture meta key)
_EW = 14   # emitter row: 0:3 v0 | 3:6 e1 | 6:9 e2 | 9 pdf_a | 10:13 rad | 13 cdf
_MW = 6    # per-material texture meta row: bc (off, h, w) | mr (off, h, w)


def _fused_tex_ok(scene) -> bool:
    """Textures the megakernel can keep in SMEM and sample exactly:
    base_color/metallic-roughness slots only, small (total texel rows within
    budget), REPEAT wrap, LINEAR filters, no mip chain (MIP_NONE makes the
    level-0 bilinear fetch the exact sampler semantics)."""
    if not scene.has_textures:
        return True
    from ..scene.types import FILTER_LINEAR, MIP_NONE, WRAP_REPEAT
    st = scene.textures
    if scene.tex_slots[2] or scene.tex_slots[3]:
        return False                       # normal/emissive maps: dense path
    if sum(h * w for h, w in st.shapes) > MAX_FUSED_TEX_ROWS:
        return False
    return all(ws == WRAP_REPEAT and wt == WRAP_REPEAT
               and mag == FILTER_LINEAR and mi == FILTER_LINEAR
               and mm == MIP_NONE
               for (ws, wt), (mag, mi, mm) in zip(st.wrap, st.filt))


def fused_applicable(scene, cfg) -> bool:
    """Static check: can this (scene, config) render via the megakernel?"""
    return (scene.geometry.num_tris <= MAX_FUSED_TRIS
            and scene.emitters.num_emitters <= MAX_FUSED_EMITTERS
            and _fused_tex_ok(scene)
            and scene.flat_normals
            and scene.env is None
            and (scene.has_emitters or scene.has_directional)
            and cfg.nee and cfg.mis
            and cfg.rr_start > cfg.max_bounces)


# ---------------------------------------------------------------------------
# In-kernel vector helpers: a vec3 is a tuple of three [8, LANES] f32 tiles.
# ---------------------------------------------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _normalize(a):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(a, a), 1e-20))
    return _scale(a, inv)


def _where3(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _power_mis(pa, pb):
    a2 = pa * pa
    return jnp.where(pa > 0.0, a2 / jnp.maximum(a2 + pb * pb, 1e-20), 0.0)


def _fmix32(h):
    """murmur3 32-bit finalizer (full avalanche)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _make_rng(seed0, seed1, pid):
    """Counter-based stateless RNG: U[0,1) keyed by (frame seed, ray id,
    sample index, static draw site).  Pure integer VPU ops — identical
    streams on TPU and in interpret mode, and independent of ray batching
    (same spirit as core/rng.py's threefry keying, cheaper in-kernel)."""
    pid_u = pid.astype(jnp.uint32)
    site = [0]

    def uniform(s):
        site[0] += 1
        h = pid_u * jnp.uint32(0x9E3779B1)
        h = h ^ seed0.astype(jnp.uint32)
        h = _fmix32(h + jnp.uint32((site[0] * 0x6C078965) & 0xFFFFFFFF))
        h = h ^ (s.astype(jnp.uint32) * jnp.uint32(0xB5297A4D))
        h = h ^ seed1.astype(jnp.uint32)
        h = _fmix32(h)
        # >>8 leaves 24 bits; bitcast to i32 (Mosaic lacks u32->f32 casts).
        h24 = jax.lax.bitcast_convert_type(h >> jnp.uint32(8), jnp.int32)
        return h24.astype(jnp.float32) * (1.0 / 16777216.0)

    return uniform


# ---------------------------------------------------------------------------
# BSDF (models/bsdf.py transcribed to component form; local frame +z = ns)
# ---------------------------------------------------------------------------

def _bsdf_consts(bc, met, rgh, spc):
    """Per-lane derived material constants shared by eval and sample."""
    r = jnp.clip(rgh, 1e-2, 1.0)
    alpha = jnp.maximum(r * r, 1e-4)
    one_m = 1.0 - met
    f0 = tuple(0.04 * spc * one_m + c * met for c in bc)
    diff = tuple(c * one_m for c in bc)
    # lobe-selection probability (models/bsdf._spec_select_prob)
    lum = (0.2126, 0.7152, 0.0722)
    ls = jnp.maximum(f0[0] * lum[0] + f0[1] * lum[1] + f0[2] * lum[2], 1e-4)
    ld = jnp.maximum(diff[0] * lum[0] + diff[1] * lum[1] + diff[2] * lum[2],
                     0.0)
    ps = jnp.clip(ls / (ls + ld), 0.05, 0.99)
    return alpha, f0, diff, ps


def _smith_lambda(alpha, wz):
    c = jnp.clip(jnp.abs(wz), 1e-6, 1.0)
    tan2 = jnp.maximum(1.0 - c * c, 0.0) / (c * c)
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)


def _eval_bsdf(wo, wi, alpha, f0, diff, ps):
    """f(wo, wi) rgb + mixture pdf (models/bsdf.eval_bsdf semantics)."""
    no = wo[2]
    ni = wi[2]
    valid = (no > 1e-6) & (ni > 1e-6)

    h = _normalize(_add(wo, wi))
    voh = jnp.maximum(_dot(wo, h), 0.0)
    m = jnp.clip(1.0 - voh, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    fr = tuple(c + (1.0 - c) * m5 for c in f0)

    a2 = alpha * alpha
    nh = jnp.maximum(h[2], 0.0)
    dd = nh * nh * (a2 - 1.0) + 1.0
    d_ggx = a2 * INV_PI / jnp.maximum(dd * dd, 1e-12)

    no_ = jnp.maximum(jnp.abs(no), 1e-6)
    ni_ = jnp.maximum(jnp.abs(ni), 1e-6)
    lam_o = _smith_lambda(alpha, no)
    lam_i = _smith_lambda(alpha, ni)
    vis = 1.0 / (4.0 * no_ * ni_ * (1.0 + lam_o + lam_i))
    dv = d_ggx * vis

    val = tuple(jnp.where(valid, diff[k] * INV_PI * (1.0 - fr[k])
                          + dv * fr[k], 0.0) for k in range(3))

    # mixture pdf: ps * VNDF + (1-ps) * cosine
    pdf_d = jnp.maximum(ni, 0.0) * INV_PI
    g1_o = 1.0 / (1.0 + lam_o)
    pdf_s = g1_o * d_ggx / (4.0 * no_)
    pdf = jnp.where(valid, ps * pdf_s + (1.0 - ps) * pdf_d, 0.0)
    return val, pdf


def _sample_bsdf(wo, u_lobe, u1, u2, alpha, f0, diff, ps):
    """Mixture sample (models/bsdf.sample_bsdf): returns (wi, f, pdf)."""
    # diffuse candidate: cosine hemisphere
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    wi_d = (r * jnp.cos(phi), r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(1.0 - u1, 0.0)))
    # specular candidate: Heitz VNDF
    vh = _normalize((alpha * wo[0], alpha * wo[1], wo[2]))
    lensq = vh[0] * vh[0] + vh[1] * vh[1]
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-12))
    big = lensq > 1e-9
    t1 = (jnp.where(big, -vh[1] * inv, 1.0),
          jnp.where(big, vh[0] * inv, 0.0),
          jnp.zeros_like(inv))
    t2 = _cross(vh, t1)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = _add(_add(_scale(t1, p1), _scale(t2, p2)), _scale(vh, p3))
    h = _normalize((alpha * nh[0], alpha * nh[1],
                    jnp.maximum(nh[2], 1e-6)))
    wi_s = _sub3(_scale(h, 2.0 * _dot(wo, h)), wo)

    use_spec = u_lobe < ps
    wi = _normalize(_where3(use_spec, wi_s, wi_d))
    f, pdf = _eval_bsdf(wo, wi, alpha, f0, diff, ps)
    return wi, f, pdf


def _onb(n):
    """Branchless orthonormal basis around unit n (Duff et al. 2017)."""
    s = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[2])
    b = n[0] * n[1] * a
    t = (1.0 + s * n[0] * n[0] * a, s * b, -s * n[0])
    bt = (b, s + n[1] * n[1] * a, -n[1])
    return t, bt


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _intersect_pass(tri_ref, o, d, t_min, t_max, n_tris, want_attrs,
                    want_uv: bool = False):
    """fori over SMEM triangles.  want_attrs=True returns the winner's
    shading attributes (inline 'gather' folded into the winner reduction);
    False returns only the any-hit occlusion mask.  want_uv=True (textured
    scenes) additionally carries the uv corner columns + material id and
    the winner's barycentrics: returns (t, attrs[13+7], u, v)."""
    zeros = jnp.zeros_like(o[0])

    def mt(t):
        v0 = (tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2])
        e1 = (tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5])
        e2 = (tri_ref[t, 6], tri_ref[t, 7], tri_ref[t, 8])
        p = _cross(d, e2)
        det = _dot(p, e1)
        inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        tv = _sub3(o, v0)
        u = _dot(tv, p) * inv
        q = _cross(tv, e1)
        v = _dot(d, q) * inv
        tt = _dot(e2, q) * inv
        ok = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (tt > t_min))
        return tt, ok, u, v

    if not want_attrs:
        # f32 0/1 carry: Mosaic cannot carry i1 vectors through scf.for.
        def body_occ(t, occ):
            tt, ok, _, _ = mt(t)
            return jnp.maximum(occ, jnp.where(ok & (tt < t_max), 1.0, 0.0))
        occ_f = jax.lax.fori_loop(0, n_tris, body_occ, zeros)
        return occ_f > 0.5

    n_attr = 13 + (7 if want_uv else 0)

    def body(t, c):
        tb, attrs, uw, vw = c
        tt, ok, u, v = mt(t)
        closer = ok & (tt < tb)
        tb = jnp.where(closer, tt, tb)
        attrs = tuple(jnp.where(closer, tri_ref[t, 9 + k], a)
                      for k, a in enumerate(attrs))
        if want_uv:
            uw = jnp.where(closer, u, uw)
            vw = jnp.where(closer, v, vw)
        return tb, attrs, uw, vw

    init = (jnp.full_like(o[0], BIG), tuple(zeros for _ in range(n_attr)),
            zeros, zeros)
    tb, attrs, uw, vw = jax.lax.fori_loop(0, n_tris, body, init)
    if want_uv:
        return tb, attrs, uw, vw
    return tb, attrs


def _tex_bilerp(tex_ref, mtex_ref, matf, uvx, uvy, *, n_mats, n_tex_rows):
    """SMEM texture fetch for the winner lanes: per-material meta gather
    (loop over M materials) + ONE loop over the quad-row table serving both
    the base-color and metallic-roughness slots, then bilinear blends.

    Rows are quad-packed like ops/texture.py ([c00|c10|c01|c11] RGBA with
    the repeat-wrapped +1 neighbors baked in), so one row select per lane
    gives all four bilinear corners.  Indices are exact small ints in f32
    (compared as floats — Mosaic-friendly, no int casts).  off < 0 = no
    texture for that slot."""
    zeros = jnp.zeros_like(uvx)
    meta = [zeros - 1.0, zeros + 1.0, zeros + 1.0,
            zeros - 1.0, zeros + 1.0, zeros + 1.0]
    for m in range(n_mats):
        sel = matf == float(m)
        meta = [jnp.where(sel, mtex_ref[m, k], mv)
                for k, mv in enumerate(meta)]
    bco, bch, bcw, mro, mrh, mrw = meta

    def coords(off, h, w):
        x = uvx * w - 0.5
        y = uvy * h - 0.5
        x = x - jnp.floor(x / w) * w          # repeat wrap, continuous
        y = y - jnp.floor(y / h) * h
        x0 = jnp.minimum(jnp.floor(x), w - 1.0)
        y0 = jnp.minimum(jnp.floor(y), h - 1.0)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        return off + y0 * w + x0, fx, fy

    idx_b, fxb, fyb = coords(bco, bch, bcw)
    idx_m, fxm, fym = coords(mro, mrh, mrw)
    bc_ch = (0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14)   # rgb x 4 corners
    mr_ch = (1, 2, 5, 6, 9, 10, 13, 14)                # (G, B) x 4 corners
    accb = [zeros] * 12
    accm = [zeros] * 8
    for r in range(n_tex_rows):
        rf = float(r)
        sb = idx_b == rf
        sm = idx_m == rf
        accb = [jnp.where(sb, tex_ref[r, c], a)
                for c, a in zip(bc_ch, accb)]
        accm = [jnp.where(sm, tex_ref[r, c], a)
                for c, a in zip(mr_ch, accm)]

    def bilerp(c00, c10, c01, c11, fx, fy):
        top = c00 * (1.0 - fx) + c10 * fx
        bot = c01 * (1.0 - fx) + c11 * fx
        return top * (1.0 - fy) + bot * fy

    bc = tuple(bilerp(accb[k], accb[3 + k], accb[6 + k], accb[9 + k],
                      fxb, fyb) for k in range(3))
    mr_g = bilerp(accm[0], accm[2], accm[4], accm[6], fxm, fym)
    mr_b = bilerp(accm[1], accm[3], accm[5], accm[7], fxm, fym)
    return bc, bco >= 0.0, mr_g, mr_b, mro >= 0.0


def _make_kernel(*, width, height, spp, max_bounces, eps, n_tris, n_em,
                 n_rays, has_em, has_dir, textured=False, n_mats=1,
                 n_tex_rows=1):
    n_shadow = (1.0 if has_em else 0.0) + (1.0 if has_dir else 0.0)

    def kernel(cam_ref, seed_ref, tri_ref, em_ref, mtex_ref, tex_ref,
               out_ref):
        g = pl.program_id(0)

        sid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
        lid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
        pid = g * _BLOCK + sid * _LANES + lid
        inb = pid < n_rays
        if width == _LANES:
            px = lid
            py = g * _SUB + sid
        else:
            py = pid // width
            px = pid - py * width
        pxf = px.astype(jnp.float32)
        pyf = py.astype(jnp.float32)

        eye = (cam_ref[0], cam_ref[1], cam_ref[2])
        rv = (cam_ref[3], cam_ref[4], cam_ref[5])
        uv = (cam_ref[6], cam_ref[7], cam_ref[8])
        fv = (cam_ref[9], cam_ref[10], cam_ref[11])
        dir_wi = (cam_ref[12], cam_ref[13], cam_ref[14])
        dir_rad = (cam_ref[15], cam_ref[16], cam_ref[17])

        rng = _make_rng(seed_ref[0], seed_ref[1], pid)

        def sample_body(s, acc):
            ar, ag, ab, cnt = acc
            # --- camera ray ---------------------------------------------
            jx = rng(s)
            jy = rng(s)
            ndx = 2.0 * (pxf + jx) * (1.0 / width) - 1.0
            ndy = 2.0 * (pyf + jy) * (1.0 / height) - 1.0
            d = _normalize((ndx * rv[0] + ndy * uv[0] + fv[0],
                            ndx * rv[1] + ndy * uv[1] + fv[1],
                            ndx * rv[2] + ndy * uv[2] + fv[2]))
            ones = jnp.ones_like(d[0])
            o = (eye[0] * ones, eye[1] * ones, eye[2] * ones)

            lr = jnp.zeros_like(ones)
            lg = jnp.zeros_like(ones)
            lb = jnp.zeros_like(ones)
            tp = (ones, ones, ones)
            active = inb
            prev_pdf = jnp.zeros_like(ones)

            for bounce in range(max_bounces + 1):
                cnt = cnt + jnp.where(active, 1.0, 0.0)
                t_min_b = 0.0 if bounce == 0 else eps
                if textured:
                    tb, attrs, uw, vw = _intersect_pass(
                        tri_ref, o, d, t_min_b, None, n_tris,
                        want_attrs=True, want_uv=True)
                else:
                    tb, attrs = _intersect_pass(tri_ref, o, d, t_min_b,
                                                None, n_tris,
                                                want_attrs=True)
                ng = (attrs[0], attrs[1], attrs[2])
                bc = (attrs[3], attrs[4], attrs[5])
                met, rgh, spc = attrs[6], attrs[7], attrs[8]
                em = (attrs[9], attrs[10], attrs[11])
                pda = attrs[12]

                if textured:
                    # factor x texture (glTF): albedo rgb from the
                    # base-color slot, roughness = G / metallic = B of the
                    # metallic-roughness slot.
                    wb = 1.0 - uw - vw
                    uvx = wb * attrs[13] + uw * attrs[15] + vw * attrs[17]
                    uvy = wb * attrs[14] + uw * attrs[16] + vw * attrs[18]
                    bct, has_b, mr_g, mr_b, has_m = _tex_bilerp(
                        tex_ref, mtex_ref, attrs[19], uvx, uvy,
                        n_mats=n_mats, n_tex_rows=n_tex_rows)
                    bc = _where3(has_b, (bc[0] * bct[0], bc[1] * bct[1],
                                         bc[2] * bct[2]), bc)
                    rgh = jnp.where(has_m, rgh * mr_g, rgh)
                    met = jnp.where(has_m, met * mr_b, met)

                active = active & (tb < 0.5 * BIG)
                pos = _add(o, _scale(d, tb))

                dgn = _dot(d, ng)
                front = dgn < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                ngo = _scale(ng, sgn)
                ns = ngo  # flat_normals gate: shading normal = face normal

                if has_em:
                    cos_l = jnp.maximum(-sgn * dgn, 0.0)
                    tcl = jnp.minimum(tb, 1e6)
                    dist2 = jnp.clip(tcl * tcl, 1e-12, 1e12)
                    pdf_hit = pda * dist2 / jnp.maximum(cos_l, 1e-6)
                    if bounce == 0:
                        w_em = 1.0
                    else:
                        w_em = jnp.where(prev_pdf > 0.0,
                                         _power_mis(prev_pdf, pdf_hit), 1.0)
                    emw = jnp.where(active & front, w_em, 0.0)
                    lr = lr + tp[0] * em[0] * emw
                    lg = lg + tp[1] * em[1] * emw
                    lb = lb + tp[2] * em[2] * emw

                if bounce == max_bounces:
                    break

                t, bt = _onb(ns)
                wo = (-_dot(d, t), -_dot(d, bt), -_dot(d, ns))
                o_next = _add(pos, _scale(ngo, eps))
                alpha, f0, diff, psel = _bsdf_consts(bc, met, rgh, spc)

                # --- NEE ------------------------------------------------
                cnt = cnt + jnp.where(active, n_shadow, 0.0)
                if has_em:
                    u_sel = rng(s)
                    u_a = rng(s)
                    u_b = rng(s)

                    if n_em == 1:
                        erow = tuple(em_ref[0, k] for k in range(13))
                    else:
                        def egather(e, c):
                            acc_i, row = c
                            pick = em_ref[e, 13] < u_sel
                            acc_i = acc_i + pick.astype(jnp.int32)
                            hit_e = acc_i == e  # smallest e with cdf >= u
                            row = tuple(jnp.where(hit_e, em_ref[e, k], r)
                                        for k, r in enumerate(row))
                            return acc_i, row
                        zer = jnp.zeros_like(ones)
                        _, erow = jax.lax.fori_loop(
                            0, n_em, egather,
                            (jnp.zeros_like(pid),
                             tuple(zer for _ in range(13))))
                    ev0 = (erow[0], erow[1], erow[2])
                    ee1 = (erow[3], erow[4], erow[5])
                    ee2 = (erow[6], erow[7], erow[8])
                    epda = erow[9]
                    erad = (erow[10], erow[11], erow[12])

                    su = jnp.sqrt(jnp.clip(u_a, 0.0, 1.0))
                    b1 = 1.0 - su
                    b2 = u_b * su
                    lp = _add(ev0, _add(_scale(ee1, b1), _scale(ee2, b2)))
                    lng = _normalize(_cross(ee1, ee2))
                    tol = _sub3(lp, pos)
                    dist2 = jnp.maximum(_dot(tol, tol), 1e-12)
                    dist = jnp.sqrt(dist2)
                    wi_w = _scale(tol, 1.0 / dist)
                    cos_le = -_dot(lng, wi_w)
                    pdf_sa = epda * dist2 / jnp.maximum(cos_le, 1e-6)
                    lvalid = (cos_le > 1e-6) & (epda > 0.0)

                    wi = (_dot(wi_w, t), _dot(wi_w, bt), _dot(wi_w, ns))
                    f, pdf_b = _eval_bsdf(wo, wi, alpha, f0, diff, psel)
                    cos_i = jnp.maximum(wi[2], 0.0)
                    cand = (active & lvalid & (cos_i > 1e-7)
                            & (pdf_sa > 0.0))
                    occ = _intersect_pass(tri_ref, o_next, wi_w, eps,
                                          dist * (1.0 - 1e-3), n_tris,
                                          want_attrs=False)
                    vis = cand & ~occ
                    w = _power_mis(pdf_sa, pdf_b)
                    k = jnp.where(vis,
                                  cos_i * w / jnp.maximum(pdf_sa, 1e-12),
                                  0.0)
                    lr = lr + tp[0] * f[0] * erad[0] * k
                    lg = lg + tp[1] * f[1] * erad[1] * k
                    lb = lb + tp[2] * f[2] * erad[2] * k

                if has_dir:
                    # Delta light: wi = -direction, radiance const, no MIS.
                    wi = (_dot(dir_wi, t), _dot(dir_wi, bt),
                          _dot(dir_wi, ns))
                    f, _pdf_b = _eval_bsdf(wo, wi, alpha, f0, diff, psel)
                    cos_i = jnp.maximum(wi[2], 0.0)
                    occ = _intersect_pass(tri_ref, o_next, dir_wi, eps,
                                          BIG * (1.0 - 1e-3), n_tris,
                                          want_attrs=False)
                    vis = active & ~occ & (cos_i > 1e-7)
                    k = jnp.where(vis, cos_i, 0.0)
                    lr = lr + tp[0] * f[0] * dir_rad[0] * k
                    lg = lg + tp[1] * f[1] * dir_rad[1] * k
                    lb = lb + tp[2] * f[2] * dir_rad[2] * k

                # --- BSDF sampling --------------------------------------
                u_l = rng(s)
                u_1 = rng(s)
                u_2 = rng(s)
                wi, f, pdf = _sample_bsdf(wo, u_l, u_1, u_2, alpha, f0,
                                          diff, psel)
                cos_i = jnp.maximum(wi[2], 0.0)
                ok = (pdf > 1e-9) & (cos_i > 0.0)
                wgt = jnp.where(ok, cos_i / jnp.maximum(pdf, 1e-20), 0.0)
                tp = (tp[0] * f[0] * wgt, tp[1] * f[1] * wgt,
                      tp[2] * f[2] * wgt)
                tmax_c = jnp.maximum(tp[0], jnp.maximum(tp[1], tp[2]))
                active = active & ok & (tmax_c > 0.0)

                wd = _normalize(_add(_add(_scale(t, wi[0]),
                                          _scale(bt, wi[1])),
                                     _scale(ns, wi[2])))
                o = _where3(active, o_next, o)
                d = _where3(active, wd, d)
                prev_pdf = pdf

            return (ar + lr, ag + lg, ab + lb, cnt)

        zero = jnp.zeros((_SUB, _LANES), jnp.float32)
        ar, ag, ab, cnt = jax.lax.fori_loop(
            0, spp, sample_body, (zero, zero, zero, zero))
        out_ref[0, 0] = ar
        out_ref[0, 1] = ag
        out_ref[0, 2] = ab
        out_ref[0, 3] = cnt

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _pack_tri_table(scene) -> jnp.ndarray:
    """Detached SMEM tri table f32[T, 32] (layout in module docstring)."""
    from ..models.lights import dense_tri_pdf_area
    g = jax.tree.map(jax.lax.stop_gradient, scene.geometry)
    m = jax.tree.map(jax.lax.stop_gradient, scene.materials)
    i0, i1, i2 = g.indices[:, 0], g.indices[:, 1], g.indices[:, 2]
    v0 = g.positions[i0]
    e1 = g.positions[i1] - v0
    e2 = g.positions[i2] - v0
    ng = jnp.cross(e1, e2)
    ng = ng * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(ng * ng, axis=-1, keepdims=True), 1e-20))
    tm = g.tri_material
    pda = jax.lax.stop_gradient(dense_tri_pdf_area(scene))
    t = v0.shape[0]
    return jnp.concatenate([
        v0, e1, e2, ng,
        m.base_color_factor[tm][:, :3],
        m.metallic_factor[tm][:, None],
        m.roughness_factor[tm][:, None],
        m.specular_factor[tm][:, None],
        m.emissive_factor[tm],
        pda[:, None],
        g.uvs[i0], g.uvs[i1], g.uvs[i2],
        tm.astype(jnp.float32)[:, None],
        jnp.zeros((t, _TW - 29), jnp.float32),
    ], axis=1)


def _pack_tex_tables(scene):
    """SMEM texture tables: per-material meta f32[M, 6] (bc off/h/w,
    mr off/h/w; off = -1 marks no texture) + level-0 quad rows f32[R, 16]
    (repeat wrap baked, same layout as ops/texture quad packing)."""
    from ..scene.types import WRAP_REPEAT
    from .texture import _quad_pack
    m = scene.materials
    n_mats = m.num_materials
    if not scene.has_textures:
        return (jnp.full((n_mats, _MW), -1.0, jnp.float32),
                jnp.zeros((1, 16), jnp.float32))
    st = scene.textures
    offs = st.offsets
    texels = jax.lax.stop_gradient(st.texels)
    pieces, row_off, acc = [], [], 0
    for i, (h, w) in enumerate(st.shapes):
        img = texels[offs[i]:offs[i] + h * w].reshape(h, w, 4)
        pieces.append(_quad_pack(img, WRAP_REPEAT, WRAP_REPEAT))
        row_off.append(acc)
        acc += h * w
    quads = jnp.concatenate(pieces, axis=0)
    off_t = jnp.asarray(row_off, jnp.float32)
    h_t = jnp.asarray([h for h, _ in st.shapes], jnp.float32)
    w_t = jnp.asarray([w for _, w in st.shapes], jnp.float32)

    def slot(ids):
        safe = jnp.maximum(ids, 0)
        rows = jnp.stack([off_t[safe], h_t[safe], w_t[safe]], axis=1)
        return jnp.where((ids >= 0)[:, None], rows, -1.0)

    mtex = jnp.concatenate([slot(m.base_color_tex),
                            slot(m.metallic_roughness_tex)], axis=1)
    return mtex, quads


def _pack_em_table(scene) -> jnp.ndarray:
    """Detached SMEM emitter table f32[E, 14]."""
    from ..models.lights import pack_emitter_attrs
    if not scene.has_emitters:
        return jnp.zeros((1, _EW), jnp.float32)
    # First 13 columns (v0|e1|e2|pdf_a|radiance); the uv/emissive-texture
    # tail is irrelevant here — _fused_tex_ok rejects emissive-textured
    # scenes (they render on the dense path).
    attrs = jax.lax.stop_gradient(pack_emitter_attrs(scene))[:, :13]
    cdf = jax.lax.stop_gradient(scene.emitters.cdf)[:, None]
    return jnp.concatenate([attrs, cdf], axis=1)


def _pack_cam(scene, camera, width: int, height: int) -> jnp.ndarray:
    """Camera + directional-light scalars f32[18] (SMEM)."""
    right, up, fwd = camera.basis()
    tan_half = jnp.tan(camera.fov_y / 2.0)
    aspect = width / height
    rv = right * (aspect * tan_half)
    uv = up * tan_half
    d = scene.directional
    return jax.lax.stop_gradient(jnp.concatenate([
        camera.position, rv, uv, fwd, -d.direction, d.radiance]))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_fused_stats(scene, camera, key, cfg, interpret: bool = False):
    """Whole-frame fused render: (hdr_sum f32[H,W,3], ray_query_count f32[]).

    hdr_sum is the SUM over cfg.spp samples (Film.hdr convention).
    Requires fused_applicable(scene, cfg).
    """
    w, h = cfg.width, cfg.height
    n = w * h
    nb = -(-n // _BLOCK)

    tri = _pack_tri_table(scene)
    em = _pack_em_table(scene)
    cam = _pack_cam(scene, camera, w, h)
    mtex, tex = _pack_tex_tables(scene)
    seeds = jax.random.key_data(jax.random.fold_in(key, 0x5EED))
    seeds = seeds.reshape(-1)[:2].astype(jnp.int32)

    kernel = _make_kernel(
        width=w, height=h, spp=cfg.spp, max_bounces=cfg.max_bounces,
        eps=float(cfg.ray_eps), n_tris=scene.geometry.num_tris,
        n_em=scene.emitters.num_emitters, n_rays=n,
        has_em=scene.has_emitters, has_dir=scene.has_directional,
        textured=scene.has_textures,
        n_mats=scene.materials.num_materials,
        n_tex_rows=tex.shape[0])

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cam [18]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seeds [2]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tri [T, 32]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # em [E, 14]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mtex [M, 6]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tex quads [R, 16]
        ],
        out_specs=pl.BlockSpec((1, 4, _SUB, _LANES),
                               lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 4, _SUB, _LANES), jnp.float32),
        interpret=interpret,
    )(cam, seeds, tri, em, mtex, tex)

    flat = out[:, :3].transpose(0, 2, 3, 1).reshape(-1, 3)[:n]
    hdr = flat.reshape(h, w, 3)
    count = jnp.sum(out[:, 3])
    return hdr, count
