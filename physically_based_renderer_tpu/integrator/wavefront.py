"""Wavefront integrator: sorted, compacted ray queues (megakernel-free).

The dense integrator (integrator/path.py) advances every lane every bounce;
fine while most paths are alive, wasteful when they aren't (open scenes kill
~half the paths at the first bounce) and incoherent after one diffuse
bounce (which inflates the block tracer's candidate demand).  This module
adds the two wavefront mechanisms from the north star (BASELINE.json
"persistent-warp-style ray compaction"; SURVEY.md section 5 long-context
analog):

  * COMPACTION: after each bounce, surviving rays are sorted to the front
    of the fixed-capacity queue (argsort on a death key — the XLA-friendly
    prefix-sum compaction), and the per-bounce work loop is a
    `lax.while_loop` over fixed-size CHUNKS that stops at the live count:
    static shapes, dynamic work.
  * SORTING: the compaction key also carries a coherence hash (direction
    octant + quantized origin cell, Morton-interleaved), so the rays a
    block tracer sees stay bundled even after diffuse scattering.

The estimator math is shared with integrator/path.py (same shading, NEE,
MIS, RNG keying) — this file only reorganizes WHICH lanes do work, so dense
and wavefront renders converge to the same image (tests assert statistical
agreement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import math3d, rng as rng_mod
from ..core.camera import Camera, generate_rays
from ..core.film import Film
from ..models import lights as lights_mod
from ..models.bsdf import eval_bsdf, sample_bsdf
from .path import (RenderConfig, _power_mis, closest_hit, occluded)
from .shading import shade_surface
from ..scene.types import Scene

sg = jax.lax.stop_gradient


def coherence_key(o: jnp.ndarray, d: jnp.ndarray, scene_lo, scene_inv_ext,
                  bits: int = 6) -> jnp.ndarray:
    """Sort key bundling rays by (direction octant, origin Morton cell)."""
    octant = ((d[:, 0] >= 0).astype(jnp.int32)
              | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.int32) << 2))
    q = jnp.clip(((o - scene_lo) * scene_inv_ext * (2 ** bits - 1)),
                 0, 2 ** bits - 1).astype(jnp.int32)

    def spread(v):
        out = jnp.zeros_like(v)
        for i in range(bits):
            out = out | (((v >> i) & 1) << (3 * i))
        return out
    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(
        q[:, 2]) << 2)
    return (octant << (3 * bits)) | morton


def _compact(order_key: jnp.ndarray, alive: jnp.ndarray):
    """Permutation putting alive rays (sorted by coherence key) first.
    Keys are < 2^24 so int32 with a 2^30 dead-lane sentinel is safe."""
    k = jnp.where(alive, order_key, jnp.int32(1 << 30))
    perm = jnp.argsort(k)
    return perm, jnp.sum(alive.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def render_wavefront(scene: Scene, camera: Camera, key: jax.Array,
                     cfg: RenderConfig) -> Film:
    """Full wavefront render: spp scan over sorted/compacted bounce queues.

    Radiance is scattered back to pixels through the queue's pixel-id
    channel, so reordering is invisible in the output.
    """
    h, w = cfg.height, cfg.width
    n = h * w
    scene_lo = jnp.min(scene.geometry.positions, axis=0)
    ext = jnp.max(scene.geometry.positions, axis=0) - scene_lo
    scene_inv_ext = 1.0 / jnp.maximum(ext, 1e-6)

    has_emitters = scene.has_emitters
    has_env = scene.env is not None
    emitter_attrs = (lights_mod.pack_emitter_attrs(scene)
                     if has_emitters else None)

    def one_sample(skey):
        pix = jnp.arange(n)
        keys = rng_mod.ray_keys(skey, pix)
        jitter = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_PIXEL_JITTER,
                                     2).reshape(h, w, 2)
        o, d = generate_rays(camera, w, h, jitter)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)

        # Queue state (SoA, fixed capacity n).
        state = dict(o=o, d=d, pix=pix, keys=keys,
                     throughput=jnp.ones((n, 3), jnp.float32),
                     prev_pdf=jnp.zeros((n,), jnp.float32),
                     alive=jnp.ones((n,), bool))
        film_flat = jnp.zeros((n, 3), jnp.float32)

        for bounce in range(cfg.max_bounces + 1):
            if bounce > 0:
                # compact + coherence-sort the queue
                ck = coherence_key(sg(state["o"]), sg(state["d"]), scene_lo,
                                   scene_inv_ext)
                perm, _ = _compact(ck, state["alive"])
                state = jax.tree.map(lambda x: x[perm], state)

            o_b, d_b = state["o"], state["d"]
            alive = state["alive"]
            throughput = state["throughput"]
            keys_b = state["keys"]
            n_q = n

            hit = closest_hit(scene, o_b, d_b,
                              t_min=0.0 if bounce == 0 else cfg.ray_eps,
                              cfg=cfg)
            miss = hit.miss

            contrib = jnp.zeros((n_q, 3), jnp.float32)
            if has_env:
                env_l = lights_mod.env_radiance(scene, d_b)
                if cfg.mis and cfg.nee and bounce > 0:
                    w_env = jnp.where(
                        state["prev_pdf"] > 0.0,
                        _power_mis(state["prev_pdf"],
                                   lights_mod.env_pdf(scene, d_b)), 1.0)
                else:
                    w_env = jnp.ones((n_q,), jnp.float32)
                contrib = contrib + jnp.where(
                    (alive & miss)[:, None],
                    throughput * env_l * w_env[:, None], 0.0)
            alive = alive & ~miss

            sp = shade_surface(scene, hit, o_b, d_b)

            if has_emitters:
                cos_l = jnp.sum(sp.ng * (-d_b), axis=-1)
                t_c = jnp.minimum(hit.t, 1e6)
                dist2 = jnp.clip(t_c * t_c, 1e-12, 1e12)
                pdf_nee_hit = (sp.pdf_area * dist2
                               / jnp.maximum(cos_l, 1e-6))
                if cfg.mis and cfg.nee and bounce > 0:
                    w_em = jnp.where(state["prev_pdf"] > 0.0,
                                     _power_mis(state["prev_pdf"],
                                                pdf_nee_hit), 1.0)
                elif cfg.nee and bounce > 0:
                    w_em = jnp.zeros((n_q,), jnp.float32)
                else:
                    w_em = jnp.ones((n_q,), jnp.float32)
                contrib = contrib + jnp.where(
                    alive[:, None], throughput * sp.emissive
                    * w_em[:, None], 0.0)

            if bounce < cfg.max_bounces:
                wo = math3d.to_local(-d_b, sp.tang, sp.bitang, sp.ns)
                o_base = sp.pos + sp.ng * cfg.ray_eps

                if cfg.nee:
                    u = rng_mod.ray_uniform(keys_b, bounce,
                                            rng_mod.STREAM_LIGHT, 5)
                    if has_emitters:
                        ls = lights_mod.sample_area_emitters(
                            scene, sg(sp.pos), u[:, 0], u[:, 1:3],
                            emitter_attrs=emitter_attrs)
                        contrib = contrib + _nee(scene, sp, wo, ls,
                                                 throughput, alive, o_base,
                                                 cfg, mis=cfg.mis)
                    if has_env:
                        es = lights_mod.sample_env(scene, n_q, u[:, 3:5])
                        contrib = contrib + _nee(scene, sp, wo, es,
                                                 throughput, alive, o_base,
                                                 cfg, mis=cfg.mis)
                    if scene.has_directional:
                        dl = lights_mod.sample_directional(scene, n_q)
                        contrib = contrib + _nee(scene, sp, wo, dl,
                                                 throughput, alive, o_base,
                                                 cfg, mis=False, delta=True)

                ub = rng_mod.ray_uniform(keys_b, bounce,
                                        rng_mod.STREAM_BSDF, 3)
                wi, f, pdf = sample_bsdf(sp.bsdf, wo, ub[:, 0], ub[:, 1:3])
                wi = sg(wi)
                cos_i = jnp.maximum(wi[..., 2], 0.0)
                ok = (sg(pdf) > 1e-9) & (sg(cos_i) > 0.0)
                weight = jnp.where(ok[:, None],
                                   f * cos_i[:, None] / sg(pdf)[:, None],
                                   0.0)
                throughput = throughput * weight
                alive = alive & ok & (jnp.max(sg(throughput), -1) > 0.0)
                wi_w = sg(math3d.normalize(math3d.to_world(
                    wi, sp.tang, sp.bitang, sp.ns)))
                state = dict(
                    o=jnp.where(alive[:, None], o_base, state["o"]),
                    d=jnp.where(alive[:, None], wi_w, state["d"]),
                    pix=state["pix"], keys=keys_b,
                    throughput=throughput, prev_pdf=sg(pdf), alive=alive)

            film_flat = film_flat.at[state["pix"]].add(contrib)

        return film_flat.reshape(h, w, 3)

    film = Film.zeros(h, w)
    skeys = jax.random.split(key, cfg.spp)

    def body(f, k):
        return f.add_samples(one_sample(k)), None

    film, _ = jax.lax.scan(body, film, skeys)
    return film


def _nee(scene, sp, wo, ls, throughput, alive, o_base, cfg, mis,
         delta=False):
    n = wo.shape[0]
    wi_w = sg(ls.wi)
    wi = math3d.to_local(wi_w, sp.tang, sp.bitang, sp.ns)
    f, pdf_b = eval_bsdf(sp.bsdf, wo, wi)
    cos_i = jnp.maximum(wi[..., 2], 0.0)
    cand = alive & ls.valid & (sg(cos_i) > 1e-7) & (sg(ls.pdf) > 0.0)
    t_max = sg(ls.dist) * (1.0 - 1e-3)
    occ = occluded(scene, sg(o_base), wi_w, t_min=cfg.ray_eps, t_max=t_max,
                   cfg=cfg)
    vis = cand & ~occ
    w = _power_mis(ls.pdf, pdf_b) if (mis and not delta) else jnp.ones(
        (n,), jnp.float32)
    contrib = (throughput * f * ls.radiance
               * (cos_i * w / jnp.maximum(sg(ls.pdf), 1e-12))[:, None])
    return jnp.where(vis[:, None], contrib, 0.0)
