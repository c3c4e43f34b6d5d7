"""Round-5 helmet (glb asset) stage profile on TPU.

Usage: python tools/prof_helmet5.py [k32|k128] [block] [max_u] [chunk]
Times each stage as a device-side lax.scan of K iterations (single
dispatch, contention-robust).
"""
import sys
import time

import jax
import jax.numpy as jnp

from physically_based_renderer_tpu.integrator.path import (
    RenderConfig, closest_hit, occluded, frame_tables, _sample_radiance)
from physically_based_renderer_tpu.integrator.shading import shade_surface
from physically_based_renderer_tpu.scene.helmet_asset import load_helmet_scene
from physically_based_renderer_tpu.scene.types import upload_scene, with_clusters
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import Camera, generate_rays
from physically_based_renderer_tpu.models import lights as lights_mod

mode = sys.argv[1] if len(sys.argv) > 1 else "k32"
block = int(sys.argv[2]) if len(sys.argv) > 2 else 256
max_u = int(sys.argv[3]) if len(sys.argv) > 3 else (128 if mode == "k32" else 48)
chunk = int(sys.argv[4]) if len(sys.argv) > 4 else (16 if mode == "k32" else 4)

base = load_helmet_scene()
scene = upload_scene(with_clusters(base, k=32 if mode == "k32" else None))
cfg = RenderConfig(width=512, height=512, spp=4, max_bounces=3,
                   block_size=block, max_u=max_u, chunk=chunk)
camera = Camera.make(position=(0.0, 0.1, 3.0), target=(0.0, 0.0, 0.0),
                     fov_y=1.0)
print(f"mode={mode} block={block} max_u={max_u} chunk={chunk}", flush=True)

W = H = 512
N = W * H
pix = jnp.arange(N)
keys = rng_mod.ray_keys(jax.random.key(0), pix)
jitter = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_PIXEL_JITTER,
                             2).reshape(H, W, 2)
o, d = generate_rays(camera, W, H, jitter)
o = o.reshape(-1, 3)
d = d.reshape(-1, 3)

K = 4


def scan_time(name, step):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c0, None, length=K)
        return c

    c = float(run(jnp.float32(0.0)))     # compile + fence (scalar pull)
    t0 = time.perf_counter()
    c = float(run(jnp.float32(0.1)))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:36s} {dt*1e3:8.2f} ms/iter", flush=True)
    return dt


def s_closest(c):
    h = closest_hit(scene, o + c * 1e-6, d, t_min=0.0, cfg=cfg)
    return c + jnp.sum(h.t) * 1e-12


# bounce-like: sorted closest from hit points with BSDF-ish scattered dirs
h0 = closest_hit(scene, o, d, t_min=0.0, cfg=cfg)
pos = o + d * jnp.minimum(jax.block_until_ready(h0.t), 1e3)[:, None]
udir = rng_mod.ray_uniform(keys, 1, rng_mod.STREAM_BSDF, 3)
th = jnp.arccos(jnp.sqrt(udir[:, 0]))
ph = 6.2831853 * udir[:, 1]
d_sc = jnp.stack([jnp.sin(th) * jnp.cos(ph), jnp.cos(th),
                  jnp.sin(th) * jnp.sin(ph)], axis=-1)
alive = h0.t < 1e29


def s_bounce_closest(c):
    h = closest_hit(scene, pos + c * 1e-6, d_sc, t_min=cfg.ray_eps, cfg=cfg,
                    active=alive, sort=True)
    return c + jnp.sum(h.t) * 1e-12


u = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_LIGHT, 5)
es = lights_mod.sample_env(scene, N, u[:, 3:5])
t_env = jnp.where(alive, 1e6, 0.0)


def s_shadow_env(c):
    occ = occluded(scene, pos + c * 1e-6, es.wi, t_min=cfg.ray_eps,
                   t_max=t_env, cfg=cfg)
    return c + jnp.sum(occ) * 1e-9


tables = frame_tables(scene)
ls = lights_mod.sample_area_emitters(scene, pos, u[:, 0], u[:, 1:3],
                                     emitter_attrs=tables[1],
                                     pyramid=tables[2])
t_em = jnp.where(alive & ls.valid, ls.dist * (1 - 1e-3), 0.0)


def s_shadow_emitter(c):
    occ = occluded(scene, pos + c * 1e-6, ls.wi, t_min=cfg.ray_eps,
                   t_max=t_em, cfg=cfg)
    return c + jnp.sum(occ) * 1e-9


def s_shade(c):
    sp = shade_surface(scene, h0, o + c * 1e-6, d, tri_attrs=tables[0],
                       pyramid=tables[2],
                       cone_width=jnp.full((N,), 2e-3))
    return c + jnp.sum(sp.bsdf.base_color) * 1e-9


def s_nee_sample(c):
    ls2 = lights_mod.sample_area_emitters(scene, pos + c * 1e-6, u[:, 0],
                                          u[:, 1:3],
                                          emitter_attrs=tables[1],
                                          pyramid=tables[2])
    es2 = lights_mod.sample_env(scene, N, u[:, 3:5])
    return c + jnp.sum(ls2.radiance) * 1e-9 + jnp.sum(es2.pdf) * 1e-9


def s_phase_a(c):
    """Candidate selection alone (root cull + interval slab + top_k)."""
    from physically_based_renderer_tpu.ops.blocktrace import (
        _root_cull, _select_candidates)
    grid = scene.clusters
    tm = _root_cull(grid, o + c * 1e-6, d, 1e-4,
                    jnp.full((N,), 1e30, jnp.float32))
    nb = N // block
    u_idx, u_entry, n_valid, *_ = _select_candidates(
        grid, o + c * 1e-6, d, tm, nb, block, 1e-4, max_u)
    return c + jnp.sum(n_valid) * 1e-9 + jnp.sum(u_entry) * 1e-12


def s_sample_pass(c):
    img = _sample_radiance(scene, camera, jax.random.fold_in(
        jax.random.key(1), (c * 1e6).astype(jnp.int32)), cfg,
        tables=tables)
    return c + jnp.sum(img) * 1e-12


for name, fn in (("phase A only (cull+slab+top_k)", s_phase_a),
                 ("camera closest", s_closest),
                 ("bounce closest (sorted, scattered)", s_bounce_closest),
                 ("shadow env (sorted)", s_shadow_env),
                 ("shadow emitter (sorted)", s_shadow_emitter),
                 ("shade_surface (full)", s_shade),
                 ("NEE sampling (area+env)", s_nee_sample),
                 ("FULL sample pass (1 spp)", s_sample_pass)):
    scan_time(name, fn)
