"""Trace-parameter sweep on the helmet scene (scratch).

Measures closest-hit and any-hit time vs (block, max_u), candidate demand
(n_valid histogram), and the effect of octant-sorting incoherent shadow
rays.  Findings drive integrator/path.py defaults.
"""
import time
import jax, jax.numpy as jnp
import numpy as np
from physically_based_renderer_tpu.integrator.path import (
    closest_hit, occluded, RenderConfig)
from physically_based_renderer_tpu.ops.blocktrace import (
    bucket_sort_perm as _bucket_sort_perm)
from physically_based_renderer_tpu.ops.blocktrace import _select_candidates
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays_at
from physically_based_renderer_tpu.core.morton import morton_pixel_ids
from physically_based_renderer_tpu.models import lights as lights_mod

bc = config_mod.get("helmet")
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)
W = H = 512
N = W * H
local = jnp.asarray(morton_pixel_ids(H, W))
keys = rng_mod.ray_keys(jax.random.key(0), local)
jitter = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_PIXEL_JITTER, 2)
px = (local % W).astype(jnp.float32)
py = (local // W).astype(jnp.float32)
o, d = generate_rays_at(camera, W, H, px, py, jitter)

# Bounce-1-like rays: hit points + env-sampled directions (incoherent).
cfg0 = bc.render
hit = jax.jit(lambda o, d: closest_hit(scene, o, d, 0.0, cfg0))(o, d)
live = ~hit.miss
t = jnp.minimum(hit.t, 1e3)
pos = o + t[:, None] * d + 1e-3 * d
u = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_LIGHT, 5)
es = lights_mod.sample_env(scene, N, u[:, 3:5])
sd = es.wi
tm_shadow = jnp.where(live, 1e30, 0.0)

print(f"live primary: {int(live.sum())}/{N}")


def timed(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        r = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / 5
    print(f"  {name:44s} {dt*1e3:7.2f} ms")
    return dt


import os
SWEEP = [(int(b), int(u)) for b, u in
         (s.split(":") for s in os.environ.get(
             "SWEEP", "256:48,128:48,512:48").split(","))]
for block, max_u in SWEEP:
    cfg = RenderConfig(tracer="pallas", block_size=block, max_u=max_u)
    f = jax.jit(lambda o, d, c=cfg: closest_hit(scene, o, d, 0.0, c).t)
    timed(f"closest primary  B={block:3d} U={max_u}", f, o, d)

cfg = RenderConfig(tracer="pallas", block_size=256, max_u=48)
nv = jax.jit(lambda o, d: _select_candidates(
    scene.clusters, o, d, jnp.full((N,), 1e30, jnp.float32),
    N // 256, 256, 0.0, 48)[2])(o, d)
print("primary nv: mean %.1f p50 %d p90 %d p99 %d max %d" % (
    float(nv.mean()), *np.percentile(np.asarray(nv), [50, 90, 99, 100])))

# shadow rays: unsorted vs octant-sorted
for block, max_u in [(256, 48)]:
    if True:
        cfg = RenderConfig(tracer="pallas", block_size=block, max_u=max_u)
        f = jax.jit(lambda o, d, tm, c=cfg: occluded(scene, o, d, 1e-3, tm,
                                                     c))
        timed(f"occl unsorted    B={block:3d} U={max_u}", f, pos, sd,
              tm_shadow)

        def occl_sorted(o_, d_, tm_, c=cfg):
            oct_ = ((d_[:, 0] < 0).astype(jnp.int32) * 4
                    + (d_[:, 1] < 0).astype(jnp.int32) * 2
                    + (d_[:, 2] < 0).astype(jnp.int32))
            key_ = jnp.where(tm_ > 0, oct_, 8)
            perm = _bucket_sort_perm(key_, 9)
            occ = occluded(scene, o_[perm], d_[perm], 1e-3, tm_[perm], c)
            return jnp.zeros_like(occ).at[perm].set(occ)
        timed(f"occl oct-sorted  B={block:3d} U={max_u}",
              jax.jit(occl_sorted), pos, sd, tm_shadow)

nv_s = jax.jit(lambda o, d, tm: _select_candidates(
    scene.clusters, o, d, tm, N // 256, 256, 1e-3, 96)[2])
p = _bucket_sort_perm(jnp.where(tm_shadow > 0, (
    (sd[:, 0] < 0).astype(jnp.int32) * 4 + (sd[:, 1] < 0).astype(jnp.int32)
    * 2 + (sd[:, 2] < 0).astype(jnp.int32)), 8), 9)
for name, oo, dd, tt in (("unsorted", pos, sd, tm_shadow),
                         ("sorted", pos[p], sd[p], tm_shadow[p])):
    nv = nv_s(oo, dd, tt)
    print(f"shadow nv {name}: mean %.1f p50 %d p90 %d p99 %d max %d" % (
        float(nv.mean()), *np.percentile(np.asarray(nv), [50, 90, 99, 100])))
