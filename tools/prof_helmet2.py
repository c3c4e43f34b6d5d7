"""Helmet perf after root-cull + shadow octant sort (scratch)."""
import time
import jax, jax.numpy as jnp
from physically_based_renderer_tpu.integrator.path import (
    closest_hit, occluded, trace_radiance, render_with_stats)
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays
from physically_based_renderer_tpu.models import lights as lights_mod

bc = config_mod.get("helmet")
cfg = bc.render
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)

W = H = 512
N = W * H
pix = jnp.arange(N)
key = jax.random.key(0)
keys = rng_mod.ray_keys(key, pix)
jitter = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_PIXEL_JITTER, 2).reshape(H, W, 2)
o, d = generate_rays(camera, W, H, jitter)
o = o.reshape(-1, 3); d = d.reshape(-1, 3)

K = 5
def scan_time(name, step):
    @jax.jit
    def run(c0):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c0, None, length=K)
        return c
    c = run(jnp.float32(0.0)); jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(jnp.float32(0.1)); jax.block_until_ready(c)
    dt = (time.perf_counter() - t0 - 0.028) / K
    print(f"{name:34s} {dt*1e3:8.2f} ms/iter")
    return dt

def s_trace(c):
    h = closest_hit(scene, o + c*1e-6, d, t_min=0.0, cfg=cfg)
    return c + h.t.sum() * 1e-12

# realistic shadow load: origins at camera-hit points, env-sampled dirs
h0 = closest_hit(scene, o, d, t_min=0.0, cfg=cfg)
h0 = jax.tree.map(jax.block_until_ready, h0)
pos = o + d * jnp.minimum(h0.t, 1e3)[:, None]
u = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_LIGHT, 5)
es = lights_mod.sample_env(scene, N, u[:, 3:5])
tm_shadow = jnp.where(~h0.miss, 1e30, 0.0)

def s_occl(c):
    occ = occluded(scene, pos + c*1e-6, es.wi, t_min=1e-3, t_max=tm_shadow,
                   cfg=cfg)
    return c + occ.sum().astype(jnp.float32) * 1e-12

def s_sample(c):
    L = trace_radiance(scene, o + c*1e-6, d, keys, cfg)
    return c + L.sum() * 1e-12

t1 = scan_time("closest_hit (camera)", s_trace)
t5 = scan_time("occluded (env shadow, real)", s_occl)
t4 = scan_time("full 1-spp sample", s_sample)

# full frame
f, cnt = render_with_stats(scene, camera, key, cfg)
jax.block_until_ready(f.hdr)
t0 = time.perf_counter()
f, cnt = render_with_stats(scene, camera, jax.random.key(1), cfg)
jax.block_until_ready(f.hdr)
dt = time.perf_counter() - t0
print(f"frame: {dt*1e3:.1f} ms, queries {float(cnt):.0f}, "
      f"rays/s {float(cnt)/dt/1e6:.2f}M")
