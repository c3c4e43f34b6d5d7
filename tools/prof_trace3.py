"""Kernel scaling: time vs (max_u, block) + shadow stats (scratch)."""
import time
import jax, jax.numpy as jnp
from physically_based_renderer_tpu.ops import blocktrace as bt
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays
from physically_based_renderer_tpu.integrator.path import closest_hit
from physically_based_renderer_tpu.models import lights as lights_mod

bc = config_mod.get("helmet")
cfg = bc.render
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)
grid = scene.clusters

W = H = 512
N = W * H
key = jax.random.key(0)
pix = jnp.arange(N)
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
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter")
    return dt

for mu in (8, 48):
    for b in (256, 1024):
        def f(c, mu=mu, b=b):
            h = bt.intersect_blocks_pallas(grid, scene.geometry,
                                           o + c * 1e-6, d, t_min=0.0,
                                           t_max=1e30, block=b, max_u=mu,
                                           lean=True)
            return c + h.t.sum() * 1e-12
        scan_time(f"closest B={b} max_u={mu}", f)

# sort overhead alone
def f_sortonly(c):
    perm = bt._octant_perm(d + c * 1e-9, jnp.full((N,), 1e30, jnp.float32))
    return c + perm.sum().astype(jnp.float32) * 1e-12
scan_time("octant sort perm alone", f_sortonly)

# shadow load stats
h0 = closest_hit(scene, o, d, t_min=0.0, cfg=cfg)
h0 = jax.tree.map(jax.block_until_ready, h0)
pos = o + d * jnp.minimum(h0.t, 1e3)[:, None]
u = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_LIGHT, 5)
es = lights_mod.sample_env(scene, N, u[:, 3:5])
tm_shadow = jnp.where(~h0.miss, 1e30, 0.0)

@jax.jit
def shadow_stats(pos, wi, tm):
    tm2 = bt._root_cull(grid, pos, wi, 1e-3, tm)
    perm = bt._octant_perm(wi, tm2)
    o_s, d_s, tm_s = pos[perm], wi[perm], tm2[perm]
    b = 256
    nb = N // b
    u_idx, u_entry, n_valid, ob, db, tmb = bt._select_candidates(
        grid, o_s, d_s, tm_s, nb, b, 1e-3, 48)
    return n_valid

nv = shadow_stats(pos, es.wi, tm_shadow)
import numpy as np
nv = np.asarray(nv)
print("shadow n_valid: mean", nv.mean(), "p50", np.percentile(nv, 50),
      "p95", np.percentile(nv, 95), "max", nv.max(),
      "zero-frac", (nv == 0).mean())

for mu in (48,):
    def fs(c, mu=mu):
        occ = bt.intersect_blocks_pallas(grid, scene.geometry,
                                         pos + c * 1e-6, es.wi, t_min=1e-3,
                                         t_max=tm_shadow, any_hit=True,
                                         block=256, max_u=mu, sort=True)
        return c + occ.sum().astype(jnp.float32) * 1e-12
    scan_time(f"shadow sorted max_u={mu}", fs)
def fs2(c):
    occ = bt.intersect_blocks_pallas(grid, scene.geometry,
                                     pos + c * 1e-6, es.wi, t_min=1e-3,
                                     t_max=tm_shadow, any_hit=True,
                                     block=256, max_u=48, sort=False)
    return c + occ.sum().astype(jnp.float32) * 1e-12
scan_time("shadow UNsorted max_u=48", fs2)
