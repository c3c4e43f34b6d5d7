"""K=32 sub-cluster tracer on helmet: correctness spot-check + timing."""
import time
import jax, jax.numpy as jnp, numpy as np
from physically_based_renderer_tpu.ops import blocktrace as bt
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays
from physically_based_renderer_tpu.integrator.path import closest_hit, render_with_stats
from physically_based_renderer_tpu.models import lights as lights_mod

import os, dataclasses
K = int(os.environ.get("PROF_K", "32"))
MU = int(os.environ.get("PROF_MU", "96"))
bc = config_mod.get("helmet")
cfg = dataclasses.replace(bc.render, max_u=MU)
spec = dataclasses.replace(bc.scene, cluster_k=K)
scene, camera = config_mod.build_scene(spec)
scene = upload_scene(scene)
grid = scene.clusters
print("C:", grid.num_clusters, "k:", grid.k, "soup:", grid.soup.shape,
      "max_u:", cfg.max_u, flush=True)

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
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter", flush=True)
    return dt

# correctness spot check vs XLA block tracer on a subset
ns = 4096
hp = bt.intersect_blocks_pallas(grid, scene.geometry, o[:ns], d[:ns],
                                t_min=0.0, block=256, max_u=cfg.max_u,
                                lean=True)
hx = bt.intersect_blocks(grid, scene.geometry, o[:ns], d[:ns], t_min=0.0,
                         block=256, max_u=cfg.max_u)
tp, tx = np.asarray(hp.t), np.asarray(hx.t)
match = (np.isclose(tp, tx, rtol=1e-4) | ((tp > 1e29) & (tx > 1e29))).mean()
print("pallas-vs-xla t match:", match, flush=True)

def f(c):
    h = bt.intersect_blocks_pallas(grid, scene.geometry, o + c * 1e-6, d,
                                   t_min=0.0, block=256, max_u=cfg.max_u,
                                   lean=True)
    return c + h.t.sum() * 1e-12
scan_time("closest k32 B=256 u=96", f)

def pa(c):
    tm = jnp.full((N,), 1e30, jnp.float32)
    u_idx, u_entry, n_valid, ob, db, tmb = bt._select_candidates(
        grid, o + c*1e-6, d, tm, N // 256, 256, 0.0, cfg.max_u)
    return c + n_valid.sum().astype(jnp.float32) * 1e-12
scan_time("phase A C~3k topk96", pa)

h0 = closest_hit(scene, o, d, t_min=0.0, cfg=cfg)
h0 = jax.tree.map(jax.block_until_ready, h0)
pos = o + d * jnp.minimum(h0.t, 1e3)[:, None]
u = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_LIGHT, 5)
es = lights_mod.sample_env(scene, N, u[:, 3:5])
tm_shadow = jnp.where(~h0.miss, 1e30, 0.0)
def fs(c):
    occ = bt.intersect_blocks_pallas(grid, scene.geometry, pos + c * 1e-6,
                                     es.wi, t_min=1e-3, t_max=tm_shadow,
                                     any_hit=True, block=256,
                                     max_u=cfg.max_u, sort=True)
    return c + occ.sum().astype(jnp.float32) * 1e-12
scan_time("shadow k32 sorted u=96", fs)

f_, cnt = render_with_stats(scene, camera, key, cfg)
jax.block_until_ready(f_.hdr)
t0 = time.perf_counter()
f_, cnt = render_with_stats(scene, camera, jax.random.key(1), cfg)
jax.block_until_ready(f_.hdr)
dt = time.perf_counter() - t0
print(f"frame: {dt*1e3:.1f} ms, queries {float(cnt):.0f}, "
      f"rays/s {float(cnt)/dt/1e6:.2f}M", flush=True)
