"""Split helmet closest_hit cost: phase A (slab+top_k) vs Pallas kernel,
and measure chunk-execution stats (scratch)."""
import time
import jax, jax.numpy as jnp
from physically_based_renderer_tpu.ops import blocktrace as bt
from physically_based_renderer_tpu.ops.pallas_trace import trace_blocks_pallas, CHUNK
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays

bc = config_mod.get("helmet")
cfg = bc.render
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)
grid = scene.clusters
print("clusters:", grid.num_clusters, "k:", grid.k)

W = H = 512
N = W * H
key = jax.random.key(0)
pix = jnp.arange(N)
keys = rng_mod.ray_keys(key, pix)
jitter = rng_mod.ray_uniform(keys, 0, rng_mod.STREAM_PIXEL_JITTER, 2).reshape(H, W, 2)
o, d = generate_rays(camera, W, H, jitter)
o = o.reshape(-1, 3); d = d.reshape(-1, 3)

b = cfg.block_size
max_u = cfg.max_u
n_pad = -(-N // b) * b
nb = n_pad // b
t_min = 0.0
tm = jnp.full((n_pad,), 1e30, jnp.float32)

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

def phase_a(c):
    u_idx, u_entry, n_valid, ob, db, tmb = bt._select_candidates(
        grid, o + c * 1e-6, d, tm[:N] * 0 + 1e30, nb, b, t_min, max_u)
    return c + u_idx.sum().astype(jnp.float32) * 1e-12 + n_valid.sum().astype(jnp.float32) * 1e-12

# prepacked pieces for kernel-only timing
u_idx, u_entry, n_valid, ob, db, tmb = jax.jit(
    lambda o, d: bt._select_candidates(grid, o, d, jnp.full((n_pad,), 1e30, jnp.float32), nb, b, t_min, max_u)
)(o, d)
ch = min(CHUNK, u_idx.shape[1])
n_u = u_idx.shape[1]
n_u_pad = -(-n_u // ch) * ch
if n_u_pad > n_u:
    u_idx = jnp.pad(u_idx, ((0, 0), (0, n_u_pad - n_u)), constant_values=grid.num_clusters)
    u_entry = jnp.pad(u_entry, ((0, 0), (0, n_u_pad - n_u)), constant_values=1e30)
soup, tri_packed = grid.soup, grid.tri_packed
o_comp = jnp.moveaxis(ob, -1, 0)
d_comp = jnp.moveaxis(db, -1, 0)

print("mean n_valid (camera rays):", float(n_valid.mean()),
      "p50:", float(jnp.percentile(n_valid.astype(jnp.float32), 50)),
      "p95:", float(jnp.percentile(n_valid.astype(jnp.float32), 95)),
      "max:", int(n_valid.max()))

def kern_only(c):
    bt_, bf_ = trace_blocks_pallas(
        u_idx, o_comp + c * 1e-6, d_comp, tmb, soup, tri_packed,
        t_min=t_min, any_hit=False, interpret=False,
        n_valid=n_valid, entry=u_entry)
    return c + bt_.sum() * 1e-12

def full(c):
    h = bt.intersect_blocks_pallas(grid, scene.geometry, o + c * 1e-6, d,
                                   t_min=t_min, t_max=1e30,
                                   block=b, max_u=max_u, lean=True)
    return c + h.t.sum() * 1e-12

ta = scan_time("phase A (slab+topk)", phase_a)
tk = scan_time("kernel only", kern_only)
tf = scan_time("full closest_hit", full)

# how many chunks would run WITHOUT the entry early exit: ceil(nv/ch)
import numpy as np
nv = np.asarray(n_valid)
print("chunks/block (no early exit): mean", float(np.ceil(nv / ch).mean()),
      "total", int(np.ceil(nv / ch).sum()))

# top_k alone
def topk_only(c):
    ob2 = (o + c * 1e-6).reshape(nb, b, 3)
    db2 = d.reshape(nb, b, 3)
    inv = jnp.where(db2 >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(db2), 1e-12)
    overlap, entry = bt._interval_slab(grid.aabb_min, grid.aabb_max,
                                       ob2.min(1), ob2.max(1), inv.min(1),
                                       inv.max(1), t_min, tmb.max(1) * 0 + 1e30)
    score = jnp.where(overlap, -entry, -jnp.inf)
    _, ui = jax.lax.top_k(score, max_u)
    return c + ui.sum().astype(jnp.float32) * 1e-12
def slab_only(c):
    ob2 = (o + c * 1e-6).reshape(nb, b, 3)
    db2 = d.reshape(nb, b, 3)
    inv = jnp.where(db2 >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(db2), 1e-12)
    overlap, entry = bt._interval_slab(grid.aabb_min, grid.aabb_max,
                                       ob2.min(1), ob2.max(1), inv.min(1),
                                       inv.max(1), t_min, tmb.max(1) * 0 + 1e30)
    return c + overlap.sum().astype(jnp.float32) * 1e-12 + entry.sum() * 1e-12
scan_time("slab only", slab_only)
scan_time("slab+topk", topk_only)
