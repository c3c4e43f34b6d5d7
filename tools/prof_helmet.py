"""Where does the helmet frame go? (scratch)"""
import time
import jax, jax.numpy as jnp
from physically_based_renderer_tpu.integrator.path import (
    closest_hit, occluded, trace_radiance)
from physically_based_renderer_tpu.integrator.shading import (
    pack_tri_attrs, shade_surface)
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod
from physically_based_renderer_tpu.core import rng as rng_mod
from physically_based_renderer_tpu.core.camera import generate_rays
from physically_based_renderer_tpu.models import lights as lights_mod

bc = config_mod.get("helmet")
cfg = bc.render
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)
print("clusters:", scene.clusters.num_clusters, "k:", scene.clusters.k)

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

def s_shade(c):
    h = closest_hit(scene, o + c*1e-6, d, t_min=0.0, cfg=cfg)
    ta = pack_tri_attrs(scene)
    sp = shade_surface(scene, h, o, d, tri_attrs=ta)
    return c + (sp.pos.sum() + sp.bsdf.base_color.sum()) * 1e-12

def s_env(c):
    L = lights_mod.env_radiance(scene, d + c*1e-9)
    es = lights_mod.sample_env(scene, N, jnp.abs(d[:, :2]) % 1.0)
    return c + L.sum() * 1e-12 + es.pdf.sum() * 1e-12

def s_sample(c):
    L = trace_radiance(scene, o + c*1e-6, d, keys, cfg)
    return c + L.sum() * 1e-12

t1 = scan_time("closest_hit", s_trace)
t2 = scan_time("trace+shade(tex)", s_shade)
t3 = scan_time("env radiance+sample", s_env)
t4 = scan_time("full 1-spp sample", s_sample)
print(f"shade delta {1e3*(t2-t1):.1f} ms")

from physically_based_renderer_tpu.models.bsdf import eval_bsdf, sample_bsdf, BsdfParams
import numpy as np

tm_big = jnp.full((N,), 1e30, jnp.float32)
def s_occl(c):
    occ = occluded(scene, o + c*1e-6, d, t_min=1e-3, t_max=tm_big, cfg=cfg)
    return c + occ.sum().astype(jnp.float32) * 1e-12

def s_rng(c):
    u = rng_mod.ray_uniform(keys, 1, rng_mod.STREAM_LIGHT, 5)
    ub = rng_mod.ray_uniform(keys, 1, rng_mod.STREAM_BSDF, 3)
    return c + u.sum() * 1e-12 + ub.sum() * 1e-12

wo = jnp.tile(jnp.array([[0.3,0.2,0.9]], jnp.float32), (N,1))
wi = jnp.tile(jnp.array([[0.1,-0.2,0.95]], jnp.float32), (N,1))
params = BsdfParams(base_color=jnp.ones((N,3))*0.6, metallic=jnp.zeros((N,)),
                    roughness=jnp.ones((N,))*0.4, specular=jnp.ones((N,)))
def s_bsdf(c):
    f, p = eval_bsdf(params, wo + c*1e-9, wi)
    wi2, f2, p2 = sample_bsdf(params, wo + c*1e-9, jnp.abs(d[:,0]), jnp.abs(d[:,1:3]))
    return c + f.sum()*1e-12 + p.sum()*1e-12 + f2.sum()*1e-12

t5 = scan_time("occluded t_max=BIG", s_occl)
t6 = scan_time("rng 2x ray_uniform", s_rng)
t7 = scan_time("bsdf eval+sample", s_bsdf)

from physically_based_renderer_tpu.ops.gather import take_rows
from physically_based_renderer_tpu.ops.texture import sample_bilinear
ta = jax.jit(lambda: pack_tri_attrs(scene))()
idx = jnp.abs(jnp.arange(N) * 7919) % scene.geometry.num_tris
uvq = jnp.stack([jnp.abs(d[:,0]), jnp.abs(d[:,1])], -1) % 1.0
texid = jnp.zeros((N,), jnp.int32)
def s_take(c):
    r = take_rows(ta, (idx + c.astype(jnp.int32)) % scene.geometry.num_tris)
    return c + r.sum() * 1e-12
def s_tex(c):
    a = sample_bilinear(scene.textures, texid, uvq + c*1e-9)
    b = sample_bilinear(scene.textures, texid+1, uvq + c*1e-9)
    return c + a.sum()*1e-12 + b.sum()*1e-12
def s_pack(c):
    t = pack_tri_attrs(scene)
    return c + t.sum() * 1e-12 + c*1e-9
t8 = scan_time("take_rows [1M] of [100K,53]", s_take)
t9 = scan_time("sample_bilinear x2", s_tex)
t10 = scan_time("pack_tri_attrs", s_pack)
