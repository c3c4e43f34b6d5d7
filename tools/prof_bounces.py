"""Helmet sample-pass cost vs bounce count / NEE (scratch)."""
import dataclasses
import time
import jax, jax.numpy as jnp
from physically_based_renderer_tpu.integrator.path import _sample_radiance
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod

bc = config_mod.get("helmet")
scene, camera = config_mod.build_scene(bc.scene)
scene = upload_scene(scene)

def t_of(cfg, name):
    @jax.jit
    def run(c0):
        def body(c, _):
            img = _sample_radiance(scene, camera,
                                   jax.random.fold_in(jax.random.key(0),
                                                      (c * 1e6).astype(jnp.int32)),
                                   cfg)
            return c + img.sum() * 1e-12, None
        c, _ = jax.lax.scan(body, c0, None, length=3)
        return c
    c = run(jnp.float32(0.0)); jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(jnp.float32(0.5)); jax.block_until_ready(c)
    dt = (time.perf_counter() - t0 - 0.028) / 3
    print(f"{name:34s} {dt*1e3:8.2f} ms/sample", flush=True)
    return dt

base = bc.render
for nb in range(4):
    t_of(dataclasses.replace(base, max_bounces=nb), f"bounces={nb} nee=on")
t_of(dataclasses.replace(base, nee=False), "bounces=3 nee=OFF")
t_of(dataclasses.replace(base, resort=False), "bounces=3 resort=OFF")
