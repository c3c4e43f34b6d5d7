"""Throughput of BASELINE configs on the current backend (scratch tool).

Usage: python tools/prof_configs.py [config ...] [--iters N]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")  # run from repo root

import jax
import jax.numpy as jnp

from physically_based_renderer_tpu.integrator.path import render_with_stats
from physically_based_renderer_tpu.scene.types import upload_scene
from physically_based_renderer_tpu.utils import config as config_mod


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_many(scene, camera, keys, cfg):
    def body(acc, key):
        film, count = render_with_stats(scene, camera, key, cfg)
        return (acc[0] + film.hdr.mean(), acc[1] + count), None
    acc, _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())), keys)
    return acc


def run(name: str, iters: int):
    bc = config_mod.get(name)
    cfg = bc.render
    scene, camera = config_mod.build_scene(bc.scene)
    scene = upload_scene(scene)
    keys = jax.random.split(jax.random.key(1), iters)
    t0 = time.perf_counter()
    cs, count = render_many(scene, camera, keys, cfg)
    _ = float(cs)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    cs, count = render_many(scene, camera, keys, cfg)
    _ = float(cs)
    dt = (time.perf_counter() - t0) / iters
    rays = float(count) / iters
    print(f"{name:12s} tris={scene.geometry.num_tris:7d} "
          f"frame={dt * 1e3:8.2f} ms  rays/frame={rays:.3g} "
          f"-> {rays / dt / 1e6:7.1f}M rays/s  (compile {t_compile:.0f}s)",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*",
                    default=["triangle", "cornell", "cornell_ggx", "helmet"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    for name in args.configs:
        run(name, args.iters)
