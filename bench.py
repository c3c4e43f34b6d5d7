"""Benchmark harness: rays/s on the BASELINE configs.

Headline metric (BASELINE.md): forward path-tracing throughput in rays/s on
the Cornell box at 4 spp (512x512, 4 bounces, NEE+MIS).  Target >= 200M
rays/s/chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N,
     "configs": {triangle|cornell|cornell_ggx|helmet: rays/s, ...}}
vs_baseline = cornell value / 200e6 (fraction of the north-star target).
The `configs` map covers all four forward BASELINE configs (VERDICT r1 #1:
"bench reports 4 configs, each with the number in the JSON").

Ray accounting: rays/s counts ray QUERIES issued by active lanes — one
closest-hit query per bounce plus one shadow query per NEE light sample —
the standard wavefront-path-tracer definition.  Counts come from the real
integrator loop (integrator.path.render_with_stats), not an estimate.
"""

from __future__ import annotations

import json
import time


def _bench_config(name: str, iters: int):
    import functools

    import jax
    import jax.numpy as jnp

    from physically_based_renderer_tpu.integrator.path import (
        render_with_stats)
    from physically_based_renderer_tpu.scene.types import upload_scene
    from physically_based_renderer_tpu.utils import config as config_mod

    bc = config_mod.get(name)
    cfg = bc.render
    scene, camera = config_mod.build_scene(bc.scene)
    scene = upload_scene(scene)

    # Sustained throughput: render `iters` full frames back-to-back in ONE
    # jitted program (lax.scan over per-frame keys) so host dispatch and
    # remote-tunnel latency are not billed to the renderer; the final
    # scalar readback fences completion (block_until_ready is not a
    # reliable barrier through remote-device transports).
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def render_many(scene, camera, keys, cfg):
        def body(acc, key):
            film, count = render_with_stats(scene, camera, key, cfg)
            return (acc[0] + film.hdr.mean(), acc[1] + count), None

        acc, _ = jax.lax.scan(
            body, (jnp.zeros(()), jnp.zeros(())), keys)
        return acc

    keys = jax.random.split(jax.random.key(1), iters)
    checksum, count = render_many(scene, camera, keys, cfg)  # compile+warm
    rays_per_frame = float(count) / iters
    _ = float(checksum)

    t0 = time.perf_counter()
    checksum, count = render_many(scene, camera, keys, cfg)
    _ = float(checksum)
    dt = (time.perf_counter() - t0) / iters
    return rays_per_frame / dt


def main():
    results = {}
    for name, iters in (("triangle", 5), ("cornell", 5),
                        ("cornell_ggx", 5), ("helmet", 3)):
        results[name] = _bench_config(name, iters)

    headline = results["cornell"]
    print(json.dumps({
        "metric": "cornell_512_4spp_rays_per_s",
        "value": headline,
        "unit": "rays/s",
        "vs_baseline": headline / 200e6,
        "configs": results,
    }))


if __name__ == "__main__":
    main()
