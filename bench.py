"""Benchmark harness: rays/s on the BASELINE headline config.

Headline metric (BASELINE.md): forward path-tracing throughput in rays/s on
the Cornell box at 4 spp (512x512, 4 bounces, NEE+MIS).  Target >= 200M
rays/s/chip.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
vs_baseline = value / 200e6 (fraction of the north-star target).

Ray accounting: rays/s counts ray QUERIES issued by active lanes — one
closest-hit query per bounce plus one shadow query per NEE light sample —
the standard wavefront-path-tracer definition.  Counts come from the real
integrator loop (integrator.path.render_with_stats), not an estimate.
"""

from __future__ import annotations

import json
import time


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from physically_based_renderer_tpu.integrator.path import (
        render_with_stats)
    from physically_based_renderer_tpu.scene.types import upload_scene
    from physically_based_renderer_tpu.utils import config as config_mod

    bc = config_mod.get("cornell")
    cfg = bc.render
    scene, camera = config_mod.build_scene(bc.scene)
    scene = upload_scene(scene)

    # Sustained throughput: render `iters` full frames back-to-back in ONE
    # jitted program (lax.scan over per-frame keys) so host dispatch and
    # remote-tunnel latency are not billed to the renderer; the final
    # scalar readback fences completion (block_until_ready is not a
    # reliable barrier through remote-device transports).
    iters = 5

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

    rays_per_s = rays_per_frame / dt
    print(json.dumps({
        "metric": "cornell_512_4spp_rays_per_s",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / 200e6,
    }))


if __name__ == "__main__":
    main()
