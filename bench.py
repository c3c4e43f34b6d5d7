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
    import jax

    from physically_based_renderer_tpu.integrator.path import (
        render_with_stats)
    from physically_based_renderer_tpu.scene.types import upload_scene
    from physically_based_renderer_tpu.utils import config as config_mod

    bc = config_mod.get("cornell")
    cfg = bc.render
    scene, camera = config_mod.build_scene(bc.scene)
    scene = upload_scene(scene)

    # Compile + warm up (including the mean-readback fence computation).
    film, count = render_with_stats(scene, camera, jax.random.key(0), cfg)
    rays_per_frame = float(count)
    _ = float(film.hdr.mean())

    # Timing forces a scalar readback per frame: block_until_ready is not a
    # reliable completion barrier through remote-device transports, so each
    # frame is fenced by materializing a reduction of its output on host.
    iters = 5
    keys = [jax.random.key(i + 1) for i in range(iters)]
    t0 = time.perf_counter()
    for i in range(iters):
        film, count = render_with_stats(scene, camera, keys[i], cfg)
        _ = float(film.hdr.mean())
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
