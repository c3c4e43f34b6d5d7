"""Runtime validation: the Vulkan-validation-layer / sanitizer analog.

The reference gates `VK_LAYER_KHRONOS_validation` behind a CLI flag
(`src/gltf_viewer/Main.cpp:22-23` -> `GpuHandle.cpp:35-37`) and compiles its
debug preset with ASan/UBSan (`CMakePresets.json:11`).  The XLA dataflow
model makes device races structurally absent (SURVEY.md section 5), so the
meaningful checks here are NUMERICAL: NaN/Inf generation and out-of-bounds
gathers inside the jitted render, surfaced by `jax.experimental.checkify`.

`checked_render` is the `--debug-checks` path of apps/render: it functionally
instruments the whole dense integrator (every div/gather/NaN site) and
raises `checkify.JaxRuntimeError` naming the failing check.  ~2x slower than
the raw render — a debug mode, exactly like the reference's validation flag.
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def checked_render(scene, camera, key, cfg):
    """Render with float/index/div checks instrumented; raises on failure.

    Pins the pure-XLA brute/BVH tracer: checkify cannot instrument Pallas
    kernel bodies (their internal while_loops reject the threaded error
    carry), and the numerical checks target the estimator math — the Pallas
    kernels are validated separately by interpret-mode equality tests.
    """
    import dataclasses

    from ..integrator.path import render as _render

    cfg = dataclasses.replace(
        cfg, tracer="bvh" if scene.bvh is not None else "brute")

    def f(s, c, k):
        return _render(s, c, k, cfg)

    # float (NaN/Inf) + OOB-index checks.  div_checks stays off: masked
    # lanes divide by zero by design (the quotient is discarded by a
    # jnp.where), same as the masked-lane convention the whole integrator
    # documents; flagging those would make every render "fail".
    checked = checkify.checkify(
        f, errors=checkify.float_checks | checkify.index_checks)
    err, film = jax.jit(checked)(scene, camera, key)
    err.throw()
    return film
