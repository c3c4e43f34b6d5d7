"""Reference-parity debug shading: headlight Blinn-Phong.

Reproduces the reference's deferred lighting pass EXACTLY
(`assets/shaders/pbr/lighting.glsl:19-29` + `BlinnPhong.lib.glsl:4-10`):

    V = L = normalize(cameraPos - P)
    H = normalize(V + L) = V
    out = albedo * max(N.V, 0) + pow(max(N.H, 0), 64)

This is the oracle for "allclose vs reference renders": primary-visibility
shading with this model matches the reference's G-buffer + lighting output
(before tonemap), modulo rasterization-vs-ray-casting edge coverage.
Kept as a cheap debug mode per SURVEY.md section 7 non-goals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import math3d
from ..core.camera import Camera, generate_rays_flat
from ..ops.intersect import intersect_brute
from ..scene.types import Scene
from ..integrator.shading import shade_surface


def blinn_phong_lighting(albedo: jnp.ndarray, n: jnp.ndarray, v: jnp.ndarray,
                         l: jnp.ndarray) -> jnp.ndarray:
    """BlinnPhong.lib.glsl:4-10, vectorized (albedo/n/v/l are [N,3])."""
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1, keepdims=True), 0.0)
    h = math3d.normalize(v + l)
    ndh = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    spec = ndh ** 64
    return albedo * ndv + spec


@partial(jax.jit, static_argnames=("width", "height"))
def render_blinn_phong(scene: Scene, camera: Camera, width: int,
                       height: int) -> jnp.ndarray:
    """Primary-visibility headlight render -> HDR [H, W, 3].

    Equivalent of one reference frame: geometry pass (ray cast instead of
    raster) + lighting pass; feed through core.tonemap.aces_gamma for the
    full present chain.
    """
    o, d = generate_rays_flat(camera, width, height)
    v0, v1, v2 = scene.geometry.tri_vertices()
    hit = intersect_brute(o, d, v0, v1, v2, t_min=0.0)
    sp = shade_surface(scene, hit, o, d)
    v = math3d.normalize(jnp.broadcast_to(camera.position, sp.pos.shape)
                         - sp.pos)
    albedo = sp.bsdf.base_color
    rgb = blinn_phong_lighting(albedo, sp.ns, v, v)
    rgb = jnp.where(hit.miss[:, None], 0.0, rgb)
    return rgb.reshape(height, width, 3)
