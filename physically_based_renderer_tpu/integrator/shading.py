"""Surface shading-point construction from hit records.

The TPU analog of the reference's G-buffer fill (geometry-pass fragment
shader `assets/shaders/geometry_pass/fragment.glsl:19-31`): interpolate
vertex attributes at the hit, run normal mapping through the TBN frame
(bitangent = cross(N, T.xyz) * T.w, `geometry_pass/vertex.glsl:25-37`), and
fetch material parameters through the texture stack.  Instead of writing
position/normal/albedo render targets, the results feed the BSDF directly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import math3d
from ..models.bsdf import BsdfParams
from ..ops.intersect import Hit
from ..ops.texture import sample_bilinear
from ..scene.types import Scene


@struct.dataclass
class ShadingPoint:
    pos: jnp.ndarray       # f32[N,3] world hit position
    ng: jnp.ndarray        # f32[N,3] geometric normal (faces the incoming ray)
    ns: jnp.ndarray        # f32[N,3] shading normal (normal-mapped, oriented)
    tang: jnp.ndarray      # f32[N,3] tangent of the shading frame
    bitang: jnp.ndarray    # f32[N,3]
    uv: jnp.ndarray        # f32[N,2]
    bsdf: BsdfParams       # per-hit material parameters
    emissive: jnp.ndarray  # f32[N,3] emitted radiance (front side)
    front: jnp.ndarray     # bool[N] ray hit the geometric front face
    mat: jnp.ndarray       # i32[N] material id


def shade_surface(scene: Scene, hit: Hit, ray_d: jnp.ndarray) -> ShadingPoint:
    """Build shading points for hits (garbage-but-finite values for misses;
    callers mask by hit.miss)."""
    g = scene.geometry
    tri = jnp.maximum(hit.tri, 0)
    idx = g.indices[tri]                                  # [N,3]
    w = hit.w[:, None]
    u = hit.u[:, None]
    v = hit.v[:, None]

    def lerp(attr):
        return (w * attr[idx[:, 0]] + u * attr[idx[:, 1]]
                + v * attr[idx[:, 2]])

    pos = lerp(g.positions)
    ns_raw = math3d.normalize(lerp(g.normals))
    t4 = lerp(g.tangents)
    uv = lerp(g.uvs)

    # Geometric normal from the winding (CCW front face).
    v0 = g.positions[idx[:, 0]]
    v1 = g.positions[idx[:, 1]]
    v2 = g.positions[idx[:, 2]]
    ng = math3d.normalize(jnp.cross(v1 - v0, v2 - v0))
    front = jnp.sum(ng * ray_d, axis=-1) < 0.0
    sign = jnp.where(front, 1.0, -1.0)[:, None]
    ng_o = ng * sign          # oriented toward the incoming ray
    ns = ns_raw * sign

    mat = g.tri_material[tri]
    mats = scene.materials

    # TBN frame: tangent orthogonalized against the shading normal,
    # bitangent = cross(N, T) * T.w  (geometry_pass/vertex.glsl:30-32).
    t = t4[:, :3] - jnp.sum(t4[:, :3] * ns, axis=-1, keepdims=True) * ns
    t = math3d.normalize(t)
    b = jnp.cross(ns, t) * t4[:, 3:4]

    # Normal mapping (geometry_pass/fragment.glsl:23-27: n = tex*2-1, TBN*n),
    # with glTF normal_scale applied to the tangential components.
    ntex = mats.normal_tex[mat]
    has_nm = (ntex >= 0)[:, None]
    nm = sample_bilinear(scene.textures, ntex, uv, default=0.5)[:, :3] * 2.0 - 1.0
    scale = mats.normal_scale[mat][:, None]
    nm = jnp.concatenate([nm[:, :2] * scale, nm[:, 2:3]], axis=-1)
    # Sanitize BEFORE normalize: lanes without a normal map carry the zero
    # vector whose normalize-gradient is NaN (where-trap).
    nm = jnp.where(has_nm, nm, jnp.array([0.0, 0.0, 1.0], jnp.float32))
    nm = math3d.normalize(nm)
    ns_mapped = math3d.normalize(
        nm[:, 0:1] * t + nm[:, 1:2] * b + nm[:, 2:3] * ns)
    ns = jnp.where(has_nm, ns_mapped, ns)
    # Keep the shading normal in the same hemisphere as the oriented
    # geometric normal (avoids light leaks from aggressive normal maps).
    flip = jnp.sum(ns * ng_o, axis=-1, keepdims=True) < 0.0
    ns = math3d.normalize(jnp.where(flip, ns - 2.0 * jnp.sum(
        ns * ng_o, axis=-1, keepdims=True) * ng_o, ns))

    # Rebuild tangent frame around the final shading normal.
    t = t - jnp.sum(t * ns, axis=-1, keepdims=True) * ns
    t = math3d.normalize(t)
    b = jnp.cross(ns, t) * t4[:, 3:4]

    # Material parameter fetches (albedo = factor x texture, the reference's
    # `mat.color * texture(colorSampler, uv)` at geometry_pass/fragment.glsl:30,
    # extended with metallic-roughness per glTF: B=metallic, G=roughness).
    bc = sample_bilinear(scene.textures, mats.base_color_tex[mat], uv)
    base_color = mats.base_color_factor[mat] * bc
    mr = sample_bilinear(scene.textures, mats.metallic_roughness_tex[mat], uv)
    metallic = mats.metallic_factor[mat] * mr[:, 2]
    roughness = mats.roughness_factor[mat] * mr[:, 1]
    em_tex = sample_bilinear(scene.textures, mats.emissive_tex[mat], uv)
    emissive = mats.emissive_factor[mat] * em_tex[:, :3]
    # One-sided emission: only the geometric front face emits.
    emissive = jnp.where(front[:, None], emissive, 0.0)

    params = BsdfParams(base_color=base_color[:, :3], metallic=metallic,
                        roughness=roughness,
                        specular=mats.specular_factor[mat])
    return ShadingPoint(pos=pos, ng=ng_o, ns=ns, tang=t, bitang=b, uv=uv,
                        bsdf=params, emissive=emissive, front=front, mat=mat)
