"""Texture sampling ops: bilinear lookup into the scene TextureStack.

Replaces the reference's vk::Sampler + combined-image-sampler descriptors
(`src/pbr_engine/engine/pbr/Material.cpp:25-62`, sampler creation
`PbrRenderSystem.cpp:96-121`): filtering becomes an explicit gather+lerp over
the padded [N_tex, H, W, 4] stack.  Differentiable w.r.t. the texel data —
this is the path inverse rendering uses to recover textures.

Wrap modes follow glTF sampler wrapS/wrapT (repeat / clamp / mirrored),
matching the reference's loadSampler mapping (`gltf/pbr/gltf/Asset.cpp:
103-120`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import TextureStack, WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT
from .gather import take_rows


def _wrap_coord(x: jnp.ndarray, size: jnp.ndarray,
                mode: jnp.ndarray) -> jnp.ndarray:
    """Wrap integer texel coords [N] into [0, size) per mode [N]."""
    size = jnp.maximum(size, 1)
    rep = jnp.mod(x, size)
    clamp = jnp.clip(x, 0, size - 1)
    period = 2 * size
    m = jnp.mod(x, period)
    mirror = jnp.where(m < size, m, period - 1 - m)
    out = jnp.where(mode == WRAP_CLAMP, clamp,
                    jnp.where(mode == WRAP_MIRROR, mirror, rep))
    return out


def sample_bilinear(stack: TextureStack, tex_idx: jnp.ndarray,
                    uv: jnp.ndarray,
                    default: float = 1.0) -> jnp.ndarray:
    """Bilinear sample -> f32[N, 4].

    tex_idx i32[N] indexes the stack; entries < 0 return `default`.
    uv f32[N, 2] in texture space (u right, v down — glTF convention, which
    the reference inherits by sampling stb-decoded rows top-first).

    Performance shape: every fetch is a SINGLE-flat-index row gather
    (XLA-TPU lowers `data[i, y, x]` multi-index gathers ~4x slower than
    `flat[row]`), and the per-texture size/wrap metadata is one packed row
    fetch instead of two i32 gathers — 6 gathers/call down to 5, each at
    full row-gather speed.
    """
    idx = jnp.maximum(tex_idx, 0)
    hp, wp = stack.data.shape[1], stack.data.shape[2]
    # Packed per-texture metadata: h, w, wrapS, wrapT (exact small ints in
    # f32; ONE row fetch for all four).
    meta = jnp.concatenate([stack.sizes.astype(jnp.float32),
                            stack.wrap.astype(jnp.float32)], axis=1)
    rows = take_rows(meta, idx)           # [N, 4]
    sz_y = rows[:, 0].astype(jnp.int32)
    sz_x = rows[:, 1].astype(jnp.int32)
    wrap_s = rows[:, 2].astype(jnp.int32)
    wrap_t = rows[:, 3].astype(jnp.int32)
    h = rows[:, 0]
    w = rows[:, 1]

    # Texel-center addressing: uv * size - 0.5
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[:, None]
    fy = (y - y0.astype(jnp.float32))[:, None]

    flat = stack.data.reshape(-1, stack.data.shape[-1])
    base = idx * (hp * wp)

    def fetch(xi, yi):
        xi = _wrap_coord(xi, sz_x, wrap_s)
        yi = _wrap_coord(yi, sz_y, wrap_t)
        return take_rows(flat, base + yi * wp + xi)   # [N, 4] flat gather

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    out = top * (1.0 - fy) + bot * fy
    has_tex = (tex_idx >= 0)[:, None]
    return jnp.where(has_tex, out, jnp.full_like(out, default))


def sample_env_bilinear(data: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Equirect env-map lookup for unit directions d[N,3] -> radiance [N,3].

    theta = acos(y) maps to rows (0 = +y pole), phi = atan2(z, x) to columns.
    """
    h, w = data.shape[0], data.shape[1]
    theta = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(d[:, 2], d[:, 0])
    u = (phi / (2.0 * jnp.pi) + 0.5) * w - 0.5
    v = theta / jnp.pi * h - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fx = (u - x0.astype(jnp.float32))[:, None]
    fy = (v - y0.astype(jnp.float32))[:, None]

    flat = data.reshape(-1, data.shape[-1])

    def fetch(xi, yi):
        xi = jnp.mod(xi, w)
        yi = jnp.clip(yi, 0, h - 1)
        return take_rows(flat, yi * w + xi)   # single-flat-index gather

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
