"""Fused ACES+gamma tonemap Pallas kernel (HDR -> LDR on device).

TPU analog of the reference's compute tonemapper: a real device kernel
(`src/pbr_engine/engine/pbr/TonemapperSystem.cpp:97-134` dispatches 16x16
workgroups of `assets/shaders/tonemappers/aces+gamma.glsl`).  Here one
Pallas kernel applies the exact same math — Hill ACES fit matrices,
RRT+ODT rational, gamma 2.2, clamp — to [ROWS, 128]-tiled channel planes,
fusing the whole post chain into a single VMEM pass (the jnp path in
core/tonemap.py stays the differentiable reference implementation; this
kernel matches it to float tolerance and is primal-only).

Layout: the image flattens to N pixels, pads to (8, 128) tile multiples,
and moves channels to a leading axis of 3 so each channel is a full VPU
tile plane — the 3x3 color-matrix mixes are 18 vector FMAs, no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 256   # rows per grid step: 3 * 256 * 128 * 4 B = 384 KB VMEM in

# Constants verbatim from core/tonemap.py (aces+gamma.glsl:10-25); the
# effective transform is out = color @ M (row-vector convention).
_IN = ((0.59719, 0.35458, 0.04823),
       (0.07600, 0.90834, 0.01566),
       (0.02840, 0.13383, 0.83777))
_OUT = ((1.60475, -0.53108, -0.07367),
        (-0.10208, 1.10813, -0.00605),
        (-0.00327, -0.07276, 1.07602))


def _matmul3(r, g, b, m):
    """(r,g,b) row-vector times 3x3 matrix m."""
    return (r * m[0][0] + g * m[1][0] + b * m[2][0],
            r * m[0][1] + g * m[1][1] + b * m[2][1],
            r * m[0][2] + g * m[1][2] + b * m[2][2])


def _rrt_odt(c):
    num = c * (c + 0.0245786) - 0.000090537
    den = c * (0.983729 * c + 0.4329510) + 0.238081
    return num / den


def _kernel(x_ref, o_ref, *, inv_gamma):
    r, g, b = x_ref[0], x_ref[1], x_ref[2]
    r, g, b = _matmul3(r, g, b, _IN)
    r, g, b = _rrt_odt(r), _rrt_odt(g), _rrt_odt(b)
    r, g, b = _matmul3(r, g, b, _OUT)

    def gamma(c):
        # pow(max(c,0), 1/gamma); exp/log with a guarded zero branch.
        pos = c > 0.0
        safe = jnp.where(pos, c, 1.0)
        return jnp.where(pos, jnp.exp(jnp.log(safe) * inv_gamma), 0.0)

    o_ref[0] = jnp.clip(gamma(r), 0.0, 1.0)
    o_ref[1] = jnp.clip(gamma(g), 0.0, 1.0)
    o_ref[2] = jnp.clip(gamma(b), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("gamma", "interpret"))
def tonemap_pallas(hdr: jnp.ndarray, gamma: float = 2.2,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Fused ACES fit -> gamma -> clamp on device; matches
    core.tonemap.aces_gamma to float tolerance.  hdr: f32[..., 3]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = hdr.shape
    assert shape[-1] == 3, f"expected [..., 3] HDR image, got {shape}"
    flat = hdr.reshape(-1, 3).astype(jnp.float32)
    n = flat.shape[0]

    rows = -(-n // _LANES)
    block_rows = min(_BLOCK_ROWS, max(8, -(-rows // 8) * 8))
    rows_pad = -(-rows // block_rows) * block_rows
    n_pad = rows_pad * _LANES
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    x = jnp.moveaxis(flat.reshape(rows_pad, _LANES, 3), -1, 0)  # [3, R, 128]

    out = pl.pallas_call(
        functools.partial(_kernel, inv_gamma=1.0 / gamma),
        grid=(rows_pad // block_rows,),
        in_specs=[pl.BlockSpec((3, block_rows, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, block_rows, _LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows_pad, _LANES), jnp.float32),
        interpret=interpret,
    )(x)

    ldr = jnp.moveaxis(out, 0, -1).reshape(-1, 3)[:n]
    return ldr.reshape(shape)
