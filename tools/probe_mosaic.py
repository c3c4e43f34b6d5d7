"""Empirical Mosaic capability probes for megakernel v2 (round 5).

Answers, on the real TPU:
  1. dynamic_gather (take_along_axis) in-kernel: which shapes compile,
     and how fast (sublane-dim and lane-dim, small and large tables)?
  2. scalar SMEM stack + while_loop: does a bundle-BVH-style scalar
     traversal compile, and what's the per-node cost?
  3. baseline: per-chunk cost of the existing MT math for calibration.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/probe_mosaic.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    return float(jnp.sum(x))


def timeit(f, *args, iters=20):
    f(*args)  # compile
    fence(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    fence(r)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- gather ---
def probe_gather(rows, lanes, axis, iters=50, reps=16):
    """take_along_axis inside a kernel: table [rows, lanes] gathered with
    same-shape indices along `axis`, repeated `reps` times to measure."""
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros_like(x)
        for i in range(reps):
            acc = acc + jnp.take_along_axis(x, (idx + i) % x.shape[axis],
                                            axis=axis)
        o_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    x = jnp.arange(rows * lanes, dtype=jnp.float32).reshape(rows, lanes)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows if axis == 0 else lanes,
                                   (rows, lanes)), jnp.int32)
    try:
        dt = timeit(run, x, idx, iters=iters)
        n = rows * lanes * reps
        print(f"gather axis={axis} [{rows},{lanes}] x{reps}: "
              f"{dt*1e6:9.1f} us  ({n/dt/1e9:7.2f} G gathers/s)", flush=True)
        # correctness spot check
        got = np.asarray(run(x, idx))
        want = sum(np.take_along_axis(np.asarray(x),
                                      (np.asarray(idx) + i)
                                      % (rows if axis == 0 else lanes),
                                      axis=axis) for i in range(reps))
        ok = np.allclose(got, want)
        if not ok:
            print("  MISMATCH!", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"gather axis={axis} [{rows},{lanes}]: FAIL {msg}", flush=True)


# ------------------------------------------------------- scalar traversal ---
def probe_scalar_stack(n_nodes=2047, iters=30):
    """Binary-tree scalar traversal with an SMEM stack; counts visited
    nodes.  Nodes: boxes in SMEM f32[n,6]; a fraction pass the slab test."""
    def kernel(boxes_ref, o_ref, stack, out_ref):
        def body(carry):
            sp, acc = carry
            node = stack[sp - 1]
            sp = sp - 1
            # fake slab test: 6 scalar reads + compares
            lo0 = boxes_ref[node, 0]
            lo1 = boxes_ref[node, 1]
            lo2 = boxes_ref[node, 2]
            hi0 = boxes_ref[node, 3]
            hi1 = boxes_ref[node, 4]
            hi2 = boxes_ref[node, 5]
            near = jnp.maximum(jnp.maximum(lo0, lo1), lo2)
            far = jnp.minimum(jnp.minimum(hi0, hi1), hi2)
            hit = near <= far
            left = 2 * node + 1
            is_inner = left < n_nodes

            @pl.when(hit & is_inner)
            def _():
                stack[sp] = left
                stack[sp + 1] = left + 1

            sp = jnp.where(hit & is_inner, sp + 2, sp)
            acc = acc + 1
            return sp, acc

        def cond(carry):
            return carry[0] > 0

        stack[0] = 0
        _, acc = jax.lax.while_loop(cond, body, (1, 0))
        out_ref[0] = acc

    @jax.jit
    def run(boxes):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )(boxes, jnp.zeros((1,), jnp.float32))

    rng = np.random.default_rng(1)
    # ~60% of nodes "hit" -> a real traversal profile
    lo = rng.uniform(-1, 0.4, (n_nodes, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.0, 1.2, (n_nodes, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, hi], 1))
    try:
        visited = int(run(boxes)[0])
        dt = timeit(run, boxes, iters=iters)
        print(f"scalar stack traversal: visited {visited} nodes in "
              f"{dt*1e6:.1f} us ({dt/max(visited,1)*1e9:.0f} ns/node)",
              flush=True)
    except Exception as e:
        print(f"scalar stack: FAIL {str(e).splitlines()[0][:140]}",
              flush=True)


# --------------------------------------------------------- chunk baseline ---
def probe_chunk(b=256, w=512, n_chunks=8, iters=30):
    """Raw MT chunk math cost, no DMA: [b, w] per chunk."""
    def kernel(o_ref, t_ref, out_ref):
        rox = o_ref[0, :][:, None]
        acc = jnp.full((b, 1), 1e30, jnp.float32)

        def body(j, acc):
            v = t_ref[:] * (j + 1.0)
            e = v * 1.0001
            px = rox * e[0, :][None, :]
            det = px * e[1, :][None, :] + px
            inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            uu = px * inv
            vv = uu * inv + px
            tt = vv * uu + uu
            ok = (uu >= 0.) & (vv >= 0.) & (uu + vv <= 1.) & (tt > 0.)
            tt = jnp.where(ok, tt, 1e30)
            return jnp.minimum(acc, jnp.min(tt, axis=1, keepdims=True))

        acc = jax.lax.fori_loop(0, n_chunks, body, acc)
        out_ref[:] = acc

    @jax.jit
    def run(o, t):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(o, t)

    o = jnp.ones((8, b), jnp.float32)
    t = jnp.ones((16, w), jnp.float32)
    dt = timeit(run, o, t, iters=iters)
    print(f"chunk math [{b},{w}] x{n_chunks}: {dt/n_chunks*1e6:.2f} us/chunk",
          flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    # 1. gather probes: sublane-dim (axis=0) tables of growing row count
    probe_gather(8, 128, 0)
    probe_gather(8, 512, 0)
    probe_gather(32, 512, 0)
    probe_gather(256, 512, 0)
    probe_gather(1024, 512, 0, reps=4)
    probe_gather(4096, 128, 0, reps=2, iters=10)
    # lane-dim (axis=1)
    probe_gather(8, 128, 1)
    probe_gather(8, 512, 1)
    probe_gather(256, 512, 1)
    probe_gather(8, 4096, 1, reps=4)
    # 2. scalar traversal
    probe_scalar_stack()
    # 3. baseline chunk math
    probe_chunk()
    print("done", flush=True)
