"""Round-5 megakernel-v2 primitive probes — run ONE probe per process.

Usage: python tools/probe2.py <name>
Names: scalar_stack | relayout | onehot_mm | gather8 | gather_state |
       gather_rows | gather_lane | gather_tex

Each probe compiles exactly one kernel and prints one timing line.  Run
via tools/probe2.sh which sequences them with timeouts (a wedged remote
compile takes the tunnel down for ~35 min — keep the blast radius to one
probe).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    return float(jnp.sum(x))


def bench(run, *args, iters=30):
    fence(run(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(*args)
    fence(r)
    return (time.perf_counter() - t0) / iters


# ------------------------------------------------------------------ scalar
def scalar_stack():
    n_nodes = 2047

    def kernel(boxes_ref, out_ref, stack, cand):
        # boxes FLAT [n*6]: 2-D SMEM arrays pad every row to 128 lanes
        # (512 B) — [2047, 6] f32 allocates 1.0 MB and busts the 1 MB SMEM.
        def cond(c):
            return c[0] > 0

        def body(c):
            sp, nc, acc = c
            node = stack[sp - 1]
            sp = sp - 1
            b = node * 6
            lo0 = boxes_ref[b + 0]
            lo1 = boxes_ref[b + 1]
            lo2 = boxes_ref[b + 2]
            hi0 = boxes_ref[b + 3]
            hi1 = boxes_ref[b + 4]
            hi2 = boxes_ref[b + 5]
            near = jnp.maximum(jnp.maximum(lo0, lo1), lo2)
            far = jnp.minimum(jnp.minimum(hi0, hi1), hi2)
            hit = near <= far
            left = 2 * node + 1
            inner = left < n_nodes

            @pl.when(hit & inner)
            def _():
                stack[sp] = left
                stack[sp + 1] = left + 1

            @pl.when(hit & ~inner)
            def _():
                cand[nc] = node

            sp = jnp.where(hit & inner, sp + 2, sp)
            nc = jnp.where(hit & ~inner, nc + 1, nc)
            return sp, nc, acc + 1

        stack[0] = 0
        _, nc, acc = jax.lax.while_loop(cond, body, (1, 0, 0))
        out_ref[0] = acc
        out_ref[1] = nc

    @jax.jit
    def run(boxes):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                            pltpu.SMEM((1024,), jnp.int32)],
        )(boxes)

    rng = np.random.default_rng(1)
    lo = rng.uniform(-1, 0.4, (n_nodes, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.0, 1.2, (n_nodes, 3)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, hi], 1).reshape(-1))
    out = np.asarray(run(boxes))
    dt = bench(run, boxes)
    print(f"scalar_stack: visited={out[0]} leaves={out[1]} "
          f"{dt*1e6:.1f} us ({dt/max(out[0],1)*1e9:.0f} ns/node)",
          flush=True)


# ---------------------------------------------------------------- relayout
def relayout():
    """[8,128] tile -> [1024,1] column and back, 20x per call."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]                       # [8,128]
        acc = jnp.zeros((1024, 1), jnp.float32)
        for i in range(10):
            col = (x + i).reshape(1024, 1)         # tile -> column
            acc = acc + col
        back = acc.reshape(8, 128)                 # column -> tile
        o_ref[:] = back

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(1024, dtype=jnp.float32).reshape(8, 128)
    got = np.asarray(run(x))
    want = sum((np.arange(1024) + i) for i in range(10)).reshape(8, 128)
    ok = np.allclose(got, want)
    dt = bench(run, x)
    print(f"relayout x11: {dt*1e6:.2f} us ({dt/11*1e9:.0f} ns each) "
          f"ok={ok}", flush=True)


# --------------------------------------------------------------- onehot_mm
def onehot_mm():
    """Winner-attr extraction: one-hot [1024,512] x chunk rows [32,512]
    contracted over lanes on the MXU -> [1024,32]."""
    def kernel(lane_ref, rows_ref, o_ref):
        win = lane_ref[:]                          # [1024,1] winner lane
        lane = jax.lax.broadcasted_iota(jnp.int32, (1024, 512), 1)
        mask = (lane == win).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            mask, rows_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @jax.jit
    def run(lane, rows):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1024, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lane, rows)

    rng = np.random.default_rng(0)
    lane = jnp.asarray(rng.integers(0, 512, (1024, 1)), jnp.int32)
    rows = jnp.asarray(rng.normal(size=(32, 512)), jnp.float32)
    got = np.asarray(run(lane, rows))
    want = np.asarray(rows).T[np.asarray(lane)[:, 0]]
    ok = np.allclose(got, want, atol=1e-4)
    dt = bench(run, lane, rows)
    print(f"onehot_mm [1024,512]x[32,512]: {dt*1e6:.2f} us ok={ok}",
          flush=True)


# ----------------------------------------------------------------- gathers
def _gather(rows, lanes, axis, tag, iters=30):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, lanes)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, rows if axis == 0 else lanes,
                                   (rows, lanes)), jnp.int32)
    got = np.asarray(run(x, idx))
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
    ok = np.allclose(got, want)
    dt = bench(run, x, idx, iters=iters)
    n = rows * lanes
    print(f"{tag} [{rows},{lanes}] axis={axis}: {dt*1e6:.2f} us "
          f"({n/dt/1e9:.2f}G/s) ok={ok}", flush=True)


PROBES = {
    "scalar_stack": scalar_stack,
    "relayout": relayout,
    "onehot_mm": onehot_mm,
    "gather8": lambda: _gather(8, 128, 0, "gather8"),
    "gather_state": lambda: _gather(1024, 128, 0, "gather_state"),
    "gather_rows": lambda: _gather(256, 512, 0, "gather_rows"),
    "gather_lane": lambda: _gather(8, 512, 1, "gather_lane"),
    "gather_tex": lambda: _gather(16384, 128, 0, "gather_tex", iters=10),
}

if __name__ == "__main__":
    name = sys.argv[1]
    print(f"--- {name} on {jax.devices()}", flush=True)
    PROBES[name]()
