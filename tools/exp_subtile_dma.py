"""Feasibility probe: DMA of [16, 32] HBM slices into lane-offset slots of
a [16, 128] VMEM buffer (the K=32 sub-cluster assembly pattern), plus
timing vs the aligned [16, 128] row DMA.  (scratch)"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(idx_ref, src_hbm, out_ref, buf, sem, *, n_iters, ch):
    g = pl.program_id(0)

    def dma(slot, i, u):
        cl = idx_ref[g * n_iters * ch + u]
        return pltpu.make_async_copy(
            src_hbm.at[cl],                       # [16, 32]
            buf.at[slot, :, pl.ds(i * 32, 32)],   # lane offset 32*i
            sem.at[slot, i])

    def start(slot, j):
        for i in range(ch):
            dma(slot, i, j * ch + i).start()

    def wait(slot):
        for i in range(ch):
            dma(slot, i, 0).wait()

    start(0, 0)

    def body(j, acc):
        slot = j % 2
        @pl.when(j + 1 < n_iters)
        def _():
            start((j + 1) % 2, j + 1)
        wait(slot)
        return acc + jnp.sum(buf[slot], axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, n_iters, body,
                            jnp.zeros((1, ch * 32), jnp.float32))
    out_ref[0, 0, :] = acc[0, :]


@functools.partial(jax.jit, static_argnames=("n_iters", "ch", "nb"))
def run(idx, src, *, n_iters, ch, nb):
    return pl.pallas_call(
        functools.partial(kernel, n_iters=n_iters, ch=ch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1, ch * 32), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, ch * 32), jnp.float32),
                pltpu.SemaphoreType.DMA((2, ch)),
            ]),
        out_shape=jax.ShapeDtypeStruct((nb, 1, ch * 32), jnp.float32),
    )(idx, src)


C = 4096
src = jnp.asarray(np.random.rand(C, 16, 32), jnp.float32)
NB, NI, CH = 1024, 8, 4
idx = jnp.asarray(np.random.randint(0, C, NB * NI * CH), jnp.int32)

out = run(idx, src, n_iters=NI, ch=CH, nb=NB)
out.block_until_ready()
# correctness: recompute on host
o = np.asarray(out)[:, 0, :]
idx_h = np.asarray(idx).reshape(NB, NI, CH)
src_h = np.asarray(src)
blk = 0
expect = np.zeros((CH * 32,), np.float32)
for j in range(NI):
    for i in range(CH):
        expect[i*32:(i+1)*32] += src_h[idx_h[blk, j, i]].sum(axis=0)
print("correct:", np.allclose(o[blk], expect, rtol=1e-5))

t0 = time.perf_counter()
for _ in range(5):
    out = run(idx, src, n_iters=NI, ch=CH, nb=NB)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 5
print(f"subtile DMA: {dt*1e3:.2f} ms for {NB}x{NI}x{CH} copies of 2KB "
      f"({NB*NI*CH*2048/dt/1e9:.1f} GB/s)")
