"""Probe: cost of HBM→VMEM window DMA at unaligned offsets vs aligned.

The spatial pass pads its halo planes purely to make window starts
tile-aligned (pad_halo = a ~1.6 ms full copy per pass at 1080p). If Mosaic
DMAs unaligned windows at comparable speed, the pad can be dropped in favor
of in-kernel index clamping. Run: python scripts/dma_align_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(off_rows, off_lanes, c, he, we, bh, bw):
    def kernel(src_hbm, out_ref, scr, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        hp = src_hbm.shape[1]
        wp = src_hbm.shape[2]
        si = jnp.clip(i * bh - off_rows, 0, hp - he)
        sj = jnp.clip(j * bw - off_lanes, 0, wp - we)
        dma = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(si, he), pl.ds(sj, we)], scr, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((bh, bw), jnp.float32)
        for cc in range(c):
            acc = acc + scr[cc, :bh, :bw]
        out_ref[...] = acc

    def run(src):
        hp, wp = src.shape[1:]
        grid = (hp // bh, wp // bw)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((c, he, we), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(src)

    return run


def main():
    c, h, w = 21, 1080, 1920
    bh, bw = 40, 128
    he, we = 64, 256
    reps = 20
    src = jax.random.uniform(jax.random.PRNGKey(0), (c, h, w), jnp.float32)

    for name, offr, offl in [("aligned starts", 0, 0),
                             ("rows -10", 10, 0),
                             ("lanes -10", 0, 10),
                             ("rows&lanes -10", 10, 10)]:
        fn = make_fn(offr, offl, c, he, we, bh, bw)

        def run(x, s):
            def f(carry, _):
                return carry + 1.0, jnp.sum(fn(x + carry)[0])
            _, v = jax.lax.scan(f, s, None, length=reps)
            return jnp.sum(v)

        g = jax.jit(run)
        t0 = time.perf_counter()
        float(g(src, 0.0))
        t1 = time.perf_counter()
        best = np.inf
        for i in range(3):
            ta = time.perf_counter()
            float(g(src, float(i)))
            best = min(best, time.perf_counter() - ta)
        print(f"{name:16s} compile {t1 - t0 - best:5.1f}s "
              f"{1000 * best / reps:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
