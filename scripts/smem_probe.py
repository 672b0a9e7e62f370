"""Probe the Mosaic SMEM budget on the live TPU: how many f32 triangle
columns can stay scalar-resident? Sizes the Pallas BVH kernel's node+leaf
tables. Run: python scripts/smem_probe.py"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n, smem_ref, o_ref, out_ref):
    # Touch first and last scalar so the table cannot be elided.
    out_ref[...] = o_ref[...] + smem_ref[0, 0] + smem_ref[9, n - 1]


def probe(n):
    x = jnp.zeros((8, 128), jnp.float32)
    cols = jnp.zeros((10, n), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_kernel, n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    r = jax.jit(f)(cols, x)
    r.block_until_ready()
    return True


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for n in (2048, 4096, 8192, 16384, 24576, 32768, 49152, 65536, 98304,
              131072):
        kb = 10 * n * 4 / 1024
        try:
            probe(n)
            print(f"n={n:7d} ({kb:8.0f} KB SMEM): OK")
        except Exception as ex:  # noqa: BLE001
            msg = str(ex).split("\n")[0][:140]
            print(f"n={n:7d} ({kb:8.0f} KB SMEM): FAIL — {msg}")
            break
