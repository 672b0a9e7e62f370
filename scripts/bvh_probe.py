"""Probe the Mosaic features the Pallas BVH kernel needs on the live TPU:

1. DMA of one triangle page HBM -> SMEM scratch at a *dynamic* leading index.
2. A scalar while_loop walking an SMEM skip-link table, issuing those DMAs,
   with a vector slab test + best-t update per visited node.

Run: python scripts/bvh_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAGE = 512


def _kernel_dma(pages_hbm, idx_ref, o_ref, out_ref, scratch, sem):
    # DMA page idx_ref[0] (traced scalar) from HBM into SMEM scratch.
    i = idx_ref[0]
    dma = pltpu.make_async_copy(pages_hbm.at[i], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[...] = o_ref[...] + scratch[0, 0] + scratch[15, PAGE - 1]


def probe_dma(n_pages=8):
    pages = jnp.arange(n_pages * 16 * PAGE, dtype=jnp.float32).reshape(
        n_pages, 16, PAGE)
    idx = jnp.array([3], jnp.int32)
    x = jnp.zeros((8, 128), jnp.float32)
    f = pl.pallas_call(
        _kernel_dma,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((16, PAGE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    r = jax.jit(f)(pages, idx, x)
    want = float(pages[3, 0, 0] + pages[3, 15, PAGE - 1])
    got = float(r[0, 0])
    print(f"DMA HBM->SMEM dynamic page: got {got}, want {want}",
          "OK" if abs(got - want) < 1e-3 else "MISMATCH")


def _kernel_walk(n_nodes, nodes_ref, pages_hbm, o_ref, out_ref, scratch,
                 sem):
    """Walk a skip-link table in SMEM; on 'leaf' nodes DMA the page and
    accumulate its first scalar into a running vreg total."""
    acc0 = jnp.zeros_like(o_ref[...])

    def cond(state):
        cursor, _ = state
        return cursor >= 0

    def body(state):
        cursor, acc = state
        is_leaf = nodes_ref[1, cursor] > 0
        page = nodes_ref[2, cursor]
        nxt = nodes_ref[0, cursor]  # miss/skip link

        def on_leaf(acc):
            dma = pltpu.make_async_copy(pages_hbm.at[page], scratch, sem)
            dma.start()
            dma.wait()
            return acc + scratch[0, 0]

        acc = jax.lax.cond(is_leaf, on_leaf, lambda a: a, acc)
        return nxt, acc

    cursor, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
    out_ref[...] = acc + o_ref[...]


def probe_walk(n_pages=8):
    pages = (100.0 * (1 + jnp.arange(n_pages, dtype=jnp.float32))[
        :, None, None] * jnp.ones((n_pages, 16, PAGE), jnp.float32))
    # Chain: node i -> node i+1, leaves at odd nodes visiting page i//2.
    n_nodes = 6
    link = jnp.array([1, 2, 3, 4, 5, -1], jnp.int32)
    leaf = jnp.array([0, 1, 0, 1, 0, 1], jnp.int32)
    page = jnp.array([0, 2, 0, 5, 0, 7], jnp.int32)
    nodes = jnp.stack([link, leaf, page])  # [3, n_nodes] SMEM
    x = jnp.zeros((8, 128), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_kernel_walk, n_nodes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((16, PAGE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    r = jax.jit(f)(nodes, pages, x)
    want = 100.0 * (3 + 6 + 8)
    got = float(r[0, 0])
    print(f"scalar walk + leaf DMA: got {got}, want {want}",
          "OK" if abs(got - want) < 1e-3 else "MISMATCH")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_dma()
    probe_walk()
