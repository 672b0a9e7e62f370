"""Pallas scatter-add into small row tables: the transpose of
ops/pallas_rows.gather_rows.

d_table[r, c] = sum over pixels p with idx[p] == r of ct[c, p].

XLA's segment_sum lowering for this shape is latency-bound (measured
121 ms for 4M indices x 24 components into 512 rows at 1080p,
scripts/grad_micro.py) because the scatter serialises. Here the one-hot
never touches HBM: per (bh, bw) tile the kernel

- transposes the index tile and the component planes onto the sublane
  axis with MXU identity matmuls (out[j, k] = x[k, j] via
  dot_general(x, I, contract dim0 x dim0); HIGHEST precision keeps f32
  exact through the bf16x3 decomposition),
- builds the [bw, t_pad] one-hot in registers (iota compare against the
  transposed index column),
- accumulates acc[t, c] += onehot^T @ values with one MXU matmul per
  sublane row,

into a VMEM accumulator that persists across grid steps (every step maps
to the same output block; step 0 zeroes it). Used as the backward of
gather_rows / from_table on gradient paths (tables <= MAX_SCATTER_ROWS);
larger tables keep the segment_sum fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH, _BW = 32, 128

# The [bw, t_pad] one-hot build and the accumulator matmul scale with the
# table size; beyond this XLA's segment_sum wins back.
MAX_SCATTER_ROWS = 2048

# Mosaic supports only DEFAULT and HIGHEST dot precisions; DEFAULT's single
# bf16 pass would corrupt indices > 256 and round gradient values to 8
# mantissa bits, so the matmuls run HIGHEST (f32-faithful).
_HI = jax.lax.Precision.HIGHEST


def _scatter_kernel(n_comp: int, t_pad: int, idx_ref, ct_ref, out_ref):
    bh, bw = idx_ref.shape

    @pl.when(pl.program_id(0) * pl.num_programs(1) + pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    eye_bh = (jax.lax.broadcasted_iota(jnp.int32, (bh, bh), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (bh, bh), 1)
              ).astype(jnp.float32)
    # int iota cast to f32: Mosaic's tpu.iota is integer-only.
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (bw, t_pad), 1).astype(
        jnp.float32)

    # idxT[j, i] = idx[i, j] via an MXU identity matmul (out = x^T).
    idx_f = idx_ref[...].astype(jnp.float32)
    idx_t = jax.lax.dot_general(idx_f, eye_bh, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_HI)

    # acc[c, t] += ct[c, i, :] @ onehot_i — no value transpose needed.
    acc = jnp.zeros((n_comp, t_pad), jnp.float32)
    for i in range(bh):
        onehot = (idx_t[:, i:i + 1] == iota_t).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            ct_ref[:, i, :], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
    out_ref[...] = out_ref[...] + acc


def scatter_rows_add(ct: jnp.ndarray, idx: jnp.ndarray, t: int,
                     interpret: bool = False) -> jnp.ndarray:
    """ct [C, ..., W] f32, idx [..., W] int32 in [0, t) -> [t, C] f32 with
    d_table[r, c] = sum_{p: idx[p]=r} ct[c, p]. Leading dims are flattened
    into rows."""
    c = ct.shape[0]
    w = ct.shape[-1]
    ct2 = ct.reshape(c, -1, w)
    idx2 = idx.reshape(-1, w)
    h = idx2.shape[0]

    ph = (-h) % _BH
    pw = (-w) % _BW
    if ph or pw:
        # Zero-pad ct so pad pixels contribute nothing (their idx pads to 0).
        ct2 = jnp.pad(ct2, ((0, 0), (0, ph), (0, pw)))
        idx2 = jnp.pad(idx2, ((0, ph), (0, pw)))
    hp, wp = h + ph, w + pw

    t_pad = max(128, -(-t // 128) * 128)
    grid = (hp // _BH, wp // _BW)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, c, t_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BH, _BW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, t_pad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, t_pad), jnp.float32),
        interpret=interpret,
    )(idx2, ct2)
    return out[:, :t].T


def scatter_fits(t: int) -> bool:
    """Dispatch guard for the kernel path (mirrors gather_rows' TPU gate)."""
    return jax.default_backend() == "tpu" and t <= MAX_SCATTER_ROWS
