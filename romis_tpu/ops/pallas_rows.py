"""Planes-first packed row gather: table [T, C] + idx [H, W] → [C, H, W].

Replaces XLA's `table[idx]` for per-pixel attribute/material fetches
(reference rtcInterpolate0 + geomID→Material map,
embree_interface.cpp:76-82). The XLA gather is HBM-latency-bound at 2M
pixels AND materialises [H, W, C] with C padded to 128 lanes (a ~1GB
buffer for C=24 at 1080p). This kernel:

- keeps the table transposed [C, T_pad] resident in VMEM,
- fetches each component with windowed lane dynamic_gathers (Mosaic's
  gather indexes within one 128-lane vreg, so T_pad/128 windows are
  selected by index range),
- writes planes-first [C, H, W] — the layout every consumer wants.

Gradients: a custom_vjp scatter-adds the output cotangent back into the
table rows (segment-sum over pixels by index), so material/normal
parameters stay differentiable through the fetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH, _BW = 32, 128

# Table budget: C * T_pad f32 resident in VMEM per tile.
MAX_VMEM_ROWS = 4096


def _rows_kernel(n_comp: int, n_win: int, idx_ref, table_t_ref, out_ref):
    bh, bw = idx_ref.shape
    idx = idx_ref[...]
    zeros_bh = jnp.zeros((bh, 128), jnp.float32)
    for c in range(n_comp):
        acc = jnp.zeros((bh, bw), jnp.float32)
        for v in range(n_win):
            win = table_t_ref[c:c + 1, 128 * v:128 * (v + 1)] + zeros_bh
            local = jnp.clip(idx - 128 * v, 0, 127)
            g = jnp.take_along_axis(win, local, axis=1)
            in_w = (idx >= 128 * v) & (idx < 128 * (v + 1))
            acc = jnp.where(in_w, g, acc)
        out_ref[c] = acc


def _rows_gather_pallas(table: jnp.ndarray, idx: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    t, c = table.shape
    h, w = idx.shape
    t_pad = max(128, -(-t // 128) * 128)
    table_t = jnp.pad(table, ((0, t_pad - t), (0, 0))).T  # [C, T_pad]

    ph = (-h) % _BH
    pw = (-w) % _BW
    idx_p = jnp.pad(idx, ((0, ph), (0, pw)))
    hp, wp = h + ph, w + pw

    out = pl.pallas_call(
        functools.partial(_rows_kernel, c, t_pad // 128),
        grid=(hp // _BH, wp // _BW),
        in_specs=[
            pl.BlockSpec((_BH, _BW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # table, whole
        ],
        out_specs=pl.BlockSpec((c, _BH, _BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(idx_p, table_t)
    return out[:, :h, :w]


def _rows_gather_xla(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(table[idx], -1, 0)  # [C, H, W]


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [T, C] f32, idx [..., H, W] int32 (in [0, T)) → [C, ..., H, W].
    TPU dispatches the fused kernel when the table fits VMEM; leading index
    axes fold into the row axis (rows are independent in the kernel), so
    K-lane callers like the surrogate-RIS replay tail stay on the kernel
    path (the XLA fallback's v&g measured 13 ms vs 3 ms per 1080p call)."""
    if (jax.default_backend() == "tpu"
            and table.shape[0] <= MAX_VMEM_ROWS and idx.ndim >= 2):
        if idx.ndim == 2:
            return _rows_gather_pallas(table, idx)
        lead = idx.shape[:-2]
        h, w = idx.shape[-2:]
        n = 1
        for s in lead:
            n *= s
        out = _rows_gather_pallas(table, idx.reshape(n * h, w))
        return out.reshape((table.shape[1],) + lead + (h, w))
    return _rows_gather_xla(table, idx)


def _gather_rows_fwd(table, idx):
    return gather_rows(table, idx), (table.shape, idx)


def _gather_rows_bwd(res, ct):
    (t, c), idx = res
    # d_table[r, comp] = Σ_{pixels p: idx[p]=r} ct[comp, p]. On TPU with a
    # small table the one-hot MXU scatter kernel replaces segment_sum
    # (121 ms → ~8 ms for 4M indices × 24 comps → 512 rows at 1080p,
    # scripts/grad_micro.py).
    from .pallas_scatter import scatter_fits, scatter_rows_add

    if scatter_fits(t):
        return scatter_rows_add(ct, idx, t), None
    flat_ct = ct.reshape(c, -1).T  # [N, C]
    d_table = jax.ops.segment_sum(flat_ct, idx.ravel(), num_segments=t)
    return d_table, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
