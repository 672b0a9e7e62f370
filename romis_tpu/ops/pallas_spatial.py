"""Pallas halo-tile neighbour gather for spatial reuse.

The XLA path gathers 5 neighbours x 2M pixels from a ~330MB packed table in
HBM — latency-bound at ~53ns/index, 534ms per pass at 1080p. But spatial
neighbours live within ±radius pixels, so each image tile only ever reads a
(bh+2r, bw+2r) halo window. This kernel:

- DMAs the halo window of every packed state plane into VMEM,
- draws the neighbour offsets with the on-chip PRNG,
- resolves each neighbour per plane with a Mosaic lane dynamic_gather
  (columns; two overlapping 128-lane windows, since the gather indexes
  within one vreg) followed by a masked (2r+1)-way select over static
  sublane rolls (rows; sublane dynamic_gather cannot span vregs).

Mosaic's lane dynamic_gather only varies the lane axis
(out[i,j] = op[i, idx[i,j]]), so the two-step factorisation requires the
COLUMN offset dx to be shared down each output column (per neighbour, per
pass); the row offset dy stays fully per-pixel.
Per-pixel marginals are unchanged (dx, dy are still uniform on [-r, r] for
every pixel — the estimator contract holds); only the cross-pixel noise
correlation differs from the reference's fully-independent offsets. This
path is opt-in via Features.fused_spatial_gather.

Border clamping (reference render_utils.cpp:109-110) is implemented by
edge-padding the planes before the kernel: clamp(x+d, 0, W-1) == edge-padded
lookup at x+d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BH, _BW = 32, 128


def _u01(bits):
    b = pltpu.bitcast(bits, jnp.int32)
    return (jax.lax.shift_right_logical(b, 8).astype(jnp.float32)
            * (1.0 / 16777216.0))


def _halo_window(radius: int):
    """Halo window size, rounded up so VMEM DMA slices stay tiling-aligned
    (sublanes multiple of 8, lanes multiple of 128)."""
    he = -((-(_BH + 2 * radius)) // 8) * 8
    we = -((-(_BW + 2 * radius)) // 128) * 128
    return he, we


def _gather_kernel(n_nbr: int, radius: int, n_planes: int,
                   seed_ref, planes_hbm, out_ref, scratch, sem):
    bh, bw = _BH, _BW
    he, we = _halo_window(radius)

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + ti * 92821 + tj * 373)

    # DMA the halo window: planes_hbm [C, Hpad, Wpad] → scratch [C, he, we].
    dma = pltpu.make_async_copy(
        planes_hbm.at[:, pl.ds(ti * bh, he), pl.ds(tj * bw, we)],
        scratch, sem)
    dma.start()
    dma.wait()

    for n in range(n_nbr):
        bits = pltpu.bitcast(pltpu.prng_random_bits((2 * he, we)), jnp.uint32)
        # Per-pixel dy in [-r, r]; column-coherent dx (row 0 of the draw).
        dy = (jnp.minimum((_u01(bits[:he]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)
        dx_row = (jnp.minimum((_u01(bits[he:he + 8]) * (2 * radius + 1))
                              .astype(jnp.int32), 2 * radius) - radius)[0:1]

        # Column gather: ls[i, j] = tile[i, r + j + dx(j)] for all rows i.
        # The index j + r + dx(j) lies in [0, bw + 2r); Mosaic's lane
        # dynamic_gather only indexes within one 128-lane vreg, so gather
        # from two 128-lane windows ([0:bw] and [we-bw:we]) and select by
        # index range (the windows overlap-cover the full range for r<=64).
        lane_idx = (jax.lax.broadcasted_iota(jnp.int32, (he, bw), 1)
                    + radius + dx_row[:, :bw])
        lane_lo = jnp.minimum(lane_idx, bw - 1)
        lane_hi = jnp.clip(lane_idx - (we - bw), 0, bw - 1)
        use_lo_lane = lane_idx < bw

        # Row gather: sel[i, j] = ls[i + r + dy(i, j), j]. A sublane
        # dynamic_gather cannot span vregs (8 sublanes for f32), so resolve
        # the row offset with a masked (2r+1)-way select over static
        # sublane rolls.
        dy_b = dy[:bh, :bw]

        for c in range(n_planes):
            tile_c = scratch[c]
            t_lo = tile_c[:, :bw]
            # t_hi[:, j] = tile[:, j + (we - bw)]: left-roll by (we - bw)
            # == right-roll by bw (mod we).
            t_hi = pltpu.roll(tile_c, shift=bw, axis=1)[:, :bw]
            ls = jnp.where(
                use_lo_lane,
                jnp.take_along_axis(t_lo, jnp.broadcast_to(lane_lo,
                                                           (he, bw)), axis=1),
                jnp.take_along_axis(t_hi, jnp.broadcast_to(lane_hi,
                                                           (he, bw)), axis=1))
            sel = jnp.zeros((bh, bw), jnp.float32)
            for d in range(-radius, radius + 1):
                # cand[i, j] = ls[i + r + d, j]: left-roll by (r + d).
                cand = pltpu.roll(ls, shift=(he - radius - d) % he,
                                  axis=0)[:bh]
                sel = jnp.where(dy_b == d, cand, sel)
            out_ref[n, c] = sel


def spatial_neighbour_gather_pallas(
    seed,
    planes: jnp.ndarray,  # [C, H, W] packed per-pixel state, planes-first
    n_nbr: int,
    radius: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns gathered neighbour planes [n_nbr, C, H, W]."""
    if radius > 64:
        # The two-window lane gather covers index range [0, bw+2r) only
        # while 2r <= 128 lanes.
        raise ValueError("fused spatial gather supports radius <= 64")
    c, h, w = planes.shape
    align_h = (-h) % _BH
    align_w = (-w) % _BW
    he, we = _halo_window(radius)
    # Edge padding implements the reference's border clamp; the extra
    # (he - bh - 2r) rows / (we - bw - 2r) cols keep the last tile's
    # aligned DMA window in bounds (never selected by any index).
    padded = jnp.pad(
        planes,
        ((0, 0),
         (radius, align_h + (he - _BH - radius)),
         (radius, align_w + (we - _BW - radius))),
        mode="edge")
    hp, wp = h + align_h, w + align_w
    grid = (hp // _BH, wp // _BW)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_nbr, radius, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((n_nbr, c, _BH, _BW),
                               lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_nbr, c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), padded)
    return out[:, :, :h, :w]
