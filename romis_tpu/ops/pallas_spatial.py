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


def _halo_window(radius: int, bh: int = None, bw: int = None):
    """Halo window size, rounded up so VMEM DMA slices stay tiling-aligned
    (sublanes multiple of 8, lanes multiple of 128)."""
    he = -((-((bh or _BH) + 2 * radius)) // 8) * 8
    we = -((-((bw or _BW) + 2 * radius)) // 128) * 128
    return he, we


def pick_tile_h(h: int) -> int:
    """Tile height for the pass kernel: prefer one that divides h so the
    wrapper's alignment pad (a full-array XLA copy, ~1.5 ms at 1080p)
    disappears — 1080 = 27*40."""
    for bh in (32, 40, 48, 24, 56, 64, 16, 8):
        if h % bh == 0:
            return bh
    return _BH


def _draw_offsets(radius: int):
    """Draw one neighbour offset field with the on-chip PRNG and precompute
    the gather controls: per-pixel dy in [-r, r] (row masks for the
    roll-select) and column-coherent dx (lane-gather indices).

    Column gather: ls[i, j] = tile[i, r + j + dx(j)]. The index j + r + dx
    lies in [0, bw + 2r); Mosaic's lane dynamic_gather only indexes within
    one 128-lane vreg, so gather from two 128-lane windows ([0:bw] and
    [we-bw:we]) and select by index range (the windows overlap-cover the
    full range for r <= 64).

    Row gather: sel[i, j] = ls[i + r + dy(i, j), j]. A sublane
    dynamic_gather cannot span vregs (8 sublanes for f32), so the row
    offset is resolved with a masked (2r+1)-way select over static sublane
    rolls; the masks dy == d are precomputed here."""
    bh, bw = _BH, _BW
    he, we = _halo_window(radius)
    bits = pltpu.bitcast(pltpu.prng_random_bits((2 * he, we)), jnp.uint32)
    # Per-pixel dy in [-r, r]; column-coherent dx (row 0 of the draw).
    dy = (jnp.minimum((_u01(bits[:he]) * (2 * radius + 1))
                      .astype(jnp.int32), 2 * radius) - radius)
    dx_row = (jnp.minimum((_u01(bits[he:he + 8]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)[0:1]

    lane_idx = (jax.lax.broadcasted_iota(jnp.int32, (he, bw), 1)
                + radius + dx_row[:, :bw])
    lane_lo = jnp.broadcast_to(jnp.minimum(lane_idx, bw - 1), (he, bw))
    lane_hi = jnp.broadcast_to(jnp.clip(lane_idx - (we - bw), 0, bw - 1),
                               (he, bw))
    use_lo_lane = lane_idx < bw

    dy_b = dy[:bh, :bw]
    row_masks = [dy_b == d for d in range(-radius, radius + 1)]
    return lane_lo, lane_hi, use_lo_lane, row_masks


def _resolve_plane(tile_c, offs, radius: int):
    """Resolve one neighbour's offset field on one halo plane [he, we] →
    [bh, bw] (see _draw_offsets for the factorisation)."""
    bh, bw = _BH, _BW
    he, we = _halo_window(radius)
    lane_lo, lane_hi, use_lo_lane, row_masks = offs
    t_lo = tile_c[:, :bw]
    # t_hi[:, j] = tile[:, j + (we - bw)]: left-roll by (we - bw)
    # == right-roll by bw (mod we).
    t_hi = pltpu.roll(tile_c, shift=bw, axis=1)[:, :bw]
    ls = jnp.where(
        use_lo_lane,
        jnp.take_along_axis(t_lo, lane_lo, axis=1),
        jnp.take_along_axis(t_hi, lane_hi, axis=1))
    sel = jnp.zeros((bh, bw), jnp.float32)
    for d in range(-radius, radius + 1):
        # cand[i, j] = ls[i + r + d, j]: left-roll by (r + d).
        cand = pltpu.roll(ls, shift=(he - radius - d) % he, axis=0)[:bh]
        sel = jnp.where(row_masks[d + radius], cand, sel)
    return sel


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
        offs = _draw_offsets(radius)
        for c in range(n_planes):
            out_ref[n, c] = _resolve_plane(scratch[c], offs, radius)


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


def _offset_gather_kernel(n_nbr: int, radius: int, n_planes: int,
                          skip_absent: bool,
                          offs_ref, planes_hbm, out_ref, scratch, sem):
    """Gather every packed plane at EXACT per-pixel offsets (dy, dx) given
    as inputs — out[n, c, i, j] = planes[c, i + dy[n,i,j], j + dx[n,i,j]]
    (pre-padded, so borders clamp). Serves the fixed per-pixel neighbour
    lists of R-MIS / R-OMIS (render/neighbours.py) and bounded temporal
    reprojection (render/restir.temporal_reuse).

    Unlike _gather_kernel's factorised two-step (which needs dx shared per
    column), both offsets here vary per pixel: for each row offset d the
    candidate rows are a STATIC [bh]-row slice of the halo window (cheaper
    than the former full-height roll), lane-gathered with the per-pixel dx
    and selected where dy == d.

    skip_absent=True SKIPS a (d, all-planes) step when no pixel of the
    tile drew dy == d (pl.when on a tile-level any): smooth motion fields
    (temporal reprojection under camera motion) touch 1–3 row offsets per
    tile, collapsing the resolve from planes×(2r+1) to ~planes×hits.
    Random/similarity offsets populate every d, where the per-(plane, d)
    branches SERIALIZE on the scalar unit (~1.4x measured) — such callers
    pass False and get the dense chain, with the two window slices per
    (plane, d) shared across all n_nbr offset fields."""
    bh, bw = _BH, _BW
    he, we = _halo_window(radius)

    ti = pl.program_id(0)
    tj = pl.program_id(1)

    dma = pltpu.make_async_copy(
        planes_hbm.at[:, pl.ds(ti * bh, he), pl.ds(tj * bw, we)],
        scratch, sem)
    dma.start()
    dma.wait()

    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    dys = [offs_ref[n] for n in range(n_nbr)]
    lanes = []
    for n in range(n_nbr):
        lane_idx = iota_bw + radius + offs_ref[n_nbr + n]
        lanes.append((jnp.minimum(lane_idx, bw - 1),
                      jnp.clip(lane_idx - (we - bw), 0, bw - 1),
                      lane_idx < bw))

    if not skip_absent:
        def dense_body(c, _):
            tile_c = scratch[c]
            accs = [jnp.zeros((bh, bw), jnp.float32) for _ in range(n_nbr)]
            for d in range(-radius, radius + 1):
                t_lo = tile_c[radius + d:radius + d + bh, :bw]
                t_hi = tile_c[radius + d:radius + d + bh, we - bw:we]
                for n in range(n_nbr):
                    lane_lo, lane_hi, use_lo = lanes[n]
                    ld = jnp.where(
                        use_lo,
                        jnp.take_along_axis(t_lo, lane_lo, axis=1),
                        jnp.take_along_axis(t_hi, lane_hi, axis=1))
                    accs[n] = jnp.where(dys[n] == d, ld, accs[n])
            for n in range(n_nbr):
                out_ref[n, c] = accs[n]
            return 0

        jax.lax.fori_loop(0, n_planes, dense_body, 0)
        return

    for n in range(n_nbr):
        lane_lo, lane_hi, use_lo = lanes[n]
        row_masks = [dys[n] == d for d in range(-radius, radius + 1)]
        row_present = [jnp.any(m) for m in row_masks]

        def body(c, _, n=n, row_masks=row_masks, row_present=row_present,
                 lane_lo=lane_lo, lane_hi=lane_hi, use_lo=use_lo):
            tile_c = scratch[c]
            out_ref[n, c] = jnp.zeros((bh, bw), jnp.float32)
            for di, d in enumerate(range(-radius, radius + 1)):
                @pl.when(row_present[di])
                def _resolve_d(d=d, di=di):
                    t_lo = tile_c[radius + d:radius + d + bh, :bw]
                    t_hi = tile_c[radius + d:radius + d + bh, we - bw:we]
                    ld = jnp.where(
                        use_lo,
                        jnp.take_along_axis(t_lo, lane_lo, axis=1),
                        jnp.take_along_axis(t_hi, lane_hi, axis=1))
                    out_ref[n, c] = jnp.where(row_masks[di], ld,
                                              out_ref[n, c])
            return 0

        jax.lax.fori_loop(0, n_planes, body, 0)


def halo_offset_gather_pallas(
    planes: jnp.ndarray,  # [C, H, W] packed per-pixel state
    dy: jnp.ndarray,  # [D, H, W] int32 row offsets in [-radius, radius]
    dx: jnp.ndarray,  # [D, H, W] int32 col offsets in [-radius, radius]
    radius: int,
    skip_absent: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-offset halo gather → [D, C, H, W]. Offsets must satisfy
    |dy|,|dx| <= radius and produce in-bounds indices (the caller's
    neighbour selection already clamps to the screen). skip_absent: True
    for smooth offset fields (temporal reprojection), False for
    random/similarity-chosen fields (see _offset_gather_kernel)."""
    if radius > 64:
        raise ValueError("halo offset gather supports radius <= 64")
    c, h, w = planes.shape
    d_n = dy.shape[0]
    align_h = (-h) % _BH
    align_w = (-w) % _BW
    he, we = _halo_window(radius)
    padded = jnp.pad(
        planes,
        ((0, 0),
         (radius, align_h + (he - _BH - radius)),
         (radius, align_w + (we - _BW - radius))),
        mode="edge")
    offs = jnp.concatenate([dy, dx], axis=0).astype(jnp.int32)
    offs = jnp.pad(offs, ((0, 0), (0, align_h), (0, align_w)))
    hp, wp = h + align_h, w + align_w
    grid = (hp // _BH, wp // _BW)

    out = pl.pallas_call(
        functools.partial(_offset_gather_kernel, d_n, radius, c,
                          skip_absent),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * d_n, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((d_n, c, _BH, _BW), lambda i, j: (0, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_n, c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(offs, padded)
    return out[:, :, :h, :w]


def _offset_scatter_kernel(d_n: int, radius: int, c_n: int,
                           offs_hbm, ct_hbm, out_ref, offs_scr, ct_scr,
                           sem_o, sem_c):
    """Transpose of _offset_gather_kernel: accumulate every (source, d)
    cotangent into the pixel it gathered FROM —
    out[c, y, x] = Σ_n Σ_{y',x'} ct[n, c, y', x'] ·
                   [y' + dy[n,y',x'] == y ∧ x' + dx[n,y',x'] == x].

    Per output tile the contributing sources live in the same ±radius halo
    window as the gather; the per-pixel lane mapping has no hardware lane
    scatter, so it decomposes into (2r+1)² statically-shifted masked adds
    per d. The plane loop is OUTERMOST (one fori_loop, masks recomputed
    per plane): hoisting the 2205 [bh, we] masks is VMEM-impossible and
    per-(n, oy) fori_loops would trace thousands of loop bodies."""
    bh, bw = _BH, _BW
    he, we = _halo_window(radius)

    # Both windows OVERLAP across tiles (stride bh < window he), so the
    # automatic BlockSpec pipeline cannot fetch them — manual DMA.
    dma_o = pltpu.make_async_copy(
        offs_hbm.at[:, pl.ds(pl.program_id(0) * bh, he),
                    pl.ds(pl.program_id(1) * bw, we)],
        offs_scr, sem_o)
    dma_c = pltpu.make_async_copy(
        ct_hbm.at[:, :, pl.ds(pl.program_id(0) * bh, he),
                  pl.ds(pl.program_id(1) * bw, we)],
        ct_scr, sem_c)
    dma_o.start()
    dma_c.start()
    dma_o.wait()
    dma_c.wait()

    # code[n, oy] = dx where dy == oy else sentinel (one compare folds the
    # dy test into the per-ox lane compare).
    big = jnp.int32(2 * radius + 7)

    def zero_body(cc, _):
        out_ref[cc] = jnp.zeros((bh, bw), jnp.float32)
        return 0

    jax.lax.fori_loop(0, c_n, zero_body, 0)

    # One small fori_loop per (n, oy) pair, accumulating into out_ref: a
    # single unrolled (n, oy, ox, c) body holds ~2205 live temporaries and
    # blew Mosaic's 16 MB scoped-vmem value stack (67 MB measured).
    for n in range(d_n):
        for oy in range(-radius, radius + 1):
            rbase = radius - oy
            code = jnp.where(
                offs_scr[n, rbase:rbase + bh, :] == oy,
                offs_scr[d_n + n, rbase:rbase + bh, :], big)
            # (Hoisting the 21 masks out of the plane loop was measured
            # NEUTRAL-to-worse — 344 KB of masks live across the fori.)

            def body(cc, _, n=n, rbase=rbase, code=code):
                src = ct_scr[n, cc, rbase:rbase + bh, :]  # [bh, we]
                add = jnp.zeros((bh, bw), jnp.float32)
                for ox in range(-radius, radius + 1):
                    lbase = radius - ox
                    m = code[:, lbase:lbase + bw] == ox
                    add = add + jnp.where(
                        m, src[:, lbase:lbase + bw], 0.0)
                out_ref[cc] = out_ref[cc] + add
                return 0

            jax.lax.fori_loop(0, c_n, body, 0)


def halo_offset_scatter_pallas(
    ct: jnp.ndarray,  # [D, C, H, W] cotangents of the gather's output
    dy: jnp.ndarray,  # [D, H, W] int32 — the gather's offsets
    dx: jnp.ndarray,
    radius: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-offset halo SCATTER-ADD → [C, H, W]: the transpose of
    halo_offset_gather, i.e. d_planes for its VJP. XLA's segment_sum
    lowering of the same scatter measured 1.6 s per 1080p R-MIS gradient
    iteration (scripts/mis_grad_bench.py diagnostics); this kernel runs the
    (2r+1)²·D masked-shift decomposition on-chip."""
    if radius > 64:
        raise ValueError("halo offset scatter supports radius <= 64")
    d_n, c, h, w = ct.shape
    align_h = (-h) % _BH
    align_w = (-w) % _BW
    he, we = _halo_window(radius)
    # Zero-pad ct: out-of-image sources contribute nothing regardless of
    # their (padded-to-0) offsets.
    ct_pad = jnp.pad(
        ct,
        ((0, 0), (0, 0),
         (radius, align_h + (he - _BH - radius)),
         (radius, align_w + (we - _BW - radius))))
    offs = jnp.concatenate([dy, dx], axis=0).astype(jnp.int32)
    offs_pad = jnp.pad(
        offs,
        ((0, 0),
         (radius, align_h + (he - _BH - radius)),
         (radius, align_w + (we - _BW - radius))))
    hp, wp = h + align_h, w + align_w
    grid = (hp // _BH, wp // _BW)

    out = pl.pallas_call(
        functools.partial(_offset_scatter_kernel, d_n, radius, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # offsets stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # ct stays in HBM
        ],
        out_specs=pl.BlockSpec((c, _BH, _BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * d_n, he, we), jnp.int32),
            pltpu.VMEM((d_n, c, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(offs_pad, ct_pad)
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def halo_offset_gather(planes, dy, dx, radius: int, skip_absent: bool = True):
    """DIFFERENTIABLE exact-offset halo gather:
    out[d, c, i, j] = planes[c, i + dy[d,i,j], j + dx[d,i,j]]
    (offsets in [-radius, radius], coords in-bounds — the callers' neighbour
    selection clamps). Forward = the Pallas halo kernel on TPU (XLA
    fancy-indexing fallback elsewhere); backward = one segment_sum
    scatter-add (the gather is linear in ``planes``), so gradient paths get
    kernel-speed neighbour fetches instead of the HBM-latency-bound XLA
    gather (~0.5 s per 1080p pass) they previously fell back to.
    ``skip_absent``: see _offset_gather_kernel (True for smooth offset
    fields, False for random/similarity-chosen ones)."""
    return _halo_offset_impl(planes, dy, dx, radius, skip_absent)


def _halo_offset_impl(planes, dy, dx, radius: int, skip_absent: bool = True):
    if jax.default_backend() == "tpu" and radius <= 64:
        return halo_offset_gather_pallas(planes, dy, dx, radius, skip_absent)
    h, w = planes.shape[-2:]
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    cols = jnp.arange(w, dtype=jnp.int32)[None, :]
    g = planes[:, rows[None] + dy, cols[None] + dx]  # [C, D, H, W]
    return jnp.moveaxis(g, 0, 1)


def _halo_offset_fwd(planes, dy, dx, radius: int, skip_absent: bool):
    return _halo_offset_impl(planes, dy, dx, radius, skip_absent), (
        dy, dx, planes.shape)


def _halo_offset_bwd(radius, skip_absent, res, ct):
    import numpy as np

    dy, dx, (c, h, w) = res
    z = lambda a: np.zeros(jnp.shape(a), dtype=jax.dtypes.float0)
    if jax.default_backend() == "tpu" and radius <= 64 and h * w >= 400_000:
        # Fused transpose kernel: XLA's segment_sum lowering of this
        # scatter measured 1.6 s per 1080p R-MIS gradient iteration vs
        # ~0.4 s for the kernel (4x; R-MIS grad step 9.8 → 5.8 s). Below
        # ~0.4 MP the kernel's fixed per-tile costs lose to segment_sum
        # (360p romis measured 1.05 → 1.56 s), hence the size gate.
        d_planes = halo_offset_scatter_pallas(
            ct.astype(jnp.float32), dy, dx, radius).astype(ct.dtype)
        return d_planes, z(dy), z(dx)
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    cols = jnp.arange(w, dtype=jnp.int32)[None, :]
    flat_idx = ((rows[None] + dy) * w + (cols[None] + dx)).ravel()
    ct_flat = jnp.moveaxis(ct, 1, -1).reshape(-1, c)  # [(D H W), C]
    d_planes = jax.ops.segment_sum(ct_flat, flat_idx, num_segments=h * w)
    return (jnp.moveaxis(d_planes.reshape(h, w, c), -1, 0), z(dy), z(dx))


halo_offset_gather.defvjp(_halo_offset_fwd, _halo_offset_bwd)


def _pass_kernel(n_nbr: int, radius: int, k: int, depth_frac: float,
                 normal_cos: float, n_tj: int, n_steps: int, bh: int,
                 shin_n, h_real: int, w_real: int,
                 seed_ref, cen_res_ref, cen_ctx_ref,
                 gates_hbm, res_hbm, out_ref, gates_scr, res_scr, sem_g,
                 sem_r):
    """One whole spatial-reuse pass per tile: neighbour gather + similarity
    gates + stream weights + lane-wise exponential race + combine, all in
    VMEM.

    Estimator contract = ops/wrs.combine_biased over {self, neighbours}
    (ReSTIR Alg. 5, reference Reservoir::combineBiased reservoir.cpp:40-66,
    gates render_utils.cpp:113-118).

    Input diet (the pass is memory-bound — see scripts/spatial_micro.py):
    gates_hbm [5, Hp, Wp] (normal3, depth, valid; padded ONCE per frame —
    XLA CSE dedups the identical pad across passes) and res_hbm
    [10K, Hp, Wp] are halo-DMA'd; reservoir state rides the SAME 10K-plane
    block (pack_pixel_planes reservoir order: pos 3K | color 3K | w_sum K |
    m K | big_w K | chosen_w K) as center input, halo source, and output,
    so pass N+1 consumes pass N's output with NO re-pack (each XLA copy of
    a 1080p plane set costs ~1.5 ms). cen_ctx_ref [18, bh, bw] (position3,
    normal3, view3, kd3, ks3, shin, depth, valid) is the receiver context;
    kd/ks/shin/view/position are never halo'd.

    The halo DMA is DOUBLE-BUFFERED across grid steps (scratch leading axis
    2): tile N+1's window streams in while tile N computes — the un-overlapped
    version stalled ~5 ms/pass on the wait (scripts/spatial_micro.py n_nbr=0
    row). The overlapping windows (stride bh < window he) make the automatic
    BlockSpec pipeline unusable for halos, hence the manual pattern. (A
    tile-column [n_tj, Hp, C*we] layout with 5-16KB DMA rows was tried and
    reverted: the DMA is already hidden, and its XLA-side prep cost 2-4 ms.)"""
    from .pallas_ris import _phong_phat

    bw = _BW
    he, we = _halo_window(radius, bh, bw)

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + ti * 48271 + tj * 719)

    step = ti * n_tj + tj
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def copies(i, j, s):
        dma_g = pltpu.make_async_copy(
            gates_hbm.at[:, pl.ds(i * bh, he), pl.ds(j * bw, we)],
            gates_scr.at[s], sem_g.at[s])
        dma_r = pltpu.make_async_copy(
            res_hbm.at[:, pl.ds(i * bh, he), pl.ds(j * bw, we)],
            res_scr.at[s], sem_r.at[s])
        return dma_g, dma_r

    @pl.when(step == 0)
    def _first():
        dma_g, dma_r = copies(ti, tj, slot)
        dma_g.start()
        dma_r.start()

    @pl.when(step + 1 < n_steps)
    def _prefetch_next():
        nj = tj + 1
        wrap = nj >= n_tj
        ni = jnp.where(wrap, ti + 1, ti)
        nj = jnp.where(wrap, 0, nj)
        dma_g, dma_r = copies(ni, nj, nslot)
        dma_g.start()
        dma_r.start()

    dma_g, dma_r = copies(ti, tj, slot)

    # Receiver shading context (dict layout of pallas_ris._phong_phat).
    cx = {
        "px": cen_ctx_ref[0], "py": cen_ctx_ref[1], "pz": cen_ctx_ref[2],
        "nx": cen_ctx_ref[3], "ny": cen_ctx_ref[4], "nz": cen_ctx_ref[5],
        "vx": cen_ctx_ref[6], "vy": cen_ctx_ref[7], "vz": cen_ctx_ref[8],
        "kdx": cen_ctx_ref[9], "kdy": cen_ctx_ref[10],
        "kdz": cen_ctx_ref[11], "ksx": cen_ctx_ref[12],
        "ksy": cen_ctx_ref[13], "ksz": cen_ctx_ref[14],
        "shin": cen_ctx_ref[15], "valid": cen_ctx_ref[17],
        "shin_n": shin_n,
    }
    from .pallas_ris import hoist_unit_view
    hoist_unit_view(cx)
    recv_depth = cen_ctx_ref[16]
    recv_valid = cx["valid"] > 0.5

    def gumbel_u(count):
        bits = pltpu.bitcast(pltpu.prng_random_bits((count * bh, bw)),
                             jnp.uint32)
        return [_u01(bits[i * bh:(i + 1) * bh]) for i in range(count)]

    # Per-lane race state: w_sum, m_out, best score, selected
    # [pos3, color3, w, p_hat].
    w_sum = [jnp.zeros((bh, bw), jnp.float32) for _ in range(k)]
    m_out = [jnp.zeros((bh, bw), jnp.float32) for _ in range(k)]
    best = [jnp.full((bh, bw), -jnp.inf) for _ in range(k)]
    sel = [[jnp.zeros((bh, bw), jnp.float32) for _ in range(8)]
           for _ in range(k)]

    def stream(lane, mask_f, pos3, col3, big_w, m, u_g):
        p_hat = _phong_phat(cx, *pos3, *col3)
        w = p_hat * big_w * m * mask_f
        # Exponential race (one log vs Gumbel-max's two, see pallas_ris):
        # argmax of w / E, E ~ Exp(1), picks stream i w.p. w_i / Σw.
        e_clock = -jnp.log(jnp.maximum(u_g, 1e-37)) + 1e-37
        score = jnp.where(w > 0.0, w / e_clock, -jnp.inf)
        upd = score > best[lane]
        w_sum[lane] = w_sum[lane] + w
        m_out[lane] = m_out[lane] + m * mask_f
        best[lane] = jnp.where(upd, score, best[lane])
        vals = pos3 + col3 + (w, p_hat)
        sel[lane] = [jnp.where(upd, v, o) for v, o in zip(vals, sel[lane])]

    # Self stream (always participates, render_utils.cpp:121-124).
    ug_self = gumbel_u(k)
    ones = jnp.ones((bh, bw), jnp.float32)
    for lane in range(k):
        stream(
            lane, ones,
            tuple(cen_res_ref[3 * lane + c] for c in range(3)),
            tuple(cen_res_ref[3 * k + 3 * lane + c] for c in range(3)),
            cen_res_ref[8 * k + lane], cen_res_ref[7 * k + lane],
            ug_self[lane])

    # Neighbour streams. Offset factorisation for this kernel: dy is
    # ROW-coherent (shared along each output row, per neighbour) so the row
    # resolve is ONE one-hot matmul on the MXU over all needed planes
    # stacked along lanes; dx stays fully per-pixel (Mosaic's lane
    # dynamic_gather takes per-pixel indices). Marginals are unchanged —
    # dy, dx are uniform on [-r, r] for every pixel — only the cross-pixel
    # correlation pattern differs (see module docstring). The one-hot rows
    # are exact 0/1 and every packed plane is finite (depth/normals are
    # zeroed at misses, render/restir.py make_shade_ctx), so the HIGHEST-
    # precision (bf16x3) matmul reconstructs the gathered f32 bit-exactly.
    dma_g.wait()
    dma_r.wait()
    g_scr = gates_scr.at[slot]
    r_scr = res_scr.at[slot]
    # Lane-stacked slot order: gates (normal3, depth, valid) then the
    # reservoir planes the streams read, re-ordered from the 10K block to
    # (pos 3K, color 3K, big_w K, m K); w_sum/chosen_w ride the DMA unused
    # (+2K planes ≈ 12% halo bytes, hidden by the double buffering — the
    # re-pack copy they save is not).
    stacked = jnp.concatenate(
        [g_scr[i] for i in range(5)]
        + [r_scr[i] for i in range(6 * k)]
        + [r_scr[8 * k + lane] for lane in range(k)]
        + [r_scr[7 * k + lane] for lane in range(k)], axis=1)

    iota_he = jax.lax.broadcasted_iota(jnp.int32, (bh, he), 1)
    row_plus_r = jax.lax.broadcasted_iota(jnp.int32, (bh, he), 0) + radius
    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    # Border clamp bounds in window coordinates (reference
    # render_utils.cpp:109-110): the halo planes are ZERO padded (cheaper
    # than an edge pad), so the clamp lives on the indices instead — pad
    # cells are never selected.
    # h_real is the GLOBAL image height; seed_ref[1] carries this band's
    # first global row (0 single-device; dev*h_loc under the shard_map halo
    # path) so border clamping happens at the GLOBAL image edges — interior
    # bands read their ppermute'd halo rows instead of clamping.
    base = seed_ref[1]
    row_lo = radius - ti * bh - base
    row_hi = radius + h_real - 1 - ti * bh - base
    lane_lo_b = radius - tj * bw
    lane_hi_b = radius + w_real - 1 - tj * bw

    for _ in range(n_nbr):
        bits = pltpu.bitcast(pltpu.prng_random_bits((2 * bh, bw)),
                             jnp.uint32)
        dy = (jnp.minimum((_u01(bits[:bh]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)[:, 0:1]
        dx = (jnp.minimum((_u01(bits[bh:]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)
        target = jnp.clip(row_plus_r + dy, row_lo, row_hi)
        onehot = (iota_he == target).astype(jnp.float32)
        r_all = jax.lax.dot_general(
            onehot, stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [bh, (5 + 8K)*we]
        lane_idx = jnp.clip(iota_bw + radius + dx, lane_lo_b, lane_hi_b)
        lane_lo = jnp.minimum(lane_idx, bw - 1)
        lane_hi = jnp.clip(lane_idx - (we - bw), 0, bw - 1)
        use_lo = lane_idx < bw

        def nb(s):
            rl = r_all[:, s * we:(s + 1) * we]
            t_lo = rl[:, :bw]
            t_hi = pltpu.roll(rl, shift=bw, axis=1)[:, :bw]
            return jnp.where(
                use_lo,
                jnp.take_along_axis(t_lo, lane_lo, axis=1),
                jnp.take_along_axis(t_hi, lane_hi, axis=1))

        n_depth = nb(3)
        n_valid = nb(4) > 0.5
        depth_ok = (jnp.abs(1.0 - n_depth
                            / jnp.maximum(recv_depth, 1e-20)) <= depth_frac)
        nnx, nny, nnz = nb(0), nb(1), nb(2)
        normal_ok = (nnx * cx["nx"] + nny * cx["ny"] + nnz * cx["nz"]
                     >= normal_cos)
        mask_f = jnp.where(depth_ok & normal_ok & recv_valid & n_valid,
                           1.0, 0.0)

        ug = gumbel_u(k)
        for lane in range(k):
            stream(
                lane, mask_f,
                tuple(nb(5 + 3 * lane + c) for c in range(3)),
                tuple(nb(5 + 3 * k + 3 * lane + c) for c in range(3)),
                nb(5 + 6 * k + lane), nb(5 + 7 * k + lane), ug[lane])

    # Outputs in pack_pixel_planes reservoir order:
    # pos 3K | color 3K | w_sum K | m K | big_w K | chosen_w K.
    for lane in range(k):
        p_sel = sel[lane][7]
        cond = (p_sel > 0.0) & (m_out[lane] > 0.0)
        denom = jnp.where(cond, p_sel * m_out[lane], 1.0)
        big_w = jnp.where(cond, w_sum[lane] / denom, 0.0)
        for c in range(3):
            out_ref[3 * lane + c] = sel[lane][c]
            out_ref[3 * k + 3 * lane + c] = sel[lane][3 + c]
        out_ref[6 * k + lane] = w_sum[lane]
        out_ref[7 * k + lane] = m_out[lane]
        out_ref[8 * k + lane] = big_w
        out_ref[9 * k + lane] = sel[lane][6]


def _pass_unbiased_kernel(n_nbr: int, radius: int, k: int, n_tj: int,
                          n_steps: int, bh: int, shin_n, h_real: int,
                          w_real: int, vis_check: bool,
                          seed_ref, cen_res_ref, cen_ctx_ref,
                          ctx_hbm, res_hbm, *refs):
    """One UNBIASED spatial-reuse pass per tile (ReSTIR Alg. 6, reference
    Reservoir::combineUnbiased reservoir.cpp:68-104): the same gather +
    stream race as _pass_kernel (mask = 1: no similarity gates,
    render/restir.spatial_pass unbiased branch), then a SECOND sweep
    re-resolves each neighbour's shading context through the STORED
    offsets and counts Z = sum_r m_r * [p_hat_r(winner) > 0] in-kernel.

    With vis_check the kernel additionally emits, per neighbour stream,
    the resolved surface position and the per-lane m_r * [p_hat_r > 0]
    term, plus Z_phat and p_hat(winner): the caller subtracts occluded
    streams from Z with ONE batched any-hit over all (stream, lane) rays
    (reservoir.cpp:85-93 semantics) — the ray batch reuses whichever
    backend intersect_any_fast picks (soup kernel or paged BVH), instead
    of an in-kernel 6x triangle loop that measured slower than the
    dedicated any-hit kernel."""
    from .pallas_ris import _phong_phat, hoist_unit_view

    if vis_check:
        out_ref, zp_ref, ps_ref, nbr_pos_ref, nbr_mf_ref = refs[:5]
        ctx_scr, res_scr, sem_c, sem_r = refs[5:]
    else:
        out_ref = refs[0]
        ctx_scr, res_scr, sem_c, sem_r = refs[1:]

    bw = _BW
    he, we = _halo_window(radius, bh, bw)

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + ti * 48271 + tj * 719)

    step = ti * n_tj + tj
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def copies(i, j, s):
        dma_c = pltpu.make_async_copy(
            ctx_hbm.at[:, pl.ds(i * bh, he), pl.ds(j * bw, we)],
            ctx_scr.at[s], sem_c.at[s])
        dma_r = pltpu.make_async_copy(
            res_hbm.at[:, pl.ds(i * bh, he), pl.ds(j * bw, we)],
            res_scr.at[s], sem_r.at[s])
        return dma_c, dma_r

    @pl.when(step == 0)
    def _first():
        dma_c, dma_r = copies(ti, tj, slot)
        dma_c.start()
        dma_r.start()

    @pl.when(step + 1 < n_steps)
    def _prefetch_next():
        nj = tj + 1
        wrap = nj >= n_tj
        ni = jnp.where(wrap, ti + 1, ti)
        nj = jnp.where(wrap, 0, nj)
        dma_c, dma_r = copies(ni, nj, nslot)
        dma_c.start()
        dma_r.start()

    dma_c, dma_r = copies(ti, tj, slot)

    cx = {
        "px": cen_ctx_ref[0], "py": cen_ctx_ref[1], "pz": cen_ctx_ref[2],
        "nx": cen_ctx_ref[3], "ny": cen_ctx_ref[4], "nz": cen_ctx_ref[5],
        "vx": cen_ctx_ref[6], "vy": cen_ctx_ref[7], "vz": cen_ctx_ref[8],
        "kdx": cen_ctx_ref[9], "kdy": cen_ctx_ref[10],
        "kdz": cen_ctx_ref[11], "ksx": cen_ctx_ref[12],
        "ksy": cen_ctx_ref[13], "ksz": cen_ctx_ref[14],
        "shin": cen_ctx_ref[15], "valid": cen_ctx_ref[17],
        "shin_n": shin_n,
    }
    hoist_unit_view(cx)

    def gumbel_u(count):
        bits = pltpu.bitcast(pltpu.prng_random_bits((count * bh, bw)),
                             jnp.uint32)
        return [_u01(bits[i * bh:(i + 1) * bh]) for i in range(count)]

    w_sum = [jnp.zeros((bh, bw), jnp.float32) for _ in range(k)]
    m_out = [jnp.zeros((bh, bw), jnp.float32) for _ in range(k)]
    best = [jnp.full((bh, bw), -jnp.inf) for _ in range(k)]
    sel = [[jnp.zeros((bh, bw), jnp.float32) for _ in range(8)]
           for _ in range(k)]

    def stream(lane, pos3, col3, big_w, m, u_g):
        p_hat = _phong_phat(cx, *pos3, *col3)
        w = p_hat * big_w * m
        e_clock = -jnp.log(jnp.maximum(u_g, 1e-37)) + 1e-37
        score = jnp.where(w > 0.0, w / e_clock, -jnp.inf)
        upd = score > best[lane]
        w_sum[lane] = w_sum[lane] + w
        m_out[lane] = m_out[lane] + m
        best[lane] = jnp.where(upd, score, best[lane])
        vals = pos3 + col3 + (w, p_hat)
        sel[lane] = [jnp.where(upd, v, o) for v, o in zip(vals, sel[lane])]

    ug_self = gumbel_u(k)
    for lane in range(k):
        stream(
            lane,
            tuple(cen_res_ref[3 * lane + c] for c in range(3)),
            tuple(cen_res_ref[3 * k + 3 * lane + c] for c in range(3)),
            cen_res_ref[8 * k + lane], cen_res_ref[7 * k + lane],
            ug_self[lane])

    dma_c.wait()
    dma_r.wait()
    c_scr = ctx_scr.at[slot]
    r_scr = res_scr.at[slot]
    # Pass-A lane-stacked slots: reservoir pos 3K | color 3K | big_w K | m K.
    stacked_res = jnp.concatenate(
        [r_scr[i] for i in range(6 * k)]
        + [r_scr[8 * k + lane] for lane in range(k)]
        + [r_scr[7 * k + lane] for lane in range(k)], axis=1)
    # Pass-B slots: ctx position3 normal3 view3 kd3 ks3 shin valid (17,
    # pack_center_ctx order skipping depth) + reservoir m (K).
    stacked_ctx = jnp.concatenate(
        [c_scr[i] for i in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                            14, 15, 17)]
        + [r_scr[7 * k + lane] for lane in range(k)], axis=1)

    iota_he = jax.lax.broadcasted_iota(jnp.int32, (bh, he), 1)
    row_plus_r = jax.lax.broadcasted_iota(jnp.int32, (bh, he), 0) + radius
    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    row_lo = radius - ti * bh
    row_hi = radius + h_real - 1 - ti * bh
    lane_lo_b = radius - tj * bw
    lane_hi_b = radius + w_real - 1 - tj * bw

    def resolve(stacked, slots, dy, dx):
        """Row one-hot matmul + per-slot lane gather at offsets (dy, dx)."""
        target = jnp.clip(row_plus_r + dy, row_lo, row_hi)
        onehot = (iota_he == target).astype(jnp.float32)
        r_all = jax.lax.dot_general(
            onehot, stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        lane_idx = jnp.clip(iota_bw + radius + dx, lane_lo_b, lane_hi_b)
        lane_lo = jnp.minimum(lane_idx, bw - 1)
        lane_hi = jnp.clip(lane_idx - (we - bw), 0, bw - 1)
        use_lo = lane_idx < bw

        def nb(s):
            rl = r_all[:, s * we:(s + 1) * we]
            t_lo = rl[:, :bw]
            t_hi = pltpu.roll(rl, shift=bw, axis=1)[:, :bw]
            return jnp.where(
                use_lo,
                jnp.take_along_axis(t_lo, lane_lo, axis=1),
                jnp.take_along_axis(t_hi, lane_hi, axis=1))

        return [nb(s) for s in slots]

    offsets = []
    for _ in range(n_nbr):
        bits = pltpu.bitcast(pltpu.prng_random_bits((2 * bh, bw)),
                             jnp.uint32)
        dy = (jnp.minimum((_u01(bits[:bh]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)[:, 0:1]
        dx = (jnp.minimum((_u01(bits[bh:]) * (2 * radius + 1))
                          .astype(jnp.int32), 2 * radius) - radius)
        offsets.append((dy, dx))
        g = resolve(stacked_res, range(8 * k), dy, dx)
        ug = gumbel_u(k)
        for lane in range(k):
            stream(
                lane,
                tuple(g[3 * lane + c] for c in range(3)),
                tuple(g[3 * k + 3 * lane + c] for c in range(3)),
                g[6 * k + lane], g[7 * k + lane], ug[lane])

    # ===== Z-count sweep (winner known) =====
    # Self input: p_hat at the receiver of the winner IS sel p_hat.
    z = [jnp.where(sel[lane][7] > 0.0, cen_res_ref[7 * k + lane], 0.0)
         for lane in range(k)]

    for n in range(n_nbr):
        dy, dx = offsets[n]
        g = resolve(stacked_ctx, range(17 + k), dy, dx)
        cxn = {
            "px": g[0], "py": g[1], "pz": g[2],
            "nx": g[3], "ny": g[4], "nz": g[5],
            "vx": g[6], "vy": g[7], "vz": g[8],
            "kdx": g[9], "kdy": g[10], "kdz": g[11],
            "ksx": g[12], "ksy": g[13], "ksz": g[14],
            "shin": g[15], "valid": g[16],
            "shin_n": shin_n,
        }
        hoist_unit_view(cxn)
        for lane in range(k):
            p_n = _phong_phat(cxn, *sel[lane][0:3], *sel[lane][3:6])
            m_n = g[17 + lane]
            mf = jnp.where(p_n > 0.0, m_n, 0.0)
            z[lane] = z[lane] + mf
            if vis_check:
                nbr_mf_ref[n * k + lane] = mf
        if vis_check:
            for c in range(3):
                nbr_pos_ref[3 * n + c] = g[c]

    # Outputs in pack_pixel_planes reservoir order.
    for lane in range(k):
        p_sel = sel[lane][7]
        cond = (p_sel > 0.0) & (z[lane] > 0.0)
        denom = jnp.where(cond, p_sel * z[lane], 1.0)
        big_w = jnp.where(cond, w_sum[lane] / denom, 0.0)
        for c in range(3):
            out_ref[3 * lane + c] = sel[lane][c]
            out_ref[3 * k + 3 * lane + c] = sel[lane][3 + c]
        out_ref[6 * k + lane] = w_sum[lane]
        out_ref[7 * k + lane] = m_out[lane]
        out_ref[8 * k + lane] = big_w
        out_ref[9 * k + lane] = sel[lane][6]
        if vis_check:
            zp_ref[lane] = z[lane]
            ps_ref[lane] = p_sel


def pad_halo(planes: jnp.ndarray, radius: int, bh: int = None,
             bw: int = None, mode: str = "edge") -> jnp.ndarray:
    """Pad [C, H, W] planes for the halo DMA windows. mode="edge" makes a
    clamped-border lookup out of plain indexing (gather/offset kernels);
    the pass kernel clamps its indices in-kernel instead and uses the
    cheaper mode="constant" zero pad (~0.4 ms less per 1080p pass — XLA's
    edge pad is a slower concat chain)."""
    bh = bh or _BH
    bw = bw or _BW
    _, h, w = planes.shape
    align_h = (-h) % bh
    align_w = (-w) % bw
    he, we = _halo_window(radius, bh, bw)
    return jnp.pad(
        planes,
        ((0, 0),
         (radius, align_h + (he - bh - radius)),
         (radius, align_w + (we - bw - radius))),
        mode=mode)


# NOTE (negative result, kept as documentation): a tile-column halo layout
# [n_tj, Hp, C*we] — one contiguous [he, C*we] slice per tile column, built
# host-side so the kernel's window DMA moves 5-16KB rows instead of 1KB —
# was measured and REJECTED: XLA's stack+transpose prep costs 2-4 ms at
# 1080p, more than the DMA it saves. The experiment lives in
# scripts/halo_prep_micro.py (v_transpose / v_concat variants).


def spatial_pass_unbiased_pallas(
    seed,
    res_planes: jnp.ndarray,  # [10K, H, W] pack_pixel_planes res order
    cen_ctx: jnp.ndarray,  # [18, H, W] pack_center_ctx (also the halo src)
    k: int,
    n_nbr: int,
    radius: int,
    geometry=None,  # needed when vis_check (shadow rays)
    vis_check: bool = False,
    uniform_shin: float = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused UNBIASED spatial-reuse pass → updated reservoir planes
    [10K, H, W] (estimator contract = ops/wrs.combine_unbiased over
    {self, neighbours}; reference Reservoir::combineUnbiased
    reservoir.cpp:68-104). With vis_check, Z's per-input visibility
    (reservoir.cpp:85-93) runs as one batched any-hit over every
    (stream, lane) ray AFTER the kernel, then W is re-derived."""
    if radius > 64:
        raise ValueError("fused spatial pass supports radius <= 64")
    _, h, w = cen_ctx.shape
    bh = pick_tile_h(h)
    align_h = (-h) % bh
    align_w = (-w) % _BW
    he, we = _halo_window(radius, bh)

    res_pad = pad_halo(res_planes, radius, bh, mode="constant")
    ctx_pad = pad_halo(cen_ctx, radius, bh, mode="constant")
    if align_h or align_w:
        res_planes_p = jnp.pad(res_planes,
                               ((0, 0), (0, align_h), (0, align_w)))
        cen_ctx_p = jnp.pad(cen_ctx, ((0, 0), (0, align_h), (0, align_w)))
    else:
        res_planes_p, cen_ctx_p = res_planes, cen_ctx
    hp, wp = h + align_h, w + align_w
    grid = (hp // bh, wp // _BW)

    tile_spec = lambda c: pl.BlockSpec((c, bh, _BW), lambda i, j: (0, i, j),
                                       memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((10 * k, hp, wp), jnp.float32)]
    out_specs = [tile_spec(10 * k)]
    if vis_check:
        out_shape += [
            jax.ShapeDtypeStruct((k, hp, wp), jnp.float32),        # Z_phat
            jax.ShapeDtypeStruct((k, hp, wp), jnp.float32),        # p_hat*
            jax.ShapeDtypeStruct((3 * n_nbr, hp, wp), jnp.float32),  # pos
            jax.ShapeDtypeStruct((n_nbr * k, hp, wp), jnp.float32),  # m*flag
        ]
        out_specs += [tile_spec(k), tile_spec(k), tile_spec(3 * n_nbr),
                      tile_spec(n_nbr * k)]

    outs = pl.pallas_call(
        functools.partial(_pass_unbiased_kernel, n_nbr, radius, k,
                          grid[1], grid[0] * grid[1], bh,
                          int(uniform_shin) if uniform_shin else None,
                          h, w, vis_check),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            tile_spec(10 * k),   # center reservoirs
            tile_spec(18),       # center ctx
            pl.BlockSpec(memory_space=pl.ANY),  # ctx halo planes (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # reservoir halo planes
        ],
        out_specs=tuple(out_specs) if vis_check else out_specs[0],
        out_shape=tuple(out_shape) if vis_check else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((2, 18, he, we), jnp.float32),
            pltpu.VMEM((2, 10 * k, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), res_planes_p, cen_ctx_p, ctx_pad,
      res_pad)

    if not vis_check:
        return outs[:, :h, :w]

    out, z_phat, p_star, nbr_pos, nbr_mf = (o[:, :h, :w] for o in outs)
    # Z visibility for every (stream, lane) ray: origins = each input's
    # surface point (neighbour positions from the kernel; self = receiver),
    # targets = the winning sample position, visibility() semantics
    # (ops/wrs.visibility_from / reference utils.cpp:41-56). The fused
    # shared-origin kernel (pallas_trace.pallas_zcount_occ) serves soups
    # that fit SMEM; larger scenes batch through the paged-BVH any-hit.
    from .pallas_trace import fits_pallas, pallas_zcount_occ
    from .wrs import SHADOW_RAY_EPSILON, visibility_from

    win_pos = out[0:3 * k].reshape(k, 3, h, w)  # [K, 3, H, W]
    origins = jnp.concatenate([
        cen_ctx[0:3][None],                      # self [1, 3, H, W]
        nbr_pos.reshape(n_nbr, 3, h, w),         # [R, 3, H, W]
    ])  # [R+1, 3, H, W]
    if interpret or fits_pallas(geometry):
        # Rays whose Z-term is already zero (stream's p̂(winner) = 0, or a
        # dead winner lane) collapse their trace window so whole-tile block
        # culling can skip; their vis value is never consumed.
        mask = jnp.concatenate([
            (p_star > 0.0)[None],                       # self [1, K, H, W]
            nbr_mf.reshape(n_nbr, k, h, w) > 0.0,       # [R, K, H, W]
        ])
        occluded = pallas_zcount_occ(origins, win_pos, geometry,
                                     eps=SHADOW_RAY_EPSILON, mask=mask,
                                     interpret=interpret)
        vis = ~occluded  # [R+1, K, H, W]
    else:
        vis = visibility_from(origins[:, None], win_pos[None], geometry)
    # vis: [R+1, K, H, W]; subtract occluded streams' m-terms from Z.
    m_self = res_planes[7 * k:8 * k]  # input (pre-pass) self m, [K, H, W]
    self_term = jnp.where((p_star > 0.0) & ~vis[0], m_self, 0.0)
    nbr_terms = jnp.where(~vis[1:], nbr_mf.reshape(n_nbr, k, h, w), 0.0)
    z = z_phat - self_term - jnp.sum(nbr_terms, axis=0)

    w_sum = out[6 * k:7 * k]
    cond = (p_star > 0.0) & (z > 0.0)
    big_w = jnp.where(cond, w_sum / jnp.where(cond, p_star * z, 1.0), 0.0)
    return jnp.concatenate([out[:8 * k], big_w, out[9 * k:]], axis=0)


def pack_center_ctx(ctx) -> jnp.ndarray:
    """ShadeCtx → the [18, H, W] receiver block: position3 | normal3 |
    view3 | kd3 | ks3 | shin | depth | valid."""
    return jnp.concatenate([
        ctx.position, ctx.normal, ctx.view_origin, ctx.kd, ctx.ks,
        ctx.shininess[None], ctx.depth_t[None],
        ctx.valid.astype(jnp.float32)[None],
    ], axis=0)


def pack_gates(ctx) -> jnp.ndarray:
    """ShadeCtx → the [5, H, W] similarity-gate block halo'd per neighbour:
    normal3 | depth | valid."""
    return jnp.concatenate([
        ctx.normal, ctx.depth_t[None],
        ctx.valid.astype(jnp.float32)[None],
    ], axis=0)


def _pad_halo_pre(ext: jnp.ndarray, radius: int, bh: int) -> jnp.ndarray:
    """Alignment-pad planes whose vertical ±radius halo rows are ALREADY
    present (ppermute-exchanged shard bands [C, h_loc + 2r, W]) so they
    match pad_halo's window geometry."""
    bw = _BW
    c, h2r, w = ext.shape
    h = h2r - 2 * radius
    align_h = (-h) % bh
    align_w = (-w) % bw
    he, we = _halo_window(radius, bh, bw)
    return jnp.pad(
        ext,
        ((0, 0),
         (0, align_h + (he - bh - 2 * radius)),
         (radius, align_w + (we - bw - radius))))


def spatial_pass_pallas(
    seed,
    res_planes: jnp.ndarray,  # [10K, H, W] pack_pixel_planes res order
    gates: jnp.ndarray,  # [5, H, W] pack_gates
    cen_ctx: jnp.ndarray,  # [18, H, W] pack_center_ctx
    k: int,
    n_nbr: int,
    radius: int,
    uniform_shin: float = None,
    halo_src=None,  # (gates_ext, res_ext) [C, H+2r, W] pre-exchanged halos
    row_base=None,  # [] int32 — this band's first global row
    h_global: int = None,  # global image height (border clamping)
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused spatial-reuse pass → updated reservoir planes [10K, H, W]
    (pack_pixel_planes reservoir order — feed the result straight back in
    for the next pass). Halo pads are built here; the identical gates pad
    is CSE'd by XLA across passes.

    Sharded bands (parallel/halo.spatial_reuse_halo) pass their
    ppermute-exchanged halos via ``halo_src`` plus ``row_base``/``h_global``
    so the in-kernel border clamp happens at the GLOBAL image edges."""
    if radius > 64:
        raise ValueError("fused spatial pass supports radius <= 64")
    _, h, w = cen_ctx.shape
    bh = pick_tile_h(h)
    align_h = (-h) % bh
    align_w = (-w) % _BW
    he, we = _halo_window(radius, bh)

    if halo_src is None:
        res_pad = pad_halo(res_planes, radius, bh, mode="constant")
        gates_pad = pad_halo(gates, radius, bh, mode="constant")
    else:
        gates_ext, res_ext = halo_src
        res_pad = _pad_halo_pre(res_ext, radius, bh)
        gates_pad = _pad_halo_pre(gates_ext, radius, bh)
    if row_base is None:
        row_base = 0
    if h_global is None:
        h_global = h
    if align_h or align_w:
        res_planes = jnp.pad(res_planes,
                             ((0, 0), (0, align_h), (0, align_w)))
        cen_ctx = jnp.pad(cen_ctx, ((0, 0), (0, align_h), (0, align_w)))
    hp, wp = h + align_h, w + align_w
    grid = (hp // bh, wp // _BW)

    from ..render.restir import SPATIAL_DEPTH_FRAC, SPATIAL_NORMAL_COS

    out = pl.pallas_call(
        functools.partial(_pass_kernel, n_nbr, radius, k,
                          SPATIAL_DEPTH_FRAC, SPATIAL_NORMAL_COS,
                          grid[1], grid[0] * grid[1], bh,
                          int(uniform_shin) if uniform_shin else None,
                          h_global, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((10 * k, bh, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),  # center reservoirs
            pl.BlockSpec((18, bh, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),  # center ctx
            pl.BlockSpec(memory_space=pl.ANY),  # gate halo planes (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # reservoir halo planes
        ],
        out_specs=pl.BlockSpec((10 * k, bh, _BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10 * k, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 5, he, we), jnp.float32),
            pltpu.VMEM((2, 10 * k, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(seed, jnp.int32),
                 jnp.asarray(row_base, jnp.int32)]),
      res_planes, cen_ctx, gates_pad, res_pad)
    return out[:, :h, :w]
