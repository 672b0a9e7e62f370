"""Fused R-MIS / R-OMIS per-iteration sweep kernels.

Reference analogs: the per-pixel inner loops of renderRMIS
(src/rendering/render.cpp:64-119) and renderROMIS (render.cpp:121-265) —
per iteration, every pixel shades every sample of its D+1-pixel fixed
neighbourhood, with per-sample MIS weights (generalisedBalanceHeuristic,
render_utils.cpp:179-187) or the R-OMIS technique-matrix accumulation
(arbitraryUnbiasedContributionWeightReciprocal, render_utils.cpp:245-257;
A/b updates render.cpp:205-218).

The XLA formulation (render/rmis.py, render/romis.py) paid, per 1080p
iteration: 60.6 ms neighbour gather + 9.7 ms shade + 55.8 ms visibility +
27.4 ms colvec + 22.9 ms A/b (+38.2 ms balance) — every stage streaming
[D1, K, ..., H, W] tensors through HBM (scripts/rmis_micro.py). This kernel
runs the WHOLE per-iteration sweep per image tile:

- neighbour reservoirs (and, for R-OMIS/balance, neighbour shading
  contexts) are resolved in-VMEM from halo windows through the stored
  per-pixel offsets (same exact-offset machinery as
  pallas_spatial._offset_gather_kernel: static row slices + per-pixel lane
  gathers, whole-tile skip of absent row offsets),
- the D1·K shadow rays per pixel share one origin (the receiver surface
  point), so visibility runs the shared-origin Möller–Trumbore loop
  (pallas_trace.occlusion_shared_origin_into) with tvec/qvec/e2·qvec
  hoisted across rays,
- the J×D1×K target-PDF sweep (colvec / balance denominators), the
  scale/ŵ math, and the A/b (or contribution) accumulation stay in
  registers; only the tiny per-tile accumulator planes leave the chip.

No RNG: given the canonical reservoirs and the offsets, the sweep is
deterministic — the interpret-mode tests check EXACT equality against the
XLA formulation (up to f32 reassociation), not statistics.
"""

from __future__ import annotations

import functools
import os

# Profiling knob (scripts/mis_sweep_micro.py): comma list of stages to
# skip inside the sweep kernel — "resolve", "occlusion", "sweep". Trace-
# static; NEVER set in production (outputs are wrong by construction).
_ABLATE = frozenset(
    s for s in os.environ.get("MIS_ABLATE", "").split(",") if s)
if _ABLATE:  # pragma: no cover - profiling-only escape hatch
    import warnings

    warnings.warn(
        f"MIS_ABLATE={sorted(_ABLATE)} is set: sweep kernels will SKIP "
        "stages and produce wrong-by-construction renders (profiling only)",
        stacklevel=2)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ris import (
    _phong_phat,
    _phong_rgb,
    compact_pack_ok,
    hoist_unit_view,
    light_comps_affine,
    light_comps_const,
    light_pos_col,
)
from .pallas_spatial import _BW, _halo_window, pad_halo, pick_tile_h
from .pallas_trace import (
    _block_aabbs,
    _pad_hw,
    _tri_columns,
    occlusion_shared_origin_into,
)

_FLT_MIN = 1.17549435e-38  # render/rmis.FLT_MIN (reference FLT_MIN)
_SHADOW_EPS = 1e-3  # ops/wrs.SHADOW_RAY_EPSILON


def _ctx_dict(planes, shin_n):
    """pack_center_ctx plane list (17: position3 normal3 view3 kd3 ks3 shin
    valid — depth dropped) → the _phong_rgb ctx dict, unit view hoisted."""
    cx = {
        "px": planes[0], "py": planes[1], "pz": planes[2],
        "nx": planes[3], "ny": planes[4], "nz": planes[5],
        "vx": planes[6], "vy": planes[7], "vz": planes[8],
        "kdx": planes[9], "kdy": planes[10], "kdz": planes[11],
        "ksx": planes[12], "ksy": planes[13], "ksz": planes[14],
        "shin": planes[15], "valid": planes[16],
        "shin_n": shin_n,
    }
    hoist_unit_view(cx)
    return cx


def _mis_kernel(mode: str, d_nbr: int, radius: int, k: int, n_tris: int,
                num_lights: int, lane_counts, shin_n, progressive: bool,
                n_tj: int, n_steps: int, bh: int, light_static,
                ext_vis: bool,
                *refs):
    """mode: 'rmis_equal' | 'rmis_balance' | 'romis'. refs layout (wrapper
    order): offs[2D], cen_ctx[18], cen_res[C_res], [nbr_ctx[14D]],
    [alphas[3*D1]], then trix SMEM + aabb SMEM (in-kernel occlusion) OR
    vis[D1*K] (``ext_vis``: visibility precomputed outside — the
    large-scene path, where the soup exceeds SMEM and the D1·K shadow rays
    batch through the paged BVH between kernel stages), res_hbm, outs...,
    scratch...

    cen_res / res_hbm hold the mode's slim reservoir pack:
      R-MIS:  pos 3K | color 3K | big_w K            (C_res = 7K)
      R-OMIS: pos 3K | color 3K | w_sum K | chosen K (C_res = 8K)
    (canonical M is the static lane_counts everywhere — never resolved).

    ``light_static`` = None (the full pack above) or
    (affine_segments, const_cols): the COMPACT coordinate pack
      R-MIS:  idxf K | u1 K | u2 K | big_w K           (C_res = 4K)
      R-OMIS: idxf K | u1 K | u2 K | w_sum K | chosen K (C_res = 5K)
    with (pos, col) reconstructed in-kernel via light_comps_affine /
    light_comps_const + light_pos_col (zero gathers; equal to the stored
    values up to cross-compilation FMA contraction, ~1 ulp) —
    the dense offset resolve is this kernel's dominant cost and scales
    with C_res, so resolving coordinates instead of values buys ~40%."""
    bw = _BW
    he, we = _halo_window(radius, bh, bw)
    d1 = d_nbr + 1
    romis = mode == "romis"
    balance = mode == "rmis_balance"
    need_ctx = romis or balance
    compact = light_static is not None
    c_res = mis_pack_planes(mode, k, compact)

    i = 0
    # Scalar-prefetch: the per-iteration block index into the (possibly
    # multi-block) reservoir pack. Runtime scalar — all iterations share
    # ONE compiled kernel (a static block base compiled 5 distinct Mosaic
    # kernels per mode and blew the compile budget).
    it_ref = refs[i]; i += 1
    offs_ref = refs[i]; i += 1
    cen_ctx_ref = refs[i]; i += 1
    cen_res_ref = refs[i]; i += 1
    nbr_ctx_ref = None
    if need_ctx:
        # Neighbour shading ctx [D*14, bh, bw], pre-resolved ONCE per frame
        # (it is iteration-invariant; the wrapper caches it via
        # halo_offset_gather) — resolving it in-kernel cost ~45 ms/iter.
        nbr_ctx_ref = refs[i]; i += 1
    alphas_ref = None
    if romis and progressive:
        alphas_ref = refs[i]; i += 1
    trix_ref = aabb_ref = vis_ref = None
    if ext_vis:
        vis_ref = refs[i]; i += 1
    else:
        trix_ref = refs[i]; i += 1
        aabb_ref = refs[i]; i += 1
    res_hbm = refs[i]; i += 1
    if romis:
        a_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        contrib_ref = None
        if progressive:
            contrib_ref = refs[i]; i += 1
    else:
        contrib_ref = refs[i]; i += 1
    res_scr = refs[i]; i += 1
    sem_r = refs[i]; i += 1
    res_rs = refs[i]; i += 1
    occf_ref = refs[i]; i += 1
    assert i == len(refs)

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    step = ti * n_tj + tj
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    # ===== double-buffered halo DMA (pattern of _pass_unbiased_kernel) =====
    res_base = it_ref[0] * c_res

    def copy(ii, jj, s):
        return pltpu.make_async_copy(
            res_hbm.at[pl.ds(res_base, c_res), pl.ds(ii * bh, he),
                       pl.ds(jj * bw, we)],
            res_scr.at[s], sem_r.at[s])

    @pl.when(step == 0)
    def _first():
        copy(ti, tj, slot).start()

    @pl.when(step + 1 < n_steps)
    def _prefetch_next():
        nj = tj + 1
        wrap = nj >= n_tj
        ni = jnp.where(wrap, ti + 1, ti)
        nj = jnp.where(wrap, 0, nj)
        copy(ni, nj, nslot).start()

    copy(ti, tj, slot).wait()

    # ===== resolve neighbour reservoirs through the per-pixel offsets =====
    # DENSE select chain — similarity-chosen offsets populate essentially
    # every row offset in a tile, and a pl.when skip per (plane, offset)
    # serializes on the scalar unit (~300 branches/tile measured as a
    # ~1.4x kernel slowdown). Loop order (plane, row-offset, neighbour):
    # the two window slices per (plane, row offset) are shared by all D
    # neighbours (only the lane gathers and selects are per-neighbour).
    iota_bw = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    dys = [offs_ref[d] for d in range(d_nbr)]
    lanes = []
    for d in range(d_nbr):
        lane_idx = iota_bw + radius + offs_ref[d_nbr + d]
        lanes.append((jnp.minimum(lane_idx, bw - 1),
                      jnp.clip(lane_idx - (we - bw), 0, bw - 1),
                      lane_idx < bw))

    def resolve_body(c, _):
        tile_c = res_scr[slot, c]
        accs = [jnp.zeros((bh, bw), jnp.float32) for _ in range(d_nbr)]
        for dd in range(-radius, radius + 1):
            t_lo = tile_c[radius + dd:radius + dd + bh, :bw]
            t_hi = tile_c[radius + dd:radius + dd + bh, we - bw:we]
            for d in range(d_nbr):
                lane_lo, lane_hi, use_lo = lanes[d]
                ld = jnp.where(
                    use_lo,
                    jnp.take_along_axis(t_lo, lane_lo, axis=1),
                    jnp.take_along_axis(t_hi, lane_hi, axis=1))
                accs[d] = jnp.where(dys[d] == dd, ld, accs[d])
        for d in range(d_nbr):
            res_rs[d, c] = accs[d]
        return 0

    if "resolve" not in _ABLATE:
        jax.lax.fori_loop(0, c_res, resolve_body, 0)
    else:
        res_rs[...] = jnp.zeros_like(res_rs)

    # ===== receiver + neighbour shading contexts =====
    cx = _ctx_dict([cen_ctx_ref[p] for p in range(16)] + [cen_ctx_ref[17]],
                   shin_n)
    valid = cx["valid"] > 0.5
    cxs = [cx]
    if need_ctx:
        # 14-plane neighbour pack (see resolve_neighbour_ctx): view_origin
        # is a per-frame constant for the pinhole camera (generate_rays
        # broadcasts ONE origin, core/camera.py:115), so the neighbour's
        # view planes are the receiver's own — substituted here instead of
        # gathered (3 planes), and depth is never read by the sweep
        # (offsets are pre-chosen) — 4 of 18 resolve planes dropped.
        for d in range(d_nbr):
            np14 = [nbr_ctx_ref[14 * d + p] for p in range(14)]
            cxs.append(_ctx_dict(
                np14[0:6] + [cen_ctx_ref[6], cen_ctx_ref[7],
                             cen_ctx_ref[8]] + np14[6:14], shin_n))

    def _raw(d, c):
        return cen_res_ref[c] if d == 0 else res_rs[d - 1, c]

    if compact:
        affine_segments, const_cols = light_static
        # Reconstruct every sample's (pos, col) ONCE from its coordinate
        # record. Empty reservoirs (stat == 0: nothing ever won the race)
        # store zero coordinates; zero pos/col to match the full pack's
        # never-selected init values exactly.
        _samples = []
        for d in range(d1):
            for lane in range(k):
                idxf = _raw(d, lane)
                u1 = _raw(d, k + lane)
                u2 = _raw(d, 2 * k + lane)
                live = _raw(d, 3 * k + lane) > 0.0
                if affine_segments is not None:
                    comps = light_comps_affine(affine_segments, idxf)
                else:
                    comps = light_comps_const(const_cols)
                pos, col = light_pos_col(comps, u1, u2)
                _samples.append((
                    tuple(jnp.where(live, v, 0.0) for v in pos),
                    tuple(jnp.where(live, v, 0.0) for v in col)))

    def sample_planes(d, lane):
        """(pos3, col3) of sample (d, lane); d = 0 is self."""
        if compact:
            return _samples[d * k + lane]
        get = lambda c: _raw(d, c)
        pos = tuple(get(3 * lane + c) for c in range(3))
        col = tuple(get(3 * k + 3 * lane + c) for c in range(3))
        return pos, col

    def stat_planes(d, lane):
        """Per-mode reservoir stats of (d, lane): big_w (R-MIS) or
        (w_sum, chosen_w) (R-OMIS)."""
        get = lambda c: _raw(d, c)
        if compact:
            if romis:
                return get(3 * k + lane), get(4 * k + lane)
            return get(3 * k + lane)
        if romis:
            return get(6 * k + lane), get(7 * k + lane)
        return get(6 * k + lane)

    # ===== shared-origin visibility for all D1*K rays =====
    if ext_vis:
        # Precomputed visibility planes (1.0 = visible), semantics =
        # ops/wrs.visibility (incl. the coincident-pair escape) — store as
        # occf so the sweep's read is uniform; dists are not needed.
        for s in range(d1 * k):
            occf_ref[s] = 1.0 - vis_ref[s]
        dists = None
    else:
        px, py, pz = cx["px"], cx["py"], cx["pz"]
        rays = []
        dists = []
        for d in range(d1):
            for lane in range(k):
                (lx, ly, lz), _ = sample_planes(d, lane)
                tox, toy, toz = lx - px, ly - py, lz - pz
                sq = tox * tox + toy * toy + toz * toz
                ok = sq > 1e-30
                dist = jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
                dinv = 1.0 / jnp.maximum(dist, 1e-20)
                # Dead-ray diet: invalid receivers never read vis (f = 0).
                # Measured negative result: extending the gate to dot_nl < 0
                # and big_w == 0 changed nothing (54.3 ms either way) — the
                # block culling tests jnp.any(live) per TILE, and per-pixel
                # deadness doesn't shrink lockstep SIMD work.
                t_eff = jnp.where(valid,
                                  jnp.maximum(dist - _SHADOW_EPS, 0.0),
                                  0.0)
                rays.append((tox * dinv, toy * dinv, toz * dinv, t_eff))
                dists.append(dist)
        if "occlusion" not in _ABLATE:
            occlusion_shared_origin_into(n_tris, trix_ref, aabb_ref,
                                         (px, py, pz), rays, _SHADOW_EPS,
                                         occf_ref)
        else:
            occf_ref[...] = jnp.zeros_like(occf_ref)

    # ===== the (j, d, k) sweep =====
    if "sweep" in _ABLATE:
        # Consume resolve + occlusion so Mosaic can't dead-code them.
        dummy = occf_ref[0] + res_rs[0, 0]
        if romis:
            for u in range(d1 * (d1 + 1) // 2):
                a_ref[u] = dummy
            for c in range(3 * d1):
                b_ref[c] = dummy
            if progressive:
                for c in range(3):
                    contrib_ref[c] = dummy
        else:
            for c in range(3):
                contrib_ref[c] = dummy
        return
    zeros = jnp.zeros((bh, bw), jnp.float32)
    if romis:
        n_up = d1 * (d1 + 1) // 2
        a_acc = [zeros] * n_up
        b_acc = [[zeros] * d1 for _ in range(3)]
    contrib = [zeros] * 3
    inv_k = 1.0 / float(k)
    equal_w = 1.0 / float(d1)

    for d in range(d1):
        for lane in range(k):
            pos3, col3 = sample_planes(d, lane)
            r, g, b_, ok = _phong_rgb(cx, *pos3, *col3)
            sq = r * r + g * g + b_ * b_
            p_recv = jnp.where(
                sq > 1e-30, jnp.sqrt(jnp.where(sq > 1e-30, sq, 1.0)), 0.0)
            p_recv = jnp.where(ok, p_recv, 0.0)
            s = d * k + lane
            vis = occf_ref[s] < 0.5
            if not ext_vis:  # the ext planes already carry the escape
                vis = vis | (dists[s] <= _SHADOW_EPS)
            gate = ok & vis
            f = [jnp.where(gate, c, 0.0) for c in (r, g, b_)]

            if not romis:
                if balance:
                    denom = _FLT_MIN + p_recv
                    for j in range(1, d1):
                        denom = denom + _phong_phat(cxs[j], *pos3, *col3)
                    mis_w = p_recv / denom
                else:
                    mis_w = equal_w
                big_w = stat_planes(d, lane)
                w_eff = mis_w * big_w * inv_k
                for c in range(3):
                    contrib[c] = contrib[c] + w_eff * f[c]
                continue

            # ----- R-OMIS: colvec under every technique j -----
            inv_m = 1.0 / max(float(lane_counts[lane]), 1e-37)
            colvec = []
            for j in range(d1):
                p_j = p_recv if j == 0 else _phong_phat(cxs[j], *pos3, *col3)
                w_sum_j, chosen_j = stat_planes(j, lane)
                w_prime = ((1.0 / jnp.maximum(p_j, 1e-37)) * inv_m
                           * (w_sum_j - chosen_j + p_j * float(num_lights)))
                w_ok = jnp.abs(w_prime) > 1e-37
                colvec.append(jnp.where(
                    (p_j > 0.0) & w_ok,
                    1.0 / jnp.where(w_ok, w_prime, 1.0), 0.0))

            s_cv = colvec[0]
            for j in range(1, d1):
                s_cv = s_cv + colvec[j]
            scale = 1.0 / (_FLT_MIN + float(k) * s_cv)
            w_hat = [cv * scale for cv in colvec]
            u = 0
            for i2 in range(d1):
                for j2 in range(i2, d1):
                    a_acc[u] = a_acc[u] + w_hat[i2] * w_hat[j2]
                    u += 1
            for c in range(3):
                fs = f[c] * scale
                for j in range(d1):
                    b_acc[c][j] = b_acc[c][j] + w_hat[j] * fs

            if progressive:
                # (f - Σ_j α_j·colvec_j) / (FLT_MIN + frac·Σ_j colvec_j)
                # (render.cpp:191-204); the /total_samples ride in XLA.
                frac = float(k) / float(d1)
                sfrac = _FLT_MIN + frac * s_cv
                for c in range(3):
                    sap = alphas_ref[c * d1] * colvec[0]
                    for j in range(1, d1):
                        sap = sap + alphas_ref[c * d1 + j] * colvec[j]
                    contrib[c] = contrib[c] + (f[c] - sap) / sfrac

    if romis:
        for u in range(d1 * (d1 + 1) // 2):
            a_ref[u] = a_acc[u]
        for c in range(3):
            for j in range(d1):
                b_ref[c * d1 + j] = b_acc[c][j]
        if progressive:
            for c in range(3):
                contrib_ref[c] = contrib[c]
    else:
        for c in range(3):
            contrib_ref[c] = contrib[c]


def pack_mis_reservoirs(res, romis: bool) -> jnp.ndarray:
    """Slim reservoir pack for the MIS kernels: pos 3K | color 3K | then
    big_w K (R-MIS) or w_sum K | chosen_w K (R-OMIS). Canonical M is the
    static lane layout — never packed."""
    hw = res.w_sum.shape[-2:]
    parts = [res.pos.reshape((-1,) + hw), res.color.reshape((-1,) + hw)]
    parts += [res.w_sum, res.chosen_w] if romis else [res.big_w]
    return jnp.concatenate(parts, axis=0)


def mis_pack_planes(mode: str, k: int, compact: bool) -> int:
    """Per-iteration reservoir pack planes C_res for ``mode``:
    full pack 7K/8K (rmis/romis), compact coordinate pack 4K/5K."""
    if compact:
        return (5 if mode == "romis" else 4) * k
    return (8 if mode == "romis" else 7) * k


def mis_pick_bh(h: int, mode: str) -> int:
    """The sweep kernel's tile height for ``mode`` (callers need it to
    pre-pad the shared halo stack for batched-iteration calls)."""
    need_ctx = mode in ("romis", "rmis_balance")
    return min(pick_tile_h(h), 24 if need_ctx else 40)


def resolve_neighbour_ctx(cen_ctx: jnp.ndarray, offs: jnp.ndarray,
                          radius: int) -> jnp.ndarray:
    """Pre-resolve the neighbour shading contexts ONCE per frame (they are
    iteration-invariant): [18, H, W] ctx + [2D, H, W] offsets →
    [D*14, H, W]. Rides halo_offset_gather (Pallas on TPU).

    Only 14 of the 18 ctx planes are gathered: view_origin3 is a per-frame
    constant for the pinhole camera (generate_rays broadcasts one origin —
    the sweep kernel substitutes the receiver's own view planes) and depth
    is never read for neighbours (offsets are pre-chosen, no similarity
    gates in the sweep). Pack: pos3 | normal3 | kd3 | ks3 | shin | valid."""
    from .pallas_spatial import halo_offset_gather

    d_nbr = offs.shape[0] // 2
    sub = jnp.concatenate([cen_ctx[0:6], cen_ctx[9:16], cen_ctx[17:18]],
                          axis=0)  # [14, H, W]
    g = halo_offset_gather(sub, offs[:d_nbr], offs[d_nbr:], radius,
                           skip_absent=False)
    return g.reshape((d_nbr * 14,) + g.shape[-2:])


def mis_iteration_pallas(
    cen_ctx: jnp.ndarray,  # [18, H, W] pack_center_ctx
    res_planes: jnp.ndarray,  # [C_res, H, W] pack_mis_reservoirs
    offs: jnp.ndarray,  # [2D, H, W] int32 (dy then dx per neighbour)
    geometry,
    k: int,
    radius: int,
    mode: str,  # 'rmis_equal' | 'rmis_balance' | 'romis'
    num_lights: int,
    lane_counts,
    nbr_ctx: jnp.ndarray = None,  # [D*14, H, W] resolve_neighbour_ctx
    alphas: jnp.ndarray = None,  # [3*D1, H, W] (progressive R-OMIS)
    it_block: int = 0,  # which per-iteration block of res_planes to use
    res_pad=None,  # precomputed pad_halo(res_planes, ...) (batched calls)
    lights=None,  # LightTable — required for the compact pack
    compact: bool = False,  # res_planes is the compact coordinate pack
    ext_vis: jnp.ndarray = None,  # [D1*K, H, W] precomputed visibility
    interpret: bool = False,
):
    """One fused R-MIS / R-OMIS iteration. Returns:
    - rmis_*: contribution [3, H, W] (sum over (d, k) of mis_w·W·f/K)
    - romis: (A upper-tri [D1(D1+1)/2, H, W], b [3*D1, H, W]
      [, progressive contribution [3, H, W]]).
    romis/rmis_balance require ``nbr_ctx`` (cache it across iterations).

    ``res_planes`` may hold SEVERAL per-iteration pack blocks
    (gen_mis_reservoir_planes layout); ``it_block`` picks this call's
    block — the tile fetch and the halo-window DMA both slice the block,
    so the batched layout costs nothing per call. Pass the shared
    ``res_pad`` (pad_halo of the full stack) to pad once per frame.

    ``compact``: res_planes holds the coordinate pack (see _mis_kernel);
    requires ``lights`` with compact_pack_ok(lights).

    ``ext_vis``: per-sample visibility planes [D1*K, H, W] (1.0 = visible,
    s = d*K + lane; ops/wrs.visibility semantics) computed OUTSIDE the
    kernel — the large-scene mode (reference anyHit serves every estimator
    at any scene size, embree_interface.cpp:58-62): the soup no longer
    needs to fit SMEM, the D1·K shadow rays ride whichever backend
    intersect_any_fast picks (paged BVH above 2048 tris)."""
    if radius > 64:
        raise ValueError("fused MIS sweep supports radius <= 64")
    romis = mode == "romis"
    need_ctx = romis or (mode == "rmis_balance")
    if need_ctx and nbr_ctx is None:
        raise ValueError(f"{mode} needs the pre-resolved nbr_ctx")
    if compact:
        if lights is None or not compact_pack_ok(lights):
            raise ValueError(
                "compact MIS pack needs an affine/const light table")
        light_static = (getattr(lights, "affine_segments", None),
                        getattr(lights, "const_cols", None))
    else:
        light_static = None
    progressive = alphas is not None
    d_nbr = offs.shape[0] // 2
    d1 = d_nbr + 1
    _, h, w = cen_ctx.shape
    # The ctx-carrying modes hold ~40 accumulator planes + the 18D-plane
    # neighbour ctx through the sweep — at bh=40 the kernel's scoped-VMEM
    # value stack exceeds the 16 MB limit; 24 divides 1080 and fits.
    bh = mis_pick_bh(h, mode)
    he, we = _halo_window(radius, bh)

    c_res = mis_pack_planes(mode, k, compact)
    if res_planes.shape[0] % c_res:
        raise ValueError("res_planes is not a whole number of pack blocks")
    if res_pad is None:
        res_pad = pad_halo(res_planes, radius, bh, mode="constant")
    cen_ctx_p, _, _ = _pad_hw(cen_ctx, bh, _BW)
    res_p, _, _ = _pad_hw(res_planes, bh, _BW)
    offs_p, _, _ = _pad_hw(offs, bh, _BW)
    if progressive:
        alphas_p, _, _ = _pad_hw(alphas, bh, _BW)
    hp, wp = cen_ctx_p.shape[-2:]
    grid = (hp // bh, wp // _BW)

    if ext_vis is None:
        trix = _tri_columns(geometry)
        aabbs = _block_aabbs(geometry, trix)

    # Index maps receive the scalar-prefetch ref (the iteration block) as
    # the TRAILING argument.
    tile = lambda c: pl.BlockSpec((c, bh, _BW), lambda i, j, s: (0, i, j),
                                  memory_space=pltpu.VMEM)
    res_tile = pl.BlockSpec((c_res, bh, _BW),
                            lambda i, j, s: (s[0], i, j),
                            memory_space=pltpu.VMEM)
    in_specs = [tile(2 * d_nbr), tile(18), res_tile]
    inputs = [offs_p, cen_ctx_p, res_p]
    if need_ctx:
        nbr_ctx_p, _, _ = _pad_hw(nbr_ctx, bh, _BW)
        in_specs.append(tile(14 * d_nbr))
        inputs.append(nbr_ctx_p)
    if progressive:
        in_specs.append(tile(3 * d1))
        inputs.append(alphas_p)
    if ext_vis is not None:
        vis_p, _, _ = _pad_hw(ext_vis.astype(jnp.float32), bh, _BW)
        in_specs.append(tile(d1 * k))
        inputs.append(vis_p)
    else:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        inputs += [trix, aabbs]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
    inputs += [res_pad]

    if romis:
        n_up = d1 * (d1 + 1) // 2
        out_shape = [jax.ShapeDtypeStruct((n_up, hp, wp), jnp.float32),
                     jax.ShapeDtypeStruct((3 * d1, hp, wp), jnp.float32)]
        out_specs = [tile(n_up), tile(3 * d1)]
        if progressive:
            out_shape.append(jax.ShapeDtypeStruct((3, hp, wp), jnp.float32))
            out_specs.append(tile(3))
    else:
        out_shape = [jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)]
        out_specs = [tile(3)]

    scratch = [
        pltpu.VMEM((2, c_res, he, we), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((d_nbr, c_res, bh, _BW), jnp.float32),
        pltpu.VMEM((d1 * k, bh, _BW), jnp.float32),
    ]

    uniform_shin = getattr(geometry, "uniform_shin", None)
    outs = pl.pallas_call(
        functools.partial(
            _mis_kernel, mode, d_nbr, radius, k, geometry.num_tris,
            num_lights, tuple(float(c) for c in lane_counts),
            int(uniform_shin) if uniform_shin else None, progressive,
            grid[1], grid[0] * grid[1], bh, light_static,
            ext_vis is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=(tuple(out_specs) if len(out_specs) > 1
                       else out_specs[0]),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )(jnp.asarray([it_block], jnp.int32), *inputs)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    outs = tuple(o[:, :h, :w] for o in outs)
    return outs if romis else outs[0]


def expand_a_upper(a_up: jnp.ndarray, d1: int) -> jnp.ndarray:
    """Upper-triangular A planes [D1(D1+1)/2, H, W] → full symmetric
    [D1, D1, H, W] (the solve_alpha input layout)."""
    rows = [[None] * d1 for _ in range(d1)]
    u = 0
    for i in range(d1):
        for j in range(i, d1):
            rows[i][j] = a_up[u]
            rows[j][i] = a_up[u]
            u += 1
    return jnp.stack([jnp.stack(r) for r in rows])
