"""Fused Pallas kernel for RIS candidate generation.

gen_canonical_samples (ops/wrs.py) streams S candidate slots through a
lax.scan: per slot it draws randoms, row-gathers light data, evaluates the
target PDF, and updates the running WRS state — every step round-tripping
carries and gather results through HBM (measured 1.34 s/frame at 1080p).

This kernel runs the whole candidate loop on-chip per image tile:

- RNG: the per-core PRNG (pltpu.prng_seed / prng_random_bits), seeded from
  (user seed, tile coordinates) — deterministic and tile-independent,
- light fetch: the per-candidate light row ([L, 24] table) is fetched with
  WINDOWED LANE DYNAMIC_GATHERS — the table lives transposed in VMEM as
  L_pad/128 broadcast windows per component, and the per-pixel index picks
  its window by range select (Mosaic's gather indexes within one 128-lane
  vreg). This replaced a one-hot MXU matmul fetch that wasted 104/128 of
  the systolic array's output rows (24 components),
- target PDF: the Phong evaluation inlined on component planes,
- WRS: running Gumbel-max per lane in registers.

HBM traffic: ctx in + reservoir out (~40 floats/pixel total). The RNG stream
differs from the XLA path's threefry (different but equally deterministic
sampling), so images differ sample-wise while all estimator statistics match
— the parity test checks means/variances, not bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.features import Features
from ..core.types import Reservoirs, ShadeCtx

# Pixel tile (bh, 128). Early kernel versions were fastest at one vreg
# (8, 128) — the WRS carry spilled at larger tiles. After the windowed-
# gather light fetch and affine synthesis slimmed the loop body, taller
# tiles win on instruction-level parallelism (more vregs per op, fewer
# single-vreg dependency stalls): measured at 1080p bh=8: 7.0 ms, 16: 6.0,
# 24: 5.2, 40: 5.1, 48: 5.7, 64: 5.9. 40 also divides 1080 (no pad).
_BH, _BW = 40, 128

ZERO_EPSILON = 1e-5

# Packed ctx plane order (see pack_ctx):
# 0-2 position, 3-5 normal, 6-8 view_origin, 9-11 kd, 12-14 ks,
# 15 shininess, 16 valid
_CTX_PLANES = 17


def pack_ctx(ctx: ShadeCtx) -> jnp.ndarray:
    return jnp.concatenate([
        ctx.position, ctx.normal, ctx.view_origin, ctx.kd, ctx.ks,
        ctx.shininess[None], ctx.valid.astype(jnp.float32)[None],
    ], axis=0)


def _u01(bits):
    """random bits → float32 in [0, 1) via the top 24 bits. Mosaic has no
    uint32→f32 cast; go through int32 with a logical shift."""
    b = pltpu.bitcast(bits, jnp.int32)
    return (jax.lax.shift_right_logical(b, 8).astype(jnp.float32)
            * (1.0 / 16777216.0))


def hoist_unit_view(cx):
    """Precompute the normalized view direction once per tile (it is
    per-pixel constant across RIS candidates / reuse streams — hoisting it
    out of _phong_phat saves ~10 ops per evaluation). Mutates cx."""
    vx0 = cx["vx"] - cx["px"]
    vy0 = cx["vy"] - cx["py"]
    vz0 = cx["vz"] - cx["pz"]
    vn = jax.lax.rsqrt(jnp.maximum(vx0 * vx0 + vy0 * vy0 + vz0 * vz0, 1e-20))
    cx["uvx"], cx["uvy"], cx["uvz"] = vx0 * vn, vy0 * vn, vz0 * vn
    return cx


def _pow_int(x, n: int):
    """x**n for a static positive integer n by repeated squaring (~2 log n
    mults) — replaces the exp(n*log x) pair when the scene has one shared
    integer shininess (Geometry.uniform_shin)."""
    r = None
    b = x
    while n:
        if n & 1:
            r = b if r is None else r * b
        n >>= 1
        if n:
            b = b * b
    return r


def _phong_rgb(cx, lx, ly, lz, cr, cg, cb):
    """Unshadowed Phong on component planes → (r, g, b, ok): the UNGATED
    color planes plus the behind/valid gate (callers apply the gate as
    their estimator needs — p_hat gates the norm, shading gates the color).
    cx = dict of ctx planes, with the unit view precomputed by
    hoist_unit_view."""
    px, py, pz = cx["px"], cx["py"], cx["pz"]
    nx, ny, nz = cx["nx"], cx["ny"], cx["nz"]
    tlx, tly, tlz = lx - px, ly - py, lz - pz
    dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-24)
    inv_d = jax.lax.rsqrt(dist2)
    dist = dist2 * inv_d
    ldx, ldy, ldz = tlx * inv_d, tly * inv_d, tlz * inv_d
    dot_nl = nx * ldx + ny * ldy + nz * ldz

    vx0, vy0, vz0 = cx["uvx"], cx["uvy"], cx["uvz"]
    rx = 2.0 * dot_nl * nx - ldx
    ry = 2.0 * dot_nl * ny - ldy
    rz = 2.0 * dot_nl * nz - ldz
    rn = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-20))
    cos_t = (rx * vx0 + ry * vy0 + rz * vz0) * rn

    cos_safe = jnp.maximum(cos_t, 1e-12)
    if cx.get("shin_n") is not None:
        spec_pow = jnp.where(cos_t > 0.0, _pow_int(cos_safe, cx["shin_n"]),
                             0.0)
    else:
        spec_pow = jnp.where(
            cos_t > 0.0, jnp.exp(cx["shin"] * jnp.log(cos_safe)), 0.0)
    inv_f2 = jnp.where(dist < ZERO_EPSILON, 1.0, 1.0 / dist2)

    out_r = (cr * cx["kdx"] * dot_nl + cr * cx["ksx"] * spec_pow) * inv_f2
    out_g = (cg * cx["kdy"] * dot_nl + cg * cx["ksy"] * spec_pow) * inv_f2
    out_b = (cb * cx["kdz"] * dot_nl + cb * cx["ksz"] * spec_pow) * inv_f2
    ok = (dot_nl >= 0.0) & (cx["valid"] > 0.5)
    return out_r, out_g, out_b, ok


def _phong_phat(cx, lx, ly, lz, cr, cg, cb):
    """Target PDF ||phong||2 on component planes (see _phong_rgb)."""
    out_r, out_g, out_b, ok = _phong_rgb(cx, lx, ly, lz, cr, cg, cb)
    sq = out_r * out_r + out_g * out_g + out_b * out_b
    p_hat = jnp.where(sq > 1e-30, jnp.sqrt(jnp.where(sq > 1e-30, sq, 1.0)),
                      0.0)
    return jnp.where(ok, p_hat, 0.0)


def light_comps_affine(affine_segments, idxf):
    """Recompute light columns arithmetically from the affine grid
    structure (LightTable.affine_segments) — zero gathers, and the exact
    f32 expression regular_light_grid used to build the rows, so the
    result is bit-identical to a table fetch of the same index. Columns
    constant across every segment come back as Python floats. Shared by
    the RIS candidate loop and the compact-pack MIS sweep reconstruction
    (ops/pallas_mis.py)."""
    nseg = len(affine_segments)
    comps = {}
    # Columns constant across every segment become Python scalars.
    for c in range(21):
        per_seg = [seg[3][c] for seg in affine_segments]
        if (all(b == 0.0 and cc == 0.0 for _, b, cc in per_seg)
                and len({a for a, _, _ in per_seg}) == 1):
            comps[c] = per_seg[0][0]
    rest = [c for c in range(21) if c not in comps]
    for si, (s0, n, period, params) in enumerate(affine_segments):
        local = idxf - float(s0) if s0 else idxf
        need_xy = any(params[c][1] != 0.0 or params[c][2] != 0.0
                      for c in rest)
        if need_xy:
            # local // period via floats: the +0.5 offset keeps floor
            # exact under the two roundings (locals are exact ints).
            xl = jnp.floor((local + 0.5) * (1.0 / period))
            yl = local - xl * float(period)
        if nseg > 1:
            in_seg = (idxf >= float(s0)) & (idxf < float(s0 + n))
        for c in rest:
            a, b, cc = params[c]
            val = a + b * xl if b != 0.0 else a
            if cc != 0.0:
                val = val + cc * yl
            if nseg == 1:
                comps[c] = val
            else:
                prev = comps.get(c, jnp.zeros_like(idxf))
                comps[c] = jnp.where(in_seg, val, prev)
    return comps


def light_comps_const(const_cols):
    """All-constant light table (single light or identical rows): every
    column a Python float."""
    return {c: const_cols[c] for c in range(21)}


def light_pos_col(comps, u1, u2):
    """(pos3, col3) of the point sample (u1, u2) on the light described by
    ``comps`` (column dict from light_comps_affine / light_comps_const /
    a table fetch): position = v0 + u1*e01 + u2*e02, color = bilerp of
    the four corner colors. Constant-corner bilerps collapse to the
    constant (single-color lights — e.g. the nightclub grid)."""
    plane = lambda i: comps[i]
    lx = plane(0) + u1 * plane(3) + u2 * plane(6)
    ly = plane(1) + u1 * plane(4) + u2 * plane(7)
    lz = plane(2) + u1 * plane(5) + u2 * plane(8)
    one_m_u = 1.0 - u1
    one_m_v = 1.0 - u2

    def bilerp(a, b, c, d):
        corners = [plane(x) for x in (a, b, c, d)]
        if (all(isinstance(x, float) for x in corners)
                and len(set(corners)) == 1):
            return corners[0]
        return ((corners[0] * one_m_u + corners[1] * u1) * one_m_v
                + (corners[2] * one_m_u + corners[3] * u1) * u2)

    cr = bilerp(9, 12, 15, 18)
    cg = bilerp(10, 13, 16, 19)
    cb = bilerp(11, 14, 17, 20)
    return (lx, ly, lz), (cr, cg, cb)


def compact_pack_ok(lights) -> bool:
    """True when the MIS sweep can reconstruct (pos, col) from a compact
    (light index, u1, u2) record with zero in-kernel table gathers: the
    table is an affine grid or fully constant."""
    if getattr(lights, "affine_segments", None) is not None:
        return True
    cc = getattr(lights, "const_cols", None)
    return cc is not None and all(c is not None for c in cc)


def _ris_kernel(s_slots: int, k_lanes: int, num_lights: int, lane_counts,
                const_cols, affine_segments, shin_n, replay: bool,
                mis_layout, group_k, compact: bool,
                seed_ref, ctx_ref, table_t_ref, *out_refs):
    bh, bw = ctx_ref.shape[-2:]
    l_pad = table_t_ref.shape[1]

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + ti * 65537 + tj * 131)

    cx = {
        "px": ctx_ref[0], "py": ctx_ref[1], "pz": ctx_ref[2],
        "nx": ctx_ref[3], "ny": ctx_ref[4], "nz": ctx_ref[5],
        "vx": ctx_ref[6], "vy": ctx_ref[7], "vz": ctx_ref[8],
        "kdx": ctx_ref[9], "kdy": ctx_ref[10], "kdz": ctx_ref[11],
        "ksx": ctx_ref[12], "ksy": ctx_ref[13], "ksz": ctx_ref[14],
        "shin": ctx_ref[15], "valid": ctx_ref[16],
        "shin_n": shin_n,
    }
    hoist_unit_view(cx)

    # Light components fetched with windowed lane dynamic_gathers: Mosaic's
    # gather indexes within one 128-lane vreg, so each VARYING component is
    # kept as n_win = L_pad/128 broadcast windows [bh, 128] and the fetch
    # selects by index range. (An earlier one-hot MXU fetch was ~4x slower:
    # M = 24 output rows uses 24/128 of the systolic array.) Components that
    # are identical for every light (const_cols, host-detected at scene
    # build — e.g. the nightclub grid shares edges + colors, leaving only 3
    # varying of 21) are baked in as Python-float scalars: the fetch is the
    # dominant cost of this kernel.
    varying = [c for c in range(21) if const_cols is None
               or const_cols[c] is None]
    if affine_segments is None:
        n_win = l_pad // 128
        # NB: materialize the sublane broadcast with an add — take_along_axis
        # of a lazy (1, 128) broadcast lowers as a >2D gather, which Mosaic
        # rejects ("Only 2D gather is supported").
        zeros_bh = jnp.zeros((bh, 128), jnp.float32)
        tab_wins = {
            c: [table_t_ref[c:c + 1, 128 * v:128 * (v + 1)] + zeros_bh
                for v in range(n_win)]
            for c in varying
        }

    def fetch_comps(idx):
        comps = {c: jnp.zeros((bh, bw), jnp.float32) for c in varying}
        for v in range(n_win):
            idx_local = jnp.clip(idx - 128 * v, 0, 127)
            in_w = (idx >= 128 * v) & (idx < 128 * (v + 1))
            for c in varying:
                g = jnp.take_along_axis(tab_wins[c][v], idx_local, axis=1)
                comps[c] = jnp.where(in_w, g, comps[c])
        if const_cols is not None:
            for c in range(21):
                if const_cols[c] is not None:
                    comps[c] = const_cols[c]
        return comps

    def candidate(u_idx, u1, u2):
        """One candidate per pixel: light pick + point sample + target PDF
        → (pos3, color3, p_hat, idxf)."""
        if affine_segments is None:
            idx = jnp.minimum((u_idx * num_lights).astype(jnp.int32),
                              num_lights - 1)  # [bh, bw]
            idxf = idx.astype(jnp.float32)
            comps = fetch_comps(idx)
        else:
            # Same truncation as the int path (floor of a non-negative
            # product), kept in f32 for the affine replay.
            idxf = jnp.minimum(jnp.floor(u_idx * num_lights),
                               float(num_lights - 1))
            comps = light_comps_affine(affine_segments, idxf)

        pos, col = light_pos_col(comps, u1, u2)
        p_hat = _phong_phat(cx, *pos, *col)
        return pos, col, p_hat, idxf

    # Per-lane running state, carried through a ROLLED step loop (the
    # fully unrolled slot loop compiled for minutes under Mosaic once the
    # windowed-gather fetch replaced the one-hot matmuls). One step draws
    # one candidate per lane (candidate j = step*K + lane, matching
    # ops/wrs._lane_layout).
    sk = -(-s_slots // k_lanes)
    n_u = 5 if replay else 4
    compact_mis = mis_layout is not None and compact
    # Carry stride per lane: the compact MIS layout races on the sample
    # COORDINATES (idxf, u1, u2) instead of the reconstructed values —
    # 3 fewer selected planes per candidate step.
    stride = 9 if replay else (7 if compact_mis else 10)
    init = []
    for _ in range(k_lanes):
        if replay:
            # w_sum, race-1 (score, idxf, u1, u2), race-2 (score, idxf,
            # u1, u2): same register count as the value-carrying layout.
            init += [jnp.zeros((bh, bw), jnp.float32),
                     jnp.full((bh, bw), -jnp.inf)]
            init += [jnp.zeros((bh, bw), jnp.float32)] * 3
            init += [jnp.full((bh, bw), -jnp.inf)]
            init += [jnp.zeros((bh, bw), jnp.float32)] * 3
        elif compact_mis:
            init += [jnp.zeros((bh, bw), jnp.float32),     # w_sum
                     jnp.full((bh, bw), -jnp.inf)]         # best score
            init += [jnp.zeros((bh, bw), jnp.float32)] * 5  # idxf u1 u2 w ph
        else:
            init += [jnp.zeros((bh, bw), jnp.float32),     # w_sum
                     jnp.full((bh, bw), -jnp.inf)]         # best score
            init += [jnp.zeros((bh, bw), jnp.float32)] * 8  # pos3 col3 w ph

    def step(t, carry):
        carry = list(carry)
        bits = pltpu.bitcast(
            pltpu.prng_random_bits((n_u * k_lanes * bh, bw)), jnp.uint32)

        def u(i):
            return _u01(bits[i * bh:(i + 1) * bh])

        for lane in range(k_lanes):
            u_i, u_1, u_2 = (u(n_u * lane), u(n_u * lane + 1),
                             u(n_u * lane + 2))
            pos, col, p_hat, idxf = candidate(u_i, u_1, u_2)
            u_g = u(n_u * lane + 3)
            # Lane `lane` holds exactly lane_counts[lane] real candidates
            # (t < count ⇔ the standard layout's j = t*K + lane < S; the
            # count form also carries the batched-iterations variant,
            # where counts repeat per iteration block).
            real = (t < int(lane_counts[lane])).astype(jnp.float32)
            w = p_hat * float(num_lights) * real

            # Exponential race (one log, vs Gumbel-max's two): argmax of
            # w / E with E ~ Exp(1) selects candidate i w.p. w_i / Σw —
            # the same distribution (A-ExpJ / exponential clocks).
            e_clock = -jnp.log(jnp.maximum(u_g, 1e-37)) + 1e-37
            score = jnp.where(w > 0.0, w / e_clock, -jnp.inf)
            o = stride * lane
            upd = score > carry[o + 1]
            carry[o] = carry[o] + w
            carry[o + 1] = jnp.where(upd, score, carry[o + 1])
            if replay:
                for i, v in enumerate((idxf, u_1, u_2)):
                    carry[o + 2 + i] = jnp.where(upd, v, carry[o + 2 + i])
                # Second, independent race for the surrogate w_sum gradient
                # (ops/wrs._gen_canonical_surrogate).
                e2 = -jnp.log(jnp.maximum(u(n_u * lane + 4), 1e-37)) + 1e-37
                score2 = jnp.where(w > 0.0, w / e2, -jnp.inf)
                upd2 = score2 > carry[o + 5]
                carry[o + 5] = jnp.where(upd2, score2, carry[o + 5])
                for i, v in enumerate((idxf, u_1, u_2)):
                    carry[o + 6 + i] = jnp.where(upd2, v, carry[o + 6 + i])
            else:
                vals = ((idxf, u_1, u_2, w, p_hat) if compact_mis
                        else pos + col + (w, p_hat))
                for i, v in enumerate(vals):
                    carry[o + 2 + i] = jnp.where(upd, v, carry[o + 2 + i])
        return tuple(carry)

    state = jax.lax.fori_loop(0, sk, step, tuple(init))

    if replay:
        # Outputs per lane: [w_sum, idx1, u1, v1, idx2, u2, v2].
        for lane in range(k_lanes):
            o = 9 * lane
            planes = [state[o]] + list(state[o + 2:o + 5]) \
                + list(state[o + 6:o + 9])
            for i, v in enumerate(planes):
                out_refs[lane * 7 + i][...] = v
        return

    if compact_mis:
        # COMPACT per-iteration blocks [idxf K | u1 K | u2 K] + [big_w K]
        # (rmis) or [w_sum K | chosen K] (romis): the sweep kernel
        # reconstructs (pos, col) bit-exactly via light_comps_affine /
        # light_comps_const + light_pos_col — 4K/5K resolved planes
        # instead of 7K/8K (the sweep's dense offset resolve is its
        # dominant cost, ~26 of 41 ms/iteration at 1080p).
        out = out_refs[0]
        romis_l = mis_layout == "romis"
        kg = group_k
        c_blk = (5 if romis_l else 4) * kg
        for lane in range(k_lanes):
            it, lg = lane // kg, lane % kg
            o = 7 * lane
            w_sum_l = state[o]
            idxf_l, u1_l, u2_l, chosen_l, p_hat_l = state[o + 2:o + 7]
            base = it * c_blk
            out[base + lg] = idxf_l
            out[base + kg + lg] = u1_l
            out[base + 2 * kg + lg] = u2_l
            if romis_l:
                out[base + 3 * kg + lg] = w_sum_l
                out[base + 4 * kg + lg] = chosen_l
            else:
                m = float(lane_counts[lane])
                cond = p_hat_l > 0.0
                denom = jnp.where(cond, p_hat_l * m, 1.0)
                out[base + 3 * kg + lg] = jnp.where(
                    cond, w_sum_l / denom, 0.0)
        return

    if mis_layout is not None:
        # Direct pack_mis_reservoirs layout into ONE [C, bh, bw] ref:
        # per-iteration blocks of [pos 3K | color 3K | big_w K] (rmis) or
        # [pos 3K | color 3K | w_sum K | chosen K] (romis) — the MIS sweep
        # kernels read this as-is, killing the per-iteration stack+pack
        # copies (measured 4.3 ms each at 1080p).
        out = out_refs[0]
        romis_l = mis_layout == "romis"
        kg = group_k
        c_blk = (8 if romis_l else 7) * kg
        for lane in range(k_lanes):
            it, lg = lane // kg, lane % kg
            o = 10 * lane
            w_sum_l = state[o]
            sel = state[o + 2:o + 10]
            base = it * c_blk
            for c in range(3):
                out[base + 3 * lg + c] = sel[c]
                out[base + 3 * kg + 3 * lg + c] = sel[3 + c]
            if romis_l:
                out[base + 6 * kg + lg] = w_sum_l
                out[base + 7 * kg + lg] = sel[6]
            else:
                m = float(lane_counts[lane])
                p_hat_l = sel[7]
                cond = p_hat_l > 0.0
                denom = jnp.where(cond, p_hat_l * m, 1.0)
                out[base + 6 * kg + lg] = jnp.where(
                    cond, w_sum_l / denom, 0.0)
        return

    # Outputs: per lane [pos3, color3, w_sum, chosen_w, p_hat, big_w].
    for lane in range(k_lanes):
        o = 10 * lane
        w_sum_l = state[o]
        sel = state[o + 2:o + 10]
        m = float(lane_counts[lane])
        p_hat_l = sel[7]
        cond = p_hat_l > 0.0
        denom = jnp.where(cond, p_hat_l * m, 1.0)
        big_w = jnp.where(cond, w_sum_l / denom, 0.0)
        planes = list(sel[:6]) + [w_sum_l, sel[6], p_hat_l, big_w]
        for i, v in enumerate(planes):
            out_refs[lane * 10 + i][...] = v


def gen_canonical_samples_pallas(
    seed: jnp.ndarray,  # [] int32
    ctx: ShadeCtx,
    lights,
    num_lights: int,
    features: Features,
    uniform_shin: float = None,
    interpret: bool = False,
) -> Reservoirs:
    """Fused-RIS entry with the gen_canonical_samples contract (different,
    equally deterministic RNG stream)."""
    from .wrs import _lane_layout

    h, w = ctx.depth_t.shape[-2:]
    s = features.initial_light_samples
    k = features.num_samples_in_reservoir
    _, lane_counts, _ = _lane_layout(s, k)

    packed = pack_ctx(ctx)
    ph = (-h) % _BH
    pw = (-w) % _BW
    if ph or pw:
        packed = jnp.pad(packed, ((0, 0), (0, ph), (0, pw)))
    hp, wp = packed.shape[-2:]

    # Pad the light table to a lane-friendly count and transpose to [24, L]
    # for the in-kernel one-hot matmul.
    l = lights.rows.shape[0]
    l_pad = max(128, -(-l // 128) * 128)
    table_t = jnp.pad(lights.rows, ((0, l_pad - l), (0, 0))).T

    grid = (hp // _BH, wp // _BW)
    out_shape = tuple(
        jax.ShapeDtypeStruct((hp, wp), jnp.float32) for _ in range(10 * k))
    out_specs = tuple(
        pl.BlockSpec((_BH, _BW), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM) for _ in range(10 * k))
    const_cols = getattr(lights, "const_cols", None)
    affine_segments = getattr(lights, "affine_segments", None)
    outs = pl.pallas_call(
        functools.partial(_ris_kernel, s, k, num_lights,
                          tuple(float(c) for c in lane_counts),
                          const_cols, affine_segments,
                          int(uniform_shin) if uniform_shin else None,
                          False, None, None, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((_CTX_PLANES, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light table
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), packed, table_t)

    def crop(a):
        return a[:h, :w]

    def lane_planes(lane):
        return [crop(outs[lane * 10 + i]) for i in range(10)]

    pos = jnp.stack(
        [jnp.stack(lane_planes(lane)[0:3], axis=0) for lane in range(k)])
    color = jnp.stack(
        [jnp.stack(lane_planes(lane)[3:6], axis=0) for lane in range(k)])
    w_sum = jnp.stack([lane_planes(lane)[6] for lane in range(k)])
    chosen = jnp.stack([lane_planes(lane)[7] for lane in range(k)])
    big_w = jnp.stack([lane_planes(lane)[9] for lane in range(k)])
    m = jnp.broadcast_to(
        jnp.asarray(lane_counts)[:, None, None], (k, h, w))

    # NB: the initial_samples_visibility_check kill is applied by the
    # dispatching wrapper (ops/wrs.gen_canonical_samples), which has the
    # geometry for the shadow rays.
    return Reservoirs(pos=pos, color=color, w_sum=w_sum, m=m, big_w=big_w,
                      chosen_w=chosen)


def gen_mis_reservoir_planes(
    seed: jnp.ndarray,  # [] int32
    ctx: ShadeCtx,
    lights,
    num_lights: int,
    features: Features,
    iterations: int,
    romis: bool,
    uniform_shin: float = None,
    compact: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched canonical generation for the fused R-MIS / R-OMIS sweep:
    ALL `iterations` x K canonical reservoirs in ONE kernel call
    (K' = iterations*K lanes, per-lane candidate counts = the per-iteration
    _lane_layout counts), emitted directly as per-iteration
    pack_mis_reservoirs blocks → [iterations * (7|8)K, H, W] — or, with
    ``compact``, coordinate blocks [idxf K | u1 K | u2 K | big_w K]
    (rmis, 4K) / [... | w_sum K | chosen K] (romis, 5K) for scenes whose
    light table the sweep can reconstruct in-kernel (compact_pack_ok).

    Iterations are mutually independent candidate draws — the estimator is
    identical to `iterations` separate gen_canonical_samples_pallas calls
    (single pltpu PRNG stream instead of per-iteration seeds; statistics
    match, bits don't — the usual kernel contract). Measured: replaces
    5 x (8 ms RIS + 4.3 ms pack) with one ~28 ms call at 1080p."""
    from .wrs import _lane_layout

    h, w = ctx.depth_t.shape[-2:]
    s = features.initial_light_samples
    k = features.num_samples_in_reservoir
    _, lane_counts1, _ = _lane_layout(s, k)
    lane_counts = tuple(float(c) for c in lane_counts1) * iterations
    k_lanes = k * iterations
    c_blk = ((5 if romis else 4) if compact else (8 if romis else 7)) * k
    n_out = iterations * c_blk

    packed = pack_ctx(ctx)
    ph = (-h) % _BH
    pw = (-w) % _BW
    if ph or pw:
        packed = jnp.pad(packed, ((0, 0), (0, ph), (0, pw)))
    hp, wp = packed.shape[-2:]

    l = lights.rows.shape[0]
    l_pad = max(128, -(-l // 128) * 128)
    table_t = jnp.pad(lights.rows, ((0, l_pad - l), (0, 0))).T

    grid = (hp // _BH, wp // _BW)
    outs = pl.pallas_call(
        functools.partial(_ris_kernel, s * iterations, k_lanes, num_lights,
                          lane_counts,
                          getattr(lights, "const_cols", None),
                          getattr(lights, "affine_segments", None),
                          int(uniform_shin) if uniform_shin else None,
                          False, "romis" if romis else "rmis", k,
                          compact),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_CTX_PLANES, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, _BH, _BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, hp, wp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), packed, table_t)
    return outs[:, :h, :w]


def gen_canonical_replay_pallas(
    seed: jnp.ndarray,  # [] int32
    ctx: ShadeCtx,
    lights,
    num_lights: int,
    features: Features,
    uniform_shin: float = None,
    interpret: bool = False,
):
    """Detached RIS forward for the surrogate gradient
    (ops/wrs._gen_canonical_surrogate): runs the fused candidate loop with
    TWO independent races and returns only the per-lane replay records —
    (w_sum [K, H, W], replay1, replay2), each replay a (light index f32,
    u1, u2) tuple of [K, H, W] planes. The reservoir is re-derived
    differentiably from these records by the caller."""
    from .wrs import _lane_layout

    h, w = ctx.depth_t.shape[-2:]
    s = features.initial_light_samples
    k = features.num_samples_in_reservoir
    _, lane_counts, _ = _lane_layout(s, k)

    packed = pack_ctx(ctx)
    ph = (-h) % _BH
    pw = (-w) % _BW
    if ph or pw:
        packed = jnp.pad(packed, ((0, 0), (0, ph), (0, pw)))
    hp, wp = packed.shape[-2:]

    l = lights.rows.shape[0]
    l_pad = max(128, -(-l // 128) * 128)
    table_t = jnp.pad(lights.rows, ((0, l_pad - l), (0, 0))).T

    grid = (hp // _BH, wp // _BW)
    out_shape = tuple(
        jax.ShapeDtypeStruct((hp, wp), jnp.float32) for _ in range(7 * k))
    out_specs = tuple(
        pl.BlockSpec((_BH, _BW), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM) for _ in range(7 * k))
    outs = pl.pallas_call(
        functools.partial(_ris_kernel, s, k, num_lights,
                          tuple(float(c) for c in lane_counts),
                          getattr(lights, "const_cols", None),
                          getattr(lights, "affine_segments", None),
                          int(uniform_shin) if uniform_shin else None,
                          True, None, None, False),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_CTX_PLANES, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), packed, table_t)

    def lane_stack(i):
        return jnp.stack([outs[lane * 7 + i][:h, :w] for lane in range(k)])

    w_sum = lane_stack(0)
    replay1 = (lane_stack(1), lane_stack(2), lane_stack(3))
    replay2 = (lane_stack(4), lane_stack(5), lane_stack(6))
    return w_sum, replay1, replay2
