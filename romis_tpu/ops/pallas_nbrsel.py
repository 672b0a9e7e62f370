"""Fused similarity-driven neighbour selection for R-MIS / R-OMIS.

Reference analog: generateResampleIndicesGrid + indicesSimilarity
(src/rendering/neighbour_selection.cpp:45-122): per pixel, classify every
cell of the ±radius box as similar/dissimilar (areSimilar, cosine fix
applied) and sample D without replacement, preferring a class per strategy.

The XLA formulation (render/neighbours.py) streams the 440-cell box in
blocks through a lax.scan with a top-D max-extraction merge — ~100 ms/frame
at 1080p, memory-bound (every merge pass streams [13, H, W] score planes
through HBM). This kernel keeps the 5 gate planes (geom_id, depth, normal)
of the halo window in VMEM and runs the whole box scan per tile:

- per box offset (static 2D slice of the window): the areSimilar gates,
  one on-chip-PRNG Gumbel draw, and the class-offset score,
- a D-slot replace-min race per class keeps the running top-D in registers
  (equivalent to Gumbel top-D = uniform sampling without replacement within
  the preferred class, exactly the XLA path's estimator contract),
- outputs are the per-slot scores + packed offsets (and, for
  EqualSimilarDissimilar, per-class slots + class counts) — the tiny
  deficit/fallback logic stays in XLA (render/neighbours.py tail).

RNG: pltpu PRNG per tile (different stream from the XLA path's threefry —
same selection distribution, different draws; the usual kernel contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spatial import _BW, _halo_window, _u01, pad_halo, pick_tile_h
from .pallas_trace import _pad_hw

_BIG_NEG = -3.0e38  # empty-slot sentinel ("-inf" that survives compares)
_CLASS_OFFSET = 1e6  # render/neighbours._CLASS_OFFSET


def _race_insert(slots, score, payload):
    """Insert (score, payload const) into the D-slot replace-min race.
    slots = list of (score_plane, payload_plane); payload is a Python
    float (the packed offset). The ~replaced chain keeps the race exact
    under score ties (f32 Gumbel collisions happen at the 1e-4/pixel
    level over a 440-candidate box)."""
    m = slots[0][0]
    for s, _ in slots[1:]:
        m = jnp.minimum(m, s)
    is_new = score > m
    replaced = jnp.zeros_like(is_new)
    out = []
    for s, p in slots:
        do = is_new & (s == m) & ~replaced
        out.append((jnp.where(do, score, s), jnp.where(do, payload, p)))
        replaced = replaced | do
    return out


def _nbrsel_kernel(d: int, radius: int, two_classes: bool,
                   prefer_similar: bool, same_geom: bool, depth_frac: float,
                   normal_cos: float, h_real: int, w_real: int, bh: int,
                   seed_ref, cen_ref, gates_hbm, *refs):
    """Outputs: one class → (scores [D], packs [D]); two classes →
    (sim_scores [D], sim_packs [D], dis_scores [D], dis_packs [D],
    counts [2]). Gate plane order (render/neighbours.py `gate`):
    geom_id | depth | normal3."""
    bw = _BW
    he, we = _halo_window(radius, bh, bw)
    if two_classes:
        (s_sim_ref, p_sim_ref, s_dis_ref, p_dis_ref, cnt_ref, scratch,
         sem) = refs
    else:
        s_ref, p_ref, scratch, sem = refs

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + ti * 26041 + tj * 947)

    dma = pltpu.make_async_copy(
        gates_hbm.at[:, pl.ds(ti * bh, he), pl.ds(tj * bw, we)],
        scratch, sem)
    dma.start()
    dma.wait()

    c_geom, c_depth = cen_ref[0], cen_ref[1]
    c_nx, c_ny, c_nz = cen_ref[2], cen_ref[3], cen_ref[4]

    # Absolute pixel coordinates for the in-bounds gate (the reference
    # iterates the window clamped to the screen,
    # neighbour_selection.cpp:55-58).
    row_abs = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
               + ti * bh)
    col_abs = (jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
               + tj * bw)

    tiles = [scratch[c] for c in range(5)]
    zero = jnp.zeros((bh, bw), jnp.float32)
    sent = [_BIG_NEG * (1.0 - 1e-3 * i) for i in range(d)]
    race_a = [(zero + sent[i], zero - 1.0) for i in range(d)]
    race_b = [(zero + sent[i], zero - 1.0) for i in range(d)] \
        if two_classes else None
    cnt_sim = zero
    cnt_dis = zero

    side = 2 * radius + 1
    for dy in range(-radius, radius + 1):
        rows = [t[radius + dy:radius + dy + bh, :] for t in tiles]
        row_ok = (row_abs + dy >= 0) & (row_abs + dy < h_real)
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue  # self never competes (self is slot 0 in XLA)
            nb = [r[:, radius + dx:radius + dx + bw] for r in rows]
            in_b = row_ok & (col_abs + dx >= 0) & (col_abs + dx < w_real)

            sim = jnp.ones((bh, bw), bool)
            if same_geom:
                sim &= nb[0] == c_geom
            df = jnp.abs(1.0 - c_depth / jnp.maximum(nb[1], 1e-20))
            sim &= df <= depth_frac
            ndot = nb[2] * c_nx + nb[3] * c_ny + nb[4] * c_nz
            sim &= ndot >= normal_cos

            # Uniform-score race: within a class every candidate has equal
            # weight, so top-D of i.i.d. u01 IS uniform sampling without
            # replacement — identical distribution to the Gumbel race at
            # zero log-weight, minus 2 transcendental logs per offset
            # (880 VPU transcendentals/pixel over the 440-cell box).
            g = _u01(pltpu.bitcast(pltpu.prng_random_bits((bh, bw)),
                                   jnp.uint32))
            pack = float((dy + radius) * side + (dx + radius))
            if two_classes:
                s_sim = jnp.where(in_b & sim, g, _BIG_NEG)
                s_dis = jnp.where(in_b & ~sim, g, _BIG_NEG)
                race_a = _race_insert(race_a, s_sim, pack)
                race_b = _race_insert(race_b, s_dis, pack)
                cnt_sim = cnt_sim + jnp.where(in_b & sim, 1.0, 0.0)
                cnt_dis = cnt_dis + jnp.where(in_b & ~sim, 1.0, 0.0)
            else:
                cls = sim if prefer_similar else ~sim
                score = jnp.where(
                    in_b, g + jnp.where(cls, _CLASS_OFFSET, 0.0), _BIG_NEG)
                race_a = _race_insert(race_a, score, pack)

    def sort_desc(slots):
        """Score-descending sorting network (the deficit tail in
        render/neighbours.py consumes slots in rank order; empty sentinels
        sink to the tail). Optimal 9-comparator network for n=5; odd-even
        transposition for other D."""
        slots = list(slots)
        if len(slots) == 5:
            pairs = [(0, 1), (3, 4), (2, 4), (2, 3), (0, 3), (0, 2),
                     (1, 4), (1, 3), (1, 2)]
        else:
            n = len(slots)
            pairs = [(i, i + 1) for r in range(n)
                     for i in range(r % 2, n - 1, 2)]
        for a, b in pairs:
            (sa, pa), (sb, pb) = slots[a], slots[b]
            swap = sb > sa
            slots[a] = (jnp.where(swap, sb, sa), jnp.where(swap, pb, pa))
            slots[b] = (jnp.where(swap, sa, sb), jnp.where(swap, pa, pb))
        return slots

    if two_classes:
        race_a = sort_desc(race_a)
        race_b = sort_desc(race_b)
        for i in range(d):
            s_sim_ref[i] = race_a[i][0]
            p_sim_ref[i] = race_a[i][1]
            s_dis_ref[i] = race_b[i][0]
            p_dis_ref[i] = race_b[i][1]
        cnt_ref[0] = cnt_sim
        cnt_ref[1] = cnt_dis
    else:
        race_a = sort_desc(race_a)
        for i in range(d):
            s_ref[i] = race_a[i][0]
            p_ref[i] = race_a[i][1]


def neighbour_select_pallas(
    seed,
    gates: jnp.ndarray,  # [5, H, W]: geom_id | depth | normal3
    d: int,
    radius: int,
    two_classes: bool,
    prefer_similar: bool,
    same_geom: bool,
    depth_frac: float,
    normal_cos: float,
    interpret: bool = False,
):
    """Box scan + per-class top-D races → (scores [D, H, W],
    packs [D, H, W]) or, two_classes, (sim_scores, sim_packs, dis_scores,
    dis_packs, counts [2, H, W]). packs hold (dy+r)*(2r+1)+(dx+r) as f32,
    -1 where the slot is empty (score at the sentinel)."""
    if radius > 64:
        raise ValueError("fused neighbour selection supports radius <= 64")
    _, h, w = gates.shape
    # The unrolled 440-offset scan spills aggressively — at bh=40 the
    # scoped-VMEM value stack exceeds the 16 MB limit (19.4 MB measured).
    # bh=32 measured best of {8: 59.2, 16: 85.5, 24: 62.0, 32: 54.5} ms at
    # 1080p (1080 % 32 != 0 costs a 3.7% pad row band — still fastest).
    bh = min(pick_tile_h(h), 32) if h % 32 == 0 or h >= 256 else \
        min(pick_tile_h(h), 24)
    gates_pad = pad_halo(gates, radius, bh, mode="constant")
    cen, _, _ = _pad_hw(gates, bh, _BW)
    hp, wp = cen.shape[-2:]
    he, we = _halo_window(radius, bh)
    grid = (hp // bh, wp // _BW)

    tile = lambda c: pl.BlockSpec((c, bh, _BW), lambda i, j: (0, i, j),
                                  memory_space=pltpu.VMEM)
    n_out = 5 if two_classes else 2
    sizes = ((d, d, d, d, 2) if two_classes else (d, d))
    outs = pl.pallas_call(
        functools.partial(_nbrsel_kernel, d, radius, two_classes,
                          prefer_similar, same_geom, depth_frac, normal_cos,
                          h, w, bh),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            tile(5),  # center gates
            pl.BlockSpec(memory_space=pl.ANY),  # gate halo planes (HBM)
        ],
        out_specs=tuple(tile(c) for c in sizes),
        out_shape=tuple(jax.ShapeDtypeStruct((c, hp, wp), jnp.float32)
                        for c in sizes),
        scratch_shapes=[
            pltpu.VMEM((5, he, we), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), cen, gates_pad)
    return tuple(o[:, :h, :w] for o in outs)
