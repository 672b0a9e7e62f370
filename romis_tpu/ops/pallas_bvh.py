"""Pallas TPU wavefront BVH traversal over the paged layout (ops/bvh.py).

This is the large-scene replacement for Embree's rtcIntersect1/rtcOccluded1
(reference: src/ray_tracing/embree_interface.cpp:58-90) that the fused
triangle-soup kernels (ops/pallas_trace.py, <= 2048 tris in SMEM) cannot
cover. Design:

- The SAH tree is cut into fixed-size triangle PAGES (<= PAGE_TRIS tris,
  contiguous in the reordered triangle arrays); the tree ABOVE the cuts — a
  few hundred nodes even at 10^5 triangles — lives in SMEM as a threaded
  skip-link table (DFS preorder, first child = node+1).
- One ray TILE per grid step walks the top tree with a single scalar cursor
  (`lax.while_loop`): per node a vectorised slab test of every ray in the
  tile against the node box decides descend vs skip — the tile IS the
  wavefront, and the walk is tile-coherent (a node is entered if ANY ray
  wants it), the TPU-shaped replacement for Embree's per-ray stack.
- Page leaves DMA their 32 KB record HBM->SMEM on demand; inside a page the
  per-PAGE_BLK block AABBs (shipped in the record's spare rows) provide
  fine-grained culling, and live blocks run the same Python-unrolled
  scalar-broadcast Möller–Trumbore step as the soup kernel.
- Closest hit prunes with the running per-ray best t (read fresh from the
  output ref at every node), so pages behind committed hits are skipped
  without any front-to-back ordering; any-hit terminates the walk early
  once the whole tile is occluded.

Measured (TPU v5e, monkey_field 5x5 = 24,202 tris, 1080p,
scripts/bvh_bench.py): closest 30.2 ms/query (68.8 Mray/s) vs 19.07 s for
the XLA lockstep while_loop (ops/traverse.py) — 632x; any-hit incl. the
shared closest pass 53.0 ms vs 18.07 s — 341x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import PAGE_BLK, PagedBVH
from .pallas_trace import _inv_dir, _mt_occluded_tri, _mt_scalar_tri, _pad_hw

_BH, _BW = 32, 256  # ray tile (the wavefront) per grid step
_BH_ANY, _BW_ANY = 32, 256
# The K-lane shared-walk kernel lives on much smaller tiles: a node/page/
# block is entered when ANY of bh·bw pixels × K lanes overlaps it, so
# wide tiles mean near-zero culling for divergent per-pixel ray batches.
# Sweep on config 7 (monkey_field 5x5, D1·K=12 ext_vis rays, corrected
# non-hoisting protocol): 32x256: 436, 16x256: 392, 8x256: 372,
# 16x128: 284, 8x128: 297, 8x512: 545 ms/iter.
_BH_ANYK, _BW_ANYK = 16, 128


def _node_slab(nodes_ref, c, ox, oy, oz, ix, iy, iz):
    """Slab test of the whole ray tile against top-tree node c's box
    (6 scalar SMEM reads broadcast against the ray vregs)."""
    tx0 = (nodes_ref[0, c] - ox) * ix
    tx1 = (nodes_ref[3, c] - ox) * ix
    ty0 = (nodes_ref[1, c] - oy) * iy
    ty1 = (nodes_ref[4, c] - oy) * iy
    tz0 = (nodes_ref[2, c] - oz) * iz
    tz1 = (nodes_ref[5, c] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.minimum(tz0, tz1))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.maximum(tz0, tz1))
    return tn, tf


def _block_slab(pg_ref, b, ox, oy, oz, ix, iy, iz):
    """Slab test against in-page block b's AABB (record rows 10-15)."""
    tx0 = (pg_ref[10, b] - ox) * ix
    tx1 = (pg_ref[13, b] - ox) * ix
    ty0 = (pg_ref[11, b] - oy) * iy
    ty1 = (pg_ref[14, b] - oy) * iy
    tz0 = (pg_ref[12, b] - oz) * iz
    tz1 = (pg_ref[15, b] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.minimum(tz0, tz1))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.maximum(tz0, tz1))
    return tn, tf


def _closest_kernel(n_blocks: int,
                    nodes_f_ref, nodes_i_ref, pfirst_ref, pages_hbm,
                    o_ref, d_ref, tmax_ref,
                    t_ref, tri_ref, u_ref, v_ref, pg, sem):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    ix, iy, iz = _inv_dir(dx, dy, dz)
    shape = ox.shape

    t_ref[...] = tmax_ref[...]
    tri_ref[...] = jnp.full(shape, -1, jnp.int32)
    u_ref[...] = jnp.zeros(shape)
    v_ref[...] = jnp.zeros(shape)

    def tri_step(base, s, carry):
        best_t, best_i, best_u, best_v = carry
        v0 = (pg[0, s], pg[1, s], pg[2, s])
        e1 = (pg[3, s], pg[4, s], pg[5, s])
        e2 = (pg[6, s], pg[7, s], pg[8, s])
        active = pg[9, s] > 0.0
        t, u, v, ok = _mt_scalar_tri(ox, oy, oz, dx, dy, dz, v0, e1, e2)
        ok = ok & (t < best_t) & active
        return (jnp.where(ok, t, best_t),
                jnp.where(ok, base + s, best_i),
                jnp.where(ok, u, best_u),
                jnp.where(ok, v, best_v))

    def process_page(page):
        pltpu.make_async_copy(pages_hbm.at[page], pg, sem).wait()
        base = pfirst_ref[page]

        def blk_body(b, _):
            btn, btf = _block_slab(pg, b, ox, oy, oz, ix, iy, iz)
            blive = (btf >= btn) & (btf > 0.0) & (btn < t_ref[...])

            @pl.when(jnp.any(blive))
            def _():
                carry = (t_ref[...], tri_ref[...], u_ref[...], v_ref[...])
                for i in range(PAGE_BLK):
                    carry = tri_step(base, b * PAGE_BLK + i, carry)
                t_ref[...], tri_ref[...], u_ref[...], v_ref[...] = carry

            return 0

        jax.lax.fori_loop(0, n_blocks, blk_body, 0)

    def body(cursor):
        tn, tf = _node_slab(nodes_f_ref, cursor, ox, oy, oz, ix, iy, iz)
        live_v = (tn <= tf) & (tf > 0.0) & (tn < t_ref[...])
        live = jnp.any(live_v)
        miss = nodes_i_ref[0, cursor]
        page = nodes_i_ref[1, cursor]

        @pl.when(live & (page >= 0))
        def _():
            pltpu.make_async_copy(pages_hbm.at[page], pg, sem).start()
            process_page(page)

        return jnp.where(live & (page < 0), cursor + 1, miss)

    jax.lax.while_loop(lambda c: c >= 0, body, jnp.int32(0))


def occlusion_paged_into(n_blocks: int, nodes_f_ref, nodes_i_ref, pages_hbm,
                         ox, oy, oz, dx, dy, dz, t_max, occf_ref, pg, sem):
    """Paged any-hit walk accumulating into the f32 scratch occf_ref (1.0 =
    occluded; Mosaic cannot carry bools). The walk dies early once every
    ray in the tile is occluded. Backs the any-hit kernel; the large-scene
    fused final-shade kernel rides the K-lane shared-walk variant below
    (occlusion_paged_k_into)."""
    ix, iy, iz = _inv_dir(dx, dy, dz)
    occf_ref[...] = jnp.zeros(ox.shape, jnp.float32)

    def tri_step(s, occ):
        v0 = (pg[0, s], pg[1, s], pg[2, s])
        e1 = (pg[3, s], pg[4, s], pg[5, s])
        e2 = (pg[6, s], pg[7, s], pg[8, s])
        active = pg[9, s] > 0.0
        hit = (_mt_occluded_tri(ox, oy, oz, dx, dy, dz, t_max, v0, e1, e2)
               & active)
        return jnp.maximum(occ, hit.astype(jnp.float32))

    def process_page(page):
        pltpu.make_async_copy(pages_hbm.at[page], pg, sem).wait()

        def blk_body(b, _):
            btn, btf = _block_slab(pg, b, ox, oy, oz, ix, iy, iz)
            occ = occf_ref[...]
            blive = ((btf >= btn) & (btf > 0.0) & (btn < t_max)
                     & (occ < 0.5))

            @pl.when(jnp.any(blive))
            def _():
                acc = occ
                for i in range(PAGE_BLK):
                    acc = tri_step(b * PAGE_BLK + i, acc)
                occf_ref[...] = acc

            return 0

        jax.lax.fori_loop(0, n_blocks, blk_body, 0)

    def body(cursor):
        tn, tf = _node_slab(nodes_f_ref, cursor, ox, oy, oz, ix, iy, iz)
        live_v = ((tn <= tf) & (tf > 0.0) & (tn < t_max)
                  & (occf_ref[...] < 0.5))
        live = jnp.any(live_v)
        miss = nodes_i_ref[0, cursor]
        page = nodes_i_ref[1, cursor]

        @pl.when(live & (page >= 0))
        def _():
            pltpu.make_async_copy(pages_hbm.at[page], pg, sem).start()
            process_page(page)

        return jnp.where(live & (page < 0), cursor + 1, miss)

    jax.lax.while_loop(lambda c: c >= 0, body, jnp.int32(0))


def occlusion_paged_k_into(n_blocks: int, nodes_f_ref, nodes_i_ref,
                           pages_hbm, rays, occf_ref, pg, sem):
    """K-lane paged any-hit: ONE top-tree walk and ONE page DMA stream
    shared by all K shadow-ray tiles (rays = list of
    (ox, oy, oz, dx, dy, dz, t_max) per lane), accumulating into
    occf_ref [K, bh, bw] (1.0 = occluded). A node/page/block is entered if
    ANY lane's still-unoccluded rays overlap it — per-lane walks would
    re-DMA every page K times; sharing amortizes the HBM traffic and the
    ~30 scalar SMEM fetches per triangle over the lanes (the same trade
    measured for the soup kernel, pallas_shade._occlusion_k_into). Backs
    the large-scene fused final-shade kernel
    (pallas_shade.final_shade_paged_pallas)."""
    k = len(rays)
    inv = [_inv_dir(r[3], r[4], r[5]) for r in rays]
    for lane in range(k):
        occf_ref[lane] = jnp.zeros(rays[lane][0].shape, jnp.float32)

    def tri_step(s, acc):
        v0 = (pg[0, s], pg[1, s], pg[2, s])
        e1 = (pg[3, s], pg[4, s], pg[5, s])
        e2 = (pg[6, s], pg[7, s], pg[8, s])
        active = pg[9, s] > 0.0
        out = []
        for lane in range(k):
            ox, oy, oz, dx, dy, dz, t_max = rays[lane]
            hit = (_mt_occluded_tri(ox, oy, oz, dx, dy, dz, t_max,
                                    v0, e1, e2) & active)
            out.append(jnp.maximum(acc[lane], hit.astype(jnp.float32)))
        return out

    def process_page(page):
        pltpu.make_async_copy(pages_hbm.at[page], pg, sem).wait()

        def blk_body(b, _):
            occ = [occf_ref[lane] for lane in range(k)]
            live = None
            for lane in range(k):
                ox, oy, oz, _, _, _, t_max = rays[lane]
                btn, btf = _block_slab(pg, b, ox, oy, oz, *inv[lane])
                ll = ((btf >= btn) & (btf > 0.0) & (btn < t_max)
                      & (occ[lane] < 0.5))
                live = ll if live is None else (live | ll)

            @pl.when(jnp.any(live))
            def _():
                acc = occ
                for i in range(PAGE_BLK):
                    acc = tri_step(b * PAGE_BLK + i, acc)
                for lane in range(k):
                    occf_ref[lane] = acc[lane]

            return 0

        jax.lax.fori_loop(0, n_blocks, blk_body, 0)

    def body(cursor):
        live = None
        for lane in range(k):
            ox, oy, oz, _, _, _, t_max = rays[lane]
            tn, tf = _node_slab(nodes_f_ref, cursor, ox, oy, oz,
                                *inv[lane])
            lv = ((tn <= tf) & (tf > 0.0) & (tn < t_max)
                  & (occf_ref[lane] < 0.5))
            live = lv if live is None else (live | lv)
        live = jnp.any(live)
        miss = nodes_i_ref[0, cursor]
        page = nodes_i_ref[1, cursor]

        @pl.when(live & (page >= 0))
        def _():
            pltpu.make_async_copy(pages_hbm.at[page], pg, sem).start()
            process_page(page)

        return jnp.where(live & (page < 0), cursor + 1, miss)

    jax.lax.while_loop(lambda c: c >= 0, body, jnp.int32(0))


def _any_kernel(n_blocks: int, nodes_f_ref, nodes_i_ref, pages_hbm,
                o_ref, d_ref, tmax_ref, occ_ref, pg, occf_ref, sem):
    occlusion_paged_into(
        n_blocks, nodes_f_ref, nodes_i_ref, pages_hbm,
        o_ref[0, 0], o_ref[0, 1], o_ref[0, 2],
        d_ref[0, 0], d_ref[0, 1], d_ref[0, 2],
        tmax_ref[0], occf_ref, pg, sem)
    occ_ref[0] = occf_ref[...] > 0.5


def paged_fits(paged: PagedBVH | None) -> bool:
    """Dispatch guard: a paged table exists and we compile for TPU (the
    kernels have no CPU lowering outside interpret mode)."""
    return paged is not None and jax.default_backend() == "tpu"


def paged_closest(rays, paged: PagedBVH, t_max=None, interpret: bool = False):
    """Closest hit via the paged wavefront kernel. Same contract as
    ops.intersect.intersect_closest: returns (t, tri, u, v) each [H, W],
    t = +inf / tri = -1 on miss."""
    h, w = rays.origin.shape[-2:]
    tm = jnp.full((h, w), jnp.inf) if t_max is None else t_max
    o, _, _ = _pad_hw(rays.origin, 8, 128)
    d, _, _ = _pad_hw(rays.direction, 8, 128)
    tm, _, _ = _pad_hw(tm, 8, 128)  # pad rays see t_max 0: never live
    hp, wp = o.shape[-2:]
    bh, bw = min(_BH, hp), min(_BW, wp)
    o, _, _ = _pad_hw(o, bh, bw)
    d, _, _ = _pad_hw(d, bh, bw)
    tm, _, _ = _pad_hw(tm, bh, bw)
    hp, wp = o.shape[-2:]

    n_blocks = paged.page_tris // PAGE_BLK
    grid = (hp // bh, wp // bw)
    ray_spec = pl.BlockSpec((3, bh, bw), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        functools.partial(_closest_kernel, n_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes_box
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes_link
            pl.BlockSpec(memory_space=pltpu.SMEM),  # page_first
            pl.BlockSpec(memory_space=pl.ANY),   # pages stay in HBM
            ray_spec, ray_spec, out_spec,
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((paged.pages.shape[1], paged.page_tris), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(paged.nodes_box, paged.nodes_link, paged.page_first, paged.pages,
      o, d, tm)
    t, tri, u, v = t[:h, :w], tri[:h, :w], u[:h, :w], v[:h, :w]
    miss = tri < 0
    return (jnp.where(miss, jnp.inf, t), tri,
            jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v))


def paged_any(origins, dirs, t_max, paged: PagedBVH,
              interpret: bool = False):
    """Occlusion query via the paged wavefront kernel. Same contract as
    ops.intersect.intersect_any: origins/dirs [..., 3, H, W], t_max
    [..., H, W] -> occluded bool [..., H, W]. Leading sample axes become an
    extra grid dimension (same reasoning as pallas_trace.pallas_any)."""
    lead = origins.shape[:-3]
    h, w = origins.shape[-2:]
    d_full = jnp.broadcast_to(dirs, origins.shape)
    o = origins.reshape((-1, 3, h, w))
    d = d_full.reshape((-1, 3, h, w))
    # t_max may be broadcastable rather than exactly matching (the XLA
    # intersect_any accepts e.g. [H, W] under leading sample axes).
    tm = jnp.broadcast_to(t_max, lead + (h, w)).reshape((-1, h, w))
    s = o.shape[0]

    o, hh, ww = _pad_hw(o, 8, 128)
    d, _, _ = _pad_hw(d, 8, 128)
    tm, _, _ = _pad_hw(tm, 8, 128)
    hp, wp = o.shape[-2:]
    bh, bw = min(_BH_ANY, hp), min(_BW_ANY, wp)
    o, _, _ = _pad_hw(o, bh, bw)
    d, _, _ = _pad_hw(d, bh, bw)
    tm, _, _ = _pad_hw(tm, bh, bw)
    hp, wp = o.shape[-2:]

    n_blocks = paged.page_tris // PAGE_BLK
    grid = (s, hp // bh, wp // bw)
    ray_spec = pl.BlockSpec((1, 3, bh, bw), lambda si, i, j: (si, 0, i, j),
                            memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, bh, bw), lambda si, i, j: (si, i, j),
                           memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            ray_spec, ray_spec, sc_spec,
        ],
        out_specs=sc_spec,
        out_shape=jax.ShapeDtypeStruct((s, hp, wp), jnp.bool_),
        scratch_shapes=[
            pltpu.SMEM((paged.pages.shape[1], paged.page_tris), jnp.float32),
            pltpu.VMEM((bh, bw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(paged.nodes_box, paged.nodes_link, paged.pages, o, d, tm)
    occ = occ[:, :hh, :ww]
    return occ.reshape(lead + (h, w)) if lead else occ[0]


def _any_k_kernel(n_blocks: int, s: int, nodes_f_ref, nodes_i_ref,
                  pages_hbm, o_ref, d_ref, tmax_ref, occ_ref, pg, occf_ref,
                  sem):
    rays = [(o_ref[lane, 0], o_ref[lane, 1], o_ref[lane, 2],
             d_ref[lane, 0], d_ref[lane, 1], d_ref[lane, 2],
             tmax_ref[lane]) for lane in range(s)]
    occlusion_paged_k_into(n_blocks, nodes_f_ref, nodes_i_ref, pages_hbm,
                           rays, occf_ref, pg, sem)
    occ_ref[...] = occf_ref[...] > 0.5


# paged_any walks the tree once PER sample plane (leading axes become a
# grid dim); above this many planes the K-lane VMEM footprint (7 S planes
# per tile) stops paying for the shared walk.
PAGED_ANY_K_MAX = 16


def paged_any_k(origins, dirs, t_max, paged: PagedBVH,
                interpret: bool = False):
    """Shared-walk occlusion for a BATCH of shadow rays per pixel: the S
    leading sample planes run as K lanes of ONE kernel — one top-tree walk
    and one page DMA stream amortized over all S rays (occlusion_paged_k_into
    docstring), instead of paged_any's S independent walks. This is the
    large-scene analog of the soup path's shared-origin Z-count batching
    (pallas_trace.pallas_zcount_occ): the MIS ext_vis batch traces D1·K=12
    rays from one receiver per pixel (reference anyHit serves them as 12
    independent rtcOccluded1 calls, embree_interface.cpp:58-62 — on TPU the
    12 walks share every page fetch). Same contract as paged_any."""
    lead = origins.shape[:-3]
    h, w = origins.shape[-2:]
    d_full = jnp.broadcast_to(dirs, origins.shape)
    o = origins.reshape((-1, 3, h, w))
    d = d_full.reshape((-1, 3, h, w))
    tm = jnp.broadcast_to(t_max, lead + (h, w)).reshape((-1, h, w))
    s = o.shape[0]
    assert s <= PAGED_ANY_K_MAX

    o, hh, ww = _pad_hw(o, 8, 128)
    d, _, _ = _pad_hw(d, 8, 128)
    tm, _, _ = _pad_hw(tm, 8, 128)
    hp, wp = o.shape[-2:]
    bh, bw = min(_BH_ANYK, hp), min(_BW_ANYK, wp)
    o, _, _ = _pad_hw(o, bh, bw)
    d, _, _ = _pad_hw(d, bh, bw)
    tm, _, _ = _pad_hw(tm, bh, bw)
    hp, wp = o.shape[-2:]

    n_blocks = paged.page_tris // PAGE_BLK
    grid = (hp // bh, wp // bw)
    ray_spec = pl.BlockSpec((s, 3, bh, bw), lambda i, j: (0, 0, i, j),
                            memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((s, bh, bw), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_any_k_kernel, n_blocks, s),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            ray_spec, ray_spec, sc_spec,
        ],
        out_specs=sc_spec,
        out_shape=jax.ShapeDtypeStruct((s, hp, wp), jnp.bool_),
        scratch_shapes=[
            pltpu.SMEM((paged.pages.shape[1], paged.page_tris), jnp.float32),
            pltpu.VMEM((s, bh, bw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(paged.nodes_box, paged.nodes_link, paged.pages, o, d, tm)
    occ = occ[:, :hh, :ww]
    return occ.reshape(lead + (h, w)) if lead else occ[0]
