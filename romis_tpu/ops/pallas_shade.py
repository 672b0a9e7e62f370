"""Fused final-shading Pallas kernel: shadow visibility + Phong + W-weighted
lane average in one pass over the image.

Reference analog: finalShading (src/rendering/render_utils.cpp:54-65) =
testVisibilityLightSample (utils.cpp:41-56) x computeShading
(shading.cpp:7-34) x outputWeight, averaged over the K reservoir lanes.

The XLA path materialises the K shadow-ray bundles (origins/dirs/t_max,
~14 planes), runs the any-hit kernel, then re-reads the shading context for
the Phong pass — ~12 ms at 1080p, of which ~10 ms is the (compute-bound)
any-hit. Fusing keeps the receiver context and reservoir planes in VMEM for
both the trace and the shade: one read of 38 input planes, 3 planes out,
and the Phong arithmetic rides along with the occlusion loop for free.

Semantics match ops/wrs.visibility + ops/shading.phong_shade exactly
(same epsilons, NaN scrubs, grad-safe norms); gradients are provided by the
re-evaluation custom_vjp in render/restir.py, not by this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_trace import (
    TRI_UNROLL,
    _blocks,
    _block_aabbs,
    _inv_dir,
    _mt_occluded_tri,
    _pad_hw,
    _slab_test,
    _tri_columns,
)

_BH, _BW = 32, 256

_SHADOW_EPS = 1e-3  # ops/wrs.SHADOW_RAY_EPSILON (reference utils.h:16)
_ZERO_EPS = 1e-5  # ops/shading.ZERO_EPSILON (reference utils.h:19)


def _safe_norm3(x, y, z, eps=1e-30):
    """core/vec.vnorm on component planes: exactly 0 for the zero vector."""
    sq = x * x + y * y + z * z
    ok = sq > eps
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)


def _occlusion_k_into(n_tris: int, k: int, trix_ref, aabb_ref, rays,
                      occf_ref):
    """Occlusion of K ray tiles in ONE triangle-block loop, accumulated into
    occf_ref [K, bh, bw] (1.0 = occluded). Sharing the loop across lanes
    amortizes the ~30 scalar SMEM fetches per triangle over all K lanes and
    interleaves K independent dependency chains for the VPU. A block is
    processed when ANY lane's still-unoccluded rays overlap its AABB
    (per-lane culling would re-fetch the triangles per lane — a net loss at
    K=2). rays = list of (ox, oy, oz, dx, dy, dz, t_max) per lane."""
    inv = [_inv_dir(r[3], r[4], r[5]) for r in rays]

    for lane in range(k):
        occf_ref[lane] = jnp.zeros(rays[lane][0].shape, jnp.float32)

    def body(b, _):
        occ = [occf_ref[lane] for lane in range(k)]
        live = None
        for lane in range(k):
            ox, oy, oz, _, _, _, t_max = rays[lane]
            tn, tf = _slab_test(aabb_ref, b, ox, oy, oz, *inv[lane])
            ll = (tf >= tn) & (tf > 0.0) & (tn < t_max) & (occ[lane] < 0.5)
            live = ll if live is None else (live | ll)

        @pl.when(jnp.any(live))
        def _process():
            acc = list(occ)
            for i in range(TRI_UNROLL):
                j = b * TRI_UNROLL + i
                v0 = (trix_ref[0, j], trix_ref[1, j], trix_ref[2, j])
                e1 = (trix_ref[3, j], trix_ref[4, j], trix_ref[5, j])
                e2 = (trix_ref[6, j], trix_ref[7, j], trix_ref[8, j])
                active = trix_ref[9, j] > 0.0
                for lane in range(k):
                    ox, oy, oz, dx, dy, dz, t_max = rays[lane]
                    hit = (_mt_occluded_tri(ox, oy, oz, dx, dy, dz, t_max,
                                            v0, e1, e2) & active)
                    acc[lane] = jnp.maximum(acc[lane],
                                            hit.astype(jnp.float32))
            for lane in range(k):
                occf_ref[lane] = acc[lane]

        return 0

    jax.lax.fori_loop(0, _blocks(n_tris), body, 0)


def _shade_lane_setup(ctx_ref, res_ref, k):
    """Per-lane shadow-ray setup (ops/wrs.visibility semantics) + the
    shared receiver context. Returns (shared, rays, lane_state); rays is
    the list of (ox, oy, oz, dx, dy, dz, t_max) tuples the occlusion loops
    consume. Dead-ray diet: where the contribution is provably zero (miss
    pixel, light behind the surface, or zero W) the visibility result is
    never read — zero t_max so those rays stop keeping triangle blocks /
    BVH pages alive in the culling loops."""
    px, py, pz = ctx_ref[0], ctx_ref[1], ctx_ref[2]
    nx, ny, nz = ctx_ref[3], ctx_ref[4], ctx_ref[5]

    # View direction (shared by all lanes): v = normalize(view_origin - p).
    vx0 = ctx_ref[6] - px
    vy0 = ctx_ref[7] - py
    vz0 = ctx_ref[8] - pz
    vinv = jnp.reciprocal(jnp.maximum(_safe_norm3(vx0, vy0, vz0), 1e-20))
    vx, vy, vz = vx0 * vinv, vy0 * vinv, vz0 * vinv

    shin = ctx_ref[15]
    valid = ctx_ref[17] > 0.5
    shared = (nx, ny, nz, vx, vy, vz, shin, valid)

    rays = []
    lane_state = []
    for lane in range(k):
        lx = res_ref[3 * lane]
        ly = res_ref[3 * lane + 1]
        lz = res_ref[3 * lane + 2]
        big_w = res_ref[8 * k + lane]

        tox, toy, toz = lx - px, ly - py, lz - pz

        # Phong light direction (needed before the trace for dead-ray
        # gating; ops/shading.phong_shade semantics).
        dist2 = tox * tox + toy * toy + toz * toz
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
        pinv = jnp.reciprocal(jnp.maximum(dist, 1e-20))
        plx, ply, plz = tox * pinv, toy * pinv, toz * pinv
        dot_nl = nx * plx + ny * ply + nz * plz

        vdist = _safe_norm3(tox, toy, toz)
        dinv = jnp.reciprocal(jnp.maximum(vdist, 1e-20))
        ldx, ldy, ldz = tox * dinv, toy * dinv, toz * dinv
        ox = px + _SHADOW_EPS * ldx
        oy = py + _SHADOW_EPS * ldy
        oz = pz + _SHADOW_EPS * ldz
        t_max = _safe_norm3(lx - ox, ly - oy, lz - oz)
        live = valid & (dot_nl >= 0.0) & (big_w != 0.0)
        t_max = jnp.where(live, t_max, 0.0)
        rays.append((ox, oy, oz, ldx, ldy, ldz, t_max))
        lane_state.append((big_w, dist, plx, ply, plz, dot_nl, vdist))

    return shared, rays, lane_state


def _shade_phong_accum(shin_n, k, shared, lane_state, ctx_ref, res_ref,
                       occf_ref, out_ref):
    """Phong x vis x W lane average (ops/shading.phong_shade semantics)
    given per-lane occlusion flags in occf_ref [K, bh, bw]."""
    nx, ny, nz, vx, vy, vz, shin, valid = shared
    kdx, kdy, kdz = ctx_ref[9], ctx_ref[10], ctx_ref[11]
    ksx, ksy, ksz = ctx_ref[12], ctx_ref[13], ctx_ref[14]

    acc = [jnp.zeros(nx.shape, jnp.float32) for _ in range(3)]
    for lane in range(k):
        big_w, dist, plx, ply, plz, dot_nl, vdist = lane_state[lane]
        cr = res_ref[3 * k + 3 * lane]
        cg = res_ref[3 * k + 3 * lane + 1]
        cb = res_ref[3 * k + 3 * lane + 2]
        vis = (occf_ref[lane] < 0.5) | (vdist <= _SHADOW_EPS)

        rx0 = 2.0 * dot_nl * nx - plx
        ry0 = 2.0 * dot_nl * ny - ply
        rz0 = 2.0 * dot_nl * nz - plz
        rinv = jnp.reciprocal(jnp.maximum(_safe_norm3(rx0, ry0, rz0), 1e-20))
        cos_t = (rx0 * vx + ry0 * vy + rz0 * vz) * rinv

        cos_safe = jnp.maximum(cos_t, 1e-12)
        if shin_n is not None:
            from .pallas_ris import _pow_int
            spec_pow = jnp.where(cos_t > 0.0, _pow_int(cos_safe, shin_n),
                                 0.0)
        else:
            spec_pow = jnp.where(
                cos_t > 0.0, jnp.exp(shin * jnp.log(cos_safe)), 0.0)

        falloff = jnp.where(dist < _ZERO_EPS, 1.0, dist)
        inv_f2 = jnp.reciprocal(falloff * falloff)

        # behind/valid gates + vis x W; the NaN scrub of phong_shade is
        # implicit — every input plane is finite by construction (packed
        # state is zeroed at misses) and dot_nl/spec_pow are finite.
        gate = jnp.where((dot_nl >= 0.0) & valid & vis, big_w * inv_f2, 0.0)
        for c, (kd_c, ks_c, col_c) in enumerate(
                ((kdx, ksx, cr), (kdy, ksy, cg), (kdz, ksz, cb))):
            out_c = col_c * (kd_c * dot_nl + ks_c * spec_pow)
            acc[c] = acc[c] + out_c * gate

    inv_k = 1.0 / float(k)
    for c in range(3):
        out_ref[c] = acc[c] * inv_k


def _shade_kernel(n_tris: int, k: int, shin_n, trix_ref, aabb_ref, ctx_ref,
                  res_ref, out_ref, occf_ref):
    """ctx_ref: [18, bh, bw] pack_center_ctx planes (position3 | normal3 |
    view3 | kd3 | ks3 | shin | depth | valid). res_ref: [10K, bh, bw]
    pack_pixel_planes reservoir order (pos 3K | color 3K | w_sum K | m K |
    big_w K | chosen_w K — the spatial pass's own output layout, so no
    re-pack copy between the passes and the shade). Output [3, bh, bw]
    pre-tone-map color."""
    shared, rays, lane_state = _shade_lane_setup(ctx_ref, res_ref, k)

    # ===== one shared occlusion loop over all K lanes =====
    _occlusion_k_into(n_tris, k, trix_ref, aabb_ref, rays, occf_ref)

    _shade_phong_accum(shin_n, k, shared, lane_state, ctx_ref, res_ref,
                       occf_ref, out_ref)


def _shade_paged_kernel(n_blocks: int, k: int, shin_n,
                        nodes_f_ref, nodes_i_ref, pages_hbm,
                        ctx_ref, res_ref, out_ref, pg, occf_ref, sem):
    """Large-scene variant of _shade_kernel: the K shadow-ray occlusions
    ride ONE shared paged-BVH walk (ops/pallas_bvh.occlusion_paged_k_into)
    instead of the SMEM triangle-soup loop — the fused final shade at any
    triangle count (reference: Embree handles this for free,
    embree_interface.cpp:58-90)."""
    from .pallas_bvh import occlusion_paged_k_into

    shared, rays, lane_state = _shade_lane_setup(ctx_ref, res_ref, k)
    occlusion_paged_k_into(n_blocks, nodes_f_ref, nodes_i_ref, pages_hbm,
                           rays, occf_ref, pg, sem)
    _shade_phong_accum(shin_n, k, shared, lane_state, ctx_ref, res_ref,
                       occf_ref, out_ref)


def final_shade_pallas(
    ctx_planes: jnp.ndarray,  # [18, H, W] pack_center_ctx
    res_planes: jnp.ndarray,  # [10K, H, W] pack_pixel_planes res order
    geometry,
    k: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused visibility x Phong x W lane average → color [3, H, W]
    (pre-tone-map)."""
    uniform_shin = getattr(geometry, "uniform_shin", None)
    ctx_p, h, w = _pad_hw(ctx_planes, _BH, _BW)
    res_p, _, _ = _pad_hw(res_planes, _BH, _BW)
    hp, wp = ctx_p.shape[-2:]

    trix = _tri_columns(geometry)
    aabbs = _block_aabbs(geometry, trix)

    grid = (hp // _BH, wp // _BW)
    out = pl.pallas_call(
        functools.partial(_shade_kernel, geometry.num_tris, k,
                          int(uniform_shin) if uniform_shin else None),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # triangles
            pl.BlockSpec(memory_space=pltpu.SMEM),  # block AABBs
            pl.BlockSpec((18, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10 * k, _BH, _BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, _BH, _BW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, _BH, _BW), jnp.float32)],
        interpret=interpret,
    )(trix, aabbs, ctx_p, res_p)
    return out[:, :h, :w]


def final_shade_paged_pallas(
    ctx_planes: jnp.ndarray,  # [18, H, W] pack_center_ctx
    res_planes: jnp.ndarray,  # [10K, H, W] pack_pixel_planes res order
    paged,  # ops.bvh.PagedBVH
    k: int,
    uniform_shin=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused visibility x Phong x W lane average through the paged BVH —
    the large-scene (>2048 tris) counterpart of final_shade_pallas. Same
    output contract: color [3, H, W], pre-tone-map."""
    from .bvh import PAGE_BLK

    ctx_p, h, w = _pad_hw(ctx_planes, _BH, _BW)
    res_p, _, _ = _pad_hw(res_planes, _BH, _BW)
    hp, wp = ctx_p.shape[-2:]
    bh, bw = min(_BH, hp), min(_BW, wp)

    n_blocks = paged.page_tris // PAGE_BLK
    grid = (hp // bh, wp // bw)
    out = pl.pallas_call(
        functools.partial(_shade_paged_kernel, n_blocks, k,
                          int(uniform_shin) if uniform_shin else None),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes_box
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nodes_link
            pl.BlockSpec(memory_space=pl.ANY),      # pages stay in HBM
            pl.BlockSpec((18, bh, bw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10 * k, bh, bw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, bh, bw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((paged.pages.shape[1], paged.page_tris), jnp.float32),
            pltpu.VMEM((k, bh, bw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(paged.nodes_box, paged.nodes_link, paged.pages, ctx_p, res_p)
    return out[:, :h, :w]
