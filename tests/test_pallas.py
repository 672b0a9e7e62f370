"""Pallas kernel correctness (interpret mode on CPU) and the custom_vjp
re-evaluation backward pass."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romis_tpu.core.types import Rays
from romis_tpu.ops.intersect import (
    closest_hit_diff, intersect_any, intersect_closest,
)
from romis_tpu.ops.pallas_trace import fits_pallas, pallas_any, pallas_closest
from romis_tpu.scene.scene import load_prebuilt

from helpers import make_rays, pack_scalar, unpack_scalar


def _rand_rays(rng, n, spread=2.0):
    origins = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return make_rays(origins, dirs)


def test_pallas_closest_matches_xla():
    scene = load_prebuilt("cornell_box")
    # fits_pallas is backend-gated (TPU only); interpret mode bypasses it.
    assert scene.geometry.num_tris <= 2048
    rng = np.random.default_rng(0)
    rays = _rand_rays(rng, 300)
    t_b, tri_b, u_b, v_b = intersect_closest(rays, scene.geometry)
    t_p, tri_p, u_p, v_p = pallas_closest(rays, scene.geometry,
                                          interpret=True)
    np.testing.assert_allclose(
        np.where(np.isfinite(unpack_scalar(t_b)), unpack_scalar(t_b), -1),
        np.where(np.isfinite(unpack_scalar(t_p)), unpack_scalar(t_p), -1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(unpack_scalar(tri_b), unpack_scalar(tri_p))
    np.testing.assert_allclose(unpack_scalar(u_b), unpack_scalar(u_p),
                               rtol=1e-4, atol=1e-6)


def test_pallas_any_matches_xla_with_leading_dims():
    scene = load_prebuilt("cornell_box")
    rng = np.random.default_rng(1)
    n, s = 64, 3
    origins = rng.uniform(-2, 2, (s, n, 3)).astype(np.float32)
    dirs = rng.normal(size=(s, n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = jnp.asarray(origins.transpose(0, 2, 1)[:, :, None, :])
    d = jnp.asarray(dirs.transpose(0, 2, 1)[:, :, None, :])
    t_max = jnp.full((s, 1, n), 1.5)
    occ_b = np.asarray(intersect_any(o, d, t_max, scene.geometry))
    occ_p = np.asarray(pallas_any(o, d, t_max, scene.geometry,
                                  interpret=True))
    np.testing.assert_array_equal(occ_b, occ_p)


def test_pallas_any_mxu_matches_xla():
    """The Plücker-matmul occlusion kernel (a kept negative-result
    exploration — see its docstring) must agree with the brute-force MT
    reference on random segments; a tiny sign-boundary mismatch budget
    covers the different f32 algebra."""
    from romis_tpu.ops.pallas_trace import pallas_any_mxu

    scene = load_prebuilt("cornell_box")
    rng = np.random.default_rng(3)
    n, s = 512, 3
    origins = rng.uniform(-2, 2, (s, n, 3)).astype(np.float32)
    dirs = rng.normal(size=(s, n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = jnp.asarray(origins.transpose(0, 2, 1)[:, :, None, :])
    d = jnp.asarray(dirs.transpose(0, 2, 1)[:, :, None, :])
    t_max = jnp.asarray(rng.uniform(0.3, 3.0, (s, 1, n)).astype(np.float32))
    occ_b = np.asarray(intersect_any(o, d, t_max, scene.geometry))
    occ_p = np.asarray(pallas_any_mxu(o, d, t_max, scene.geometry,
                                      interpret=True))
    assert (occ_b != occ_p).mean() <= 1e-3


def test_spatial_gather_kernel_structure():
    """Fused spatial neighbour gather (TPU-interpret emulation): every
    gathered value must come from the clamped ±radius window of the source
    pixel, identically across planes. (The TPU-interpret PRNG stub is
    deterministic, so offset *distributions* are validated on hardware —
    see the docstring of ops/pallas_spatial.py.)"""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_spatial import spatial_neighbour_gather_pallas

    h, w, r, n_nbr = 64, 200, 10, 2
    coord = (np.arange(h)[:, None] * 4096
             + np.arange(w)[None, :]).astype(np.float32)
    planes = np.stack([coord, coord * 2.0], axis=0)
    g = np.asarray(spatial_neighbour_gather_pallas(
        7, jnp.asarray(planes), n_nbr, r,
        interpret=pltpu.InterpretParams()))
    assert g.shape == (n_nbr, 2, h, w)
    v = g[:, 0]
    yy = (v // 4096).astype(int)
    xx = (v % 4096).astype(int)
    ys = np.arange(h)[None, :, None]
    xs = np.arange(w)[None, None, :]
    assert np.all((yy >= np.maximum(ys - r, 0))
                  & (yy <= np.minimum(ys + r, h - 1)))
    assert np.all((xx >= np.maximum(xs - r, 0))
                  & (xx <= np.minimum(xs + r, w - 1)))
    np.testing.assert_array_equal(g[:, 1], 2.0 * g[:, 0])


def test_ris_kernel_matches_wrs_semantics():
    """Fused RIS kernel (TPU-interpret emulation) vs a replay of the WRS
    bookkeeping. The interpret PRNG stub returns zeros: every candidate
    picks light 0 at its (u=0, v=0) corner, so all slots in a lane are
    identical — w_sum = count * w, winner = the common candidate, and
    W = wSum / (p_hat * M)."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_ris import gen_canonical_samples_pallas
    from romis_tpu.ops.shading import target_pdf
    from romis_tpu.ops.wrs import _lane_layout
    from romis_tpu.scene.lights import LightListBuilder
    from helpers import random_reservoirs_and_ctx

    h, w, k = 40, 150, 2
    feats = Features()
    _, ctx = random_reservoirs_and_ctx(np.random.default_rng(4), h, w, k)
    b = LightListBuilder()
    b.add_parallelogram((0.3, 2.0, 0.1), (0.4, 0, 0), (0, 0, 0.4),
                        (1.0, 0.9, 0.8), (0.5, 0.5, 0.5),
                        (0.2, 0.4, 0.6), (0.1, 0.1, 0.1))
    b.add_point((1.0, 1.5, -0.5), (2.0, 2.0, 2.0))
    lights = b.build()

    got = gen_canonical_samples_pallas(
        9, ctx, lights, len(b), feats, interpret=pltpu.InterpretParams())

    _, lane_counts, _ = _lane_layout(feats.initial_light_samples, k)
    pos0 = np.asarray(lights.rows[0, 0:3])  # v0 at u=v=0
    col0 = np.asarray(lights.rows[0, 9:12])  # c0 at u=v=0
    pos = jnp.broadcast_to(jnp.asarray(pos0)[:, None, None], (3, h, w))
    col = jnp.broadcast_to(jnp.asarray(col0)[:, None, None], (3, h, w))
    p_hat = np.asarray(target_pdf(ctx, pos, col, feats))  # [H, W]
    w_cand = p_hat * len(b)

    for lane in range(k):
        cnt = float(lane_counts[lane])
        np.testing.assert_allclose(np.asarray(got.w_sum[lane]),
                                   cnt * w_cand, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.m[lane]),
                                   np.full((h, w), cnt), rtol=1e-6)
        sel_mask = (w_cand > 0)[None]
        np.testing.assert_allclose(
            np.asarray(got.pos[lane]) * sel_mask, np.asarray(pos) * sel_mask,
            rtol=1e-5, atol=1e-6)
        cond = p_hat > 0
        expect_bw = np.where(cond, cnt * w_cand
                             / np.where(cond, p_hat * cnt, 1.0), 0.0)
        np.testing.assert_allclose(np.asarray(got.big_w[lane]), expect_bw,
                                   rtol=2e-3, atol=1e-4)


def test_rows_gather_matches_and_grads():
    """Planes-first packed row gather: pallas (interpret) == XLA == direct,
    and the custom_vjp backward scatter-adds into the table."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_rows import (
        _rows_gather_pallas, _rows_gather_xla, gather_rows,
    )

    rng = np.random.default_rng(8)
    t, c, h, w = 200, 7, 40, 150
    table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, (h, w)).astype(np.int32))

    direct = np.moveaxis(np.asarray(table)[np.asarray(idx)], -1, 0)
    np.testing.assert_array_equal(np.asarray(_rows_gather_xla(table, idx)),
                                  direct)
    np.testing.assert_array_equal(
        np.asarray(_rows_gather_pallas(table, idx,
                                       interpret=pltpu.InterpretParams())),
        direct)

    # Gradient: d/d_table of sum(weights * gather) is a weighted scatter.
    weights = jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32))
    g = jax.grad(lambda tb: jnp.sum(gather_rows(tb, idx) * weights))(table)
    expect = np.zeros((t, c), np.float32)
    np.add.at(expect, np.asarray(idx).ravel(),
              np.asarray(weights).reshape(c, -1).T)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-5)


def test_halo_offset_gather_exact():
    """Exact-offset halo gather (R-MIS/R-OMIS neighbour fetch) vs direct
    indexing — fully deterministic, offsets are inputs."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_spatial import halo_offset_gather_pallas

    h, w, r, d_n, c = 48, 180, 5, 3, 4
    rng = np.random.default_rng(6)
    planes = rng.normal(size=(c, h, w)).astype(np.float32)
    ys = np.arange(h)[None, :, None]
    xs = np.arange(w)[None, None, :]
    # In-bounds offsets within the box (what neighbour selection produces).
    ny = np.clip(ys + rng.integers(-r, r + 1, (d_n, h, w)), 0, h - 1)
    nx = np.clip(xs + rng.integers(-r, r + 1, (d_n, h, w)), 0, w - 1)
    dy = (ny - ys).astype(np.int32)
    dx = (nx - xs).astype(np.int32)

    got = np.asarray(halo_offset_gather_pallas(
        jnp.asarray(planes), jnp.asarray(dy), jnp.asarray(dx), r,
        interpret=pltpu.InterpretParams()))
    expect = planes[:, ny, nx].transpose(1, 0, 2, 3)  # [D, C, H, W]
    np.testing.assert_array_equal(got, expect)


def test_spatial_pass_kernel_matches_combine_semantics():
    """Fused spatial pass (TPU-interpret emulation) vs a replay of the
    combine_biased semantics. The interpret PRNG stub returns zeros, so all
    offsets are (-r, -r) and the exponential race clock is one constant —
    the winner is the first stream with maximal w, which we can replay
    exactly with the XLA building blocks."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_spatial import (
        pack_center_ctx, pack_gates, spatial_pass_pallas,
    )
    from romis_tpu.ops.shading import target_pdf
    from romis_tpu.render.restir import (
        SPATIAL_DEPTH_FRAC, SPATIAL_NORMAL_COS, pack_pixel_planes,
        pack_reservoir_planes, unpack_pixel_planes, unpack_reservoir_planes,
    )
    from helpers import random_reservoirs_and_ctx

    h, w, r, k, n_nbr = 40, 150, 3, 2, 2
    feats = Features()
    res, ctx = random_reservoirs_and_ctx(np.random.default_rng(3), h, w, k)

    planes = pack_pixel_planes(res, ctx)
    got = unpack_reservoir_planes(
        spatial_pass_pallas(5, pack_reservoir_planes(res), pack_gates(ctx),
                            pack_center_ctx(ctx), k, n_nbr, r,
                            interpret=pltpu.InterpretParams()), k)

    # Replay: every neighbour is the pixel at clamp(y-r, x-r).
    ys = np.clip(np.arange(h) - r, 0, h - 1)
    xs = np.clip(np.arange(w) - r, 0, w - 1)
    g = np.asarray(planes)[:, ys][:, :, xs]
    nbr, nbr_ctx = unpack_pixel_planes(jnp.asarray(g)[None], k)

    depth_ok = np.abs(
        1.0 - np.asarray(nbr_ctx.depth_t[0])
        / np.maximum(np.asarray(ctx.depth_t), 1e-20)) <= SPATIAL_DEPTH_FRAC
    normal_ok = np.sum(
        np.asarray(nbr_ctx.normal[0]) * np.asarray(ctx.normal), axis=0,
    ) >= SPATIAL_NORMAL_COS
    mask_nbr = (depth_ok & normal_ok & np.asarray(ctx.valid)
                & np.asarray(nbr_ctx.valid[0]))

    # Stream order in the kernel: self first, then n_nbr identical copies
    # of the gathered neighbour.
    def stack(field_self, field_nbr):
        return np.stack([field_self] + [field_nbr] * n_nbr, axis=0)

    p_self = np.asarray(target_pdf(ctx, res.pos, res.color, feats))
    p_nbr = np.asarray(target_pdf(ctx, nbr.pos[0], nbr.color[0], feats))
    p_hat = stack(p_self, p_nbr)  # [R+1, K, H, W]
    masks = stack(np.ones((h, w), bool), mask_nbr)[:, None]
    w_stream = (p_hat * stack(np.asarray(res.big_w), np.asarray(nbr.big_w[0]))
                * stack(np.asarray(res.m), np.asarray(nbr.m[0])) * masks)

    w_sum = w_stream.sum(axis=0)
    m_out = (stack(np.asarray(res.m), np.asarray(nbr.m[0])) * masks).sum(0)
    # First stream with maximal w wins (constant Gumbel, strict >).
    win = np.argmax(w_stream, axis=0)
    any_pos = (w_stream > 0).any(axis=0)
    take = np.take_along_axis
    sel_p_hat = take(p_hat, win[None], 0)[0] * any_pos
    pos_all = stack(np.asarray(res.pos), np.asarray(nbr.pos[0]))
    sel_pos = take(pos_all, win[:, None][None], 0)[0]
    cond = (sel_p_hat > 0) & (m_out > 0)
    big_w = np.where(cond, w_sum / np.where(cond, sel_p_hat * m_out, 1.0),
                     0.0)

    np.testing.assert_allclose(np.asarray(got.w_sum), w_sum, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.m), m_out, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.big_w), big_w, rtol=2e-3,
                               atol=1e-4)
    sel_mask = any_pos[:, None]
    np.testing.assert_allclose(np.asarray(got.pos) * sel_mask,
                               sel_pos * sel_mask, rtol=2e-4, atol=1e-5)


def test_zcount_occlusion_kernel_matches_visibility_from():
    """The fused shared-origin Z-count occlusion kernel must reproduce
    ops/wrs.visibility_from exactly: same (eps, dist) ray window, same
    coincident-pair escape (VERDICT r3 item 6)."""
    from romis_tpu.ops.pallas_trace import pallas_zcount_occ
    from romis_tpu.ops.wrs import visibility_from

    scene = load_prebuilt("cornell_box")
    rng = np.random.default_rng(11)
    r_n, k_n, h, w = 4, 2, 16, 24
    origins = jnp.asarray(rng.uniform(-1.2, 1.2, (r_n, 3, h, w)),
                          jnp.float32)
    targets = jnp.asarray(rng.uniform(-1.2, 1.2, (k_n, 3, h, w)),
                          jnp.float32)
    # Exercise the coincident escape on a few pixels.
    targets = targets.at[0, :, 0, 0].set(origins[0, :, 0, 0])

    occ = pallas_zcount_occ(origins, targets, scene.geometry,
                            interpret=True)  # [R, K, h, w]
    vis_ref = visibility_from(origins[:, None], targets[None],
                              scene.geometry)
    np.testing.assert_array_equal(np.asarray(~occ), np.asarray(vis_ref))


def test_zcount_block_cull_is_exact():
    """The plane-separation block cull (round 5) only skips triangle
    blocks PROVEN unreachable from the tile's origin/target boxes, so the
    occlusion output must be bitwise unchanged wherever the ray mask is
    alive — across random masks, clustered tiles (tight AABBs), and
    scattered ones (loose AABBs)."""
    from romis_tpu.ops.pallas_trace import pallas_zcount_occ

    scene = load_prebuilt("cornell_box")
    rng = np.random.default_rng(5)
    r_n, k_n, h, w = 3, 2, 16, 24
    # Clustered origins near the floor, targets near the ceiling light:
    # the regime the cull exploits (walls/ceiling separate cleanly).
    origins = jnp.asarray(
        rng.uniform(-0.3, 0.3, (r_n, 3, h, w)) + np.array(
            [0.0, -0.8, 0.0])[None, :, None, None], jnp.float32)
    targets = jnp.asarray(
        rng.uniform(-0.2, 0.2, (k_n, 3, h, w)) + np.array(
            [0.0, 0.9, 0.0])[None, :, None, None], jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(r_n, k_n, h, w)) > 0.3)

    occ_cull = pallas_zcount_occ(origins, targets, scene.geometry,
                                 mask=mask, block_cull=True, interpret=True)
    occ_ref = pallas_zcount_occ(origins, targets, scene.geometry,
                                mask=mask, block_cull=False, interpret=True)
    alive = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(occ_cull)[alive],
                                  np.asarray(occ_ref)[alive])

    # Wide-spread boxes (little to cull) must also stay exact.
    origins2 = jnp.asarray(rng.uniform(-1.2, 1.2, (r_n, 3, h, w)),
                           jnp.float32)
    targets2 = jnp.asarray(rng.uniform(-1.2, 1.2, (k_n, 3, h, w)),
                           jnp.float32)
    occ2c = pallas_zcount_occ(origins2, targets2, scene.geometry,
                              mask=mask, block_cull=True, interpret=True)
    occ2r = pallas_zcount_occ(origins2, targets2, scene.geometry,
                              mask=mask, block_cull=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ2c)[alive],
                                  np.asarray(occ2r)[alive])


@pytest.mark.parametrize("vis_check", [False, True],
                         ids=["novis", "vischeck"])
def test_spatial_pass_unbiased_kernel_matches_combine(vis_check):
    """Fused UNBIASED spatial pass (interpret: zero PRNG → offsets (-r,-r),
    constant race clock) vs a replay of combine_unbiased: no gates, m_out
    sums every stream, Z counts each input's m where the winner's target
    PDF at that input's own context (x its visibility when vis_check) is
    positive, W = wSum / (p_hat* x Z)."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_spatial import (
        pack_center_ctx, spatial_pass_unbiased_pallas,
    )
    from romis_tpu.ops.shading import target_pdf
    from romis_tpu.ops.wrs import visibility_from
    from romis_tpu.render.restir import (
        pack_pixel_planes, pack_reservoir_planes, unpack_pixel_planes,
        unpack_reservoir_planes,
    )
    from romis_tpu.scene.scene import load_prebuilt
    from helpers import random_reservoirs_and_ctx

    h, w, r, k, n_nbr = 40, 150, 3, 2, 2
    feats = Features()
    res, ctx = random_reservoirs_and_ctx(np.random.default_rng(3), h, w, k)
    geometry = load_prebuilt("cornell_box").geometry

    got = unpack_reservoir_planes(
        spatial_pass_unbiased_pallas(
            5, pack_reservoir_planes(res), pack_center_ctx(ctx), k, n_nbr,
            r, geometry=geometry, vis_check=vis_check,
            interpret=pltpu.InterpretParams()), k)

    planes = pack_pixel_planes(res, ctx)
    ys = np.clip(np.arange(h) - r, 0, h - 1)
    xs = np.clip(np.arange(w) - r, 0, w - 1)
    g = np.asarray(planes)[:, ys][:, :, xs]
    nbr, nbr_ctx = unpack_pixel_planes(jnp.asarray(g)[None], k)

    def stack(field_self, field_nbr):
        return np.stack([field_self] + [field_nbr] * n_nbr, axis=0)

    p_self = np.asarray(target_pdf(ctx, res.pos, res.color, feats))
    p_nbr = np.asarray(target_pdf(ctx, nbr.pos[0], nbr.color[0], feats))
    p_hat = stack(p_self, p_nbr)  # [R+1, K, H, W]
    w_stream = (p_hat * stack(np.asarray(res.big_w), np.asarray(nbr.big_w[0]))
                * stack(np.asarray(res.m), np.asarray(nbr.m[0])))

    w_sum = w_stream.sum(axis=0)
    m_all = stack(np.asarray(res.m), np.asarray(nbr.m[0]))
    m_out = m_all.sum(0)
    win = np.argmax(w_stream, axis=0)
    any_pos = (w_stream > 0).any(axis=0)
    take = np.take_along_axis
    sel_p_hat = take(p_hat, win[None], 0)[0] * any_pos
    pos_all = stack(np.asarray(res.pos), np.asarray(nbr.pos[0]))
    col_all = stack(np.asarray(res.color), np.asarray(nbr.color[0]))
    sel_pos = take(pos_all, win[:, None][None], 0)[0]
    sel_col = take(col_all, win[:, None][None], 0)[0]

    # Z: winner evaluated at each input's own context.
    p_at_self = np.asarray(
        target_pdf(ctx, jnp.asarray(sel_pos), jnp.asarray(sel_col), feats))
    ctx1 = jax.tree.map(lambda a: a[0], nbr_ctx)
    p_at_nbr = np.asarray(
        target_pdf(ctx1, jnp.asarray(sel_pos), jnp.asarray(sel_col), feats))
    flags = stack(p_at_self > 0, p_at_nbr > 0)
    if vis_check:
        origins = jnp.stack(
            [ctx.position] + [nbr_ctx.position[0]] * n_nbr)  # [R+1, 3, H, W]
        vis = np.asarray(visibility_from(
            origins[:, None], jnp.asarray(sel_pos)[None], geometry))
        flags = flags & vis
    z = (m_all * flags).sum(0)
    cond = (sel_p_hat > 0) & (z > 0)
    big_w = np.where(cond, w_sum / np.where(cond, sel_p_hat * z, 1.0), 0.0)

    np.testing.assert_allclose(np.asarray(got.w_sum), w_sum, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.m), m_out, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.big_w), big_w, rtol=2e-3,
                               atol=1e-4)
    sel_mask = any_pos[:, None]
    np.testing.assert_allclose(np.asarray(got.pos) * sel_mask,
                               sel_pos * sel_mask, rtol=2e-4, atol=1e-5)


def test_fused_final_shade_matches_xla():
    """Fused visibility+Phong+W kernel (interpret) vs the XLA final shade
    on a real scene with random reservoir state."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_shade import final_shade_pallas
    from romis_tpu.ops.pallas_spatial import pack_center_ctx
    from romis_tpu.render.restir import (
        _final_shade_xla, pack_reservoir_planes,
    )
    from helpers import random_reservoirs_and_ctx

    scene = load_prebuilt("cornell_box")
    h, w, k = 24, 140, 2
    feats = Features()
    res, ctx = random_reservoirs_and_ctx(np.random.default_rng(5), h, w, k)

    expect = np.asarray(_final_shade_xla(ctx, res, scene.geometry, feats))
    got = np.asarray(final_shade_pallas(
        pack_center_ctx(ctx), pack_reservoir_planes(res), scene.geometry, k,
        interpret=pltpu.InterpretParams()))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_uniform_shin_pow_specialization():
    """Repeated-squaring specular pow (Geometry.uniform_shin) must match the
    exp/log path within f32 rounding, across the magnitudes specular cosines
    take, and the host detection must fire only for one shared integer
    shininess."""
    from romis_tpu.ops.pallas_ris import _pow_int
    from romis_tpu.scene.scene import _detect_uniform_shin

    x = jnp.asarray(
        np.concatenate([np.random.default_rng(0).uniform(1e-12, 1.0, 4096),
                        [1e-12, 1.0, 0.999999, 1e-3]]).astype(np.float32))
    for n in (1, 2, 4, 10, 250, 1024):
        got = np.asarray(_pow_int(x, n))
        expect = np.asarray(jnp.exp(float(n) * jnp.log(x)))
        np.testing.assert_allclose(got, expect, rtol=5e-5, atol=1e-38)

    assert _detect_uniform_shin(np.array([250.0, 250.0])) == 250.0
    assert _detect_uniform_shin(np.array([250.0, 10.0])) is None
    assert _detect_uniform_shin(np.array([10.5, 10.5])) is None
    assert _detect_uniform_shin(np.array([0.0])) is None

    # End-to-end: the fused shade kernel with uniform_shin set vs the XLA
    # path on a ctx whose shininess plane equals that constant.
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_shade import final_shade_pallas
    from romis_tpu.ops.pallas_spatial import pack_center_ctx
    from romis_tpu.render.restir import (
        _final_shade_xla, pack_reservoir_planes,
    )
    from helpers import random_reservoirs_and_ctx

    scene = load_prebuilt("cornell_box")
    h, w, k = 24, 140, 2
    res, ctx = random_reservoirs_and_ctx(np.random.default_rng(6), h, w, k)
    ctx = ctx.replace(shininess=jnp.full((h, w), 250.0))
    geo = scene.geometry.replace(uniform_shin=250.0)

    expect = np.asarray(_final_shade_xla(ctx, res, geo, Features()))
    got = np.asarray(final_shade_pallas(
        pack_center_ctx(ctx), pack_reservoir_planes(res), geo, k,
        interpret=pltpu.InterpretParams()))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff_gradients():
    """The re-evaluation backward must equal autodiff through the block
    scan (away from selection ties)."""
    scene = load_prebuilt("cornell_box")
    rng = np.random.default_rng(2)
    rays = _rand_rays(rng, 128)

    def loss_via(fn):
        def f(origin, v0):
            g = scene.geometry.replace(v0=v0)
            t, tri, u, v = fn(Rays(origin=origin, direction=rays.direction),
                              g)
            t = jnp.where(jnp.isfinite(t), t, 0.0)
            return jnp.sum(t * 1.7 + u * 0.3 - v * 0.2)
        return jax.grad(f, argnums=(0, 1))(rays.origin, scene.geometry.v0)

    g_ref = loss_via(intersect_closest)
    g_new = loss_via(closest_hit_diff)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)


def test_ris_const_cols_bitexact():
    """Baking host-detected constant light columns into the RIS kernel
    (LightTable.const_cols) must not change a single bit vs gathering all
    21 columns: the constants ARE the table values. Uses a regular grid
    (shared edges/colors — only v0 varies, the nightclub case)."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_ris import gen_canonical_samples_pallas
    from romis_tpu.scene.lights import LightListBuilder, regular_light_grid
    from helpers import random_reservoirs_and_ctx

    h, w, k = 24, 130, 2
    feats = Features()
    _, ctx = random_reservoirs_and_ctx(np.random.default_rng(7), h, w, k)
    b = LightListBuilder()
    regular_light_grid(b, (-2.0, 3.0, -2.0), (12, 12), (0.2, 0, 0),
                       (0, 0, 0.2), (1.0, 0.8, 0.6))
    lights = b.build()
    assert lights.const_cols is not None
    # Only v0.x / v0.z vary (the grid is planar: v0.y, edges, colors shared).
    assert [c is None for c in lights.const_cols] == (
        [True, False, True] + [False] * 18)

    baked = gen_canonical_samples_pallas(
        5, ctx, lights.replace(affine_segments=None), len(b), feats,
        interpret=pltpu.InterpretParams())
    full = gen_canonical_samples_pallas(
        5, ctx, lights.replace(const_cols=None, affine_segments=None),
        len(b), feats, interpret=pltpu.InterpretParams())
    for a, c in zip(jax.tree.leaves(baked), jax.tree.leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_ris_affine_segments_bitexact():
    """The affine-grid light synthesis (LightTable.affine_segments) must
    reproduce the gather path bit-for-bit: it replays regular_light_grid's
    own f32 expressions instead of fetching the stored rows. Two grids of
    different periods/colors = the nightclub shape (scene.cpp:30-66)."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_ris import gen_canonical_samples_pallas
    from romis_tpu.scene.lights import LightListBuilder, regular_light_grid
    from helpers import random_reservoirs_and_ctx

    h, w, k = 16, 140, 2
    feats = Features()
    _, ctx = random_reservoirs_and_ctx(np.random.default_rng(3), h, w, k)
    b = LightListBuilder()
    regular_light_grid(b, (-8.7, 6.4, -9.1), (16, 16), (0.0, 0.0, 17.0),
                       (0.0, -6.0, 0.0), (0.65, 0.65, 0.65), 0.30)
    regular_light_grid(b, (9.2, 6.4, 8.6), (12, 7), (-17.0, 0.0, 0.0),
                       (0.0, -6.0, 0.0), (0.4, 0.4, 0.4), 0.30)
    lights = b.build()
    assert lights.affine_segments is not None
    assert [seg[:3] for seg in lights.affine_segments] == [
        (0, 256, 16), (256, 84, 7)]
    # The affine params replay the stored rows exactly on the host too.
    rows = np.asarray(lights.rows)
    for s0, n, period, params in lights.affine_segments:
        for i in range(0, n, 13):
            xl, yl = np.float32(i // period), np.float32(i % period)
            for c in range(21):
                a, bb, cc = (np.float32(x) for x in params[c])
                assert rows[s0 + i, c] == np.float32(a + bb * xl) + cc * yl

    synth = gen_canonical_samples_pallas(
        11, ctx, lights, len(b), feats, interpret=pltpu.InterpretParams())
    gathered = gen_canonical_samples_pallas(
        11, ctx, lights.replace(const_cols=None, affine_segments=None),
        len(b), feats, interpret=pltpu.InterpretParams())
    for a, c in zip(jax.tree.leaves(synth), jax.tree.leaves(gathered)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_halo_offset_gather_vjp():
    """The differentiable exact-offset halo gather's backward must equal the
    direct scatter-add of cotangents (the gather is linear in the planes)."""
    from romis_tpu.ops.pallas_spatial import halo_offset_gather

    rng = np.random.default_rng(0)
    c, h, w, d_n, r = 4, 16, 24, 3, 2
    planes = jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32))
    ys = np.arange(h)[None, :, None]
    xs = np.arange(w)[None, None, :]
    ny = np.clip(ys + rng.integers(-r, r + 1, (d_n, h, w)), 0, h - 1)
    nx = np.clip(xs + rng.integers(-r, r + 1, (d_n, h, w)), 0, w - 1)
    dy = jnp.asarray((ny - ys).astype(np.int32))
    dx = jnp.asarray((nx - xs).astype(np.int32))
    wts = rng.normal(size=(d_n, c, h, w)).astype(np.float32)

    # Forward equals direct indexing.
    got = np.asarray(halo_offset_gather(planes, dy, dx, r))
    np.testing.assert_array_equal(
        got, np.moveaxis(np.asarray(planes)[:, ny, nx], 0, 1))

    g = jax.grad(lambda p: jnp.sum(
        halo_offset_gather(p, dy, dx, r) * jnp.asarray(wts)))(planes)
    expect = np.zeros((c, h, w), np.float32)
    for di in range(d_n):
        for cc in range(c):
            np.add.at(expect[cc], (ny[di], nx[di]), wts[di, cc])
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-5)


def test_halo_offset_scatter_kernel_matches_segment_sum():
    """The fused scatter kernel (the gather's TPU transpose,
    halo_offset_scatter_pallas) must reproduce the direct scatter-add
    exactly — including duplicate targets, image borders, and the padded
    alignment region."""
    from romis_tpu.ops.pallas_spatial import halo_offset_scatter_pallas

    rng = np.random.default_rng(5)
    c, h, w, d_n, r = 6, 40, 150, 4, 3  # non-tile-multiple H/W on purpose
    ys = np.arange(h)[None, :, None]
    xs = np.arange(w)[None, None, :]
    ny = np.clip(ys + rng.integers(-r, r + 1, (d_n, h, w)), 0, h - 1)
    nx = np.clip(xs + rng.integers(-r, r + 1, (d_n, h, w)), 0, w - 1)
    dy = jnp.asarray((ny - ys).astype(np.int32))
    dx = jnp.asarray((nx - xs).astype(np.int32))
    ct = rng.normal(size=(d_n, c, h, w)).astype(np.float32)

    got = np.asarray(halo_offset_scatter_pallas(
        jnp.asarray(ct), dy, dx, r, interpret=True))
    expect = np.zeros((c, h, w), np.float32)
    for di in range(d_n):
        for cc in range(c):
            np.add.at(expect[cc], (ny[di], nx[di]), ct[di, cc])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_spatial_pass_halo_src_matches_full_image():
    """The fused pass kernel fed pre-exchanged band halos + a global row
    base (parallel/halo.spatial_reuse_halo) must reproduce the full-image
    kernel exactly: interior band rows read their halo instead of clamping,
    edge bands clamp at the GLOBAL image border. The TPU-interpret PRNG
    stub draws zeros, so every neighbour offset is (-r, -r) and the race
    clocks tie deterministically — both sides see identical noise."""
    from jax.experimental.pallas import tpu as pltpu

    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_spatial import (
        pack_center_ctx, pack_gates, spatial_pass_pallas,
    )
    from romis_tpu.render.restir import pack_reservoir_planes
    from helpers import random_reservoirs_and_ctx

    h, w, k, n_nbr, radius = 32, 128, 2, 3, 4
    rng = np.random.default_rng(5)
    res, ctx = random_reservoirs_and_ctx(rng, h, w, k)
    res_planes = pack_reservoir_planes(res)
    gates = pack_gates(ctx)
    cen = pack_center_ctx(ctx)
    interp = pltpu.InterpretParams()

    full = np.asarray(spatial_pass_pallas(
        0, res_planes, gates, cen, k, n_nbr, radius, interpret=interp))

    h_loc = h // 2

    def ext(planes, base):
        """Global rows [base - r, base + h_loc + r), zeros out of range —
        exactly what ppermute halo exchange hands an edge band."""
        z = np.zeros((planes.shape[0], h + 2 * radius, w), np.float32)
        z[:, radius:radius + h] = np.asarray(planes)
        return jnp.asarray(z[:, base:base + h_loc + 2 * radius])

    for b in range(2):
        base = b * h_loc
        out_b = np.asarray(spatial_pass_pallas(
            0, res_planes[:, base:base + h_loc], gates[:, base:base + h_loc],
            cen[:, base:base + h_loc], k, n_nbr, radius,
            halo_src=(ext(gates, base), ext(res_planes, base)),
            row_base=base, h_global=h, interpret=interp))
        np.testing.assert_array_equal(out_b, full[:, base:base + h_loc],
                                      err_msg=f"band {b}")
