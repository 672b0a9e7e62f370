"""Interpret-mode parity of the fused R-MIS / R-OMIS sweep kernels
(ops/pallas_mis.py) against the XLA formulations (render/rmis.py,
render/romis.py). The kernels draw NO randomness — given the canonical
reservoirs and the neighbour offsets, every output is a deterministic
function — so these are exact-math comparisons (f32 reassociation + the
rsqrt-vs-sqrt arithmetic class), not statistical bands. Visibility bits can
flip on rays grazing occluder edges (the kernel's t-window formulation is
algebraically, not bitwise, equal to the XLA epsilon-offset origin), so the
occluded-scene checks allow a sub-percent mismatch fraction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romis_tpu.core.camera import make_camera, generate_rays
from romis_tpu.core.features import Features, MISWeight
from romis_tpu.core.vec import e
from romis_tpu.ops.pallas_mis import (
    expand_a_upper,
    mis_iteration_pallas,
    pack_mis_reservoirs,
    resolve_neighbour_ctx,
)
from romis_tpu.ops.pallas_spatial import pack_center_ctx
from romis_tpu.ops.shading import phong_shade_planes, target_pdf
from romis_tpu.ops.wrs import _lane_layout, gen_canonical_samples, visibility
from romis_tpu.render.neighbours import select_neighbour_indices
from romis_tpu.render.restir import trace_primary
from romis_tpu.render.rmis import (
    _gather_neighbourhood,
    _mis_offsets,
    balance_heuristic_weights,
)
from romis_tpu.scene.scene import load_prebuilt

HW = (16, 24)
FEATS = Features(initial_light_samples=8, num_neighbours_to_sample=3,
                 spatial_resample_radius=3)


@pytest.fixture(scope="module")
def setup():
    scene = load_prebuilt("cornell_box_parallelogram_light")
    h, w = HW
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(0, 0, 0),
                      distance=2.5, fov_deg=50, resolution=HW)
    rays = generate_rays(cam, h, w)
    _, ctx = trace_primary(rays, scene.geometry, FEATS)
    key = jax.random.PRNGKey(7)
    ny, nx = select_neighbour_indices(key, ctx, h, w, FEATS)
    res = gen_canonical_samples(jax.random.fold_in(key, 1), ctx,
                                scene.lights, scene.num_lights,
                                scene.geometry, FEATS)
    return scene, ctx, ny, nx, res


def _compare(kernel_out, xla_out, max_flip_frac=0.01, rtol=2e-3, atol=2e-4):
    """allclose up to arithmetic-class differences, allowing a sub-percent
    fraction of visibility-bit flips (which change single samples a lot)."""
    a = np.asarray(kernel_out)
    b = np.asarray(xla_out)
    err = np.abs(a - b) / (np.abs(b) + atol / rtol)
    bad = err > rtol
    assert bad.mean() <= max_flip_frac, (bad.mean(), float(err.max()))


def _rmis_xla_iteration(ctx, res, ny, nx, geometry, num_lights, mode):
    """One R-MIS iteration contribution, exactly as render_rmis's XLA body
    computes it (render/rmis.py iteration)."""
    d1 = ny.shape[0]
    nb = _gather_neighbourhood(res, ny, nx)
    p_, c_ = nb.pos, nb.color
    rgb = phong_shade_planes(
        ctx, p_[:, :, 0], p_[:, :, 1], p_[:, :, 2],
        c_[:, :, 0], c_[:, :, 1], c_[:, :, 2], FEATS)
    shade = jnp.stack(rgb, axis=2)
    vis = visibility(ctx.position, nb.pos, geometry)
    sample_color = jnp.where(e(vis), shade, 0.0)
    if mode == "rmis_balance":
        nbhd_ctx = _gather_neighbourhood(ctx, ny, nx)
        recv_p = target_pdf(ctx, nb.pos, nb.color, FEATS)
        mis_w = balance_heuristic_weights(nbhd_ctx, nb.pos, nb.color,
                                          recv_p, FEATS)
    else:
        mis_w = jnp.full(nb.big_w.shape, 1.0 / d1)
    k = nb.pos.shape[1]
    contrib = e(mis_w * nb.big_w) * sample_color / k
    return contrib.sum(axis=(0, 1))


@pytest.mark.parametrize("mode", ["rmis_equal", "rmis_balance"])
def test_rmis_iteration_kernel_matches_xla(setup, mode):
    scene, ctx, ny, nx, res = setup
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples,
                                     FEATS.num_samples_in_reservoir)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    nbr_ctx = (resolve_neighbour_ctx(cen, offs, FEATS.spatial_resample_radius)
               if mode == "rmis_balance" else None)
    got = mis_iteration_pallas(
        cen, pack_mis_reservoirs(res, romis=False),
        offs, scene.geometry,
        FEATS.num_samples_in_reservoir, FEATS.spatial_resample_radius,
        mode, scene.num_lights, lane_counts, nbr_ctx=nbr_ctx,
        interpret=True)
    want = _rmis_xla_iteration(ctx, res, ny, nx, scene.geometry,
                               scene.num_lights, mode)
    _compare(got, want)


def _romis_xla_iteration(ctx, res, ny, nx, geometry, num_lights,
                         alphas=None):
    """One R-OMIS iteration's (A update, b update[, progressive contrib]),
    exactly as render_romis's XLA body computes them (render/romis.py)."""
    from romis_tpu.render.romis import FLT_MIN, _colvec_for_samples

    d1 = ny.shape[0]
    h, w = ctx.depth_t.shape[-2:]
    k = res.pos.shape[0]
    nbhd_ctx = _gather_neighbourhood(ctx, ny, nx)
    nb = _gather_neighbourhood(res, ny, nx)
    colvec = _colvec_for_samples(nb, nbhd_ctx, num_lights, FEATS)
    p_, c_ = nb.pos, nb.color
    rgb = phong_shade_planes(
        ctx, p_[:, :, 0], p_[:, :, 1], p_[:, :, 2],
        c_[:, :, 0], c_[:, :, 1], c_[:, :, 2], FEATS)
    shade = jnp.stack(rgb, axis=2)
    vis = visibility(ctx.position, nb.pos, geometry)
    f = jnp.where(e(vis), shade, 0.0)
    scale = 1.0 / (FLT_MIN + float(k) * jnp.sum(colvec, axis=0))
    w_hat = colvec * scale[None]
    wf = w_hat.reshape(d1, d1 * k, h, w)
    ws = (w_hat * scale[None]).reshape(d1, d1 * k, h, w)
    ff = f.reshape(d1 * k, 3, h, w)
    s_n = d1 * k
    a_upd = [[None] * d1 for _ in range(d1)]
    for i in range(d1):
        for j in range(i, d1):
            v = sum(wf[i, s] * wf[j, s] for s in range(s_n))
            a_upd[i][j] = v
            a_upd[j][i] = v
    a_mat = jnp.stack([jnp.stack(row) for row in a_upd])
    b_vec = jnp.stack([
        jnp.stack([sum(ws[j, s] * ff[s, c] for s in range(s_n))
                   for j in range(d1)])
        for c in range(3)])
    if alphas is None:
        return a_mat, b_vec
    frac = float(k) / float(d1)
    sum_alpha_prod = jnp.stack([
        sum(alphas[c, j][None, None] * colvec[j] for j in range(d1))
        for c in range(3)
    ], axis=2)
    sum_frac = FLT_MIN + frac * jnp.sum(colvec, axis=0)
    contrib = (f - sum_alpha_prod) / sum_frac[:, :, None]
    return a_mat, b_vec, jnp.sum(contrib, axis=(0, 1))


@pytest.mark.parametrize("progressive", [False, True],
                         ids=["direct", "progressive"])
def test_romis_iteration_kernel_matches_xla(setup, progressive):
    scene, ctx, ny, nx, res = setup
    d1 = FEATS.num_neighbours_to_sample + 1
    h, w = HW
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples,
                                     FEATS.num_samples_in_reservoir)
    alphas = None
    if progressive:
        alphas = jax.random.uniform(jax.random.PRNGKey(3), (3, d1, h, w),
                                    minval=-0.5, maxval=0.5)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    nbr_ctx = resolve_neighbour_ctx(cen, offs, FEATS.spatial_resample_radius)
    outs = mis_iteration_pallas(
        cen, pack_mis_reservoirs(res, romis=True),
        offs, scene.geometry,
        FEATS.num_samples_in_reservoir, FEATS.spatial_resample_radius,
        "romis", scene.num_lights, lane_counts, nbr_ctx=nbr_ctx,
        alphas=alphas.reshape(3 * d1, h, w) if progressive else None,
        interpret=True)
    want = _romis_xla_iteration(ctx, res, ny, nx, scene.geometry,
                                scene.num_lights, alphas)
    got_a = expand_a_upper(outs[0], d1)
    # A accumulates regardless of visibility — pure arithmetic parity.
    _compare(got_a, want[0], max_flip_frac=0.0, rtol=5e-3)
    _compare(outs[1].reshape(3, d1, h, w), want[1])
    if progressive:
        _compare(outs[2], want[2])


@pytest.mark.parametrize("strategy", ["similar", "dissimilar",
                                      "equal_similar_dissimilar"])
def test_neighbour_selection_kernel_composition(setup, strategy):
    """The fused box-scan selection kernel (ops/pallas_nbrsel.py) must
    reproduce the XLA path's DETERMINISTIC properties exactly (its Gumbel
    draws differ, so the specific picks don't have to): self first, offsets
    within the radius box and in-bounds, no duplicate non-self neighbours,
    and the per-pixel class composition — similarity classification is
    deterministic, so the number of similar-class picks must match the
    without-replacement top-D contract per pixel."""
    from romis_tpu.core.features import NeighbourSelectionStrategy
    from romis_tpu.render.neighbours import (
        _select_neighbours_kernel, _similar_planes,
    )

    scene, ctx, _, _, _ = setup
    h, w = HW
    feats = FEATS.replace(
        neighbour_selection_strategy=NeighbourSelectionStrategy(strategy))
    d = feats.num_neighbours_to_sample
    r = feats.spatial_resample_radius
    key = jax.random.PRNGKey(11)
    # TPU-interpret emulation (the PRNG stub draws zeros: Gumbel scores tie,
    # the race resolves ties deterministically — the class composition and
    # the invariants below are RNG-independent either way).
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = _select_neighbours_kernel(key, ctx, h, w, feats,
                                       interpret=pltpu.InterpretParams())
    ny, nx = np.asarray(ny), np.asarray(nx)
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]

    assert ny.shape == (d + 1, h, w)
    np.testing.assert_array_equal(ny[0], np.broadcast_to(rows, (h, w)))
    np.testing.assert_array_equal(nx[0], np.broadcast_to(cols, (h, w)))
    assert (np.abs(ny[1:] - rows) <= r).all()
    assert (np.abs(nx[1:] - cols) <= r).all()
    assert (ny >= 0).all() and (ny < h).all()
    assert (nx >= 0).all() and (nx < w).all()

    # Brute-force per-pixel class counts over the in-bounds box.
    gate = np.concatenate([
        np.asarray(ctx.geom_id, np.float32)[None],
        np.asarray(ctx.depth_t)[None], np.asarray(ctx.normal)], axis=0)
    sim_count = np.zeros((h, w), np.int64)
    tot_count = np.zeros((h, w), np.int64)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            yy = rows + dy
            xx = cols + dx
            inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            g5 = gate[:, np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
            sim = np.asarray(_similar_planes(ctx, jnp.asarray(g5), feats))
            sim_count += (sim & inb)
            tot_count += inb

    packed = ny * w + nx
    self_pack = rows * w + cols
    picked_sim = np.zeros((h, w), np.int64)
    picked_real = np.zeros((h, w), np.int64)
    seen = []
    for s in range(1, d + 1):
        is_self = packed[s] == self_pack
        g5 = gate[:, ny[s], nx[s]]
        sim = np.asarray(_similar_planes(ctx, jnp.asarray(g5), feats))
        picked_sim += (sim & ~is_self)
        picked_real += ~is_self
        seen.append(np.where(is_self, -1 - s, packed[s]))
    # No duplicate non-self picks (without replacement).
    seen = np.stack(seen)
    for a in range(d):
        for b in range(a + 1, d):
            assert not ((seen[a] == seen[b]) & (seen[a] >= 0)).any()

    # Interior pixels have 440 in-bounds candidates >= d: the composition
    # is deterministic per strategy.
    assert (picked_real == np.minimum(d, tot_count)).all()
    if strategy == "similar":
        want = np.minimum(d, sim_count)
    elif strategy == "dissimilar":
        want = np.maximum(d - (tot_count - sim_count), 0)
        want = np.minimum(want, sim_count)  # deficit fill from similar
    else:
        n_sim = np.minimum(d // 2 + 1, sim_count)
        n_sim = np.maximum(n_sim, d - np.minimum(tot_count - sim_count, d))
        want = np.minimum(n_sim, d)
    lim = np.minimum(want, np.minimum(d, tot_count))
    assert (picked_sim == lim).all(), (
        strategy, np.abs(picked_sim - lim).max())


@pytest.mark.parametrize("romis", [False, True])
def test_batched_mis_pack_blocks_match_single(setup, romis):
    """gen_mis_reservoir_planes (batched iterations, direct pack layout)
    under interpret mode (zero PRNG: all draws identical) must emit each
    per-iteration block bit-equal to pack_mis_reservoirs of the single
    fused RIS call."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_ris import (
        gen_canonical_samples_pallas, gen_mis_reservoir_planes,
    )

    scene, ctx, ny, nx, res = setup
    its = 3
    pack = gen_mis_reservoir_planes(
        0, ctx, scene.lights, scene.num_lights, FEATS, its, romis=romis,
        interpret=pltpu.InterpretParams())
    single = pack_mis_reservoirs(
        gen_canonical_samples_pallas(0, ctx, scene.lights, scene.num_lights,
                                     FEATS,
                                     interpret=pltpu.InterpretParams()),
        romis=romis)
    c_blk = single.shape[0]
    assert pack.shape[0] == its * c_blk
    for i in range(its):
        np.testing.assert_array_equal(
            np.asarray(pack[i * c_blk:(i + 1) * c_blk]), np.asarray(single),
            err_msg=f"block {i}")


def test_mis_iteration_it_block_slices_exactly(setup):
    """The sweep kernel fed a multi-block pack with it_block=i must equal
    the same call on the extracted single block (the kernel is
    deterministic — exact equality)."""
    scene, ctx, ny, nx, res = setup
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples,
                                     FEATS.num_samples_in_reservoir)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    rng = np.random.default_rng(3)
    single = pack_mis_reservoirs(res, romis=False)
    c_blk = single.shape[0]
    stack = jnp.concatenate([
        jnp.asarray(rng.uniform(0.1, 2.0, single.shape).astype(np.float32)),
        single,
        jnp.asarray(rng.uniform(0.1, 2.0, single.shape).astype(np.float32)),
    ], axis=0)
    kw = dict(
        k=FEATS.num_samples_in_reservoir,
        radius=FEATS.spatial_resample_radius, mode="rmis_equal",
        num_lights=scene.num_lights, lane_counts=lane_counts,
        interpret=True)
    got = mis_iteration_pallas(cen, stack, offs, scene.geometry,
                               it_block=1, **kw)
    want = mis_iteration_pallas(cen, single, offs, scene.geometry, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ===== compact coordinate pack (idxf, u1, u2 + stats) =====

@pytest.fixture(scope="module")
def grid_setup():
    """Affine-grid light scene (nightclub, 83 tris) — the compact MIS pack
    reconstructs (pos, col) from light coordinates in-kernel."""
    scene = load_prebuilt("cornell_nightclub")
    h, w = HW
    cam = make_camera(look_at=(2.57, 1.23, -1.35), rotation_deg=(10.3, 30, 0),
                      distance=25, fov_deg=30, resolution=HW)
    rays = generate_rays(cam, h, w)
    _, ctx = trace_primary(rays, scene.geometry, FEATS)
    key = jax.random.PRNGKey(11)
    ny, nx = select_neighbour_indices(key, ctx, h, w, FEATS)
    return scene, ctx, ny, nx


def _full_from_compact(compact, lights, mode, k):
    """Host-side reconstruction of the FULL pack from the compact
    coordinate pack, through the SAME jnp helpers the kernel uses (equal
    up to cross-compilation FMA contraction)."""
    from romis_tpu.ops.pallas_ris import (
        light_comps_affine, light_comps_const, light_pos_col,
    )

    romis = mode == "romis"
    cc = (5 if romis else 4) * k
    blocks = []
    for b in range(compact.shape[0] // cc):
        blk = compact[b * cc:(b + 1) * cc]
        pos, col = [], []
        for lane in range(k):
            idxf, u1, u2 = blk[lane], blk[k + lane], blk[2 * k + lane]
            if lights.affine_segments is not None:
                comps = light_comps_affine(lights.affine_segments, idxf)
            else:
                comps = light_comps_const(lights.const_cols)
            p3, c3 = light_pos_col(comps, u1, u2)
            live = blk[3 * k + lane] > 0.0
            pos.append([jnp.where(live, v, 0.0) for v in p3])
            col.append([jnp.where(live, jnp.asarray(v, jnp.float32), 0.0)
                        for v in c3])
        planes = ([p for lane in range(k) for p in pos[lane]]
                  + [c for lane in range(k) for c in col[lane]]
                  + [blk[3 * k + lane] for lane in range(k)])
        if romis:
            planes += [blk[4 * k + lane] for lane in range(k)]
        blocks.append(jnp.stack(planes))
    return jnp.concatenate(blocks, axis=0)


@pytest.mark.parametrize("mode", ["rmis_equal", "rmis_balance", "romis"])
def test_compact_sweep_matches_full(grid_setup, mode):
    """The sweep on a random compact pack must match the sweep on the
    reconstructed full pack to f32-reassociation precision (separately
    compiled programs may contract FMAs differently — measured max rel
    2.2e-7), with a tiny allowance for visibility flips on rays grazing
    occluder edges from ulp-different reconstructed positions."""
    scene, ctx, ny, nx = grid_setup
    k = FEATS.num_samples_in_reservoir
    romis = mode == "romis"
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples, k)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    radius = FEATS.spatial_resample_radius
    nbr_ctx = (resolve_neighbour_ctx(cen, offs, radius)
               if mode != "rmis_equal" else None)

    h, w = HW
    rng = np.random.default_rng(5)
    cc = (5 if romis else 4) * k
    compact = rng.uniform(0.0, 1.0, (cc, h, w)).astype(np.float32)
    compact[:k] = np.floor(
        rng.uniform(0, scene.num_lights, (k, h, w))).astype(np.float32)
    # ~20% empty reservoirs (stat = 0) — reconstruction must zero those.
    compact[3 * k:4 * k] *= rng.uniform(0, 1, (k, h, w)) > 0.2
    compact = jnp.asarray(compact)

    full = jax.jit(_full_from_compact, static_argnums=(2, 3))(
        compact, scene.lights, mode, k)
    kw = dict(k=k, radius=radius, mode=mode, num_lights=scene.num_lights,
              lane_counts=lane_counts, nbr_ctx=nbr_ctx, interpret=True)
    got = mis_iteration_pallas(cen, compact, offs, scene.geometry,
                               lights=scene.lights, compact=True, **kw)
    want = mis_iteration_pallas(cen, full, offs, scene.geometry, **kw)
    if not isinstance(got, tuple):
        got, want = (got,), (want,)
    for g, wv in zip(got, want):
        # rtol: measured max rel 2.2e-7 (rmis); the R-OMIS colvec
        # reciprocals amplify ulp noise near (w_sum - chosen) cancellation
        # to ~3e-5.
        _compare(g, wv, max_flip_frac=0.002, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("romis", [False, True])
def test_compact_ris_emit_reconstructs_full(grid_setup, romis):
    """gen_mis_reservoir_planes(compact=True) host-reconstructed must
    bit-match the full emit of the same call (interpret mode: the PRNG
    draws are identical across the two calls)."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_ris import gen_mis_reservoir_planes

    scene, ctx, ny, nx = grid_setup
    its = 2
    kw = dict(interpret=pltpu.InterpretParams())
    full = gen_mis_reservoir_planes(0, ctx, scene.lights, scene.num_lights,
                                    FEATS, its, romis=romis, **kw)
    comp = gen_mis_reservoir_planes(0, ctx, scene.lights, scene.num_lights,
                                    FEATS, its, romis=romis, compact=True,
                                    **kw)
    mode = "romis" if romis else "rmis_equal"
    recon = jax.jit(_full_from_compact, static_argnums=(2, 3))(
        comp, scene.lights, mode, FEATS.num_samples_in_reservoir)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(full))


@pytest.mark.parametrize("mode", ["rmis_equal", "rmis_balance"])
def test_rmis_iteration_kernel_ext_vis_matches_xla(setup, mode):
    """ext_vis mode (the large-scene path: visibility precomputed outside
    the kernel) vs the XLA formulation. Both sides evaluate the SAME
    ops/wrs.visibility — no visibility-bit flip allowance."""
    from romis_tpu.render.rmis import mis_ext_vis

    scene, ctx, ny, nx, res = setup
    k = FEATS.num_samples_in_reservoir
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples, k)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    nbr_ctx = (resolve_neighbour_ctx(cen, offs, FEATS.spatial_resample_radius)
               if mode == "rmis_balance" else None)
    pack = pack_mis_reservoirs(res, romis=False)
    ext = mis_ext_vis(ctx, pack[:3 * k], offs,
                      FEATS.spatial_resample_radius, scene.geometry, k)
    got = mis_iteration_pallas(
        cen, pack, offs, scene.geometry, k, FEATS.spatial_resample_radius,
        mode, scene.num_lights, lane_counts, nbr_ctx=nbr_ctx, ext_vis=ext,
        interpret=True)
    want = _rmis_xla_iteration(ctx, res, ny, nx, scene.geometry,
                               scene.num_lights, mode)
    _compare(got, want, max_flip_frac=0.0)


def test_romis_iteration_kernel_ext_vis_matches_xla(setup):
    from romis_tpu.render.rmis import mis_ext_vis

    scene, ctx, ny, nx, res = setup
    d1 = FEATS.num_neighbours_to_sample + 1
    h, w = HW
    k = FEATS.num_samples_in_reservoir
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples, k)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    nbr_ctx = resolve_neighbour_ctx(cen, offs, FEATS.spatial_resample_radius)
    pack = pack_mis_reservoirs(res, romis=True)
    ext = mis_ext_vis(ctx, pack[:3 * k], offs,
                      FEATS.spatial_resample_radius, scene.geometry, k)
    outs = mis_iteration_pallas(
        cen, pack, offs, scene.geometry, k, FEATS.spatial_resample_radius,
        "romis", scene.num_lights, lane_counts, nbr_ctx=nbr_ctx,
        ext_vis=ext, interpret=True)
    want = _romis_xla_iteration(ctx, res, ny, nx, scene.geometry,
                                scene.num_lights)
    _compare(expand_a_upper(outs[0], d1), want[0], max_flip_frac=0.0,
             rtol=5e-3)
    _compare(outs[1].reshape(3, d1, h, w), want[1], max_flip_frac=0.0)


def test_rmis_ext_vis_large_scene_matches_xla():
    """The whole point of ext_vis: a >2048-tri scene (soup exceeds SMEM)
    through the sweep kernel, visibility batched through the BVH — parity
    with the XLA formulation (VERDICT r3 item 4)."""
    from romis_tpu.ops.bvh import with_bvh
    from romis_tpu.render.rmis import mis_ext_vis
    from romis_tpu.scene.scene import load_monkey_field

    scene = load_monkey_field(2)
    geometry = with_bvh(scene.geometry)
    n_tris = int(np.asarray(geometry.active).sum())
    assert n_tris > 2048, n_tris

    h, w = 12, 16
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(25, 30, 0),
                      distance=6.0, fov_deg=50, resolution=(h, w))
    rays = generate_rays(cam, h, w)
    _, ctx = trace_primary(rays, geometry, FEATS)
    key = jax.random.PRNGKey(5)
    ny, nx = select_neighbour_indices(key, ctx, h, w, FEATS)
    res = gen_canonical_samples(jax.random.fold_in(key, 1), ctx,
                                scene.lights, scene.num_lights, geometry,
                                FEATS)
    k = FEATS.num_samples_in_reservoir
    _, lane_counts, _ = _lane_layout(FEATS.initial_light_samples, k)
    cen = pack_center_ctx(ctx)
    offs = _mis_offsets(ny, nx)
    pack = pack_mis_reservoirs(res, romis=False)
    ext = mis_ext_vis(ctx, pack[:3 * k], offs,
                      FEATS.spatial_resample_radius, geometry, k)
    got = mis_iteration_pallas(
        cen, pack, offs, geometry, k, FEATS.spatial_resample_radius,
        "rmis_equal", scene.num_lights, lane_counts, ext_vis=ext,
        interpret=True)
    want = _rmis_xla_iteration(ctx, res, ny, nx, geometry,
                               scene.num_lights, "rmis_equal")
    _compare(got, want, max_flip_frac=0.0)
