"""Weighted-reservoir-sampling core: selection law, bookkeeping, estimator
unbiasedness, and combine semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from romis_tpu.core.features import Features
from romis_tpu.core.types import Reservoirs, ShadeCtx
from romis_tpu.ops.wrs import (
    clamp_temporal_m, combine_biased, combine_unbiased, gen_canonical_samples,
    _lane_layout,
)
from romis_tpu.scene.lights import LightListBuilder
from romis_tpu.scene.scene import build_geometry
from romis_tpu.scene.objloader import SubMesh, Material


def _flat_ctx(n):
    """Surface points on z=0 plane facing +z, white diffuse."""
    rng = np.random.default_rng(5)
    pos = np.concatenate(
        [rng.uniform(-1, 1, (n, 2)), np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    return ShadeCtx(
        valid=jnp.ones((n,), bool),
        position=jnp.asarray(pos),
        normal=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        view_origin=jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]]), (n, 1)),
        kd=jnp.ones((n, 3)),
        ks=jnp.zeros((n, 3)),
        shininess=jnp.ones((n,)),
        geom_id=jnp.zeros((n,), jnp.int32),
        depth_t=jnp.full((n,), 3.0),
    )


def _empty_geometry():
    sm = SubMesh(
        positions=np.zeros((3, 3), np.float32),
        normals=np.tile(np.array([0, 0, 1], np.float32), (3, 1)),
        texcoords=np.zeros((3, 2), np.float32),
        triangles=np.array([[0, 1, 2]], np.int32),
        material=Material(),
    )
    g = build_geometry([sm])
    # Degenerate triangle → nothing ever occludes.
    return g


def _point_lights(positions, colors):
    b = LightListBuilder()
    for p, c in zip(positions, colors):
        b.add_point(p, c)
    return b.build(), len(b)


def test_lane_layout():
    sk, counts, real = _lane_layout(32, 2)
    assert sk == 16 and list(counts) == [16.0, 16.0] and real.all()
    sk, counts, real = _lane_layout(5, 2)
    assert sk == 3
    assert list(counts) == [3.0, 2.0]  # lane 0: j=0,2,4; lane 1: j=1,3


def test_ris_bookkeeping():
    """wSum = sum of candidate weights, M = candidates per lane, and
    W = wSum / (p_hat * M) — exact identities, not statistics."""
    n = 16
    ctx = _flat_ctx(n)
    lights, nl = _point_lights(
        [(0, 0, 2), (1, 1, 1), (-1, 0, 1.5)],
        [(1, 1, 1), (2, 0.5, 0.1), (0.3, 0.9, 0.2)],
    )
    feats = Features(initial_light_samples=8, num_samples_in_reservoir=2)
    geometry = _empty_geometry()
    res = gen_canonical_samples(jax.random.PRNGKey(0), ctx, lights, nl,
                                geometry, feats)
    m = np.asarray(res.m)
    np.testing.assert_allclose(m, 4.0)  # 8 candidates / 2 lanes
    assert np.asarray(res.total_m()).tolist() == [8.0] * n

    # W identity where p_hat of the winner > 0.
    from romis_tpu.ops.shading import target_pdf
    p_hat = np.asarray(target_pdf(
        jax.tree.map(lambda a: a[:, None], ctx), res.pos, res.color, feats))
    w = np.asarray(res.big_w)
    ws = np.asarray(res.w_sum)
    nzero = p_hat > 0
    np.testing.assert_allclose(
        w[nzero], (ws / (np.maximum(p_hat, 1e-37) * m))[nzero], rtol=1e-4)


def test_wrs_selection_distribution():
    """The Gumbel-max lane winner is distributed ∝ candidate weight."""
    # One pixel at the origin, lights straight above at distances 1 and 2 →
    # p_hat ∝ dotNL/d² gives light 0 exactly 4x light 1's weight.
    ctx = _flat_ctx(1)
    ctx = ctx.replace(position=jnp.zeros((1, 3)))
    lights, nl = _point_lights([(0, 0, 1), (0, 0, 2)], [(1, 1, 1), (1, 1, 1)])
    geometry = _empty_geometry()

    def picks_for(feats, trials, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), trials)
        res = jax.vmap(
            lambda k: gen_canonical_samples(k, ctx, lights, nl, geometry,
                                            feats)
        )(keys)
        return np.asarray(res.pos)[:, 0, 0, 2]

    # With 1 candidate the pick is just the uniform light choice (50/50).
    feats = Features(initial_light_samples=1, num_samples_in_reservoir=1)
    picks = picks_for(feats, 4000, 0)
    assert 0.45 < (picks == 1.0).mean() < 0.55

    # With many candidates, RIS resamples toward the 4x-weight light:
    # P(pick light 0) → 4/(4+1) = 0.8.
    feats = Features(initial_light_samples=32, num_samples_in_reservoir=1)
    picks = picks_for(feats, 4000, 1)
    frac_near = (picks == 1.0).mean()
    assert 0.77 < frac_near < 0.83, frac_near


def test_ris_estimator_unbiased():
    """E[p_hat(y) * W] over the RIS draw equals sum over lights of p_hat —
    the defining property of the W weight (RIS / ReSTIR Eq. 6)."""
    n = 512  # many pixels = many independent replicates
    ctx = _flat_ctx(1)
    ctx = jax.tree.map(lambda a: jnp.repeat(a, n, axis=0), ctx)
    lights, nl = _point_lights(
        [(0, 0, 1), (0.5, 0.5, 2), (-0.5, 0, 1.2)],
        [(1, 1, 1), (1, 0.2, 0.1), (0.1, 0.5, 1.0)],
    )
    feats = Features(initial_light_samples=4, num_samples_in_reservoir=2)
    geometry = _empty_geometry()

    from romis_tpu.ops.shading import target_pdf

    # Integrand f = p_hat itself → estimate should equal Σ_lights p_hat.
    truth = 0.0
    for li in range(nl):
        truth += float(target_pdf(
            jax.tree.map(lambda a: a[:1], ctx),
            lights.v0[li][None], lights.c0[li][None], feats)[0])

    est = []
    for t in range(30):
        res = gen_canonical_samples(jax.random.PRNGKey(t), ctx, lights, nl,
                                    geometry, feats)
        p_hat = target_pdf(jax.tree.map(lambda a: a[:, None], ctx),
                           res.pos, res.color, feats)
        # per-pixel estimate: mean over lanes of p_hat * W … with f = p_hat,
        # each lane's E[f(y) W] = Σ p_hat / K? No: each lane estimates the
        # full integral; lanes are averaged like finalShading does (÷K).
        est.append(np.asarray(jnp.sum(p_hat * res.big_w, axis=1) / res.k))
    est = np.concatenate(est)
    rel_err = abs(est.mean() - truth) / truth
    assert rel_err < 0.02, (est.mean(), truth)


def _mk_res(pos, color, w_sum, m, big_w):
    return Reservoirs(
        pos=jnp.asarray(pos, jnp.float32),
        color=jnp.asarray(color, jnp.float32),
        w_sum=jnp.asarray(w_sum, jnp.float32),
        m=jnp.asarray(m, jnp.float32),
        big_w=jnp.asarray(big_w, jnp.float32),
        chosen_w=jnp.zeros_like(jnp.asarray(w_sum, jnp.float32)),
    )


def test_combine_biased_bookkeeping():
    """M_out = Σ masked input M per lane; W = wSum/(p_hat·M) identity;
    masked-out inputs contribute nothing (reservoir.cpp:40-66)."""
    n, r, k = 8, 3, 2
    rng = np.random.default_rng(11)
    ctx = _flat_ctx(n)
    pos = rng.uniform(-1, 1, (n, r, k, 3)).astype(np.float32)
    pos[..., 2] = np.abs(pos[..., 2]) + 0.5  # in front of the plane
    color = rng.uniform(0.2, 1, (n, r, k, 3)).astype(np.float32)
    w_sum = rng.uniform(0, 5, (n, r, k)).astype(np.float32)
    m = rng.integers(1, 20, (n, r, k)).astype(np.float32)
    big_w = rng.uniform(0, 2, (n, r, k)).astype(np.float32)
    inputs = _mk_res(pos, color, w_sum, m, big_w)
    mask = rng.uniform(size=(n, r)) > 0.3
    mask[:, 0] = True
    feats = Features()

    out = combine_biased(jax.random.PRNGKey(0), ctx, inputs,
                         jnp.asarray(mask), feats)
    want_m = (m * mask[..., None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out.m), want_m, rtol=1e-6)

    from romis_tpu.ops.shading import target_pdf
    p_hat_in = np.asarray(target_pdf(
        jax.tree.map(lambda a: a[:, None, None], ctx), inputs.pos,
        inputs.color, feats))
    w_in = p_hat_in * big_w * m * mask[..., None]
    np.testing.assert_allclose(np.asarray(out.w_sum), w_in.sum(axis=1),
                               rtol=1e-4)

    p_hat_out = np.asarray(target_pdf(
        jax.tree.map(lambda a: a[:, None], ctx), out.pos, out.color, feats))
    w = np.asarray(out.big_w)
    ok = p_hat_out > 0
    np.testing.assert_allclose(
        w[ok],
        (np.asarray(out.w_sum) / np.maximum(p_hat_out * want_m, 1e-37))[ok],
        rtol=1e-4)

    # The winner must be one of the *unmasked* input samples.
    sel = np.asarray(out.pos)  # [n, k, 3]
    for i in range(n):
        for lane in range(k):
            cands = pos[i, mask[i], lane]
            d = np.linalg.norm(cands - sel[i, lane], axis=-1)
            zero_w = w_in[i, :, lane][mask[i]].sum() == 0
            assert zero_w or d.min() < 1e-6


def test_combine_unbiased_z_count():
    """Z counts the *total* M (summed over lanes, reservoir.cpp:85-93 uses
    totalSampleNums) of inputs whose own p_hat at the winner is > 0; with
    K = 1 and all inputs valid everywhere, Z equals the biased M and the two
    combines agree."""
    n, r, k = 4, 2, 1
    rng = np.random.default_rng(3)
    ctx = _flat_ctx(n)
    pos = rng.uniform(-1, 1, (n, r, k, 3)).astype(np.float32)
    pos[..., 2] = np.abs(pos[..., 2]) + 0.5
    color = rng.uniform(0.2, 1, (n, r, k, 3)).astype(np.float32)
    w_sum = rng.uniform(0.1, 5, (n, r, k)).astype(np.float32)
    m = rng.integers(1, 9, (n, r, k)).astype(np.float32)
    big_w = rng.uniform(0.1, 2, (n, r, k)).astype(np.float32)
    inputs = _mk_res(pos, color, w_sum, m, big_w)
    mask = jnp.ones((n, r), bool)
    feats = Features()
    geometry = _empty_geometry()

    # Input ctxs: every input reservoir's own geometry = the same flat plane
    # points → p_hat > 0 at any sample in front of it.
    input_ctxs = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (n, r) + a.shape[1:]), ctx)

    key = jax.random.PRNGKey(0)
    out_u = combine_unbiased(key, ctx, inputs, mask, input_ctxs, geometry,
                             feats)
    out_b = combine_biased(key, ctx, inputs, mask, feats)
    np.testing.assert_allclose(np.asarray(out_u.big_w),
                               np.asarray(out_b.big_w), rtol=1e-5)

    # K = 2: Z = Σ_r total M per reference, so W_unbiased = W_biased·M_lane/Z.
    n, r, k = 4, 2, 2
    pos = rng.uniform(-1, 1, (n, r, k, 3)).astype(np.float32)
    pos[..., 2] = np.abs(pos[..., 2]) + 0.5
    color = rng.uniform(0.2, 1, (n, r, k, 3)).astype(np.float32)
    w_sum = rng.uniform(0.1, 5, (n, r, k)).astype(np.float32)
    m = rng.integers(1, 9, (n, r, k)).astype(np.float32)
    big_w = rng.uniform(0.1, 2, (n, r, k)).astype(np.float32)
    inputs = _mk_res(pos, color, w_sum, m, big_w)
    mask = jnp.ones((n, r), bool)
    input_ctxs = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (n, r) + a.shape[1:]), ctx)
    out_u = combine_unbiased(key, ctx, inputs, mask, input_ctxs, geometry,
                             feats)
    out_b = combine_biased(key, ctx, inputs, mask, feats)
    z = m.sum(axis=(1, 2), keepdims=False)[:, None]  # [n, 1] → broadcast [n, k]
    m_lane = m.sum(axis=1)  # [n, k]
    np.testing.assert_allclose(
        np.asarray(out_u.big_w), np.asarray(out_b.big_w) * m_lane / z,
        rtol=1e-4)


def test_temporal_m_clamp():
    """render_utils.cpp:151-163 contract (float math)."""
    n, k = 2, 2
    prev = _mk_res(
        np.zeros((n, k, 3)), np.zeros((n, k, 3)),
        w_sum=[[10.0, 20.0], [1.0, 1.0]],
        m=[[100.0, 300.0], [2.0, 2.0]],
        big_w=np.zeros((n, k)),
    )
    current_total = jnp.asarray([2.0, 2.0])  # bound = 20*2+1 = 41
    out = clamp_temporal_m(prev, current_total, 20.0)
    m = np.asarray(out.m)
    ws = np.asarray(out.w_sum)
    # Pixel 0: total 400 > 41 → each lane clamped to 41, wSum scaled by 41/M.
    np.testing.assert_allclose(m[0], [41.0, 41.0])
    np.testing.assert_allclose(ws[0], [10.0 * 41 / 100, 20.0 * 41 / 300],
                               rtol=1e-6)
    # Pixel 1: total 4 ≤ 41 → untouched.
    np.testing.assert_allclose(m[1], [2.0, 2.0])
    np.testing.assert_allclose(ws[1], [1.0, 1.0])
