"""Winner-replay surrogate RIS gradient (Features.surrogate_resampling_grad):
values must be BIT-IDENTICAL to the exact path, and the gradient estimator
must be unbiased for the exact autodiff gradient (paired statistical test —
the surrogate shares the exact path's candidates and primary winner, so the
difference is purely the second-race w_sum term)."""

import numpy as np
import jax
import jax.numpy as jnp

from romis_tpu.core.camera import generate_rays, make_camera
from romis_tpu.core.features import Features
from romis_tpu.ops.wrs import gen_canonical_samples
from romis_tpu.render.restir import trace_primary
from romis_tpu.scene.lights import LightListBuilder
from romis_tpu.scene.scene import load_prebuilt

HW = (12, 12)


def _setup():
    scene = load_prebuilt("cornell_box_parallelogram_light")
    # Several distinct lights so the light-pick index actually varies.
    b = LightListBuilder()
    b.add_parallelogram((-0.3, 0.55, -0.3), (0.25, 0, 0), (0, 0, 0.25),
                        (4, 3, 2), (3, 4, 2), (2, 3, 4), (4, 2, 3))
    b.add_parallelogram((0.1, 0.55, 0.0), (0.2, 0, 0), (0, 0, 0.2),
                        (1, 5, 1), (1, 5, 1), (5, 1, 1), (1, 1, 5))
    b.add_point((0.0, 0.3, 0.0), (2, 2, 2))
    b.add_segment((-0.5, 0.1, -0.5), (0.5, 0.1, -0.5), (1, 2, 3), (3, 2, 1))
    lights = b.build().replace(const_cols=None, affine_segments=None)
    nl = len(b)

    h, w = HW
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(0, 0, 0),
                      distance=2.5, fov_deg=50, resolution=HW)
    feats = Features(initial_light_samples=8, spatial_reuse=False,
                     temporal_reuse=False, enable_tone_mapping=False)
    rays = generate_rays(cam, h, w)
    _, ctx = trace_primary(rays, scene.geometry, feats)
    return ctx, lights, nl, scene.geometry, feats


def _loss_fn(feats, ctx, lights, nl, geometry, proj):
    def loss(rows, kd, key):
        li = lights.replace(rows=rows)
        cx = ctx.replace(kd=kd)
        res = gen_canonical_samples(key, cx, li, nl, geometry, feats)
        return (jnp.sum(res.big_w * proj[0])
                + jnp.sum(res.pos * proj[1])
                + jnp.sum(res.color * proj[2])
                + jnp.sum(res.chosen_w * proj[3]))

    return loss


def test_surrogate_values_identical():
    """Same candidates, same primary winner, same reservoir values — up to
    XLA fusion-level float reassociation (~1 ulp) in the recomputed
    winner attributes."""
    ctx, lights, nl, geometry, feats = _setup()
    key = jax.random.PRNGKey(3)
    exact = gen_canonical_samples(key, ctx, lights, nl, geometry, feats)
    surr = gen_canonical_samples(
        key, ctx, lights, nl, geometry,
        feats.replace(surrogate_resampling_grad=True))
    for f in ("pos", "color", "w_sum", "m", "big_w", "chosen_w"):
        np.testing.assert_allclose(
            np.asarray(getattr(exact, f)), np.asarray(getattr(surr, f)),
            rtol=1e-6, atol=1e-7, err_msg=f)


def test_replay_kernel_surrogate_tail_interpret():
    """Fused replay kernel (interpret: zero PRNG → every candidate is light
    0 at its (0,0) corner) + the surrogate tail reconstruct the same
    closed-form reservoir as tests/test_pallas.test_ris_kernel_matches_wrs_
    semantics, and gradients flow through the tail into the light table."""
    from jax.experimental.pallas import tpu as pltpu
    from romis_tpu.ops.pallas_ris import gen_canonical_replay_pallas
    from romis_tpu.ops.shading import target_pdf
    from romis_tpu.ops.wrs import _lane_layout, _surrogate_tail

    import sys
    sys.path.insert(0, "tests")
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
    nl = len(b)
    _, lane_counts, _ = _lane_layout(feats.initial_light_samples, k)

    w_sum, r1, r2 = gen_canonical_replay_pallas(
        9, ctx, lights, nl, feats, interpret=pltpu.InterpretParams())

    def tail_loss(rows):
        li = lights.replace(rows=rows, const_cols=None, affine_segments=None)
        res = _surrogate_tail(ctx, li, nl, None, feats, lane_counts,
                              w_sum, r1, r2)
        return jnp.sum(res.big_w), res

    (_, res), g = jax.value_and_grad(tail_loss, has_aux=True)(lights.rows)

    pos0 = np.asarray(lights.rows[0, 0:3])
    col0 = np.asarray(lights.rows[0, 9:12])
    pos = jnp.broadcast_to(jnp.asarray(pos0)[:, None, None], (3, h, w))
    col = jnp.broadcast_to(jnp.asarray(col0)[:, None, None], (3, h, w))
    p_hat = np.asarray(target_pdf(ctx, pos, col, feats))
    w_cand = p_hat * nl
    for lane in range(k):
        cnt = float(lane_counts[lane])
        np.testing.assert_allclose(np.asarray(w_sum[lane]), cnt * w_cand,
                                   rtol=2e-4, atol=1e-5)
        sel = (w_cand > 0)[None]
        np.testing.assert_allclose(
            np.asarray(res.pos[lane]) * sel, np.asarray(pos) * sel,
            rtol=1e-5, atol=1e-6)
        cond = p_hat > 0
        expect_bw = np.where(cond, cnt * w_cand
                             / np.where(cond, p_hat * cnt, 1.0), 0.0)
        np.testing.assert_allclose(np.asarray(res.big_w[lane]), expect_bw,
                                   rtol=2e-3, atol=1e-4)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[0]).max() > 0  # light 0 receives gradient
    assert np.abs(g[1:]).max() == 0  # never sampled → no gradient


def test_surrogate_gradient_unbiased():
    ctx, lights, nl, geometry, feats = _setup()
    h, w = HW
    k = feats.num_samples_in_reservoir
    pk = jax.random.split(jax.random.PRNGKey(11), 4)
    proj = (jax.random.normal(pk[0], (k, h, w)),
            jax.random.normal(pk[1], (k, 3, h, w)),
            jax.random.normal(pk[2], (k, 3, h, w)),
            jax.random.normal(pk[3], (k, h, w)))

    loss_e = _loss_fn(feats, ctx, lights, nl, geometry, proj)
    loss_s = _loss_fn(feats.replace(surrogate_resampling_grad=True),
                      ctx, lights, nl, geometry, proj)
    grad_e = jax.jit(jax.grad(loss_e, argnums=(0, 1)))
    grad_s = jax.jit(jax.grad(loss_s, argnums=(0, 1)))

    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    ge_rows, ge_kd = jax.vmap(lambda kk: grad_e(lights.rows, ctx.kd, kk))(keys)
    gs_rows, gs_kd = jax.vmap(lambda kk: grad_s(lights.rows, ctx.kd, kk))(keys)

    for name, de, ds in (("rows", ge_rows, gs_rows), ("kd", ge_kd, gs_kd)):
        diff = np.asarray(ds - de).reshape(len(keys), -1)
        mean = diff.mean(axis=0)
        stderr = diff.std(axis=0) / np.sqrt(len(keys))
        scale = np.abs(np.asarray(de).reshape(len(keys), -1)).mean() + 1e-6
        # Paired mean difference compatible with zero: within 5 stderr plus
        # a small absolute slack relative to typical gradient magnitude.
        bad = np.abs(mean) > 5.0 * stderr + 1e-3 * scale
        assert not bad.any(), (
            name, int(bad.sum()), float(np.abs(mean).max()),
            float(stderr.max()))
