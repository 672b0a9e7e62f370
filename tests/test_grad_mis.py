"""Differentiable R-MIS / R-OMIS tests (VERDICT r3 item 1).

Gradient flow + finite-difference validation of the MIS estimators through
the XLA formulation (diff/grad.py render_mis_with_params — the
fused_resampling=False contract), for both R-MIS weight modes and both
R-OMIS variants, plus an inverse-rendering convergence check.

Reference semantics being differentiated: renderRMIS
(src/rendering/render.cpp:64-119), renderROMIS (render.cpp:121-265).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romis_tpu.core.camera import make_camera
from romis_tpu.core.features import Features, MISWeight, RayTraceMode
from romis_tpu.diff.grad import (
    extract_params, make_mis_grad_fn, mis_l2_image_loss,
    render_mis_with_params,
)
from romis_tpu.scene.scene import load_prebuilt

HW = (12, 12)


@pytest.fixture(scope="module")
def cornell():
    return load_prebuilt("cornell_box_parallelogram_light")


def _setup(cornell, feats):
    h, w = HW
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(0, 0, 0),
                      distance=2.5, fov_deg=50, resolution=HW)
    params = extract_params(cornell.geometry, cornell.lights)
    args = (jax.random.PRNGKey(0), cam, cornell.geometry, cornell.lights,
            cornell.num_lights, h, w, feats)
    return params, args


def _mis_feats(**kw):
    base = dict(
        enable_tone_mapping=False, initial_light_samples=4,
        max_iterations_mis=2, spatial_resample_radius=2,
        num_neighbours_to_sample=2,
    )
    base.update(kw)
    return Features(**base)


MIS_CONFIGS = [
    ("rmis_equal", _mis_feats(ray_trace_mode=RayTraceMode.RMIS,
                              mis_weight_rmis=MISWeight.EQUAL)),
    ("rmis_balance", _mis_feats(ray_trace_mode=RayTraceMode.RMIS,
                                mis_weight_rmis=MISWeight.BALANCE)),
    ("romis_direct", _mis_feats(ray_trace_mode=RayTraceMode.ROMIS,
                                use_progressive_romis=False)),
    ("romis_progressive", _mis_feats(ray_trace_mode=RayTraceMode.ROMIS,
                                     use_progressive_romis=True,
                                     max_iterations_mis=3)),
]


@pytest.mark.parametrize(
    "feats", [f for _, f in MIS_CONFIGS], ids=[n for n, _ in MIS_CONFIGS])
def test_mis_gradients_finite_and_nonzero(cornell, feats):
    params, args = _setup(cornell, feats)
    target = jnp.zeros(HW + (3,))
    loss, grads = jax.value_and_grad(mis_l2_image_loss)(
        params, target, *args)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for name in vars(grads):
        g = getattr(grads, name)
        assert np.isfinite(np.asarray(g)).all(), f"NaN/inf grad in {name}"
    for name in ("light_c0", "light_v0", "mat_kd", "tri_v0"):
        assert float(jnp.abs(getattr(grads, name)).max()) > 0, name


@pytest.mark.parametrize(
    "feats", [f for _, f in MIS_CONFIGS], ids=[n for n, _ in MIS_CONFIGS])
def test_mis_light_color_grad_matches_finite_difference(cornell, feats):
    """Light emission enters linearly except through target PDFs / colvecs;
    AD must match central differences closely."""
    params, args = _setup(cornell, feats)
    target = jnp.zeros(HW + (3,))
    loss_fn = lambda p: mis_l2_image_loss(p, target, *args)
    g = jax.grad(loss_fn)(params)

    # Progressive runs the α solve inside the iteration scan — its loss has
    # more f32 rounding, and central differences at 1e-3 are dominated by
    # cancellation noise (measured: FD converges to the AD value as eps
    # grows, 0.6% at 1e-2).
    eps = 3e-3 if feats.use_progressive_romis else 1e-3
    rng = np.random.default_rng(0)
    for _ in range(2):
        ch = rng.integers(0, 3)
        base = np.asarray(params.light_c0)
        d = np.zeros_like(base)
        d[0, ch] = eps
        fd = (float(loss_fn(params.replace(light_c0=jnp.asarray(base + d))))
              - float(loss_fn(params.replace(light_c0=jnp.asarray(base - d))))
              ) / (2 * eps)
        ad = float(np.asarray(g.light_c0)[0, ch])
        assert abs(fd - ad) <= 3e-2 * max(abs(fd), abs(ad), 1e-3), (fd, ad)


@pytest.mark.parametrize(
    "feats", [f for _, f in MIS_CONFIGS], ids=[n for n, _ in MIS_CONFIGS])
@pytest.mark.parametrize("field", ["mat_kd", "mat_ks"])
def test_mis_material_grad_matches_finite_difference(cornell, feats, field):
    params, args = _setup(cornell, feats)
    target = jnp.zeros(HW + (3,))
    loss_fn = lambda p: mis_l2_image_loss(p, target, *args)
    g = jax.grad(loss_fn)(params)

    eps = 3e-3 if feats.use_progressive_romis else 1e-3
    gk = np.asarray(getattr(g, field))
    mi, ch = np.unravel_index(np.abs(gk).argmax(), gk.shape)
    base = np.asarray(getattr(params, field))
    d = np.zeros_like(base)
    d[mi, ch] = eps
    fd = (float(loss_fn(params.replace(**{field: jnp.asarray(base + d)})))
          - float(loss_fn(params.replace(**{field: jnp.asarray(base - d)})))
          ) / (2 * eps)
    ad = float(gk[mi, ch])
    # kd/ks enter the target PDF and every colvec denominator — tolerate a
    # few percent of nonlinear secondary effect at finite eps.
    assert abs(fd - ad) <= 8e-2 * max(abs(fd), abs(ad), 1e-3), (fd, ad)


@pytest.mark.parametrize(
    "feats", [f for _, f in MIS_CONFIGS], ids=[n for n, _ in MIS_CONFIGS])
def test_mis_light_position_grad_matches_finite_difference(cornell, feats):
    params, args = _setup(cornell, feats)

    def energy(p):
        # log1p energy: the progressive estimator's FLT_MIN denominator
        # (faithful to render.cpp:197) can put a ~1e30 firefly in a pixel;
        # log1p keeps the probe smooth for central differences AND shrinks
        # the firefly's gradient to ~1/firefly (a hard clamp made the FD
        # jump discontinuously when the firefly crossed the clamp).
        img = render_mis_with_params(p, *args)
        return jnp.sum(jnp.log1p(jnp.maximum(img, 0.0)))

    g = jax.grad(energy)(params)
    gy = float(np.asarray(g.light_v0)[0, 1])
    eps = 1e-4  # log1p smoothing keeps even progressive stable here
    base = np.asarray(params.light_v0)
    d = np.zeros_like(base)
    d[0, 1] = eps
    fd = (float(energy(params.replace(light_v0=jnp.asarray(base + d))))
          - float(energy(params.replace(light_v0=jnp.asarray(base - d))))) \
        / (2 * eps)
    assert abs(fd - gy) <= 6e-2 * max(abs(fd), abs(gy), 1e-3), (fd, gy)


@pytest.mark.parametrize(
    "feats", [f for _, f in MIS_CONFIGS], ids=[n for n, _ in MIS_CONFIGS])
def test_mis_vertex_grad_finite_difference_on_energy(cornell, feats):
    """Vertex gradients flow through the Möller–Trumbore hit maths of the
    MIS paths too (silhouette terms excepted — smooth component only)."""
    params, args = _setup(cornell, feats)

    def energy(p):
        img = render_mis_with_params(p, *args)
        # see the position test's log1p note
        return jnp.sum(jnp.log1p(jnp.maximum(img, 0.0)))

    g = jax.grad(energy)(params)
    gv = np.asarray(g.tri_v0)
    ti, ch = np.unravel_index(np.abs(gv).argmax(), gv.shape)
    eps = 2e-4
    base = np.asarray(params.tri_v0)
    d = np.zeros_like(base)
    d[ti, ch] = eps
    fp = float(energy(params.replace(tri_v0=jnp.asarray(base + d))))
    fm = float(energy(params.replace(tri_v0=jnp.asarray(base - d))))
    fd = (fp - fm) / (2 * eps)
    ad = float(gv[ti, ch])
    assert np.sign(fd) == np.sign(ad) or abs(fd - ad) < 0.25 * abs(ad), (
        fd, ad)


def test_romis_inverse_rendering_recovers_light_color(cornell):
    """Inverse rendering through R-OMIS: perturb the light corner colors,
    descend the L2 loss against the unperturbed render, recover them."""
    feats = _mis_feats(ray_trace_mode=RayTraceMode.ROMIS)
    params, args = _setup(cornell, feats)
    key, cam = args[0], args[1]

    target = render_mis_with_params(params, *args)

    true_c0 = np.asarray(params.light_c0)
    start = params.replace(
        light_c0=jnp.asarray(true_c0) * 0.3 + 0.4)
    grad_fn = jax.jit(lambda p: jax.value_and_grad(mis_l2_image_loss)(
        p, target, *args))

    p = start
    loss0 = None
    for step in range(60):
        loss, g = grad_fn(p)
        if loss0 is None:
            loss0 = float(loss)
        # Only descend the parameter being recovered (the others are at the
        # optimum already; finite noise would otherwise push them around).
        p = p.replace(light_c0=p.light_c0 - 3.0 * g.light_c0)
    final = float(loss)
    assert final < 0.05 * loss0, (loss0, final)
    np.testing.assert_allclose(np.asarray(p.light_c0), true_c0, atol=0.08)


def test_make_mis_grad_fn_jits(cornell):
    feats = _mis_feats(ray_trace_mode=RayTraceMode.RMIS)
    params, args = _setup(cornell, feats)
    key, cam = args[0], args[1]
    fn = jax.jit(make_mis_grad_fn(cornell.geometry, cornell.lights,
                                  cornell.num_lights, *HW, feats))
    target = jnp.zeros(HW + (3,))
    loss, g = fn(params, target, key, cam)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g.light_c0)).all()


def _random_phat_inputs(key, h=8, w=10, lead=(3, 2)):
    from romis_tpu.core.types import ShadeCtx

    ks = jax.random.split(key, 12)
    u = lambda k_, shape, lo=-1.0, hi=1.0: jax.random.uniform(
        k_, shape, minval=lo, maxval=hi)
    normal = u(ks[0], (3, h, w))
    normal = normal / jnp.maximum(
        jnp.sqrt(jnp.sum(normal ** 2, 0, keepdims=True)), 1e-6)
    ctx = ShadeCtx(
        valid=u(ks[1], (h, w)) > -0.8,  # ~10% invalid
        position=u(ks[2], (3, h, w)),
        normal=normal,
        view_origin=u(ks[3], (3, h, w), -2.0, 2.0),
        kd=u(ks[4], (3, h, w), 0.0, 1.0),
        ks=u(ks[5], (3, h, w), 0.0, 1.0),
        shininess=u(ks[6], (h, w), 1.0, 40.0),
        geom_id=jnp.zeros((h, w), jnp.int32),
        depth_t=jnp.ones((h, w)),
    )
    pos = u(ks[7], lead + (3, h, w), -2.0, 2.0)
    col = u(ks[8], lead + (3, h, w), 0.0, 5.0)
    # Edge regimes: coincident sample/surface (dist→0) and dark samples.
    pos = pos.at[0, 0, :, 0, 0].set(ctx.position[:, 0, 0])
    col = col.at[0, 0, :, 0, 1].set(0.0)
    wgt = u(ks[9], lead + (h, w))
    return ctx, pos, col, wgt


def test_analytic_phat_vjp_matches_ad():
    """target_pdf_planes_analytic: identical forward, AD-grade gradients
    w.r.t. every ctx field and every sample plane (the closed-form Phong
    VJP of VERDICT r4 item 2) — across valid/invalid, backfacing,
    zero-specular, and coincident-pair regimes."""
    from romis_tpu.ops.shading import (
        target_pdf_planes, target_pdf_planes_analytic,
    )

    feats = Features()
    ctx, pos, col, wgt = _random_phat_inputs(jax.random.PRNGKey(7))
    comps = (pos[:, :, 0], pos[:, :, 1], pos[:, :, 2],
             col[:, :, 0], col[:, :, 1], col[:, :, 2])

    def loss(fn, ctx_, comps_):
        return jnp.sum(fn(ctx_, *comps_, feats) * wgt)

    v_ad = loss(target_pdf_planes, ctx, comps)
    v_an = loss(target_pdf_planes_analytic, ctx, comps)
    np.testing.assert_array_equal(np.asarray(v_ad), np.asarray(v_an))

    diff_fields = ["position", "normal", "view_origin", "kd", "ks",
                   "shininess"]

    def split_loss(fn):
        def f(diff_ctx, comps_):
            ctx_ = ctx.replace(**diff_ctx)
            return loss(fn, ctx_, comps_)
        return f

    dctx = {k: getattr(ctx, k) for k in diff_fields}
    g_ad = jax.grad(split_loss(target_pdf_planes), argnums=(0, 1))(
        dctx, comps)
    g_an = jax.grad(split_loss(target_pdf_planes_analytic), argnums=(0, 1))(
        dctx, comps)
    for (name, a), b in zip(
            sorted(g_ad[0].items()) + list(enumerate(g_ad[1])),
            [v for _, v in sorted(g_an[0].items())] + list(g_an[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"cotangent mismatch: {name}")


def test_analytic_phong_planes_vjp_matches_ad():
    """phong_shade_planes_analytic: per-channel cotangents (the
    equal-weight sweep backward) match AD."""
    from romis_tpu.ops.shading import (
        phong_shade_planes, phong_shade_planes_analytic,
    )

    feats = Features()
    ctx, pos, col, wgt = _random_phat_inputs(jax.random.PRNGKey(11))
    comps = (pos[:, :, 0], pos[:, :, 1], pos[:, :, 2],
             col[:, :, 0], col[:, :, 1], col[:, :, 2])
    wgt3 = (wgt, wgt * 0.5, wgt * wgt)

    def loss(fn, dctx, comps_):
        ctx_ = ctx.replace(**dctx)
        r, g, b = fn(ctx_, *comps_, feats)
        return jnp.sum(r * wgt3[0] + g * wgt3[1] + b * wgt3[2])

    diff_fields = ["position", "normal", "view_origin", "kd", "ks",
                   "shininess"]
    dctx = {k: getattr(ctx, k) for k in diff_fields}
    v_ad, g_ad = jax.value_and_grad(
        lambda d, c: loss(phong_shade_planes, d, c), argnums=(0, 1))(
        dctx, comps)
    v_an, g_an = jax.value_and_grad(
        lambda d, c: loss(phong_shade_planes_analytic, d, c),
        argnums=(0, 1))(dctx, comps)
    np.testing.assert_array_equal(np.asarray(v_ad), np.asarray(v_an))
    for (name, a), b in zip(
            sorted(g_ad[0].items()) + list(enumerate(g_ad[1])),
            [v for _, v in sorted(g_an[0].items())] + list(g_an[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"cotangent mismatch: {name}")
