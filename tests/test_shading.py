"""Phong shading / target PDF / tone mapping vs the NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from romis_tpu.core.features import Features
from romis_tpu.core.types import ShadeCtx
from romis_tpu.ops.shading import (
    exposure_tone_mapping, phong_shade, target_pdf,
)

from oracle import phong as oracle_phong


def _ctx(n, rng):
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return ShadeCtx(
        valid=jnp.ones((n,), bool),
        position=jnp.asarray(pos),
        normal=jnp.asarray(nrm),
        view_origin=jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32)),
        kd=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        ks=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        shininess=jnp.asarray(rng.uniform(1, 30, (n,)).astype(np.float32)),
        geom_id=jnp.zeros((n,), jnp.int32),
        depth_t=jnp.ones((n,)),
    )


def test_phong_matches_oracle():
    rng = np.random.default_rng(0)
    n = 64
    ctx = _ctx(n, rng)
    lp = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    lc = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    feats = Features()
    got = np.asarray(phong_shade(ctx, jnp.asarray(lp), jnp.asarray(lc), feats))
    for i in range(n):
        want = oracle_phong(lp[i], lc[i], np.asarray(ctx.view_origin)[i],
                            np.asarray(ctx.position)[i],
                            np.asarray(ctx.normal)[i],
                            np.asarray(ctx.kd)[i], np.asarray(ctx.ks)[i],
                            float(np.asarray(ctx.shininess)[i]))
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=1e-5)


def test_phong_light_behind_is_zero():
    feats = Features()
    ctx = ShadeCtx(
        valid=jnp.ones((1,), bool),
        position=jnp.zeros((1, 3)),
        normal=jnp.asarray([[0.0, 0.0, 1.0]]),
        view_origin=jnp.asarray([[0.0, 0.0, 2.0]]),
        kd=jnp.ones((1, 3)), ks=jnp.ones((1, 3)),
        shininess=jnp.ones((1,)),
        geom_id=jnp.zeros((1,), jnp.int32), depth_t=jnp.ones((1,)),
    )
    out = phong_shade(ctx, jnp.asarray([[0.0, 0.0, -1.0]]), jnp.ones((1, 3)),
                      feats)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_phong_coincident_light_distance_clamp():
    """Distance < ZERO_EPSILON → treated as 1 (shading.cpp:31-33)."""
    feats = Features()
    ctx = ShadeCtx(
        valid=jnp.ones((1,), bool),
        position=jnp.zeros((1, 3)),
        normal=jnp.asarray([[0.0, 0.0, 1.0]]),
        view_origin=jnp.asarray([[0.0, 0.0, 2.0]]),
        kd=jnp.ones((1, 3)), ks=jnp.zeros((1, 3)),
        shininess=jnp.ones((1,)),
        geom_id=jnp.zeros((1,), jnp.int32), depth_t=jnp.ones((1,)),
    )
    out = np.asarray(phong_shade(ctx, jnp.zeros((1, 3)), jnp.ones((1, 3)),
                                 feats))
    assert np.all(np.isfinite(out))


def test_invalid_pixels_shade_zero():
    rng = np.random.default_rng(1)
    ctx = _ctx(4, rng).replace(valid=jnp.zeros((4,), bool))
    out = phong_shade(ctx, jnp.ones((4, 3)), jnp.ones((4, 3)), Features())
    np.testing.assert_allclose(np.asarray(out), 0.0)
    p = target_pdf(ctx, jnp.ones((4, 3)), jnp.ones((4, 3)), Features())
    np.testing.assert_allclose(np.asarray(p), 0.0)


def test_disable_shading_returns_kd():
    rng = np.random.default_rng(2)
    ctx = _ctx(4, rng)
    feats = Features(enable_shading=False)
    out = phong_shade(ctx, jnp.ones((4, 3)), jnp.ones((4, 3)), feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ctx.kd), rtol=1e-6)


def test_target_pdf_is_norm():
    rng = np.random.default_rng(3)
    ctx = _ctx(8, rng)
    lp = jnp.asarray(rng.uniform(-2, 2, (8, 3)).astype(np.float32))
    lc = jnp.ones((8, 3))
    feats = Features()
    shade = np.asarray(phong_shade(ctx, lp, lc, feats))
    p = np.asarray(target_pdf(ctx, lp, lc, feats))
    np.testing.assert_allclose(p, np.linalg.norm(shade, axis=-1), rtol=1e-5)


def test_tone_mapping():
    """1 - exp(-exposure*c), then pow(c, 1/gamma) (tone_mapping.cpp:8-11)."""
    feats = Features(exposure=1.5, gamma=2.0)
    c = jnp.asarray([[0.0, 0.5, 10.0]])
    out = np.asarray(exposure_tone_mapping(c, feats))
    want = (1.0 - np.exp(-1.5 * np.array([0.0, 0.5, 10.0]))) ** 0.5
    np.testing.assert_allclose(out[0], want, rtol=1e-5)
