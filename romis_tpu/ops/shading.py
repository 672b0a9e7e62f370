"""Phong shading, target PDF, and texture lookup — image-minor layout.

Reference analogs:
- computeShading   (src/rendering/shading.cpp:7-34)
- targetPDF        (src/rendering/reservoir.cpp:106-109)
- acquireTexel     (src/scene/texture.cpp:4-9)
- diffuseAlbedo    (src/utils/utils.cpp:33-37)

Deviations (documented, deliberate):
- The specular lobe clamps cos(theta) to >= 0 before pow. The reference calls
  std::pow on a possibly-negative base, which yields NaN for fractional
  shininess (then scrubbed to 0, shading.cpp:27-28) but a *signed* value for
  integer shininess — a numerical quirk, not a feature.
- Interpolated shading normals are normalized; the reference uses the raw
  rtcInterpolate0 output (embree_interface.cpp:76-77).

All ctx fields are [..., H, W] ([..., 3, H, W] for vectors); sample tensors
carry extra *leading* axes and broadcast against ctx via plain NumPy rules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import Features
from ..core.types import ShadeCtx
from ..core.vec import e, vdot, vnorm, vnormalize

ZERO_EPSILON = 1e-5  # reference src/utils/utils.h:19


def acquire_texel(tex_data, tex_size, tex_id, uv):
    """Nearest-neighbour texel fetch (reference src/scene/texture.cpp:4-9:
    x = u*(W-1), y = v*(H-1), row-major, no wrapping/filtering).

    tex_data: [NT, TH, TW, 3]; tex_size: [NT, 2] (h, w); tex_id: [..., H, W]
    int32 (may be -1); uv: [..., 2, H, W]. Returns [..., 3, H, W] (garbage
    where tex_id < 0 — callers select against it)."""
    tid = jnp.maximum(tex_id, 0)
    th = tex_size[tid, 0].astype(jnp.float32)
    tw = tex_size[tid, 1].astype(jnp.float32)
    u = jnp.take(uv, 0, axis=-3)
    v = jnp.take(uv, 1, axis=-3)
    x = jnp.clip((u * (tw - 1.0)).astype(jnp.int32), 0, tex_data.shape[2] - 1)
    y = jnp.clip((v * (th - 1.0)).astype(jnp.int32), 0, tex_data.shape[1] - 1)
    texel = tex_data[tid, y, x]  # [..., H, W, 3]
    return jnp.moveaxis(texel, -1, -3)


def diffuse_albedo(geometry, mat_id, uv, features: Features):
    """Per-pixel effective diffuse albedo: texture if present else material kd
    (reference diffuseAlbedo, utils.cpp:33-37)."""
    from ..core.vec import from_table

    kd = from_table(geometry.mat_kd, mat_id)
    if not features.enable_texture_mapping:
        return kd
    tex_id = geometry.mat_tex_id[mat_id]
    texel = acquire_texel(geometry.tex_data, geometry.tex_size, tex_id, uv)
    return jnp.where(e(tex_id >= 0), texel, kd)


def phong_shade(
    ctx: ShadeCtx,
    light_pos: jnp.ndarray,  # [..., 3, H, W], leading axes broadcast
    light_color: jnp.ndarray,  # [..., 3, H, W]
    features: Features,
) -> jnp.ndarray:
    """Phong diffuse + specular with inverse-square falloff → [..., 3, H, W].

    Matches computeShading (shading.cpp:7-34): early-out when the light is
    behind the surface, NaN scrubbing of both terms, distance clamped to 1
    when within ZERO_EPSILON of 0."""
    if not features.enable_shading:
        return jnp.broadcast_to(
            ctx.kd, jnp.broadcast_shapes(ctx.kd.shape, light_pos.shape)
        )

    p = ctx.position
    n = ctx.normal
    to_light = light_pos - p
    dist2 = vdot(to_light, to_light)
    # Floor inside the sqrt: d(sqrt)/dx at 0 is inf and would NaN-poison
    # gradients of coincident light/surface pairs.
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    l_dir = to_light / e(jnp.maximum(dist, 1e-20))
    dot_nl = vdot(n, l_dir)

    v = vnormalize(ctx.view_origin - p)
    r = vnormalize(2.0 * e(dot_nl) * n - l_dir)
    cos_theta = vdot(r, v)

    diffuse = light_color * ctx.kd * e(dot_nl)
    # Grad-safe clamped pow: d/dx x^s at x=0 is inf for s<1; route the
    # zero-specular branch through where on both value and base.
    cos_safe = jnp.maximum(cos_theta, 1e-12)
    spec_pow = jnp.where(cos_theta > 0.0,
                         jnp.power(cos_safe, ctx.shininess), 0.0)
    specular = light_color * ctx.ks * e(spec_pow)
    diffuse = jnp.where(jnp.isnan(diffuse), 0.0, diffuse)
    specular = jnp.where(jnp.isnan(specular), 0.0, specular)

    falloff_d = jnp.where(dist < ZERO_EPSILON, 1.0, dist)
    out = (diffuse + specular) / e(falloff_d * falloff_d)

    behind = dot_nl < 0.0
    out = jnp.where(e(behind), 0.0, out)
    return jnp.where(e(ctx.valid), out, 0.0)


def phong_shade_planes(ctx: ShadeCtx, px, py, pz, cr, cg, cb,
                       features: Features):
    """phong_shade on scalar COMPONENT planes ([..., H, W] each) instead of
    [..., 3, H, W] vectors → (r, g, b) planes. Same math; exists because
    vector-axis arrays in hot loops make XLA materialise [.., 3, H, W]
    temporaries (and, inside lax.scan reverse-mode, assign the size-3 axis
    to the lane dimension — a 42x padded layout that OOMs the 1080p
    gradient pass). All-scalar planes keep H, W minor."""
    if not features.enable_shading:
        shp = jnp.broadcast_shapes(ctx.kd[0].shape, px.shape)
        return tuple(jnp.broadcast_to(ctx.kd[c], shp) for c in range(3))

    ppx, ppy, ppz = ctx.position[0], ctx.position[1], ctx.position[2]
    nx, ny, nz = ctx.normal[0], ctx.normal[1], ctx.normal[2]
    tox, toy, toz = px - ppx, py - ppy, pz - ppz
    dist2 = tox * tox + toy * toy + toz * toz
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    dinv = 1.0 / jnp.maximum(dist, 1e-20)
    lx, ly, lz = tox * dinv, toy * dinv, toz * dinv
    dot_nl = nx * lx + ny * ly + nz * lz

    vx0 = ctx.view_origin[0] - ppx
    vy0 = ctx.view_origin[1] - ppy
    vz0 = ctx.view_origin[2] - ppz
    vsq = vx0 * vx0 + vy0 * vy0 + vz0 * vz0
    vok = vsq > 1e-30
    vn = jnp.where(vok, jnp.sqrt(jnp.where(vok, vsq, 1.0)), 0.0)
    vinv = 1.0 / jnp.maximum(vn, 1e-20)
    vx, vy, vz = vx0 * vinv, vy0 * vinv, vz0 * vinv

    rx0 = 2.0 * dot_nl * nx - lx
    ry0 = 2.0 * dot_nl * ny - ly
    rz0 = 2.0 * dot_nl * nz - lz
    rsq = rx0 * rx0 + ry0 * ry0 + rz0 * rz0
    rok = rsq > 1e-30
    rn = jnp.where(rok, jnp.sqrt(jnp.where(rok, rsq, 1.0)), 0.0)
    rinv = 1.0 / jnp.maximum(rn, 1e-20)
    cos_t = (rx0 * vx + ry0 * vy + rz0 * vz) * rinv

    cos_safe = jnp.maximum(cos_t, 1e-12)
    spec_pow = jnp.where(cos_t > 0.0, jnp.power(cos_safe, ctx.shininess),
                         0.0)
    falloff = jnp.where(dist < ZERO_EPSILON, 1.0, dist)
    inv_f2 = 1.0 / (falloff * falloff)

    out = []
    for col, kd_c, ks_c in ((cr, ctx.kd[0], ctx.ks[0]),
                            (cg, ctx.kd[1], ctx.ks[1]),
                            (cb, ctx.kd[2], ctx.ks[2])):
        diffuse = col * kd_c * dot_nl
        specular = col * ks_c * spec_pow
        diffuse = jnp.where(jnp.isnan(diffuse), 0.0, diffuse)
        specular = jnp.where(jnp.isnan(specular), 0.0, specular)
        o = (diffuse + specular) * inv_f2
        out.append(jnp.where((dot_nl < 0.0) | ~ctx.valid, 0.0, o))
    return tuple(out)


def target_pdf_planes(ctx: ShadeCtx, px, py, pz, cr, cg, cb,
                      features: Features) -> jnp.ndarray:
    """target_pdf (= ||phong||_2) on scalar component planes — see
    phong_shade_planes."""
    r, g, b = phong_shade_planes(ctx, px, py, pz, cr, cg, cb, features)
    sq = r * r + g * g + b * b
    ok = sq > 1e-30
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)


def _unbroadcast(g, shape):
    """Sum a cotangent down to ``shape`` (reverse of NumPy broadcasting)."""
    extra = g.ndim - len(shape)
    if extra > 0:
        g = g.sum(axis=tuple(range(extra)))
    ax = tuple(i for i, (gd, sd) in enumerate(zip(g.shape, shape))
               if sd == 1 and gd != 1)
    if ax:
        g = g.sum(axis=ax, keepdims=True)
    return g


def _phat_math(p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2, kd3,
               ks1, ks2, ks3, shin, validf, px, py, pz, cr, cg, cb):
    """Shared forward scalars of target_pdf_planes (same ops, same guard
    structure as phong_shade_planes — values are identical). Returns the
    intermediates the analytic backward reuses."""
    tox, toy, toz = px - p1, py - p2, pz - p3
    dist2 = tox * tox + toy * toy + toz * toz
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-24))
    dinv = 1.0 / jnp.maximum(dist, 1e-20)
    lx, ly, lz = tox * dinv, toy * dinv, toz * dinv
    dot_nl = n1 * lx + n2 * ly + n3 * lz

    vx0, vy0, vz0 = vo1 - p1, vo2 - p2, vo3 - p3
    vsq = vx0 * vx0 + vy0 * vy0 + vz0 * vz0
    vok = vsq > 1e-30
    vn = jnp.where(vok, jnp.sqrt(jnp.where(vok, vsq, 1.0)), 0.0)
    vinv = 1.0 / jnp.maximum(vn, 1e-20)
    vx, vy, vz = vx0 * vinv, vy0 * vinv, vz0 * vinv

    rx0 = 2.0 * dot_nl * n1 - lx
    ry0 = 2.0 * dot_nl * n2 - ly
    rz0 = 2.0 * dot_nl * n3 - lz
    rsq = rx0 * rx0 + ry0 * ry0 + rz0 * rz0
    rok = rsq > 1e-30
    rn = jnp.where(rok, jnp.sqrt(jnp.where(rok, rsq, 1.0)), 0.0)
    rinv = 1.0 / jnp.maximum(rn, 1e-20)
    rv = rx0 * vx + ry0 * vy + rz0 * vz
    cos_t = rv * rinv

    cos_safe = jnp.maximum(cos_t, 1e-12)
    spec_pow = jnp.where(cos_t > 0.0, jnp.power(cos_safe, shin), 0.0)
    falloff = jnp.where(dist < ZERO_EPSILON, 1.0, dist)
    inv_f2 = 1.0 / (falloff * falloff)

    dead = (dot_nl < 0.0) | (validf < 0.5)
    out = []
    for col, kd_c, ks_c in ((cr, kd1, ks1), (cg, kd2, ks2), (cb, kd3, ks3)):
        diffuse = col * kd_c * dot_nl
        specular = col * ks_c * spec_pow
        diffuse = jnp.where(jnp.isnan(diffuse), 0.0, diffuse)
        specular = jnp.where(jnp.isnan(specular), 0.0, specular)
        o = (diffuse + specular) * inv_f2
        out.append(jnp.where(dead, 0.0, o))
    r, g, b = out
    sq = r * r + g * g + b * b
    ok = sq > 1e-30
    p_hat = jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
    return (p_hat, (r, g, b), ok, dead,
            (tox, toy, toz, dist2, dist, dinv, lx, ly, lz, dot_nl,
             vx0, vy0, vz0, vok, vn, vinv, vx, vy, vz,
             rx0, ry0, rz0, rok, rn, rinv, rv, cos_t, cos_safe, spec_pow,
             falloff, inv_f2))


@jax.custom_vjp
def _phat_cv(p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2, kd3,
             ks1, ks2, ks3, shin, validf, px, py, pz, cr, cg, cb):
    return _phat_math(p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2,
                      kd3, ks1, ks2, ks3, shin, validf, px, py, pz,
                      cr, cg, cb)[0]


def _phat_cv_fwd(*args):
    return _phat_cv(*args), args


def _phong_bwd_core(args, mids, rgb, go_r, go_g, go_b):
    """Shared closed-form backward of the phong planes given per-channel
    output cotangents go_c (already zeroed on dead pixels). Guard semantics
    mirror the AD path's double-wheres (each max/sqrt/where gate
    contributes the same zero-or-pass derivative); equality is to f32
    rounding, validated against AD in
    tests/test_grad_mis.py::test_analytic_phat_vjp_matches_ad."""
    (p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2, kd3,
     ks1, ks2, ks3, shin, validf, px, py, pz, cr, cg, cb) = args
    r, g, b = rgb
    (tox, toy, toz, dist2, dist, dinv, lx, ly, lz, dot_nl,
     vx0, vy0, vz0, vok, vn, vinv, vx, vy, vz,
     rx0, ry0, rz0, rok, rn, rinv, rv, cos_t, cos_safe, spec_pow,
     falloff, inv_f2) = mids

    # Per-channel product-rule fan-out (diffuse + specular, shared invf2).
    d_cr = (kd1 * dot_nl + ks1 * spec_pow) * inv_f2 * go_r
    d_cg = (kd2 * dot_nl + ks2 * spec_pow) * inv_f2 * go_g
    d_cb = (kd3 * dot_nl + ks3 * spec_pow) * inv_f2 * go_b
    d_kd1 = cr * dot_nl * inv_f2 * go_r
    d_kd2 = cg * dot_nl * inv_f2 * go_g
    d_kd3 = cb * dot_nl * inv_f2 * go_b
    d_ks1 = cr * spec_pow * inv_f2 * go_r
    d_ks2 = cg * spec_pow * inv_f2 * go_g
    d_ks3 = cb * spec_pow * inv_f2 * go_b
    d_dnl = (cr * kd1 * go_r + cg * kd2 * go_g + cb * kd3 * go_b) * inv_f2
    d_sp = (cr * ks1 * go_r + cg * ks2 * go_g + cb * ks3 * go_b) * inv_f2
    # u_c·go_c with u_c = diffuse+specular = o_c/inv_f2 (inv_f2 > 0 always).
    d_invf2 = (r * go_r + g * go_g + b * go_b) / inv_f2

    # specular pow: d/dcos, d/dshin (gated exactly like the AD path).
    pospow = cos_t > 0.0
    d_cos = jnp.where(pospow & (cos_t > 1e-12),
                      shin * spec_pow / cos_safe, 0.0) * d_sp
    d_shin = jnp.where(pospow, spec_pow * jnp.log(cos_safe), 0.0) * d_sp

    # falloff chain: invf2 = falloff⁻²; falloff = where(dist<ε, 1, dist).
    d_dist = jnp.where(dist < ZERO_EPSILON, 0.0,
                       -2.0 * inv_f2 / falloff) * d_invf2

    # cos_t = rv·rinv
    d_rv = d_cos * rinv
    d_rinv = d_cos * rv
    d_rn = jnp.where(rn > 1e-20, -(rinv * rinv), 0.0) * d_rinv
    d_rsq = jnp.where(rok, 0.5 * rinv, 0.0) * d_rn  # 1/(2·rn) = rinv/2

    d_rx = 2.0 * rx0 * d_rsq + vx * d_rv
    d_ry = 2.0 * ry0 * d_rsq + vy * d_rv
    d_rz = 2.0 * rz0 * d_rsq + vz * d_rv
    d_vx = rx0 * d_rv
    d_vy = ry0 * d_rv
    d_vz = rz0 * d_rv

    # v = v0·vinv
    d_vinv = vx0 * d_vx + vy0 * d_vy + vz0 * d_vz
    d_vn = jnp.where(vn > 1e-20, -(vinv * vinv), 0.0) * d_vinv
    d_vsq = jnp.where(vok, 0.5 * vinv, 0.0) * d_vn
    d_vx0 = vinv * d_vx + 2.0 * vx0 * d_vsq
    d_vy0 = vinv * d_vy + 2.0 * vy0 * d_vsq
    d_vz0 = vinv * d_vz + 2.0 * vz0 * d_vsq

    # r0 = 2·dnl·n − l̂
    d_dnl = d_dnl + 2.0 * (n1 * d_rx + n2 * d_ry + n3 * d_rz)
    d_n1 = 2.0 * dot_nl * d_rx
    d_n2 = 2.0 * dot_nl * d_ry
    d_n3 = 2.0 * dot_nl * d_rz
    d_lx = -d_rx
    d_ly = -d_ry
    d_lz = -d_rz

    # dnl = n·l̂
    d_n1 = d_n1 + lx * d_dnl
    d_n2 = d_n2 + ly * d_dnl
    d_n3 = d_n3 + lz * d_dnl
    d_lx = d_lx + n1 * d_dnl
    d_ly = d_ly + n2 * d_dnl
    d_lz = d_lz + n3 * d_dnl

    # l̂ = to·dinv; dinv = 1/max(dist, 1e-20)
    d_tox = dinv * d_lx
    d_toy = dinv * d_ly
    d_toz = dinv * d_lz
    d_dinv = tox * d_lx + toy * d_ly + toz * d_lz
    d_dist = d_dist + jnp.where(dist > 1e-20, -(dinv * dinv), 0.0) * d_dinv
    d_dist2 = jnp.where(dist2 > 1e-24, 0.5 / dist, 0.0) * d_dist
    d_tox = d_tox + 2.0 * tox * d_dist2
    d_toy = d_toy + 2.0 * toy * d_dist2
    d_toz = d_toz + 2.0 * toz * d_dist2

    # to = L − P; v0 = V0 − P
    d_px, d_py, d_pz = d_tox, d_toy, d_toz
    d_p1 = -d_tox - d_vx0
    d_p2 = -d_toy - d_vy0
    d_p3 = -d_toz - d_vz0
    d_vo1, d_vo2, d_vo3 = d_vx0, d_vy0, d_vz0

    def ub(gv, ref):
        return _unbroadcast(gv, ref.shape)

    return (ub(d_p1, p1), ub(d_p2, p2), ub(d_p3, p3),
            ub(d_n1, n1), ub(d_n2, n2), ub(d_n3, n3),
            ub(d_vo1, vo1), ub(d_vo2, vo2), ub(d_vo3, vo3),
            ub(d_kd1, kd1), ub(d_kd2, kd2), ub(d_kd3, kd3),
            ub(d_ks1, ks1), ub(d_ks2, ks2), ub(d_ks3, ks3),
            ub(d_shin, shin), jnp.zeros_like(validf),
            ub(d_px, px), ub(d_py, py), ub(d_pz, pz),
            ub(d_cr, cr), ub(d_cg, cg), ub(d_cb, cb))


def _phat_cv_bwd(args, ghat):
    """Closed-form VJP of p̂ = ||phong||₂ (VERDICT r4 item 2: the
    O(J·D1·K) Phong backward is the MIS gradient floor). Residuals are the
    INPUTS only — the ~25 shared forward scalars are recomputed once here
    and every cotangent reads them, so reverse-mode holds no per-call
    Phong temporaries and no remat/tangent bookkeeping."""
    p_hat, rgb, ok, dead, mids = _phat_math(*args)
    r, g, b = rgb
    gsafe = jnp.where(ok, ghat / jnp.where(ok, p_hat, 1.0), 0.0)
    go_r = jnp.where(dead, 0.0, gsafe * r)
    go_g = jnp.where(dead, 0.0, gsafe * g)
    go_b = jnp.where(dead, 0.0, gsafe * b)
    return _phong_bwd_core(args, mids, rgb, go_r, go_g, go_b)


_phat_cv.defvjp(_phat_cv_fwd, _phat_cv_bwd)


@jax.custom_vjp
def _phong_cv(p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2, kd3,
              ks1, ks2, ks3, shin, validf, px, py, pz, cr, cg, cb):
    return _phat_math(p1, p2, p3, n1, n2, n3, vo1, vo2, vo3, kd1, kd2,
                      kd3, ks1, ks2, ks3, shin, validf, px, py, pz,
                      cr, cg, cb)[1]


def _phong_cv_fwd(*args):
    return _phong_cv(*args), args


def _phong_cv_bwd(args, gs):
    _, rgb, _, dead, mids = _phat_math(*args)
    go_r = jnp.where(dead, 0.0, gs[0])
    go_g = jnp.where(dead, 0.0, gs[1])
    go_b = jnp.where(dead, 0.0, gs[2])
    return _phong_bwd_core(args, mids, rgb, go_r, go_g, go_b)


_phong_cv.defvjp(_phong_cv_fwd, _phong_cv_bwd)


def phong_shade_planes_analytic(ctx: ShadeCtx, px, py, pz, cr, cg, cb,
                                features: Features):
    """phong_shade_planes with the fused closed-form VJP (identical
    forward). The equal-weight R-MIS backward floor is this function's
    [D1, K]-way AD backward — see target_pdf_planes_analytic."""
    if not features.enable_shading:
        return phong_shade_planes(ctx, px, py, pz, cr, cg, cb, features)
    return _phong_cv(
        ctx.position[0], ctx.position[1], ctx.position[2],
        ctx.normal[0], ctx.normal[1], ctx.normal[2],
        ctx.view_origin[0], ctx.view_origin[1], ctx.view_origin[2],
        ctx.kd[0], ctx.kd[1], ctx.kd[2],
        ctx.ks[0], ctx.ks[1], ctx.ks[2],
        ctx.shininess, ctx.valid.astype(jnp.float32),
        px, py, pz, cr, cg, cb)


def target_pdf_planes_analytic(ctx: ShadeCtx, px, py, pz, cr, cg, cb,
                               features: Features) -> jnp.ndarray:
    """target_pdf_planes with a fused closed-form VJP (forward values are
    identical — same op graph). Used on MIS gradient paths where the
    O(J·D1·K) Phong backward is the per-iteration floor; forward-only
    callers keep target_pdf_planes (XLA fuses both the same)."""
    if not features.enable_shading:
        return target_pdf_planes(ctx, px, py, pz, cr, cg, cb, features)
    return _phat_cv(
        ctx.position[0], ctx.position[1], ctx.position[2],
        ctx.normal[0], ctx.normal[1], ctx.normal[2],
        ctx.view_origin[0], ctx.view_origin[1], ctx.view_origin[2],
        ctx.kd[0], ctx.kd[1], ctx.kd[2],
        ctx.ks[0], ctx.ks[1], ctx.ks[2],
        ctx.shininess, ctx.valid.astype(jnp.float32),
        px, py, pz, cr, cg, cb)


def target_pdf(
    ctx: ShadeCtx, light_pos: jnp.ndarray, light_color: jnp.ndarray,
    features: Features,
) -> jnp.ndarray:
    """p-hat = ||unshadowed Phong shading||_2 (reference targetPDF,
    reservoir.cpp:106-109) → [..., H, W]. Zero for missed pixels. vnorm is
    grad-safe at 0 (the all-zero bsdf is the common case)."""
    bsdf = phong_shade(ctx, light_pos, light_color, features)
    return vnorm(bsdf)


def exposure_tone_mapping(color: jnp.ndarray, features: Features) -> jnp.ndarray:
    """1 - exp(-exposure*c), then gamma (reference
    src/post_processing/tone_mapping.cpp:8-11)."""
    mapped = 1.0 - jnp.exp(-features.exposure * color)
    return jnp.power(jnp.maximum(mapped, 0.0), 1.0 / features.gamma)


def safe_norm(v, axis=-1, keepdims=False, eps=1e-30):
    """L2 norm over an arbitrary axis that is exactly 0 for the zero vector
    with gradient 0 (not NaN) there."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    ok = sq > eps
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)
