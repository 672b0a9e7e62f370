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
