"""Ray-triangle intersection: batched Möller–Trumbore over the scene soup.

This is the brute-force backend (every ray tests every triangle) — the
baseline the BVH/Pallas backend (ops/traverse.py) is validated against, and
the *faster* choice for the reference's own scenes (1–640 triangles: one
fused VPU loop beats divergent traversal).

Reference analogs: EmbreeInterface::closestHit / anyHit
(src/ray_tracing/embree_interface.cpp:58-90). Embree's rtcIntersect1 becomes a
`lax.scan` over static triangle blocks with a running per-ray best hit: rays
are the vector axis (VPU lanes), triangle blocks stream through VMEM, memory
is O(N_rays * block) instead of O(N_rays * T).

Semantics:
- closest hit accepts t in (0, t_max) and returns barycentrics (u toward v1,
  v toward v2) for attribute interpolation (embree rtcInterpolate0 analog),
- any-hit (shadow) accepts t in (0, t_max); the caller applies the
  SHADOW_RAY_EPSILON origin offset (reference utils.cpp:41-56),
- ties in t resolve to the lowest triangle index (deterministic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import HitRecord, Rays
from .shading import diffuse_albedo, safe_norm
from ..core.features import Features
from ..core.types import ShadeCtx

MT_EPSILON = 1e-9


def _pick_block(num_rays: int, num_tris: int, budget: int = 1 << 23) -> int:
    """Triangle block size so the [rays, block] working set stays ~budget."""
    block = max(1, budget // max(num_rays, 1))
    block = min(block, num_tris)
    # Round to a divisor-friendly size (num_tris is a multiple of TRI_PAD=128).
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= block and num_tris % cand == 0:
            return cand
    return 1


def _mt_block(origins, dirs, v0, e1, e2, active):
    """Möller–Trumbore for a [N] ray batch against a [B] triangle block.
    Returns (t [N, B], u, v) with t = +inf on miss."""
    d = dirs[:, None, :]  # [N, 1, 3]
    o = origins[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])  # [N, B, 3]
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)  # [N, B]
    # Double-where keeps the backward pass NaN-free on degenerate triangles
    # (grad of 1/det at det→0 would otherwise poison vertex gradients).
    det_ok = jnp.abs(det) > MT_EPSILON
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = jnp.where(det_ok, 1.0 / det_safe, 0.0)
    tvec = o - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    vv = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    ok = (
        det_ok
        & (u >= 0.0) & (u <= 1.0)
        & (vv >= 0.0) & (u + vv <= 1.0)
        & (t > 0.0)
        & active[None, :]
    )
    return jnp.where(ok, t, jnp.inf), u, vv


def intersect_closest(rays: Rays, geometry, t_max=None):
    """Closest hit of each ray against the whole soup.

    Returns (t [N], tri_idx [N] int32, u [N], v [N]); t = +inf / tri = -1 on
    miss. Reference: EmbreeInterface::closestHit (embree_interface.cpp:64-90).
    """
    n = rays.n
    num_tris = geometry.num_tris
    block = _pick_block(n, num_tris)
    steps = num_tris // block

    tri_blocks = jax.tree.map(
        lambda a: a.reshape((steps, block) + a.shape[1:]),
        (geometry.v0, geometry.e1, geometry.e2, geometry.active),
    )

    tmax0 = jnp.full((n,), jnp.inf) if t_max is None else t_max

    def body(carry, blk):
        best_t, best_i, best_u, best_v, base = carry
        v0, e1, e2, act = blk
        t, u, v = _mt_block(rays.origin, rays.direction, v0, e1, e2, act)
        t = jnp.where(t < tmax0[:, None], t, jnp.inf)
        loc = jnp.argmin(t, axis=-1)  # [N] lowest index wins ties
        rows = jnp.arange(n)
        t_b, u_b, v_b = t[rows, loc], u[rows, loc], v[rows, loc]
        better = t_b < best_t
        best_t = jnp.where(better, t_b, best_t)
        best_i = jnp.where(better, base + loc.astype(jnp.int32), best_i)
        best_u = jnp.where(better, u_b, best_u)
        best_v = jnp.where(better, v_b, best_v)
        return (best_t, best_i, best_u, best_v, base + block), None

    init = (
        jnp.full((n,), jnp.inf),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.int32(0),
    )
    (best_t, best_i, best_u, best_v, _), _ = jax.lax.scan(body, init, tri_blocks)
    return best_t, best_i, best_u, best_v


def intersect_any(origins, dirs, t_max, geometry) -> jnp.ndarray:
    """Occlusion query: True where some triangle lies at t in (0, t_max).
    Reference: EmbreeInterface::anyHit (embree_interface.cpp:58-62)."""
    n = origins.shape[0]
    num_tris = geometry.num_tris
    block = _pick_block(n, num_tris)
    steps = num_tris // block

    tri_blocks = jax.tree.map(
        lambda a: a.reshape((steps, block) + a.shape[1:]),
        (geometry.v0, geometry.e1, geometry.e2, geometry.active),
    )

    def body(occluded, blk):
        v0, e1, e2, act = blk
        t, _, _ = _mt_block(origins, dirs, v0, e1, e2, act)
        hit = jnp.any(t < t_max[:, None], axis=-1)
        return occluded | hit, None

    occluded, _ = jax.lax.scan(body, jnp.zeros((n,), bool), tri_blocks)
    return occluded


def make_hit_record(rays: Rays, geometry, t, tri, u, v) -> HitRecord:
    """Gather interpolated hit attributes (reference rtcInterpolate0 calls,
    embree_interface.cpp:76-81). Shading normals are normalized (deviation
    from the reference's raw interpolation — documented in ops/shading.py)."""
    valid = jnp.isfinite(t)
    idx = jnp.maximum(tri, 0)
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]
    normal = w * geometry.n0[idx] + uu * geometry.n1[idx] + vv * geometry.n2[idx]
    norm = safe_norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-20)
    uv = w * geometry.uv0[idx] + uu * geometry.uv1[idx] + vv * geometry.uv2[idx]
    return HitRecord(
        valid=valid,
        t=t,
        normal=jnp.where(valid[..., None], normal, 0.0),
        uv=jnp.where(valid[..., None], uv, 0.0),
        mat_id=jnp.where(valid, geometry.mat_id[idx], 0),
        geom_id=jnp.where(valid, geometry.geom_id[idx], -1),
        prim_id=jnp.where(valid, tri, -1),
    )


def make_shade_ctx(rays: Rays, hits: HitRecord, geometry,
                   features: Features) -> ShadeCtx:
    """Bundle everything the target PDF / shading needs about the receiver."""
    safe_t = jnp.where(hits.valid, hits.t, 0.0)
    position = rays.origin + safe_t[..., None] * rays.direction
    kd = diffuse_albedo(geometry, hits.mat_id, hits.uv, features)
    return ShadeCtx(
        valid=hits.valid,
        position=position,
        normal=hits.normal,
        view_origin=rays.origin,
        kd=kd,
        ks=geometry.mat_ks[hits.mat_id],
        shininess=geometry.mat_shininess[hits.mat_id],
        geom_id=hits.geom_id,
        depth_t=safe_t,
    )
