"""R-MIS: reservoir-based multiple importance sampling.

Reference: renderRMIS (src/rendering/render.cpp:64-119). Iterated RIS over a
fixed per-pixel neighbourhood: each iteration draws fresh canonical
reservoirs, then every pixel shades every sample of its D+1 neighbourhood
pixels with a per-sample MIS weight — Equal (1/|neighbourhood|, render.cpp:97)
or the generalised balance heuristic (render_utils.cpp:179-187) — times the
sample's unbiased contribution weight W, divided by K samples per reservoir.
Iterations are averaged and tone mapped (combineToScreen,
render_utils.cpp:68-85).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, generate_rays
from ..core.features import Features, MISWeight
from ..core.types import ShadeCtx
from ..ops.shading import exposure_tone_mapping, phong_shade, target_pdf
from ..ops.wrs import gen_canonical_samples, visibility
from .neighbours import select_neighbour_indices
from .restir import trace_primary

PH_NEIGHBOURS = 11
PH_ITER = 12

FLT_MIN = 1.17549435e-38  # matches the reference's FLT_MIN denominators


def _balance_heuristic(
    nbhd_ctx: ShadeCtx,  # fields [N, D1, ...]
    sample_pos,  # [N, D1, K, 3]
    sample_color,  # [N, D1, K, 3]
    receiver_p_hat,  # [N, D1, K] — p_hat at the receiver, precomputed
    features: Features,
):
    """generalisedBalanceHeuristic (render_utils.cpp:179-187):
    p_hat_receiver(y) / (FLT_MIN + Σ_j p_hat_j(y)), denominator over every
    neighbourhood pixel j's own geometry."""
    # Evaluate each sample against every neighbourhood pixel's geometry:
    # ctx [N, 1, 1, D1] × samples [N, D1, K, 1].
    ctx_j = jax.tree.map(
        lambda a: jnp.moveaxis(a, 1, -1 if a.ndim == 2 else a.ndim - 1)[
            :, None, None] if a.ndim == 2
        else jnp.moveaxis(a, 1, 1)[:, None, None], nbhd_ctx)
    # Simpler explicit construction: expand samples with a trailing axis for j.
    d1 = sample_pos.shape[1]

    def at_j(a):
        # [N, D1(j), ...] → [N, 1(d), 1(k), D1(j), ...]
        return a[:, None, None]

    ctx_j = jax.tree.map(at_j, nbhd_ctx)
    p_all = target_pdf(
        ctx_j, sample_pos[..., None, :], sample_color[..., None, :], features,
    )  # [N, D1, K, D1]
    denom = FLT_MIN + jnp.sum(p_all, axis=-1)
    return receiver_p_hat / denom


def render_rmis(
    key,
    cam: CameraParams,
    geometry,
    lights,
    num_lights: int,
    height: int,
    width: int,
    features: Features,
):
    """Full R-MIS render → tone-mapped image [H, W, 3]."""
    n = height * width
    d1 = features.num_neighbours_to_sample + 1

    rays = generate_rays(cam, height, width)
    _, ctx = trace_primary(rays, geometry, features)
    nbr_idx = select_neighbour_indices(
        jax.random.fold_in(key, PH_NEIGHBOURS), ctx, height, width, features,
    )  # [N, D1]
    nbhd_ctx = jax.tree.map(lambda a: a[nbr_idx], ctx)  # [N, D1, ...]

    equal_w = 1.0 / d1

    def iteration(carry, it_key):
        acc = carry
        res = gen_canonical_samples(it_key, ctx, lights, num_lights,
                                    geometry, features)
        nb = jax.tree.map(lambda a: a[nbr_idx], res)  # [N, D1, K, ...]

        # Shading + visibility of every neighbourhood sample at the receiver.
        ctx_e = jax.tree.map(lambda a: a[:, None, None], ctx)
        shade = phong_shade(ctx_e, nb.pos, nb.color, features)  # [N,D1,K,3]
        vis = visibility(
            ctx.position[:, None, None],
            jnp.broadcast_to(nb.pos, nb.pos.shape), geometry,
        )  # [N, D1, K]
        sample_color = jnp.where(vis[..., None], shade, 0.0)

        if features.mis_weight_rmis == MISWeight.BALANCE:
            recv_p_hat = target_pdf(ctx_e, nb.pos, nb.color, features)
            mis_w = _balance_heuristic(nbhd_ctx, nb.pos, nb.color,
                                       recv_p_hat, features)
        else:
            mis_w = jnp.full(nb.big_w.shape, equal_w)

        contrib = (mis_w * nb.big_w)[..., None] * sample_color / nb.k
        return acc + contrib.sum(axis=(1, 2)), None

    it_keys = jax.random.split(jax.random.fold_in(key, PH_ITER),
                               features.max_iterations_mis)
    acc, _ = jax.lax.scan(iteration, jnp.zeros((n, 3)), it_keys)

    color = acc / features.max_iterations_mis
    if features.enable_tone_mapping:
        color = exposure_tone_mapping(color, features)
    return color.reshape(height, width, 3)
