"""Weighted reservoir sampling (WRS) as order-invariant, vectorised math.

The reference's Reservoir::update (src/rendering/reservoir.cpp:10-32) is a
sequential, order-dependent stream: each candidate is routed to the
sub-reservoir with the smallest running wSum and accepted with probability
w/wSum using libc rand(). That is unvectorisable and irreproducible.

TPU-native reformulation (estimator-equivalent, deterministic):

- **K fixed lanes** replace the route-to-smallest-wSum load balancing:
  candidate j goes to lane j mod K (candidate generation) and an input
  reservoir's lane-k sample feeds output lane k (combination). Any fixed
  partition preserves the RIS estimator contract — K samples, each with
  W = wSum / (p_hat * M) over its own candidate subset.
- **Gumbel-max selection** replaces streaming accept/reject: within a lane,
  the winner is argmax(log w + Gumbel noise), which selects index i with
  probability w_i / sum(w) *exactly*, is associative/order-invariant, and is
  driven by counter-based jax.random keys (shard-invariant, reproducible).

Combination routines mirror ReSTIR Algorithms 5/6 as implemented by
Reservoir::combineBiased / combineUnbiased (reservoir.cpp:40-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.features import Features
from ..core.types import Reservoirs, ShadeCtx
from ..scene.lights import LightTable, sample_lights
from .intersect import intersect_any
from .shading import safe_norm, target_pdf

SHADOW_RAY_EPSILON = 1e-3  # reference src/utils/utils.h:16


def _expand(ctx: ShadeCtx, axes: int = 1) -> ShadeCtx:
    """Insert trailing sample axes after the pixel axis so ctx fields
    broadcast against [N, S, ...] sample tensors."""
    def f(a):
        for _ in range(axes):
            a = a[:, None]
        return a
    return jax.tree.map(f, ctx)


def visibility(ctx_position, sample_pos, geometry) -> jnp.ndarray:
    """Shadow-ray visibility from surface points to light samples.

    Reference: testVisibilityLightSample (src/utils/utils.cpp:41-56) —
    direction computed from the unoffset point, origin pushed
    SHADOW_RAY_EPSILON along it, t_max = remaining distance.

    ctx_position: [..., 3]; sample_pos: [..., 3] (same shape). Returns bool
    [...] (True = visible). Degenerate (coincident) pairs are visible.
    """
    shape = sample_pos.shape[:-1]
    p = jnp.broadcast_to(ctx_position, sample_pos.shape).reshape(-1, 3)
    s = sample_pos.reshape(-1, 3)
    to = s - p
    dist = safe_norm(to, axis=-1)
    d = to / jnp.maximum(dist, 1e-20)[..., None]
    origin = p + SHADOW_RAY_EPSILON * d
    t_max = safe_norm(s - origin, axis=-1)
    occluded = intersect_any(origin, d, t_max, geometry)
    visible = (~occluded) | (dist <= SHADOW_RAY_EPSILON)
    return visible.reshape(shape)


def _lane_layout(s: int, k: int):
    """Static lane geometry: S candidates → K lanes of ceil(S/K) slots,
    candidate j in lane j mod K, slot j // K. Returns (slots_per_lane,
    per-lane real counts [K], real mask [K, slots])."""
    import numpy as np

    sk = -(-s // k)
    j = np.arange(sk * k).reshape(sk, k).T  # [K, sk]; j = slot*K + lane
    real = j < s
    counts = real.sum(axis=1).astype(np.float32)
    return sk, counts, real


def gen_canonical_samples(
    key: jax.Array,
    ctx: ShadeCtx,
    lights: LightTable,
    num_lights: int,
    geometry,
    features: Features,
) -> Reservoirs:
    """Per-pixel RIS candidate generation (reference genCanonicalSamples,
    src/scene/light.cpp:39-99).

    Draws S = initial_light_samples candidates per pixel — uniform light pick
    (probability 1/num_lights, reference light.cpp:48-51), uniform point on
    the light — weights each by p_hat / (1/num_lights), and runs lane-parallel
    WRS. W = wSum / (p_hat * M) per lane with the zero-p_hat guard
    (light.cpp:85-95); the optional initial visibility check kills W
    (light.cpp:85-88).

    Candidates stream through a `lax.scan` over slot index (one candidate per
    lane per step, all K lanes in parallel) so peak memory is O(N*K) instead
    of O(N*S) — at 1080p the [N, S] layout would be GBs of HBM. The running
    Gumbel-max over the stream is distribution-identical to a global argmax.
    """
    n = ctx.position.shape[0]
    s = features.initial_light_samples
    k = features.num_samples_in_reservoir
    sk, lane_counts, lane_real = _lane_layout(s, k)

    ctx_e = _expand(ctx)
    keys = jax.random.split(key, sk)
    real_per_slot = jnp.asarray(lane_real.T.copy())  # [sk, K] bool

    def step(carry, inp):
        w_sum, best_score, sel_pos, sel_color, sel_w, sel_p_hat = carry
        slot_key, real = inp  # real: [K]
        k1, k2, k3 = jax.random.split(slot_key, 3)
        idx = jax.random.randint(k1, (n, k), 0, num_lights)
        uv = jax.random.uniform(k2, (n, k, 2))
        g = jax.random.gumbel(k3, (n, k))

        pos, color = sample_lights(lights, idx, uv[..., 0], uv[..., 1])
        p_hat = target_pdf(ctx_e, pos, color, features)  # [N, K]
        w = p_hat * float(num_lights) * real[None].astype(jnp.float32)

        score = jnp.where(w > 0.0, jnp.log(jnp.maximum(w, 1e-37)) + g, -jnp.inf)
        upd = score > best_score
        return (
            w_sum + w,
            jnp.where(upd, score, best_score),
            jnp.where(upd[..., None], pos, sel_pos),
            jnp.where(upd[..., None], color, sel_color),
            jnp.where(upd, w, sel_w),
            jnp.where(upd, p_hat, sel_p_hat),
        ), None

    init = (
        jnp.zeros((n, k)),
        jnp.full((n, k), -jnp.inf),
        jnp.zeros((n, k, 3)),
        jnp.zeros((n, k, 3)),
        jnp.zeros((n, k)),
        jnp.zeros((n, k)),
    )
    (w_sum, _, sel_pos, sel_color, sel_w, sel_p_hat), _ = jax.lax.scan(
        step, init, (keys, real_per_slot)
    )

    m = jnp.broadcast_to(jnp.asarray(lane_counts)[None], (n, k))
    big_w = jnp.where(
        sel_p_hat > 0.0,
        (1.0 / jnp.maximum(sel_p_hat, 1e-37)) * (1.0 / jnp.maximum(m, 1.0))
        * w_sum,
        0.0,
    )

    if features.initial_samples_visibility_check:
        vis = visibility(ctx.position[:, None], sel_pos, geometry)
        big_w = jnp.where(vis, big_w, 0.0)

    return Reservoirs(
        pos=sel_pos, color=sel_color, w_sum=w_sum, m=m, big_w=big_w,
        chosen_w=sel_w,
    )


def _stream_weights(receiver: ShadeCtx, inputs: Reservoirs, in_mask, features):
    """Per-input-sample resampling weight at the receiver:
    w = p_hat_receiver(y) * W * M (reservoir.cpp:44-52)."""
    p_hat = target_pdf(_expand(receiver, 2), inputs.pos, inputs.color, features)
    w = p_hat * inputs.big_w * inputs.m
    w = jnp.where(in_mask[..., None], w, 0.0)
    return w, p_hat


def _select_lanewise(key, w, p_hat, inputs: Reservoirs, in_mask):
    """Gumbel-max winner over the R input axis, per output lane k.
    w/p_hat: [N, R, K]. Returns (Reservoirs fields before W computation)."""
    n, r, k = w.shape
    gumbel = jax.random.gumbel(key, (n, r, k))
    score = jnp.where(w > 0.0, jnp.log(jnp.maximum(w, 1e-37)) + gumbel, -jnp.inf)
    win = jnp.argmax(score, axis=1)  # [N, K]

    gather = lambda a: jnp.take_along_axis(
        a, win[:, None, :, None] if a.ndim == 4 else win[:, None, :], axis=1
    ).squeeze(1)
    sel_pos = gather(inputs.pos)
    sel_color = gather(inputs.color)
    sel_w = gather(w)
    sel_p_hat = gather(p_hat)

    w_sum = jnp.sum(w, axis=1)  # [N, K]
    m_out = jnp.sum(jnp.where(in_mask[..., None], inputs.m, 0.0), axis=1)
    return sel_pos, sel_color, sel_w, sel_p_hat, w_sum, m_out


def combine_biased(
    key: jax.Array,
    receiver: ShadeCtx,
    inputs: Reservoirs,  # fields [N, R, K, ...]
    in_mask: jnp.ndarray,  # [N, R] bool — which input reservoirs participate
    features: Features,
) -> Reservoirs:
    """ReSTIR Algorithm 5 (reference Reservoir::combineBiased,
    reservoir.cpp:40-66): re-weight every input sample by
    p_hat_receiver * W * M, resample one winner per lane, then
    W = wSum / (p_hat(winner) * M_total)."""
    w, p_hat = _stream_weights(receiver, inputs, in_mask, features)
    sel_pos, sel_color, sel_w, sel_p_hat, w_sum, m_out = _select_lanewise(
        key, w, p_hat, inputs, in_mask
    )
    big_w = jnp.where(
        (sel_p_hat > 0.0) & (m_out > 0.0),
        (1.0 / jnp.maximum(sel_p_hat, 1e-37))
        * (1.0 / jnp.maximum(m_out, 1e-37))
        * w_sum,
        0.0,
    )
    return Reservoirs(pos=sel_pos, color=sel_color, w_sum=w_sum, m=m_out,
                      big_w=big_w, chosen_w=sel_w)


def combine_unbiased(
    key: jax.Array,
    receiver: ShadeCtx,
    inputs: Reservoirs,  # fields [N, R, K, ...]
    in_mask: jnp.ndarray,  # [N, R]
    input_ctxs: ShadeCtx,  # fields [N, R, ...] — each input's own geometry
    geometry,
    features: Features,
) -> Reservoirs:
    """ReSTIR Algorithm 6 (reference Reservoir::combineUnbiased,
    reservoir.cpp:68-104): same resampling as the biased combine, but the
    denominator counts only inputs whose own target PDF (optionally ×
    visibility from *their* surface point, reservoir.cpp:85-93) is positive
    at the winning sample: W = wSum / (p_hat(winner) * Z)."""
    w, p_hat = _stream_weights(receiver, inputs, in_mask, features)
    sel_pos, sel_color, sel_w, sel_p_hat, w_sum, m_out = _select_lanewise(
        key, w, p_hat, inputs, in_mask
    )

    # Z-count: evaluate the winner samples at every input's geometry.
    # sel_pos [N, K, 3] vs input ctx [N, R] → broadcast to [N, R, K].
    ctx_r = jax.tree.map(lambda a: a[:, :, None], input_ctxs)
    p_hat_at_inputs = target_pdf(
        ctx_r, sel_pos[:, None], sel_color[:, None], features
    )  # [N, R, K]
    if features.spatial_reuse_visibility_check:
        vis = visibility(
            input_ctxs.position[:, :, None],
            jnp.broadcast_to(sel_pos[:, None], p_hat_at_inputs.shape + (3,)),
            geometry,
        )
        p_hat_at_inputs = jnp.where(vis, p_hat_at_inputs, 0.0)

    total_m = jnp.sum(inputs.m, axis=-1)  # [N, R]
    z = jnp.sum(
        jnp.where((p_hat_at_inputs > 0.0) & in_mask[..., None],
                  total_m[..., None], 0.0),
        axis=1,
    )  # [N, K]

    big_w = jnp.where(
        (sel_p_hat > 0.0) & (z > 0.0),
        (1.0 / jnp.maximum(sel_p_hat, 1e-37)) * (1.0 / jnp.maximum(z, 1e-37))
        * w_sum,
        0.0,
    )
    return Reservoirs(pos=sel_pos, color=sel_color, w_sum=w_sum, m=m_out,
                      big_w=big_w, chosen_w=sel_w)


def clamp_temporal_m(prev: Reservoirs, current_total_m, clamp: int) -> Reservoirs:
    """Temporal M-clamping (reference temporalReuse,
    render_utils.cpp:151-163): if the predecessor's total M exceeds
    clamp * current_total_m + 1, rescale each lane's wSum by (bound / M_lane)
    and set M_lane = bound. Float math (the reference uses integer division at
    render_utils.cpp:160 — a documented quirk we do not copy)."""
    bound = clamp * current_total_m + 1.0  # [N]
    needs = prev.total_m() > bound  # [N]
    lane_nonzero = prev.m > 0.0
    scale = jnp.where(lane_nonzero, bound[:, None] / jnp.maximum(prev.m, 1e-37),
                      1.0)
    new_w_sum = jnp.where(needs[:, None] & lane_nonzero,
                          prev.w_sum * scale, prev.w_sum)
    new_m = jnp.where(needs[:, None] & lane_nonzero,
                      jnp.broadcast_to(bound[:, None], prev.m.shape), prev.m)
    return prev.replace(w_sum=new_w_sum, m=new_m)
