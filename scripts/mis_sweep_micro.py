"""Isolated timing of ONE fused R-MIS/R-OMIS sweep-kernel call at 1080p on
TPU (synthetic reservoirs/offsets, real flagship geometry) — the iteration
loop costs 5x this per frame, so kernel ablations are measured here without
full-frame compiles.

Run: python scripts/mis_sweep_micro.py [rmis_equal|rmis_balance|romis]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, reps=8):
    def scanned(*a):
        def step(s, _):
            return s + jnp.sum(fn(s, *a)), None

        acc, _ = jax.lax.scan(step, jnp.float32(1.0), None, length=reps)
        return acc

    jfn = jax.jit(scanned)
    t0 = time.perf_counter()
    float(jfn(*args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>24}: {best / reps * 1e3:8.2f} ms (compile {comp:.0f}s)",
          flush=True)


def main():
    import __graft_entry__ as ge
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_mis import (
        mis_iteration_pallas, mis_pack_planes, resolve_neighbour_ctx,
    )
    from romis_tpu.ops.pallas_ris import compact_pack_ok
    from romis_tpu.ops.wrs import _lane_layout

    mode = sys.argv[1] if len(sys.argv) > 1 else "rmis_equal"
    res_s = os.environ.get("RMIS_RES", "1080x1920")
    h, w = (int(x) for x in res_s.split("x"))
    feats = Features()
    k = feats.num_samples_in_reservoir
    d = feats.num_neighbours_to_sample
    radius = feats.spatial_resample_radius
    romis = mode == "romis"
    compact = (os.environ.get("MIS_COMPACT", "1") == "1")
    _, lane_counts, _ = _lane_layout(feats.initial_light_samples, k)

    scene = ge._flagship_scene()
    geometry = scene.geometry
    compact = compact and compact_pack_ok(scene.lights)
    # Plane count must reflect the DOWNGRADED compact flag (a scene without
    # an affine/const light table packs 7K/8K planes, not 4K/5K).
    c_res = mis_pack_planes(mode, k, compact)
    print("compact pack:", compact)

    rng = np.random.default_rng(0)
    cen_ctx = jnp.asarray(
        rng.uniform(0.1, 1.0, (18, h, w)).astype(np.float32))
    res_planes = rng.uniform(0.1, 1.0, (c_res, h, w)).astype(np.float32)
    if compact:
        res_planes[:k] = np.floor(
            rng.uniform(0, scene.num_lights, (k, h, w)))
    res_planes = jnp.asarray(res_planes)
    offs = jnp.asarray(rng.integers(-radius, radius + 1, (2 * d, h, w)),
                       jnp.int32)
    nbr_ctx = None
    if mode != "rmis_equal":
        nbr_ctx = jax.jit(resolve_neighbour_ctx, static_argnums=2)(
            cen_ctx, offs, radius)
        timed("resolve_nbr_ctx",
              lambda s, c, o: resolve_neighbour_ctx(c * s, o, radius),
              cen_ctx, offs, reps=4)

    def sweep(s, cen, res, off, nc):
        out = mis_iteration_pallas(
            cen, res * s, off, geometry, k, radius, mode,
            scene.num_lights, lane_counts, nbr_ctx=nc,
            lights=scene.lights if compact else None, compact=compact)
        return out[0] if isinstance(out, tuple) else out

    timed(f"sweep[{mode}]", sweep, cen_ctx, res_planes, offs, nbr_ctx)


if __name__ == "__main__":
    main()
