"""Microbenchmark of the fused spatial-pass kernel on TPU.

Times spatial_pass_pallas at 1080p for several (n_nbr, radius) points to
attribute cost: DMA+center (n_nbr=0), per-neighbour resolve (slope over
n_nbr), halo size (radius).  Run: python scripts/spatial_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    h, w, k = 1080, 1920, 2
    reps = 20

    import romis_tpu.ops.pallas_spatial as ps
    if os.environ.get("SP_TILE"):
        bh, bw = (int(x) for x in os.environ["SP_TILE"].split("x"))
        ps._BH, ps._BW = bh, bw
        # spatial_pass_pallas picks its tile height via pick_tile_h(h),
        # which ignores _BH unless nothing in its list divides h — bypass
        # it so the override actually takes effect.
        ps.pick_tile_h = lambda h: bh
        print(f"spatial tile override: {bh}x{bw}")

    from romis_tpu.ops.pallas_spatial import spatial_pass_pallas

    key = jax.random.PRNGKey(0)
    res_planes = jax.random.uniform(key, (10 * k, h, w), jnp.float32)
    cen_ctx = jax.random.uniform(jax.random.fold_in(key, 1), (18, h, w),
                                 jnp.float32)

    for n_nbr, radius in [(0, 10), (1, 10), (5, 10)]:
        def run(seed0, res_planes, cen_ctx):
            def f(s, _):
                out = spatial_pass_pallas(
                    s, res_planes, cen_ctx[3:8], cen_ctx, k, n_nbr, radius)
                return s + 1, jnp.sum(out[0])
            _, sums = jax.lax.scan(f, seed0, None, length=reps)
            return jnp.sum(sums)

        fn = jax.jit(run, static_argnums=())
        t0 = time.perf_counter()
        float(fn(jnp.int32(1), res_planes, cen_ctx))
        t1 = time.perf_counter()
        best = float("inf")
        for i in range(2, 5):  # min-of-3: tunnel adds ~0-1s per dispatch
            ta = time.perf_counter()
            float(fn(jnp.int32(i), res_planes, cen_ctx))
            best = min(best, time.perf_counter() - ta)
        print(f"n_nbr={n_nbr} r={radius:2d}  compile {t1-t0-best:5.1f}s "
              f"{1000*best/reps:7.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
