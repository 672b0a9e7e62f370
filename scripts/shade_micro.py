"""Microbenchmark of final_shade's building blocks on TPU at 1080p.

Rows attribute final_shade's frame cost (12 ms measured in phase_bench):
the K=2 any-hit shadow trace, the Phong evaluation, and the XLA glue
between them. ANY_TILE=bhxbw overrides the any-hit kernel tile to probe
culling coherence. Run: python scripts/shade_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp


def main():
    h, w = 1080, 1920
    reps = 20

    import romis_tpu.ops.pallas_trace as ptr
    if os.environ.get("ANY_TILE"):
        bh, bw = (int(x) for x in os.environ["ANY_TILE"].split("x"))
        ptr._BH_ANY, ptr._BW_ANY = bh, bw
        print(f"any-hit tile override: {bh}x{bw}")

    from romis_tpu.core.features import Features
    from romis_tpu.ops.shading import phong_shade
    from romis_tpu.ops.wrs import gen_canonical_samples, visibility
    from romis_tpu.render.restir import generate_rays, trace_primary
    import __graft_entry__ as ge

    scene = ge._flagship_scene()
    features = Features()
    cam = ge._flagship_camera(h, w)
    geometry, lights, n_lights = (scene.geometry, scene.lights,
                                  scene.num_lights)

    @jax.jit
    def setup(key):
        rays = generate_rays(cam, h, w)
        _, ctx = trace_primary(rays, geometry, features)
        res = gen_canonical_samples(key, ctx, lights, n_lights, geometry,
                                    features)
        return ctx, res

    ctx, res = setup(jax.random.PRNGKey(0))
    jax.block_until_ready(res)

    only = os.environ.get("PHASES")
    only = [s.strip() for s in only.split(",")] if only else None

    def timed(name, body):
        if only is not None and not any(s in name for s in only):
            return

        def run(key, ctx, res):
            def f(carry, kk):
                jitter = 1e-6 * jax.random.normal(kk, res.pos.shape)
                r2 = res.replace(pos=res.pos + jitter)
                return carry, jnp.sum(body(ctx, r2))
            keys = jax.random.split(key, reps)
            _, sums = jax.lax.scan(f, 0.0, keys)
            return jnp.sum(sums)

        fn = jax.jit(run)
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(1), ctx, res))
        t1 = time.perf_counter()
        best = np.inf
        for i in range(2, 5):
            ta = time.perf_counter()
            float(fn(jax.random.PRNGKey(i), ctx, res))
            best = min(best, time.perf_counter() - ta)
        print(f"{name:28s} compile {t1 - t0 - best:6.1f}s  "
              f"{1000 * best / reps:8.2f} ms/rep", flush=True)

    timed("visibility K=2",
          lambda ctx, res: visibility(ctx.position, res.pos, geometry))
    timed("visibility lane0 only",
          lambda ctx, res: visibility(ctx.position, res.pos[0:1], geometry))
    timed("phong K=2",
          lambda ctx, res: phong_shade(ctx, res.pos, res.color, features))

    def full(ctx, res):
        from romis_tpu.render.restir import final_shade
        return final_shade(ctx, res, geometry, features)

    timed("final_shade (full)", full)


if __name__ == "__main__":
    main()
