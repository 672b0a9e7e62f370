"""TPU benchmark: paged Pallas BVH traversal (ops/pallas_bvh.py) vs the
XLA lockstep while_loop (ops/traverse.py) on a >10k-triangle scene.

Workload: monkey_field NxN (N*N*500 + 2 tris), 1080p primary rays
(closest-hit) and one shadow-ray batch (any-hit). Tunnel protocol: reps
inside one jitted lax.scan, fetch one scalar, min of 3 calls.

Run: python scripts/bvh_bench.py [N] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from romis_tpu.core.camera import camera_position, generate_rays, make_camera
from romis_tpu.core.types import Rays
from romis_tpu.ops.bvh import build_bvh
from romis_tpu.ops.pallas_bvh import paged_any, paged_closest
from romis_tpu.ops.traverse import bvh_any, bvh_closest
from romis_tpu.scene.scene import load_monkey_field

H, W = 1080, 1920


def timed(name, fn, *args, reps=8, n_rays=H * W):
    """One jitted scan of `reps` calls; min-of-3 wall clocks."""

    def scanned(key, *a):
        def step(carry, i):
            out = fn(jax.random.fold_in(key, i), *a)
            return carry + out, ()

        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    jfn = jax.jit(scanned)
    t0 = time.perf_counter()
    jfn(jax.random.PRNGKey(0), *args).block_until_ready()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        jfn(jax.random.PRNGKey(r), *args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ms = best / reps * 1e3
    mray = n_rays / (ms * 1e-3) / 1e6
    print(f"{name}: {ms:8.2f} ms/query  {mray:9.1f} Mray/s  "
          f"(compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("backend:", jax.default_backend(), flush=True)
    scene = load_monkey_field(n)
    bvh, geo = build_bvh(scene.geometry)
    n_tris = int(jnp.sum(geo.active))
    paged = bvh.paged
    print(f"scene {scene.name}: {n_tris} tris, "
          f"{bvh.n_nodes} nodes, top tree {paged.nodes_box.shape[1]} nodes, "
          f"{paged.n_pages} pages x {paged.page_tris}", flush=True)

    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(25, 30, 0),
                      distance=2.2 * n, fov_deg=50, resolution=(H, W))
    rays = generate_rays(cam, H, W)
    cpos = camera_position(cam)

    def jitter_rays(key):
        d = rays.direction + 1e-4 * jax.random.normal(key, rays.direction.shape)
        d = d / jnp.sqrt(jnp.sum(d * d, axis=0, keepdims=True))
        return Rays(origin=rays.origin, direction=d)

    # -- closest hit ---------------------------------------------------
    def paged_c(key):
        r = jitter_rays(key)
        t, tri, u, v = paged_closest(r, paged)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    def xla_c(key):
        r = jitter_rays(key)
        t, tri, u, v = bvh_closest(r, geo, bvh)
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    ms_p = timed("paged closest 1080p", paged_c, reps=reps)
    ms_x = timed("xla   closest 1080p", xla_c, reps=max(1, reps // 8))
    print(f"closest speedup: {ms_x / ms_p:.1f}x", flush=True)

    # -- any hit (shadow rays toward a fixed point light) --------------
    lpos = jnp.asarray([0.0, 1.5 * n, 0.0])

    def shadow_batch(key):
        r = jitter_rays(key)
        t, tri, u, v = paged_closest(r, paged)
        hitp = r.origin + r.direction * jnp.where(jnp.isfinite(t), t, 0.0)
        d = lpos[:, None, None] - hitp
        dist = jnp.sqrt(jnp.sum(d * d, axis=0))
        return hitp + 1e-3 * d / dist[None], d, dist

    def paged_a(key):
        o, d, dist = shadow_batch(key)
        occ = paged_any(o, d, dist, paged)
        return jnp.sum(occ.astype(jnp.float32))

    def xla_a(key):
        o, d, dist = shadow_batch(key)
        occ = bvh_any(o, d, dist, geo, bvh)
        return jnp.sum(occ.astype(jnp.float32))

    ms_pa = timed("paged any     1080p", paged_a, reps=reps)
    ms_xa = timed("xla   any     1080p", xla_a, reps=max(1, reps // 8))
    # any-hit timings include one paged_closest to build the batch.
    print(f"any speedup (incl. shared closest): {ms_xa / ms_pa:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
