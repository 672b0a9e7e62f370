"""Unbiased-combination 1080p frame timing, A/B over the Z-count
plane-separation block cull (VERDICT r4 weak #4 'fewer tests').

Times the full unbiased ReSTIR frame (nightclub, reference defaults +
unbiased_combination) with and without spatial_reuse_visibility_check, and
for the vis-check frame with the round-5 triangle-plane block cull
(ops/pallas_trace._plane_cull_blocks) on vs off.

Run: python scripts/unbiased_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(name, scene, cam, h, w, features, reps=10):
    from romis_tpu.render.restir import (
        initial_temporal_state, render_restir_frame,
    )

    prev = initial_temporal_state(h, w, features.num_samples_in_reservoir,
                                  cam)

    def frames(key, prev):
        def body(state, k):
            img, state = render_restir_frame(
                k, cam, scene.geometry, scene.lights, scene.num_lights,
                h, w, features, state)
            return state, jnp.mean(img)

        keys = jax.random.split(key, reps)
        state, means = jax.lax.scan(body, prev, keys)
        return jnp.sum(means)

    fn = jax.jit(frames)
    t0 = time.perf_counter()
    v = float(fn(jax.random.PRNGKey(0), prev))
    comp = time.perf_counter() - t0
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        float(fn(jax.random.PRNGKey(r), prev))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best / reps * 1e3:8.1f} ms/frame "
          f"(compile {comp:.0f}s, mean {v:.4g})", flush=True)
    return best / reps * 1e3


def main():
    import __graft_entry__ as ge
    from romis_tpu.core.features import Features
    from romis_tpu.ops import pallas_trace

    h, w = 1080, 1920
    scene = ge._flagship_scene()
    cam = ge._flagship_camera(h, w)

    feats_nv = Features(unbiased_combination=True)
    feats_v = Features(unbiased_combination=True,
                       spatial_reuse_visibility_check=True)

    bench("unbiased (no vis-check)", scene, cam, h, w, feats_nv)

    orig = pallas_trace.pallas_zcount_occ
    try:
        pallas_trace.pallas_zcount_occ = functools.partial(
            orig, block_cull=False)
        bench("unbiased+vis (cull OFF)", scene, cam, h, w, feats_v)
    finally:
        pallas_trace.pallas_zcount_occ = orig
    bench("unbiased+vis (cull ON)", scene, cam, h, w, feats_v)


if __name__ == "__main__":
    main()
