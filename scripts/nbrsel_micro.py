"""Micro-profile the MIS per-frame constants (VERDICT r3 item 5):
neighbour selection (fused box-scan kernel) and resolve_neighbour_ctx at
1080p, plus formulation variants. Run: python scripts/nbrsel_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, reps=3):
    jfn = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (c + fn(*a, salt=c), None), jnp.float32(0),
        None, length=reps)[0])
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best / reps * 1e3:8.1f} ms (compile {comp:.0f}s)",
          flush=True)


def main():
    import __graft_entry__ as ge
    from romis_tpu.core.camera import generate_rays
    from romis_tpu.core.features import Features
    from romis_tpu.ops.pallas_mis import resolve_neighbour_ctx
    from romis_tpu.ops.pallas_spatial import pack_center_ctx
    from romis_tpu.render.neighbours import select_neighbour_indices
    from romis_tpu.render.restir import trace_primary
    from romis_tpu.render.rmis import _mis_offsets

    h, w = (int(x) for x in os.environ.get("RMIS_RES",
                                           "1080x1920").split("x"))
    scene = ge._flagship_scene()
    cam = ge._flagship_camera(h, w)
    feats = Features()
    geometry = scene.geometry
    rays = generate_rays(cam, h, w)
    _, ctx = jax.jit(lambda r: trace_primary(r, geometry, feats))(rays)
    key = jax.random.PRNGKey(0)
    cen_ctx = jax.jit(pack_center_ctx)(ctx)
    ny, nx = jax.jit(lambda c: select_neighbour_indices(
        key, c, h, w, feats, geometry))(ctx)
    offs = jax.jit(_mis_offsets)(ny, nx)
    radius = feats.spatial_resample_radius

    def sel(c, salt):
        yy, xx = select_neighbour_indices(
            jax.random.fold_in(key, salt.astype(jnp.int32)), c, h, w,
            feats, geometry)
        return (yy.sum() + xx.sum()).astype(jnp.float32)

    timed("nbr select (kernel)", sel, ctx)

    def res(cc, oo, salt):
        return resolve_neighbour_ctx(cc + 0 * salt, oo, radius).sum()

    timed("resolve_nbr_ctx", res, cen_ctx, offs)

    # resolve via the offset-gather kernel on only the 5 gate planes (the
    # sweep needs 17; this isolates the per-plane scaling).
    from romis_tpu.ops.pallas_spatial import halo_offset_gather

    d = offs.shape[0] // 2

    def res5(cc, oo, salt):
        return halo_offset_gather(cc[:5] + 0 * salt, oo[:d], oo[d:],
                                  radius, skip_absent=False).sum()

    timed("resolve 5 planes", res5, cen_ctx, offs)


if __name__ == "__main__":
    main()
