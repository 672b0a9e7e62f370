"""Scaling-efficiency harness (BASELINE.md metrics section).

Runs the two SPMD frame paths — GSPMD row sharding (parallel/shard.py,
render_frame_sharded) and hand-scheduled ppermute halo exchange
(parallel/halo.py, render_frame_halo) — over 1/2/4/8-device meshes and
emits a JSON scaling table: ms/frame, rays/s, parallel efficiency vs the
1-device run, and the analytic halo traffic per frame.

Real multi-chip hardware is not reachable from this container (one v5e
chip behind a tunnel), so the default run uses the 8-virtual-device CPU
backend: the numbers validate that the collectives compile, the work
partitions, and nothing serialises — the per-device efficiency of virtual
devices on one host is a LOWER bound (they contend for the same cores).
On a real pod slice the same script runs unchanged per host after
`parallel/launch.maybe_init_distributed()`.

Run: python scripts/scaling_bench.py [--tpu] [--res HxW] [--frames N]
Writes scaling_table.json next to this script's repo root.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp


def bench_path(name, frame_fn, key, prev, n_frames):
    """Scan n_frames inside one jit; min-of-3 wall clocks."""

    def frames(key, prev):
        def body(state, k):
            img, state = frame_fn(k, state)
            return state, jnp.mean(img)

        keys = jax.random.split(key, n_frames)
        state, means = jax.lax.scan(body, prev, keys)
        return jnp.sum(means)

    fn = jax.jit(frames)
    t0 = time.perf_counter()
    float(fn(key, prev))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        float(fn(jax.random.fold_in(key, r), prev))
        best = min(best, time.perf_counter() - t0)
    return best / n_frames, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real TPU backend (1 chip) instead of "
                         "the 8-virtual-device CPU mesh")
    ap.add_argument("--res", default="256x512")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from romis_tpu.core.features import Features
    from romis_tpu.parallel.halo import render_frame_halo
    from romis_tpu.parallel.launch import maybe_init_distributed
    from romis_tpu.parallel.mesh import make_mesh
    from romis_tpu.parallel.shard import render_frame_sharded
    from romis_tpu.render.restir import initial_temporal_state
    import __graft_entry__ as ge

    maybe_init_distributed()
    h, w = (int(x) for x in args.res.split("x"))
    scene = ge._flagship_scene()
    cam = ge._flagship_camera(h, w)
    features = Features(enable_tone_mapping=False)
    k = features.num_samples_in_reservoir
    prev = initial_temporal_state(h, w, k, cam)
    key = jax.random.PRNGKey(0)
    rays_per_frame = h * w * (1 + k)

    n_dev_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev_all and h % n == 0]

    # Analytic halo traffic for the ppermute path: per pass, each device
    # sends radius rows x W lanes x (reservoir + gate planes) in BOTH
    # directions (the fused in-band combine exchanges the 10K reservoir
    # planes + the 5 gate planes; the XLA fallback exchanges the full
    # 19-plane ShadeCtx instead of the gates).
    res_planes = 10 * k
    gate_planes = 5  # normal3 | depth | valid
    halo_bytes_per_pass_per_dev = (
        2 * features.spatial_resample_radius * w
        * (res_planes + gate_planes) * 4 * 2)  # up+down

    table = {"backend": jax.default_backend(), "resolution": [h, w],
             "frames": args.frames, "paths": {}}

    # ---- comm/compute split (VERDICT r2 weak #6) -------------------------
    # (a) Ideal per-shard compute: the same frame on ONE device at the
    # shard's (h/n, w) resolution. total − ideal = communication +
    # imbalance + (CPU virtual mesh only) core contention — the split that
    # distinguishes partitioning overhead from the contention floor.
    from romis_tpu.render.restir import render_restir_frame

    shard_compute = {}
    for n in sizes:
        hs = h // n
        cam_s = ge._flagship_camera(hs, w)
        prev_s = initial_temporal_state(hs, w, k, cam_s)

        def frame_one(key_, prev_, cam_s=cam_s, hs=hs):
            return render_restir_frame(
                key_, cam_s, scene.geometry, scene.lights, scene.num_lights,
                hs, w, features, prev_)

        spf, _ = bench_path("shard_compute", frame_one, key, prev_s,
                            args.frames)
        shard_compute[n] = spf
        print(f"shard_compute h/{n}: {spf*1e3:8.2f} ms/frame", flush=True)
    table["shard_compute_ms"] = {
        str(n): round(v * 1e3, 2) for n, v in shard_compute.items()}

    # (b) Collective microbenchmark: ppermute of one spatial pass's halo
    # payload (both directions) on the n-device mesh, per device.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from romis_tpu.parallel.mesh import TILE_AXIS

    res_planes_n = 10 * k
    gate_planes_n = 5
    coll = {}
    for n in sizes:
        if n == 1:
            continue
        mesh = make_mesh(n)
        payload = jnp.zeros(
            (n, res_planes_n + gate_planes_n,
             features.spatial_resample_radius, w))

        def halo_xchg(x, n=n):
            perm_up = [(i, (i + 1) % n) for i in range(n)]
            perm_dn = [(i, (i - 1) % n) for i in range(n)]
            up = jax.lax.ppermute(x, TILE_AXIS, perm_up)
            dn = jax.lax.ppermute(x, TILE_AXIS, perm_dn)
            return up + dn

        f = jax.jit(shard_map(
            lambda x: jax.lax.scan(
                lambda c, _: (halo_xchg(c), None), x, None, length=32)[0],
            mesh=mesh, in_specs=P(TILE_AXIS), out_specs=P(TILE_AXIS)))
        jax.block_until_ready(f(payload))
        t0 = time.perf_counter()
        jax.block_until_ready(f(payload))
        coll[n] = (time.perf_counter() - t0) / 32 / 2  # per ppermute
    table["halo_ppermute_us"] = {
        str(n): round(v * 1e6, 1) for n, v in coll.items()}

    base = {}
    for path_name, frame in (
        ("gspmd", render_frame_sharded), ("halo", render_frame_halo),
    ):
        rows = {}
        for n in sizes:
            mesh = make_mesh(n)
            with mesh:
                def frame_fn(key_, prev_, mesh=mesh, frame=frame):
                    return frame(key_, cam, scene.geometry, scene.lights,
                                 scene.num_lights, h, w, features, prev_,
                                 mesh)

                spf, compile_s = bench_path(path_name, frame_fn, key, prev,
                                            args.frames)
            rays_s = rays_per_frame / spf
            if n == 1:
                base[path_name] = spf
            eff = base[path_name] / (spf * n)
            rows[str(n)] = {
                "ms_per_frame": round(spf * 1e3, 2),
                "rays_per_s": round(rays_s),
                "efficiency_vs_1dev": round(eff, 3),
                # comm + imbalance + (CPU mesh) contention, vs the ideal
                # single-device shard-sized render above.
                "shard_compute_ms": round(shard_compute[n] * 1e3, 2),
                "overhead_ms": round((spf - shard_compute[n]) * 1e3, 2),
                "overhead_frac": round(
                    max(0.0, 1.0 - shard_compute[n] / spf), 3),
                "halo_bytes_per_frame": (
                    halo_bytes_per_pass_per_dev
                    * features.spatial_resampling_passes * n
                    if path_name == "halo" and n > 1 else 0),
                "compile_s": round(compile_s, 1),
            }
            print(f"{path_name} n={n}: {spf*1e3:8.2f} ms/frame "
                  f"eff={eff:.2f}", flush=True)
        table["paths"][path_name] = rows

    # ---- sharded R-MIS / R-OMIS over the same meshes (round 4) ----------
    # The MIS halo path (parallel/mis.py): per-iteration canonical
    # generation per band + radius-row ppermute halos. Reduced iteration/
    # neighbour counts keep the CPU-mesh run tractable; the partitioning
    # and collective structure is identical at reference defaults.
    from romis_tpu.core.features import RayTraceMode
    from romis_tpu.parallel.mis import (
        render_rmis_sharded, render_romis_sharded,
    )

    mis_feats = features.replace(
        max_iterations_mis=2, num_neighbours_to_sample=3,
        spatial_resample_radius=4, initial_light_samples=8)
    for path_name, renderer, mode in (
        ("rmis_sharded", render_rmis_sharded, RayTraceMode.RMIS),
        ("romis_sharded", render_romis_sharded, RayTraceMode.ROMIS),
    ):
        feats_m = mis_feats.replace(ray_trace_mode=mode)
        rows = {}
        for n in sizes:
            mesh = make_mesh(n)
            with mesh:
                def frame_fn(key_, prev_, mesh=mesh, renderer=renderer,
                             feats_m=feats_m):
                    return renderer(key_, cam, scene.geometry, scene.lights,
                                    scene.num_lights, h, w, feats_m, mesh), \
                        prev_

                def frame_img(key_, prev_, f=frame_fn):
                    img, p = f(key_, prev_)
                    return img, p

                spf, compile_s = bench_path(path_name, frame_img, key, 0.0,
                                            args.frames)
            if n == 1:
                base[path_name] = spf
            eff = base[path_name] / (spf * n)
            rows[str(n)] = {
                "ms_per_frame": round(spf * 1e3, 2),
                "efficiency_vs_1dev": round(eff, 3),
                "compile_s": round(compile_s, 1),
            }
            print(f"{path_name} n={n}: {spf*1e3:8.2f} ms/frame "
                  f"eff={eff:.2f}", flush=True)
        table["paths"][path_name] = rows
    table["mis_note"] = (
        "rmis/romis_sharded: parallel/mis.py halo path at reduced params "
        "(2 iterations, D=3, radius 4, S=8) for CPU-mesh tractability; "
        "same partitioning/collectives as reference defaults")

    out = args.out or os.path.join(os.path.dirname(__file__), "..",
                                   "scaling_table.json")
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
