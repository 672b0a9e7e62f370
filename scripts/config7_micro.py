"""Per-phase decomposition of config 7 (large-scene MIS: monkey_field 5x5,
24,202 tris, 1080p, ext_vis sweep path) — VERDICT r4 item 4: the ~3.2
s/frame had no recorded split, so the next optimization had no target.

Phases timed separately (tunnel-safe protocol: reps inside one jitted scan,
min-of-3):
  trace       paged closest hit (primary rays)
  nbrsel      select_neighbour_indices (fused box-scan kernel)
  resolve     resolve_neighbour_ctx (romis/balance only)
  ris         gen_mis_reservoir_planes (all 5 iterations batched)
  extgather   halo_offset_gather of one iteration's pos planes
  extvis      the D1*K=12-ray paged shadow batch of one iteration
              (round 5: paged_any_k shared walk — was 12 independent
              paged_any walks)
  sweep       one mis_iteration_pallas call with precomputed ext_vis

Run: python scripts/config7_micro.py [rmis_equal|romis ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _salt(args, s):
    """Perturb every float leaf by a loop-step-dependent denormal: without
    a carry dependence XLA HOISTS the whole constant-arg body out of the
    reps scan and the printed time is total/reps (discovered round 5 —
    config7 stage sums said ~1.0 s while the real frame measured 2.44 s;
    verified reps=1 vs reps=3 const: identical totals). +1e-30 is value-
    invisible but defeats loop-invariant code motion."""
    return jax.tree.map(
        lambda l: l + s if jnp.issubdtype(l.dtype, jnp.floating) else l,
        args)


def timed(name, fn, *args, reps=3):
    def scanned(*a):
        def step(s, i):
            a2 = _salt(a, i.astype(jnp.float32) * 1e-30)
            return s + jnp.sum(fn(*a2)), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
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
    print(f"{name:>12}: {best / reps * 1e3:8.1f} ms (compile {comp:.0f}s)",
          flush=True)
    return best / reps * 1e3


def main():
    from romis_tpu.core.camera import generate_rays, make_camera
    from romis_tpu.core.features import Features, RayTraceMode
    from romis_tpu.ops.bvh import with_bvh
    from romis_tpu.ops.pallas_mis import (
        mis_iteration_pallas, mis_pack_planes, mis_pick_bh,
        resolve_neighbour_ctx,
    )
    from romis_tpu.ops.pallas_ris import gen_mis_reservoir_planes
    from romis_tpu.ops.pallas_spatial import pack_center_ctx, pad_halo
    from romis_tpu.ops.wrs import _lane_layout
    from romis_tpu.render.neighbours import select_neighbour_indices
    from romis_tpu.render.restir import trace_primary
    from romis_tpu.render.rmis import PH_NEIGHBOURS, _mis_offsets, mis_ext_vis
    from romis_tpu.scene.scene import load_monkey_field

    modes = sys.argv[1:] or ["rmis_equal", "romis"]
    res_s = os.environ.get("RMIS_RES", "1080x1920")
    h, w = (int(x) for x in res_s.split("x"))
    n = int(os.environ.get("C7_N", "5"))
    scene = load_monkey_field(n)
    scene.geometry = with_bvh(scene.geometry).replace(use_pallas=True)
    geometry, lights, nl = scene.geometry, scene.lights, scene.num_lights
    cam = make_camera(look_at=(0, 0, 0), rotation_deg=(25, 30, 0),
                      distance=11.0, fov_deg=50, resolution=(h, w))
    feats = Features()
    k = feats.num_samples_in_reservoir
    radius = feats.spatial_resample_radius
    it_n = feats.max_iterations_mis
    _, lane_counts, _ = _lane_layout(feats.initial_light_samples, k)
    key = jax.random.PRNGKey(0)

    rays = generate_rays(cam, h, w)
    timed("trace", lambda r: trace_primary(r, geometry, feats)[1].position,
          rays)
    _, ctx = jax.jit(lambda r: trace_primary(r, geometry, feats))(rays)
    ctx = jax.tree.map(jnp.asarray, ctx)

    timed("nbrsel", lambda c: jnp.stack(select_neighbour_indices(
        jax.random.fold_in(key, PH_NEIGHBOURS), c, h, w, feats,
        geometry)).astype(jnp.float32), ctx)
    ny, nx = jax.jit(lambda c: select_neighbour_indices(
        jax.random.fold_in(key, PH_NEIGHBOURS), c, h, w, feats, geometry))(
        ctx)
    offs = jax.jit(_mis_offsets)(ny, nx)
    offs = jnp.asarray(offs)
    cen_ctx = jax.jit(pack_center_ctx)(ctx)

    timed("resolve", lambda c, o: resolve_neighbour_ctx(c, o, radius),
          cen_ctx, offs)

    for mode in modes:
        romis = mode == "romis"
        print(f"----- {mode} -----", flush=True)
        seed = jnp.int32(7)
        mk_ris = lambda s, c: gen_mis_reservoir_planes(  # noqa: E731
            s, c, lights, nl, feats, it_n, romis=romis,
            uniform_shin=getattr(geometry, "uniform_shin", None),
            compact=False)
        timed("ris", mk_ris, seed, ctx)
        res_pack = jnp.asarray(jax.jit(mk_ris)(seed, ctx))
        c_res = mis_pack_planes(mode, k, False)

        timed("extgather+vis",
              lambda c, rp, o: mis_ext_vis(
                  c, rp[:3 * k], o, radius, geometry, k),
              ctx, res_pack, offs)
        ext = jnp.asarray(jax.jit(
            lambda c, rp, o: mis_ext_vis(c, rp[:3 * k], o, radius,
                                         geometry, k))(ctx, res_pack, offs))

        nbr_ctx = (jnp.asarray(jax.jit(
            lambda c, o: resolve_neighbour_ctx(c, o, radius))(
            cen_ctx, offs)) if romis else None)
        res_pad = jax.jit(lambda rp: pad_halo(
            rp, radius, mis_pick_bh(h, mode), mode="constant"))(res_pack)
        res_pad = jnp.asarray(res_pad)

        def sweep(cc, rp, o, pad, ex, nc):
            out = mis_iteration_pallas(
                cc, rp, o, geometry, k, radius, mode, nl, lane_counts,
                nbr_ctx=nc, it_block=0, res_pad=pad, lights=lights,
                compact=False, ext_vis=ex)
            return out[0] if isinstance(out, tuple) else out

        timed("sweep", sweep, cen_ctx, res_pack, offs, res_pad, ext,
              nbr_ctx)


if __name__ == "__main__":
    main()
