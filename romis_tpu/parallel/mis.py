"""Sharded R-MIS / R-OMIS over row bands with ppermute halo exchange.

The reference parallelises the MIS pixel loops exactly like ReSTIR's — OpenMP
``parallel for`` over rows (render.cpp:76-78,145-147,
neighbour_selection.cpp:111-113). The MIS neighbourhood is a fixed per-pixel
list bounded by ±spatial_resample_radius (neighbour_selection.cpp:55-58), so
the cross-device data dependency is the SAME radius-row halo stencil as
spatial reuse: each iteration, every device generates canonical reservoirs
for its own row band, exchanges ``radius`` boundary rows with its two mesh
neighbours (`parallel/halo._halo_extend` ppermute), and resolves its
neighbour gathers locally.

Phase layout mirrors parallel/halo.render_frame_halo: trace + neighbour
selection run under GSPMD row sharding (one code path with the single-device
renderers), the per-iteration loop runs as shard_map with explicit halos.

``inject`` (neighbour coords + per-iteration reservoirs, the
render_rmis/render_romis hook) makes the sharded result BITWISE-comparable
to the single-device XLA formulation (tests/test_parallel_mis.py); without
it the per-band RNG streams differ (per-device folded keys) while the
estimator contract is identical — the same caveat as spatial_reuse_halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..core.camera import CameraParams, generate_rays
from ..core.features import Features
from ..ops.shading import exposure_tone_mapping
from ..ops.wrs import gen_canonical_samples
from ..render.neighbours import select_neighbour_indices
from ..render.restir import trace_primary
from ..render.rmis import PH_ITER, PH_NEIGHBOURS, rmis_sample_contrib
from ..render.romis import romis_iteration_terms, solve_alpha
from .halo import _gather_local, _halo_extend
from .mesh import TILE_AXIS, shard_pixels


def _mis_setup(key, cam, geometry, lights, num_lights, height, width,
               features, mesh, inject):
    """Shared trace + neighbour selection under GSPMD row sharding.
    Returns (ctx, offs_y, offs_x [D1, H, W], res_stack or None)."""
    rays = shard_pixels(generate_rays(cam, height, width), mesh)
    _, ctx = trace_primary(rays, geometry, features)
    ctx = shard_pixels(ctx, mesh)

    if inject is not None:
        ny, nx = inject[0], inject[1]
        res_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *inject[2])
    else:
        ny, nx = select_neighbour_indices(
            jax.random.fold_in(key, PH_NEIGHBOURS), ctx, height, width,
            features, geometry)
        res_stack = None

    rows = jnp.arange(height, dtype=jnp.int32)[:, None]
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    # Offsets are bounded by ±radius (neighbour_selection.cpp:55-58 —
    # both selection paths only consider the clamped box), which is what
    # makes the fixed radius-row halo sufficient.
    offs_y = ny.astype(jnp.int32) - rows[None]  # [D1, H, W]
    offs_x = nx.astype(jnp.int32) - cols[None]
    return ctx, offs_y, offs_x, res_stack


def _band_gather(tree, iy, ix):
    """Gather every leaf of a halo-extended local pytree at local coords
    iy/ix [D1, h_loc, W] → fields [D1, ..., h_loc, W]."""
    return jax.tree.map(
        lambda a: _gather_local(a, iy, ix), tree)


def _make_mis_shard(key, ctx, offs_y, offs_x, res_stack, geometry, lights,
                    num_lights, height, width, features, mesh, body):
    """Common shard_map scaffolding: builds local halo coords + per-iteration
    reservoir supplier, then defers to ``body(ctx_l, get_nb, nbhd_ctx_l)``
    where get_nb(it) returns the iteration's gathered neighbourhood
    reservoirs [D1, K, ..., h_loc, W]."""
    n_dev = mesh.shape[TILE_AXIS]
    assert height % n_dev == 0, "image rows must divide the mesh"
    h_loc = height // n_dev
    radius = features.spatial_resample_radius
    assert h_loc >= radius, (
        f"band height {h_loc} must cover the halo radius {radius}")

    def spec_for(a):
        return P(*([None] * (a.ndim - 2)), TILE_AXIS, None)

    specs_ctx = jax.tree.map(spec_for, ctx)
    specs_res = jax.tree.map(spec_for, res_stack) if res_stack is not None \
        else ()
    rep_geo = jax.tree.map(lambda a: P(), geometry)
    rep_li = jax.tree.map(lambda a: P(), lights)
    has_inject = res_stack is not None
    res_in = res_stack if has_inject else ()

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), specs_ctx, spec_for(offs_y), spec_for(offs_x),
                  specs_res, rep_geo, rep_li),
        out_specs=P(None, TILE_AXIS, None),
        check_rep=False,
    )
    def run(key, ctx_l, offs_y_l, offs_x_l, res_l, geometry, lights):
        dev = jax.lax.axis_index(TILE_AXIS)
        dkey = jax.random.fold_in(jax.random.fold_in(key, PH_ITER), dev)

        iy = (jnp.arange(h_loc, dtype=jnp.int32)[None, :, None]
              + offs_y_l + radius)  # local index into the extended band
        ix = (jnp.arange(width, dtype=jnp.int32)[None, None, :]
              + offs_x_l)  # globally pre-clipped columns

        ctx_ext = jax.tree.map(
            lambda a: _halo_extend(a, radius, n_dev), ctx_l)
        nbhd_ctx = _band_gather(ctx_ext, iy, ix)

        def get_nb(it):
            if has_inject:
                res = jax.tree.map(lambda a: a[it], res_l)
            else:
                res = gen_canonical_samples(
                    jax.random.fold_in(dkey, it), ctx_l, lights, num_lights,
                    geometry, features)
            res_ext = jax.tree.map(
                lambda a: _halo_extend(a, radius, n_dev), res)
            return _band_gather(res_ext, iy, ix)

        return body(ctx_l, get_nb, nbhd_ctx, geometry)

    return run(key, ctx, offs_y, offs_x, res_in, geometry, lights)


def render_rmis_sharded(
    key,
    cam: CameraParams,
    geometry,
    lights,
    num_lights: int,
    height: int,
    width: int,
    features: Features,
    mesh,
    inject=None,
):
    """R-MIS over the row-band mesh → tone-mapped image [H, W, 3].
    Same estimator as render_rmis (render.cpp:64-119)."""
    it_n = features.max_iterations_mis

    ctx, offs_y, offs_x, res_stack = _mis_setup(
        key, cam, geometry, lights, num_lights, height, width, features,
        mesh, inject)

    def body(ctx_l, get_nb, nbhd_ctx, geometry_l):
        h_loc, w = ctx_l.depth_t.shape[-2:]
        acc = jnp.zeros((3, h_loc, w))
        for it in range(it_n):
            acc = acc + rmis_sample_contrib(ctx_l, nbhd_ctx, get_nb(it),
                                            geometry_l, features)
        return acc

    acc = _make_mis_shard(key, ctx, offs_y, offs_x, res_stack, geometry,
                          lights, num_lights, height, width, features, mesh,
                          body)
    color = acc / it_n
    if features.enable_tone_mapping:
        color = exposure_tone_mapping(color, features)
    return jnp.moveaxis(color, 0, -1)


def render_romis_sharded(
    key,
    cam: CameraParams,
    geometry,
    lights,
    num_lights: int,
    height: int,
    width: int,
    features: Features,
    mesh,
    return_alphas: bool = False,
    inject=None,
):
    """R-OMIS over the row-band mesh → tone-mapped image [H, W, 3] (and
    optionally per-technique α images [D1, H, W, 3]). Same estimator as
    render_romis (render.cpp:121-265); the per-pixel A/b accumulation and
    the Tikhonov α solve are pixel-local, so they run entirely per band."""
    d1 = features.num_neighbours_to_sample + 1
    it_n = features.max_iterations_mis
    progressive = features.use_progressive_romis

    ctx, offs_y, offs_x, res_stack = _mis_setup(
        key, cam, geometry, lights, num_lights, height, width, features,
        mesh, inject)

    def body(ctx_l, get_nb, nbhd_ctx, geometry_l):
        h_loc, w = ctx_l.depth_t.shape[-2:]
        a_mat = jnp.zeros((d1, d1, h_loc, w))
        b_vec = jnp.zeros((3, d1, h_loc, w))
        final_colors = jnp.zeros((3, h_loc, w))
        alphas = jnp.zeros((3, d1, h_loc, w))

        for it in range(it_n):
            if (progressive and it >= 1
                    and it % features.progressive_update_mod == 0):
                alphas = solve_alpha(a_mat, b_vec)
            if progressive:
                final_colors = final_colors + jnp.sum(alphas, axis=1)
            a_d, b_d, prog = romis_iteration_terms(
                ctx_l, nbhd_ctx, get_nb(it), alphas, num_lights, geometry_l,
                features)
            a_mat = a_mat + a_d
            b_vec = b_vec + b_d
            if progressive:
                final_colors = final_colors + prog

        if progressive:
            color = final_colors / it_n
            alpha_out = alphas
        else:
            alpha_out = solve_alpha(a_mat, b_vec)
            color = jnp.sum(alpha_out, axis=1)
        # One [3 + 3*D1, h_loc, w] plane stack out (shard_map wants a single
        # row-sharded output layout here).
        return jnp.concatenate(
            [color, alpha_out.reshape(3 * d1, h_loc, w)], axis=0)

    out = _make_mis_shard(key, ctx, offs_y, offs_x, res_stack, geometry,
                          lights, num_lights, height, width, features, mesh,
                          body)
    color = out[:3]
    alpha_out = out[3:].reshape(3, d1, height, width)
    if features.enable_tone_mapping:
        color = exposure_tone_mapping(color, features)
    image = jnp.moveaxis(color, 0, -1)
    if return_alphas:
        return image, jnp.moveaxis(alpha_out, 0, -1)  # [D1, H, W, 3]
    return image


def make_sharded_mis_train_step(
    geometry, lights, num_lights: int, height: int, width: int,
    features: Features, mesh, lr: float = 1e-2,
):
    """Jitted SPMD MIS training step (VERDICT r4 missing-item 2): L2 loss of
    the sharded R-MIS/R-OMIS render against a target, SGD on the
    differentiable scene parameters. Scene params are replicated (P() specs
    in _make_mis_shard); shard_map's transpose psum-reduces their cotangents
    across row bands automatically — the same gradient all-reduce contract
    as parallel/shard.make_sharded_train_step. The backward rides the
    differentiable XLA formulation (fused_resampling=False), including the
    _halo_extend ppermute transpose (gradients cross band boundaries through
    the halo exactly where the forward read them).
    """
    from ..core.features import RayTraceMode
    from ..diff.grad import SceneParams, apply_params

    grad_features = features.replace(fused_resampling=False)
    is_rmis = grad_features.ray_trace_mode == RayTraceMode.RMIS

    def loss_fn(params: SceneParams, target, key, cam):
        g, li = apply_params(geometry, lights, params)
        render = render_rmis_sharded if is_rmis else render_romis_sharded
        img = render(key, cam, g, li, num_lights, height, width,
                     grad_features, mesh)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_step(params: SceneParams, target, key, cam):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, key, cam)
        new_params = jax.tree.map(lambda p, gr: p - lr * gr, params, grads)
        return new_params, loss, grads

    return train_step
