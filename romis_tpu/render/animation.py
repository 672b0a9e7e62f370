"""Animated multi-frame and multi-camera rendering.

Reference analogs:
- the interactive frame loop carrying previousFrameGrid
  (src/main.cpp:108-177) → a `lax.scan` over frames with the TemporalState
  carry — one compiled program for a whole animation;
- one std::thread per camera in CLI batch mode (src/main.cpp:213-230, which
  data-races on the shared grid) → `jax.vmap` over a stacked camera pytree:
  every camera renders in the same SPMD program, no threads, no races.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams
from ..core.features import Features
from .restir import TemporalState, initial_temporal_state, render_restir_frame


def stack_cameras(cams: list[CameraParams]) -> CameraParams:
    """Stack per-camera parameter pytrees along a leading frame axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def interpolate_cameras(cam_a: CameraParams, cam_b: CameraParams,
                        n_frames: int) -> CameraParams:
    """Linear camera path from cam_a to cam_b (inclusive) — the animated
    camera workload of BASELINE config 4."""
    ts = jnp.linspace(0.0, 1.0, n_frames)
    return jax.tree.map(
        lambda a, b: a[None] * (1.0 - ts.reshape((-1,) + (1,) * jnp.ndim(a)))
        + b[None] * ts.reshape((-1,) + (1,) * jnp.ndim(a)),
        cam_a, cam_b)


def render_animation(
    key,
    cams: CameraParams,  # stacked, leading axis = frames
    geometry,
    lights,
    num_lights: int,
    height: int,
    width: int,
    features: Features,
    prev: TemporalState | None = None,
    keys=None,
):
    """Render F temporally-reused frames in one jitted scan.
    Returns (images [F, H, W, 3], final TemporalState). Use
    ``features.temporal_reprojection=True`` for moving cameras.

    ``keys`` ([F] stacked PRNG keys) overrides the default split of ``key``
    — checkpoint resume (cli.py --checkpoint) passes the tail of the
    original run's per-frame keys so a resumed run is bit-identical to an
    uninterrupted one."""
    n_frames = jax.tree.leaves(cams)[0].shape[0]
    if prev is None:
        cam0 = jax.tree.map(lambda a: a[0], cams)
        prev = initial_temporal_state(
            height, width, features.num_samples_in_reservoir, cam0)

    def body(state, inp):
        frame_key, cam = inp
        img, state = render_restir_frame(
            frame_key, cam, geometry, lights, num_lights, height, width,
            features, state)
        return state, img

    if keys is None:
        keys = jax.random.split(key, n_frames)
    state, images = jax.lax.scan(body, prev, (keys, cams))
    return images, state


def render_camera_batch(
    key,
    cams: CameraParams,  # stacked, leading axis = cameras
    geometry,
    lights,
    num_lights: int,
    height: int,
    width: int,
    features: Features,
):
    """Render independent cameras in parallel via vmap (the reference's
    per-camera std::thread fan-out, main.cpp:213-230 — minus its
    previousFrameGrid data race, which we deliberately do not reproduce).
    Returns images [C, H, W, 3]."""
    n_cams = jax.tree.leaves(cams)[0].shape[0]
    keys = jax.random.split(key, n_cams)

    def one(k, cam):
        prev = initial_temporal_state(
            height, width, features.num_samples_in_reservoir, cam)
        img, _ = render_restir_frame(k, cam, geometry, lights, num_lights,
                                     height, width, features, prev)
        return img

    return jax.vmap(one)(keys, cams)
