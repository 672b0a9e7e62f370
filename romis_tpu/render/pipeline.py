"""Render-mode dispatch — the analog of renderRayTraced
(src/rendering/render.cpp:268-290): pick ReSTIR / R-MIS / R-OMIS, render, and
return the image plus (ReSTIR only) the temporal state for the next frame.
Also writes the per-render Features provenance JSON like the reference's
cereal archive (render.cpp:282-288) when an output directory is given.
"""

from __future__ import annotations

import datetime
import os

import jax

from ..core.camera import CameraParams
from ..core.features import Features, RayTraceMode
from .restir import TemporalState, initial_temporal_state, render_restir_frame
from .rmis import render_rmis
from .romis import render_romis


def render_frame(
    key,
    cam: CameraParams,
    scene,
    height: int,
    width: int,
    features: Features,
    prev: TemporalState | None = None,
):
    """Render one frame with the configured mode. Returns (image [H, W, 3],
    TemporalState | None)."""
    g, l, nl = scene.geometry, scene.lights, scene.num_lights
    if features.ray_trace_mode == RayTraceMode.RESTIR:
        if prev is None:
            prev = initial_temporal_state(
                height, width, features.num_samples_in_reservoir, cam)
        fn = jax.jit(render_restir_frame, static_argnums=(4, 5, 6, 7))
        return fn(key, cam, g, l, nl, height, width, features, prev)
    if features.ray_trace_mode == RayTraceMode.RMIS:
        fn = jax.jit(render_rmis, static_argnums=(4, 5, 6, 7))
        return fn(key, cam, g, l, nl, height, width, features), None
    if features.ray_trace_mode == RayTraceMode.ROMIS:
        fn = jax.jit(render_romis, static_argnums=(4, 5, 6, 7))
        return fn(key, cam, g, l, nl, height, width, features), None
    raise ValueError(f"unsupported ray-trace mode {features.ray_trace_mode}")


def write_provenance(features: Features, out_dir: str) -> str:
    """Timestamped Features JSON dump (reference render.cpp:282-288)."""
    os.makedirs(out_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    path = os.path.join(out_dir, f"{stamp}.json")
    with open(path, "w") as f:
        f.write(features.to_json())
    return path
