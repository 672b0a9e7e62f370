"""Core SoA pytree types.

The reference keeps per-pixel state as arrays-of-structs
(``ReservoirGrid = vector<vector<Reservoir>>``, src/rendering/reservoir.h:28-75,
``HitInfo`` src/utils/common.h:43-49). On TPU everything is
structure-of-arrays: each field is one dense ``[H*W, ...]`` array so the whole
pipeline vectorises onto the VPU/MXU and shards cleanly over a device mesh.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rays:
    """A batch of rays. Reference analog: framework/include/framework/ray.h."""

    origin: jnp.ndarray  # [N, 3]
    direction: jnp.ndarray  # [N, 3] (normalized)

    @property
    def n(self) -> int:
        return self.origin.shape[0]


@struct.dataclass
class HitRecord:
    """Closest-hit results for a ray batch.

    Reference analog: ``HitInfo`` + ``RayHit`` (src/utils/common.h:43-54),
    produced by ``EmbreeInterface::closestHit``
    (src/ray_tracing/embree_interface.cpp:64-90). Materials are carried as
    indices into the scene material table instead of inline structs.
    """

    valid: jnp.ndarray  # [N] bool — ray hit something
    t: jnp.ndarray  # [N] hit distance (inf on miss)
    normal: jnp.ndarray  # [N, 3] interpolated shading normal (normalized)
    uv: jnp.ndarray  # [N, 2] interpolated texture coordinate
    mat_id: jnp.ndarray  # [N] int32 material index
    geom_id: jnp.ndarray  # [N] int32 submesh id (reference geometryId)
    prim_id: jnp.ndarray  # [N] int32 triangle index (for differentiable re-eval)


@struct.dataclass
class ShadeCtx:
    """Per-pixel shading context: everything the target PDF / Phong shading
    needs about the receiving surface point. This is the SoA replacement for
    the reference carrying ``cameraRay`` + ``hitInfo`` inside each Reservoir
    (src/rendering/reservoir.h:33-36).
    """

    valid: jnp.ndarray  # [N] bool
    position: jnp.ndarray  # [N, 3] hit point (ray.origin + t*dir)
    normal: jnp.ndarray  # [N, 3]
    view_origin: jnp.ndarray  # [N, 3] camera ray origin (for the V vector)
    kd: jnp.ndarray  # [N, 3] effective diffuse albedo (texture already applied)
    ks: jnp.ndarray  # [N, 3]
    shininess: jnp.ndarray  # [N]
    geom_id: jnp.ndarray  # [N] int32
    depth_t: jnp.ndarray  # [N] primary-hit distance (for similarity gates)


@struct.dataclass
class Reservoirs:
    """K-lane weighted reservoirs for a pixel batch.

    Reference analog: ``Reservoir`` (src/rendering/reservoir.h:28-75), with the
    AoS-of-vectors replaced by dense arrays and the sequential
    route-to-smallest-wSum update (reservoir.cpp:10-32) replaced by fixed,
    order-invariant lanes (see ops/wrs.py).
    """

    pos: jnp.ndarray  # [N, K, 3] selected light-sample positions
    color: jnp.ndarray  # [N, K, 3] selected light-sample colors
    w_sum: jnp.ndarray  # [N, K] sum of resampling weights
    m: jnp.ndarray  # [N, K] float sample counts (reference sampleNums)
    big_w: jnp.ndarray  # [N, K] unbiased contribution weight W (outputWeight)
    chosen_w: jnp.ndarray  # [N, K] weight of the chosen sample (for R-OMIS)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def k(self) -> int:
        return self.pos.shape[1]

    def total_m(self) -> jnp.ndarray:
        """Reference Reservoir::totalSampleNums (reservoir.cpp:34-38)."""
        return jnp.sum(self.m, axis=-1)


def empty_reservoirs(n: int, k: int) -> Reservoirs:
    return Reservoirs(
        pos=jnp.zeros((n, k, 3), jnp.float32),
        color=jnp.zeros((n, k, 3), jnp.float32),
        w_sum=jnp.zeros((n, k), jnp.float32),
        m=jnp.zeros((n, k), jnp.float32),
        big_w=jnp.zeros((n, k), jnp.float32),
        chosen_w=jnp.zeros((n, k), jnp.float32),
    )
