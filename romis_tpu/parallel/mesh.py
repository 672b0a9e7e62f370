"""Device-mesh construction and sharding specs.

The reference's parallelism is OpenMP rows + one thread per camera
(SURVEY §2.4). The TPU analog: shard the [H*W] pixel/ray/reservoir axis over
a 1-D ``tiles`` mesh axis; scene (triangles, materials, lights) replicated on
every chip. Gradients of replicated scene parameters are reduced by GSPMD's
automatic psum; cross-tile reservoir reads in spatial reuse lower to
collective gathers/permutes over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (TILE_AXIS,))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pixel) axis; all trailing axes replicated."""
    return NamedSharding(mesh, P(TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(tree, mesh: Mesh):
    """Constrain every array in a pixel-major pytree to be sharded on its
    leading axis."""
    s = pixel_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, s), tree
    )
