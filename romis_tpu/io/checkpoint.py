"""Checkpoint / resume for animated multi-frame renders.

The reference has no checkpointing — temporal state lives in memory only
(shared_ptr<ReservoirGrid>, src/main.cpp:65,165; SURVEY §5). For long
animated runs we serialise the full temporal carry (reservoirs + previous
frame's geometry context + camera + frame index + PRNG key) to a .npz so a
run can resume bit-exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import CameraParams
from ..core.types import Reservoirs, ShadeCtx
from ..render.restir import TemporalState


def _flatten(prefix: str, tree) -> dict:
    out = {}
    leaves, treedef = jax.tree.flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, state: TemporalState, key, frame: int) -> None:
    data = _flatten("state", state)
    data["key"] = np.asarray(jax.random.key_data(key))
    data["frame"] = np.asarray(frame, np.int64)
    np.savez_compressed(path, **data)


def load_checkpoint(path: str, template: TemporalState):
    """Returns (TemporalState, key, frame). ``template`` supplies the pytree
    structure (same resolution / K as the saved run)."""
    with np.load(path) as z:
        leaves, treedef = jax.tree.flatten(template)
        n = len(leaves)
        new_leaves = [jnp.asarray(z[f"state.{i}"]) for i in range(n)]
        for old, new in zip(leaves, new_leaves):
            if old.shape != new.shape:
                raise ValueError(
                    f"checkpoint shape mismatch: {new.shape} vs {old.shape}")
        state = jax.tree.unflatten(treedef, new_leaves)
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
        frame = int(z["frame"])
    return state, key, frame
