"""One-hot MXU scatter-add (ops/pallas_scatter.py) vs segment_sum, and the
from_table/gather_rows backward routing."""

import numpy as np
import jax
import jax.numpy as jnp

from romis_tpu.ops.pallas_scatter import scatter_rows_add


def _ref(ct, idx, t):
    c = ct.shape[0]
    flat = np.asarray(ct).reshape(c, -1).T
    out = np.zeros((t, c), np.float32)
    np.add.at(out, np.asarray(idx).ravel(), flat)
    return out


def test_scatter_matches_segment_sum_2d():
    rng = np.random.default_rng(0)
    c, h, w, t = 24, 48, 200, 512
    ct = jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, (h, w)).astype(np.int32))
    out = scatter_rows_add(ct, idx, t, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(ct, idx, t),
                               rtol=1e-5, atol=1e-4)


def test_scatter_leading_dims_and_small_table():
    rng = np.random.default_rng(1)
    c, k, h, w, t = 9, 2, 13, 40, 83
    ct = jnp.asarray(rng.normal(size=(c, k, h, w)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, (k, h, w)).astype(np.int32))
    out = scatter_rows_add(ct, idx, t, interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref(ct, idx, t),
                               rtol=1e-5, atol=1e-4)


def test_from_table_grad_matches_autodiff():
    from romis_tpu.core.vec import from_table

    rng = np.random.default_rng(2)
    t, c, h, w = 83, 3, 16, 24
    table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, t, (h, w)).astype(np.int32))
    proj = jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32))

    def loss(tab):
        g = from_table(tab, idx)  # [C, H, W] (VEC_AXIS = -3)
        return jnp.sum(g * proj)

    def loss_plain(tab):
        g = jnp.stack([tab[:, i][idx] for i in range(c)], axis=0)
        return jnp.sum(g * proj)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(table)),
                               np.asarray(jax.grad(loss_plain)(table)),
                               rtol=1e-5, atol=1e-5)
