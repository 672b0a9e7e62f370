"""Microbenchmark: XLA cost of building the tile-column halo layout
[n_tj, Hp, C*we] from [C, H, W] planes at 1080p. Negative result: the
stack+transpose prep costs 2-4 ms, more than the halo DMA it would save
(note in pallas_spatial.py next to pad_halo). Run:
python scripts/halo_prep_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import jax.numpy as jnp

from romis_tpu.ops.pallas_spatial import _BH, _BW, _halo_window, pad_halo


def main():
    c, h, w, radius = 16, 1080, 1920, 10
    reps = 20
    he, we = _halo_window(radius)
    n_tj = (w + ((-w) % _BW)) // _BW

    def v_transpose(planes):
        padded = pad_halo(planes, radius)
        cols = jnp.stack(
            [padded[:, :, j * _BW:j * _BW + we] for j in range(n_tj)],
            axis=0)
        cols = jnp.transpose(cols, (0, 2, 1, 3))
        return cols.reshape(n_tj, padded.shape[1], c * we)

    def v_concat(planes):
        padded = pad_halo(planes, radius)
        parts = [
            jnp.concatenate(
                [padded[cc, :, j * _BW:j * _BW + we] for cc in range(c)],
                axis=-1)
            for j in range(n_tj)
        ]
        return jnp.stack(parts, axis=0)

    def v_pad_only(planes):
        return pad_halo(planes, radius)

    def v_pad_zero(planes):
        align_h = (-h) % _BH
        align_w = (-w) % _BW
        return jnp.pad(
            planes,
            ((0, 0),
             (radius, align_h + (he - _BH - radius)),
             (radius, align_w + (we - _BW - radius))))

    def v_pad_zero_noalign(planes):
        # bottom/right zero pad only (interior offset handled in-kernel)
        align_h = (-h) % _BH
        align_w = (-w) % _BW
        return jnp.pad(
            planes,
            ((0, 0),
             (0, align_h + (he - _BH)),
             (0, align_w + (we - _BW))))

    key = jax.random.PRNGKey(0)
    planes = jax.random.uniform(key, (c, h, w), jnp.float32)

    for name, fn in [("pad_halo only", v_pad_only),
                     ("zero pad", v_pad_zero),
                     ("zero pad trail", v_pad_zero_noalign),
                     ("stack+transpose", v_transpose),
                     ("per-col concat", v_concat)]:
        def run(x):
            def f(s, _):
                out = fn(x + s)
                return s + 1.0, out[0, 0, 0]
            _, v = jax.lax.scan(f, 0.0, None, length=reps)
            return jnp.sum(v)

        g = jax.jit(run)
        t0 = time.perf_counter()
        float(g(planes))
        t1 = time.perf_counter()
        best = np.inf
        for _ in range(3):
            ta = time.perf_counter()
            float(g(planes))
            best = min(best, time.perf_counter() - ta)
        print(f"{name:18s} compile {t1 - t0 - best:5.1f}s "
              f"{1000 * best / reps:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
