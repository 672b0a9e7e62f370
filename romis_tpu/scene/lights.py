"""Unified SoA light table.

The reference stores lights as a variant<PointLight, SegmentLight,
ParallelogramLight> (src/utils/common.h:72-87) and branches per light when
sampling (src/scene/light.cpp:63-82). On TPU we canonicalise every light into
the parallelogram form so sampling is branch-free gathers + FMAs:

- point:          v0 = position, edge01 = edge02 = 0, all corner colors equal
- segment:        v0 = endpoint0, edge01 = endpoint1 - endpoint0, edge02 = 0,
                  colors (c0, c1, c0, c1) so the bilinear lerp reduces to the
                  reference's single-axis mix (light.cpp:19-23)
- parallelogram:  direct (light.cpp:27-34)

Sampling one light with two uniforms (u, v):
    position = v0 + u*edge01 + v*edge02
    color    = mix(mix(c0, c1, u), mix(c2, c3, u), v)
which matches sampleParallelogramLight (light.cpp:27-34) exactly and is the
identity-on-(u,·) / constant mapping for segment / point lights.
"""

from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp


POINT, SEGMENT, PARALLELOGRAM = 0, 1, 2


@struct.dataclass
class LightTable:
    v0: jnp.ndarray  # [L, 3]
    edge01: jnp.ndarray  # [L, 3]
    edge02: jnp.ndarray  # [L, 3]
    c0: jnp.ndarray  # [L, 3]
    c1: jnp.ndarray  # [L, 3]
    c2: jnp.ndarray  # [L, 3]
    c3: jnp.ndarray  # [L, 3]
    kind: jnp.ndarray  # [L] int32 (POINT/SEGMENT/PARALLELOGRAM, metadata only)
    # Packed row table [L, 24]: v0|e01|e02|c0|c1|c2|c3|pad. Sampling fetches
    # ONE row per candidate index: measured on TPU, 21 per-component gathers
    # run at ~6M indices/s while one 24-float row-gather runs ~57x faster.
    rows: jnp.ndarray
    # Host-detected constant columns of the 21-float row: a 21-tuple whose
    # entries are the shared float value where the column is identical for
    # EVERY light, else None. Regular light grids (e.g. the nightclub's 512
    # lights, scene.cpp:5-28) share edges + colors, so only v0 varies — the
    # fused RIS kernel (ops/pallas_ris.py) bakes constants as scalars and
    # gathers only varying columns (the fetch dominates its runtime).
    # None = unknown/traced (apply_params clears it when differentiating
    # through light parameters).
    const_cols: tuple | None = struct.field(pytree_node=False, default=None)
    # Exact affine structure of the table, when EVERY light comes from
    # regular_light_grid calls (src/scene/scene.cpp:5-28): a tuple of
    # segments (start, count, period, params21) where light i in
    # [start, start+count) has column c equal to
    #     a + b*float(local // period) + c_*float(local % period),
    # local = i - start, params21[c] = (a, b, c_) — the builder's own f32
    # expression, so recomputation is BIT-EXACT vs the stored rows. The
    # fused RIS kernel (ops/pallas_ris.py) uses this to synthesise light
    # rows arithmetically instead of dynamic-gathering them (the fetch
    # dominates that kernel). None = irregular/traced table.
    affine_segments: tuple | None = struct.field(pytree_node=False,
                                                 default=None)

    @property
    def n(self) -> int:
        return self.v0.shape[0]


def _pack_rows(v0, e01, e02, c0, c1, c2, c3) -> jnp.ndarray:
    import numpy as np

    cols = np.concatenate(
        [np.asarray(x, np.float32) for x in (v0, e01, e02, c0, c1, c2, c3)],
        axis=1)
    pad = np.zeros((cols.shape[0], 24 - cols.shape[1]), np.float32)
    return jnp.asarray(np.concatenate([cols, pad], axis=1))


def _pack_rows_jnp(v0, e01, e02, c0, c1, c2, c3) -> jnp.ndarray:
    """Traced variant (used when differentiating through light params)."""
    cols = jnp.concatenate([v0, e01, e02, c0, c1, c2, c3], axis=1)
    return jnp.concatenate(
        [cols, jnp.zeros((cols.shape[0], 24 - cols.shape[1]))], axis=1)


class LightListBuilder:
    """Host-side builder mirroring the reference light variants."""

    def __init__(self):
        self.rows = []
        # (start, count, period, params21) spans appended by
        # regular_light_grid; build() exposes them as affine_segments only
        # when they cover the whole table.
        self._affine_spans = []

    def add_point(self, position, color):
        """Reference PointLight (common.h:72-75)."""
        z = (0.0, 0.0, 0.0)
        self.rows.append((position, z, z, color, color, color, color, POINT))
        return self

    def add_segment(self, endpoint0, endpoint1, color0, color1):
        """Reference SegmentLight (common.h:77-81)."""
        e0 = np.asarray(endpoint0, np.float32)
        e1 = np.asarray(endpoint1, np.float32)
        z = (0.0, 0.0, 0.0)
        self.rows.append((e0, e1 - e0, z, color0, color1, color0, color1, SEGMENT))
        return self

    def add_parallelogram(self, v0, edge01, edge02, color0, color1, color2, color3):
        """Reference ParallelogramLight (common.h:83-87)."""
        self.rows.append((v0, edge01, edge02, color0, color1, color2, color3,
                          PARALLELOGRAM))
        return self

    def build(self) -> LightTable:
        if not self.rows:
            # Keep a 1-row dummy table (weight-0 lights) so shapes stay static.
            z = np.zeros((1, 3), np.float32)
            return LightTable(
                v0=jnp.asarray(z), edge01=jnp.asarray(z), edge02=jnp.asarray(z),
                c0=jnp.asarray(z), c1=jnp.asarray(z), c2=jnp.asarray(z),
                c3=jnp.asarray(z), kind=jnp.zeros((1,), jnp.int32),
                rows=_pack_rows(z, z, z, z, z, z, z),
                const_cols=tuple(0.0 for _ in range(21)),
            )
        cols = list(zip(*self.rows))
        arrs = [np.asarray(c, np.float32).reshape(-1, 3) for c in cols[:7]]
        kind = np.asarray(cols[7], np.int32)
        flat = np.concatenate(arrs, axis=1)  # [L, 21]
        const_cols = tuple(
            float(flat[0, c]) if bool((flat[:, c] == flat[0, c]).all())
            else None
            for c in range(21)
        )
        covered = sum(s[1] for s in self._affine_spans)
        affine = (tuple(self._affine_spans)
                  if covered == len(self.rows) else None)
        return LightTable(
            v0=jnp.asarray(arrs[0]), edge01=jnp.asarray(arrs[1]),
            edge02=jnp.asarray(arrs[2]), c0=jnp.asarray(arrs[3]),
            c1=jnp.asarray(arrs[4]), c2=jnp.asarray(arrs[5]),
            c3=jnp.asarray(arrs[6]), kind=jnp.asarray(kind),
            rows=_pack_rows(*arrs),
            const_cols=const_cols,
            affine_segments=affine,
        )

    def __len__(self):
        return len(self.rows)


def sample_lights(
    lights: LightTable,
    light_idx: jnp.ndarray,  # [..., H, W] int32
    u: jnp.ndarray,  # [..., H, W] uniform in [0, 1]
    v: jnp.ndarray,  # [..., H, W] uniform in [0, 1]
):
    """Vectorised light sampling in image-minor layout. Returns
    (position [..., 3, H, W], color [..., 3, H, W]).

    Matches sampleParallelogramLight (light.cpp:27-34) with the point/segment
    cases falling out of the canonicalised table.
    """
    from ..core.vec import VEC_AXIS, e
    from ..ops.pallas_rows import gather_rows

    # ONE packed planes-first row-gather per index (see LightTable.rows):
    # [24, ..., H, W]. gather_rows' custom_vjp backward is a segment_sum
    # into the table — autodiff of a plain rows[idx] gather emitted a
    # [N_pixels, 24→128]-padded scatter that OOM'd the 1080p gradient pass.
    rows = gather_rows(lights.rows, light_idx)

    def comp(i):  # [..., 3, H, W] slice of the packed row
        return jnp.moveaxis(rows[3 * i:3 * i + 3], 0, VEC_AXIS)

    v0, e01, e02 = comp(0), comp(1), comp(2)
    c0, c1, c2, c3 = comp(3), comp(4), comp(5), comp(6)
    uu = e(u)
    vv = e(v)
    pos = v0 + uu * e01 + vv * e02
    lerp01 = c0 * (1.0 - uu) + c1 * uu
    lerp23 = c2 * (1.0 - uu) + c3 * uu
    color = lerp01 * (1.0 - vv) + lerp23 * vv
    return pos, color


def sample_lights_planes(
    lights: LightTable,
    light_idx: jnp.ndarray,  # [..., H, W] int32
    u: jnp.ndarray,
    v: jnp.ndarray,
):
    """sample_lights on scalar component planes: returns
    (px, py, pz, cr, cg, cb), each [..., H, W]. Avoids [..., 3, H, W]
    intermediates whose size-3 axis XLA lane-pads 42x inside scan
    reverse-mode (see ops/shading.target_pdf_planes)."""
    from ..ops.pallas_rows import gather_rows

    rows = gather_rows(lights.rows, light_idx)  # [24, ..., H, W]
    px = rows[0] + u * rows[3] + v * rows[6]
    py = rows[1] + u * rows[4] + v * rows[7]
    pz = rows[2] + u * rows[5] + v * rows[8]
    cols = []
    for c in range(3):
        lerp01 = rows[9 + c] * (1.0 - u) + rows[12 + c] * u
        lerp23 = rows[15 + c] * (1.0 - u) + rows[18 + c] * u
        cols.append(lerp01 * (1.0 - v) + lerp23 * v)
    return px, py, pz, cols[0], cols[1], cols[2]


def regular_light_grid(
    builder: LightListBuilder,
    start_pos,
    counts,
    edge01,
    edge02,
    color,
    empty_space_percentage: float = 0.1,
):
    """Grid of parallelogram lights. Reference: regularLightGrid
    (src/scene/scene.cpp:5-28)."""
    start_pos = np.asarray(start_pos, np.float32)
    edge01 = np.asarray(edge01, np.float32)
    edge02 = np.asarray(edge02, np.float32)
    cx, cy = counts
    space01 = edge01 / cx
    space02 = edge02 / cy
    light01 = edge01 * (1.0 - empty_space_percentage) / cx
    light02 = edge02 * (1.0 - empty_space_percentage) / cy
    start = len(builder)
    for xl in range(cx):
        for yl in range(cy):
            origin = start_pos + space01 * xl + space02 * yl
            builder.add_parallelogram(origin, light01, light02,
                                      color, color, color, color)
    # Record the exact affine structure (LightTable.affine_segments): light
    # local = xl*cy + yl, so column value = a + b*(local//cy) + c*(local%cy)
    # with the SAME f32 expression as `origin` above — bit-exact on replay.
    color = np.asarray(color, np.float32)
    zero3 = np.zeros(3, np.float32)

    def abc(a3, b3, c3):
        return [(float(a3[d]), float(b3[d]), float(c3[d])) for d in range(3)]

    params = (abc(start_pos, space01, space02)      # v0
              + abc(light01, zero3, zero3)          # edge01
              + abc(light02, zero3, zero3)          # edge02
              + abc(color, zero3, zero3) * 4)       # c0..c3
    builder._affine_spans.append((start, cx * cy, cy, tuple(params)))
    return builder
