"""Device-side scene representation (SoA) and prebuilt scenes.

Reference analogs: Scene/loadScenePrebuilt (src/scene/scene.{h,cpp}) and the
Embree geometry upload (src/ray_tracing/embree_interface.cpp:30-51). Instead
of per-mesh geometry objects handed to a BVH library, all submeshes are fused
into one flat triangle-soup SoA pytree with per-triangle material and submesh
ids — the layout the Pallas traversal kernels and XLA both want.

Triangle arrays are padded to a multiple of ``TRI_PAD`` with degenerate
(zero-area) triangles so downstream kernels see lane-aligned static shapes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
from flax import struct

from .objloader import SubMesh, load_obj
from .lights import LightListBuilder, LightTable, regular_light_grid

# Triangle-count padding granularity. The brute-force intersector streams
# triangle blocks over the (H, W) lane grid, so block-size divisibility (8)
# is all that's needed; padding to 128 would waste up to ~50% ray-triangle
# tests on small scenes (the nightclub is 83 tris). Pallas kernels that want
# 128-aligned triangle arrays pad internally.
TRI_PAD = 8


@struct.dataclass
class Geometry:
    """Flattened triangle soup + material table + texture stack.

    ``bvh`` is an optional acceleration structure (ops/bvh.BVH). When set,
    ops.intersect dispatches to the stackless wavefront traversal
    (ops/traverse.py) instead of the brute-force block scan; build it with
    ``romis_tpu.ops.bvh.with_bvh(geometry)``. None (the default) is the
    right choice for small scenes (< ~1k triangles)."""

    # Triangles [T, ...] (T padded to TRI_PAD)
    v0: jnp.ndarray  # [T, 3] first vertex
    e1: jnp.ndarray  # [T, 3] v1 - v0 (Möller–Trumbore edge)
    e2: jnp.ndarray  # [T, 3] v2 - v0
    n0: jnp.ndarray  # [T, 3] per-vertex shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # [T, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray  # [T] int32
    geom_id: jnp.ndarray  # [T] int32 submesh id (reference geometryId)
    active: jnp.ndarray  # [T] bool (False on padding)

    # Material table [M, ...] (reference Material, framework mesh.h:22-34)
    mat_kd: jnp.ndarray  # [M, 3]
    mat_ks: jnp.ndarray  # [M, 3]
    mat_shininess: jnp.ndarray  # [M]
    mat_tex_id: jnp.ndarray  # [M] int32, -1 = no texture

    # Texture stack [NT, TH, TW, 3] (all textures padded to common size)
    tex_data: jnp.ndarray
    tex_size: jnp.ndarray  # [NT, 2] int32 (height, width)

    # Packed row tables — ONE row-gather per index instead of 20+ scalar
    # component gathers (measured ~57x faster on TPU; see scene/lights.py):
    # tri_rows  [T, 12]: v0(3) e1(3) e2(3) active pad(2)   (traversal leaves)
    # attr_rows [T, 24]: n0 n1 n2 (9) uv0 uv1 uv2 (6) mat_id geom_id pad(7)
    # mat_rows  [M, 8]:  kd(3) ks(3) shininess tex_id      (shading context)
    tri_rows: jnp.ndarray
    attr_rows: jnp.ndarray
    mat_rows: jnp.ndarray

    # Optional acceleration structure (ops/bvh.BVH pytree or None).
    bvh: object = None

    # Backend choice for the brute-force path (static, not a pytree leaf):
    # route intersections through the fused Pallas kernels when True and the
    # soup fits on-chip (ops/pallas_trace.py). Enable with
    # geometry.replace(use_pallas=True) on TPU.
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    # Host-detected specialization (static): when every material shares one
    # integer shininess (e.g. the nightclub's Ns=250), the Pallas kernels
    # compute the specular pow by repeated squaring (~12 mults) instead of
    # exp(shin*log(cos)) — two transcendentals per evaluation, 32+
    # evaluations per pixel per frame in the RIS kernel alone.
    uniform_shin: float = struct.field(pytree_node=False, default=None)

    @property
    def num_tris(self) -> int:
        return self.v0.shape[0]


@dataclass
class Scene:
    """Host-side scene bundle handed to the renderer."""

    geometry: Geometry
    lights: LightTable
    num_lights: int
    name: str = "scene"


def _load_texture(path: str) -> np.ndarray | None:
    try:
        from PIL import Image  # pillow ships with the torch stack

        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32) / 255.0
    except Exception:
        return None


def build_geometry(submeshes: list[SubMesh]) -> Geometry:
    """Fuse submeshes into the flat SoA layout.

    Reference analog: EmbreeInterface::initScene
    (src/ray_tracing/embree_interface.cpp:30-51) — one geometry per submesh
    with a geomID→Material map becomes per-triangle (geom_id, mat_id) columns.
    """
    tri_rows = []
    mats = []
    textures: list[np.ndarray] = []
    tex_paths: dict[str, int] = {}

    for gid, sm in enumerate(submeshes):
        m = sm.material
        tex_id = -1
        if m.kd_texture:
            if m.kd_texture not in tex_paths:
                img = _load_texture(m.kd_texture)
                if img is not None:
                    tex_paths[m.kd_texture] = len(textures)
                    textures.append(img)
                else:
                    tex_paths[m.kd_texture] = -1
            tex_id = tex_paths[m.kd_texture]
        mats.append((m.kd, m.ks, m.shininess, tex_id))
        mat_id = len(mats) - 1
        p, n, uv, t = sm.positions, sm.normals, sm.texcoords, sm.triangles
        for tri in t:
            i0, i1, i2 = int(tri[0]), int(tri[1]), int(tri[2])
            tri_rows.append(
                (p[i0], p[i1] - p[i0], p[i2] - p[i0],
                 n[i0], n[i1], n[i2],
                 uv[i0], uv[i1], uv[i2], mat_id, gid)
            )

    n_tris = len(tri_rows)
    n_pad = max(TRI_PAD, -(-n_tris // TRI_PAD) * TRI_PAD)

    def col(i, dim):
        a = np.zeros((n_pad, dim), np.float32)
        if n_tris:
            a[:n_tris] = np.asarray([r[i] for r in tri_rows], np.float32)
        return a

    mat_kd = np.asarray([m[0] for m in mats], np.float32).reshape(-1, 3)
    mat_ks = np.asarray([m[1] for m in mats], np.float32).reshape(-1, 3)
    mat_sh = np.asarray([m[2] for m in mats], np.float32).reshape(-1)
    mat_tx = np.asarray([m[3] for m in mats], np.int32).reshape(-1)

    if textures:
        th = max(t.shape[0] for t in textures)
        tw = max(t.shape[1] for t in textures)
        tex = np.zeros((len(textures), th, tw, 3), np.float32)
        sizes = np.zeros((len(textures), 2), np.int32)
        for i, t in enumerate(textures):
            tex[i, : t.shape[0], : t.shape[1]] = t
            sizes[i] = (t.shape[0], t.shape[1])
    else:
        tex = np.zeros((1, 1, 1, 3), np.float32)
        sizes = np.ones((1, 2), np.int32)

    active = np.zeros((n_pad,), bool)
    active[:n_tris] = True
    ids = np.zeros((n_pad,), np.int32)
    if n_tris:
        ids[:n_tris] = [r[9] for r in tri_rows]
    gids = np.zeros((n_pad,), np.int32)
    if n_tris:
        gids[:n_tris] = [r[10] for r in tri_rows]

    g = Geometry(
        v0=jnp.asarray(col(0, 3)), e1=jnp.asarray(col(1, 3)),
        e2=jnp.asarray(col(2, 3)), n0=jnp.asarray(col(3, 3)),
        n1=jnp.asarray(col(4, 3)), n2=jnp.asarray(col(5, 3)),
        uv0=jnp.asarray(col(6, 2)), uv1=jnp.asarray(col(7, 2)),
        uv2=jnp.asarray(col(8, 2)),
        mat_id=jnp.asarray(ids), geom_id=jnp.asarray(gids),
        active=jnp.asarray(active),
        mat_kd=jnp.asarray(mat_kd), mat_ks=jnp.asarray(mat_ks),
        mat_shininess=jnp.asarray(mat_sh), mat_tex_id=jnp.asarray(mat_tx),
        tex_data=jnp.asarray(tex), tex_size=jnp.asarray(sizes),
        tri_rows=jnp.zeros(()), attr_rows=jnp.zeros(()),
        mat_rows=jnp.zeros(()),
        uniform_shin=_detect_uniform_shin(mat_sh),
    )
    return repack_rows(g)


def _detect_uniform_shin(mat_sh) -> float:
    """One shared integer shininess across all materials, else None
    (see Geometry.uniform_shin)."""
    vals = {float(v) for v in np.asarray(mat_sh).ravel()}
    if len(vals) != 1:
        return None
    v = vals.pop()
    if v == round(v) and 1.0 <= v <= 1024.0:
        return v
    return None


def pack_tri_rows(v0, e1, e2, active):
    n = v0.shape[0]
    return jnp.concatenate(
        [v0, e1, e2, active.astype(jnp.float32)[:, None],
         jnp.zeros((n, 2), jnp.float32)], axis=1)


def pack_attr_rows(n0, n1, n2, uv0, uv1, uv2, mat_id, geom_id):
    n = n0.shape[0]
    return jnp.concatenate(
        [n0, n1, n2, uv0, uv1, uv2,
         mat_id.astype(jnp.float32)[:, None],
         geom_id.astype(jnp.float32)[:, None],
         jnp.zeros((n, 7), jnp.float32)], axis=1)


def pack_mat_rows(mat_kd, mat_ks, mat_shininess, mat_tex_id):
    return jnp.concatenate(
        [mat_kd, mat_ks, mat_shininess[:, None],
         mat_tex_id.astype(jnp.float32)[:, None]], axis=1)


def repack_rows(g: Geometry) -> Geometry:
    """(Re)build the packed row tables from the component columns. Must be
    called after replacing any packed column (diff/grad.apply_params does)."""
    return g.replace(
        tri_rows=pack_tri_rows(g.v0, g.e1, g.e2, g.active),
        attr_rows=pack_attr_rows(g.n0, g.n1, g.n2, g.uv0, g.uv1, g.uv2,
                                 g.mat_id, g.geom_id),
        mat_rows=pack_mat_rows(g.mat_kd, g.mat_ks, g.mat_shininess,
                               g.mat_tex_id),
    )


# ---------------------------------------------------------------------------
# Prebuilt scenes (reference: loadScenePrebuilt, src/scene/scene.cpp:68-132)
# ---------------------------------------------------------------------------

def default_data_dir() -> str | None:
    for cand in (os.environ.get("ROMIS_DATA_DIR"),
                 os.path.join(os.path.dirname(__file__), "..", "..", "data"),
                 "/root/reference/data"):
        if cand and os.path.isdir(cand):
            return cand
    return None


def nightclub_lights(builder: LightListBuilder) -> LightListBuilder:
    """The Cornell Nightclub's 512 wall lights. Reference:
    constructNightClubLights (src/scene/scene.cpp:30-66)."""
    counts = (16, 16)
    free = 0.30
    # Right wall, color 0.65
    regular_light_grid(builder, (-8.7, 6.4, -9.1), counts,
                       (0.0, 0.0, 17.0), (0.0, -6.0, 0.0),
                       (0.65, 0.65, 0.65), free)
    # Back wall, color 0.4
    regular_light_grid(builder, (9.2, 6.4, 8.6), counts,
                       (-17.0, 0.0, 0.0), (0.0, -6.0, 0.0),
                       (0.4, 0.4, 0.4), free)
    return builder


_PREBUILT = {
    "single_triangle": ("triangle.obj", False),
    "cube": ("cube.obj", False),
    "cube_textured": ("cube-textured.obj", False),
    "cornell_box": ("CornellBox-Mirror-Rotated.obj", True),
    "cornell_box_parallelogram_light": ("CornellBox-Mirror-Rotated.obj", True),
    "cornell_nightclub": ("cornell-nightclub.obj", False),
    "monkey": ("monkey.obj", True),
}


def _instance_grid(submeshes, n: int, spacing: float = 2.2):
    """Replicate submeshes over an n x n XZ grid (new-framework large-scene
    workload — the reference has no >640-tri scene; this sizes the BVH
    traversal benchmark at n*n*500 monkey triangles)."""
    import dataclasses

    out = []
    half = (n - 1) / 2.0
    for gi in range(n):
        for gj in range(n):
            off = np.asarray(
                [(gi - half) * spacing, 0.0, (gj - half) * spacing],
                np.float32)
            for sm in submeshes:
                out.append(dataclasses.replace(
                    sm, positions=sm.positions + off))
    return out


def load_monkey_field(n: int = 5, data_dir: str | None = None) -> Scene:
    """n x n grid of monkeys (n*n*500 + 2 triangles) under a parallelogram
    sky light + 2 point lights: the large-scene benchmark for the paged
    Pallas BVH traversal (ops/pallas_bvh.py). Not a reference scene."""
    data_dir = data_dir or default_data_dir()
    if data_dir is None:
        raise FileNotFoundError("no data directory found; set ROMIS_DATA_DIR")
    submeshes = load_obj(os.path.join(data_dir, "monkey.obj"),
                         center_and_normalize=True)
    submeshes = _instance_grid(submeshes, n)
    # Ground plane under the grid.
    import dataclasses

    ext = 1.4 * n
    quad = dataclasses.replace(
        submeshes[0],
        positions=np.asarray([[-ext, -0.8, -ext], [ext, -0.8, -ext],
                              [ext, -0.8, ext], [-ext, -0.8, ext]],
                             np.float32),
        normals=np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1)),
        texcoords=np.zeros((4, 2), np.float32),
        triangles=np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    submeshes.append(quad)

    lights = LightListBuilder()
    lights.add_parallelogram(
        (-0.3 * n, 1.5 * n, -0.3 * n), (0.6 * n, 0, 0), (0, 0, 0.6 * n),
        (40.0, 40.0, 40.0), (40.0, 40.0, 40.0), (40.0, 40.0, 40.0),
        (40.0, 40.0, 40.0))
    lights.add_point((-ext, 2.0, -ext), (30, 30, 30))
    lights.add_point((ext, 2.0, ext), (30, 30, 30))
    return Scene(geometry=build_geometry(submeshes), lights=lights.build(),
                 num_lights=len(lights), name=f"monkey_field_{n}x{n}")


def load_prebuilt(name: str, data_dir: str | None = None) -> Scene:
    """Reference: loadScenePrebuilt (src/scene/scene.cpp:68-132), including the
    hardcoded per-scene lights."""
    data_dir = data_dir or default_data_dir()
    if data_dir is None:
        raise FileNotFoundError("no data directory found; set ROMIS_DATA_DIR")
    obj, center = _PREBUILT[name]
    submeshes = load_obj(os.path.join(data_dir, obj), center_and_normalize=center)

    lights = LightListBuilder()
    if name == "single_triangle":
        # Reference also overrides kd to white (scene.cpp:73).
        submeshes[0].material.kd = (1.0, 1.0, 1.0)
        lights.add_point((-1, 1, -1), (1, 1, 1))
    elif name == "cube":
        lights.add_segment((1.5, 0.5, -0.6), (-1, 0.5, -0.5),
                           (0.9, 0.2, 0.1), (0.2, 1, 0.3))
    elif name == "cube_textured":
        lights.add_point((-1.0, 1.5, -1.0), (1, 1, 1))
    elif name == "cornell_box":
        lights.add_point((0, 0.58, 0), (1, 1, 1))
    elif name == "cornell_box_parallelogram_light":
        lights.add_parallelogram(
            (-0.2, 0.5, 0), (0.4, 0, 0), (0.0, 0.0, 0.4),
            (1.0, 1.0, 1.0), (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), (1.0, 1.0, 1.0))
    elif name == "cornell_nightclub":
        nightclub_lights(lights)
    elif name == "monkey":
        lights.add_point((-1, 1, -1), (1, 1, 1))
        lights.add_point((1, -1, -1), (1, 1, 1))

    return Scene(geometry=build_geometry(submeshes), lights=lights.build(),
                 num_lights=len(lights), name=name)


def load_scene_from_file(path: str, lights: LightListBuilder,
                         center_and_normalize: bool = False) -> Scene:
    """Reference: loadSceneFromFile (src/scene/scene.cpp:134-140)."""
    submeshes = load_obj(path, center_and_normalize=center_and_normalize)
    return Scene(geometry=build_geometry(submeshes), lights=lights.build(),
                 num_lights=len(lights),
                 name=os.path.splitext(os.path.basename(path))[0])
