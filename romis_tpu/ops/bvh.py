"""BVH build (host-side) and flattened threaded layout for TPU traversal.

This replaces Embree's acceleration structure (reference:
src/ray_tracing/embree_interface.cpp:30-51, RTC_BUILD_QUALITY_HIGH). The
build runs once per scene on the host:

- preferred: the native C++ binned-SAH builder (native/bvh_builder.cpp, via
  ctypes — no pybind11 in this image),
- fallback: a NumPy median-split builder with identical output layout.

Layout is *threaded* (stackless skip-link) in DFS preorder:
- inner node at index i has its first child at i+1 and a ``miss_link`` to
  jump to when the ray misses its box (the node after its subtree),
- leaves own a contiguous [first, first+count) range of the *reordered*
  triangle arrays (we physically permute the geometry so tri_order is the
  identity — leaf tests become contiguous gathers),
- traversal state per ray is a single int cursor → maps onto TPU wavefronts
  with no per-ray stack (see ops/traverse.py).

All node columns are stored as separate [N_nodes] arrays (image-minor gather
discipline, see core/vec.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
import jax.numpy as jnp
from flax import struct

MAX_LEAF = 4  # static unroll bound in the traversal kernels

# Paged layout constants (the Pallas traversal kernel's working set,
# ops/pallas_bvh.py): triangles are regrouped into fixed-size "pages" cut
# from the SAH tree as maximal subtrees of <= PAGE_TRIS triangles; the tree
# ABOVE the cuts (the "top tree") is small enough for SMEM residence and is
# walked with a scalar skip-link cursor, DMA-ing live pages HBM->SMEM.
PAGE_TRIS = 512      # triangle slots per page (lane dim of the page record)
PAGE_ROWS = 16       # rows: v0/e1/e2 xyz (9) + active (1) + block AABBs (6)
PAGE_BLK = 16        # triangles per fine culling block inside a page
MAX_TOP_NODES = 8192  # SMEM budget guard (32 B/node; probe: 320 KB is safe)


@struct.dataclass
class PagedBVH:
    """SMEM top tree + HBM triangle pages for the Pallas traversal kernels.

    nodes_box  [6, N] f32: bmin xyz / bmax xyz per top-tree node
    nodes_link [2, N] i32: (miss_link | -1, page_id | -1 for inner nodes)
    page_first [P]    i32: global (reordered) triangle index of page slot 0
    pages      [P, PAGE_ROWS, page_tris] f32: rows 0-8 v0/e1/e2 xyz,
               row 9 active flag, rows 10-15 per-PAGE_BLK block AABBs
               (min xyz / max xyz packed in the first page_tris//PAGE_BLK
               lanes; empty blocks hold inverted +-1e30 sentinels)
    """

    nodes_box: jnp.ndarray
    nodes_link: jnp.ndarray
    page_first: jnp.ndarray
    pages: jnp.ndarray

    @property
    def n_pages(self) -> int:
        return self.pages.shape[0]

    @property
    def page_tris(self) -> int:
        return self.pages.shape[2]


@struct.dataclass
class BVH:
    # Node columns [N_nodes] (DFS preorder; first child = parent + 1).
    bmin_x: jnp.ndarray
    bmin_y: jnp.ndarray
    bmin_z: jnp.ndarray
    bmax_x: jnp.ndarray
    bmax_y: jnp.ndarray
    bmax_z: jnp.ndarray
    miss_link: jnp.ndarray  # int32, -1 terminates traversal
    leaf_first: jnp.ndarray  # int32, -1 for inner nodes
    leaf_count: jnp.ndarray  # int32, 0 for inner nodes

    # Paged layout for the Pallas traversal kernels (None when the top tree
    # exceeds the SMEM budget; ops/intersect then uses the XLA wavefront).
    paged: PagedBVH | None = None

    @property
    def n_nodes(self) -> int:
        return self.bmin_x.shape[0]


def _load_native():
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libromis_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.bvh_build_sah.restype = ctypes.c_int32
        lib.bvh_build_sah.argtypes = [f32p, f32p, f32p, ctypes.c_int32,
                                      ctypes.c_int32,
                                      f32p, f32p, i32p, i32p, i32p, i32p,
                                      i32p]
        return lib
    except OSError:
        return None


_NATIVE = _load_native()


def _build_arrays_native(v0, e1, e2, max_leaf):
    n = len(v0)
    cap = 2 * n
    bmin = np.zeros((cap, 3), np.float32)
    bmax = np.zeros((cap, 3), np.float32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    lfirst = np.zeros(cap, np.int32)
    lcount = np.zeros(cap, np.int32)
    order = np.zeros(n, np.int32)

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def pi(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    n_nodes = _NATIVE.bvh_build_sah(
        p32(v0), p32(e1), p32(e2), n, max_leaf,
        p32(bmin), p32(bmax), pi(left), pi(right), pi(lfirst), pi(lcount),
        pi(order))
    if n_nodes < 0:
        raise RuntimeError("native BVH build failed")
    return (bmin[:n_nodes], bmax[:n_nodes], left[:n_nodes], right[:n_nodes],
            lfirst[:n_nodes], lcount[:n_nodes], order)


def _build_arrays_numpy(v0, e1, e2, max_leaf):
    """Median-split fallback with the same DFS-preorder output contract."""
    n = len(v0)
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    cent = 0.5 * (lo + hi)

    bmin, bmax, left, right, lfirst, lcount = [], [], [], [], [], []
    order = np.arange(n, dtype=np.int32)

    def build(idxs):
        node = len(bmin)
        bmin.append(lo[idxs].min(axis=0))
        bmax.append(hi[idxs].max(axis=0))
        left.append(-1)
        right.append(-1)
        if len(idxs) <= max_leaf:
            lfirst.append(-2)  # patched below: position in final order
            lcount.append(len(idxs))
            build.leaves.append((node, idxs))
            return node
        lfirst.append(-1)
        lcount.append(0)
        ext = cent[idxs].max(axis=0) - cent[idxs].min(axis=0)
        axis = int(np.argmax(ext))
        med = np.argsort(cent[idxs, axis], kind="stable")
        half = len(idxs) // 2
        l = build(idxs[med[:half]])
        r = build(idxs[med[half:]])
        left[node] = l
        right[node] = r
        return node

    build.leaves = []
    build(order)

    final_order = []
    for node, idxs in build.leaves:
        lfirst[node] = len(final_order)
        final_order.extend(idxs.tolist())
    return (np.asarray(bmin, np.float32), np.asarray(bmax, np.float32),
            np.asarray(left, np.int32), np.asarray(right, np.int32),
            np.asarray(lfirst, np.int32), np.asarray(lcount, np.int32),
            np.asarray(final_order, np.int32))


def _thread_links(left, right):
    """miss_link per node for DFS-preorder skip traversal."""
    n = len(left)
    miss = np.full(n, -1, np.int32)

    def assign(node, miss_of_node):
        miss[node] = miss_of_node
        l, r = left[node], right[node]
        if l >= 0:
            assign(l, r)  # after the left subtree comes the right child
            assign(r, miss_of_node)

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * n + 100))
    try:
        assign(0, -1)
    finally:
        sys.setrecursionlimit(old)
    return miss


def _build_paged(bmin, bmax, left, right, lfirst, lcount, v0s, e1s, e2s,
                 page_tris: int = PAGE_TRIS) -> PagedBVH | None:
    """Cut the SAH build tree into a SMEM-resident top tree whose leaves are
    fixed-size triangle pages (see PagedBVH). The builders' in-place
    partition guarantees every subtree owns a contiguous, DFS-monotone
    triangle range, so page p is simply slots [first, first+count) of the
    reordered triangle arrays and a page hit maps back to global indices as
    page_first[p] + slot.

    v0s/e1s/e2s: the ACTIVE triangles already in final (reordered) order.
    Returns None when the top tree would not fit the SMEM budget."""
    n = len(left)
    sub_first = np.where(lcount > 0, lfirst, 0).astype(np.int64)
    sub_count = lcount.astype(np.int64).copy()
    # Children follow their parent in the DFS-preorder node array, so a
    # reverse sweep sees both children before the parent.
    for i in range(n - 1, -1, -1):
        if left[i] >= 0:
            sub_first[i] = sub_first[left[i]]
            sub_count[i] = sub_count[left[i]] + sub_count[right[i]]
    assert int(lcount.max(initial=0)) <= page_tris, (
        "page_tris must be >= the builder's largest leaf")

    # DFS-preorder cut: maximal subtrees with <= page_tris triangles.
    top_orig: list[int] = []
    top_page: list[int] = []
    pages: list[tuple[int, int]] = []
    stack = [0]
    while stack:
        i = stack.pop()
        if sub_count[i] <= page_tris or left[i] < 0:
            top_orig.append(i)
            top_page.append(len(pages))
            pages.append((int(sub_first[i]), int(sub_count[i])))
        else:
            top_orig.append(i)
            top_page.append(-1)
            stack.append(right[i])
            stack.append(left[i])
    n_top = len(top_orig)
    if n_top > MAX_TOP_NODES:
        return None

    new_idx = {o: k for k, o in enumerate(top_orig)}
    miss = np.full(n_top, -1, np.int32)
    st = [(0, -1)]
    while st:
        o, m = st.pop()
        k = new_idx[o]
        miss[k] = m
        if top_page[k] < 0:
            l, r = left[o], right[o]
            st.append((r, m))
            st.append((l, new_idx[r]))

    n_pages = len(pages)
    nb = page_tris // PAGE_BLK
    rec = np.zeros((n_pages, PAGE_ROWS, page_tris), np.float32)
    pfirst = np.zeros(max(n_pages, 1), np.int32)
    for p, (f, c) in enumerate(pages):
        pfirst[p] = f
        sl = slice(f, f + c)
        rec[p, 0:3, :c] = v0s[sl].T
        rec[p, 3:6, :c] = e1s[sl].T
        rec[p, 6:9, :c] = e2s[sl].T
        rec[p, 9, :c] = 1.0
        pts = np.stack([v0s[sl], v0s[sl] + e1s[sl], v0s[sl] + e2s[sl]], 1)
        lo = pts.min(1)
        hi = pts.max(1)
        blo = np.full((nb, 3), 1e30, np.float32)
        bhi = np.full((nb, 3), -1e30, np.float32)
        for b in range(nb):
            s0, s1 = b * PAGE_BLK, min((b + 1) * PAGE_BLK, c)
            if s1 > s0:
                blo[b] = lo[s0:s1].min(0) - 1e-4
                bhi[b] = hi[s0:s1].max(0) + 1e-4
        rec[p, 10:13, :nb] = blo.T
        rec[p, 13:16, :nb] = bhi.T

    ti = np.asarray(top_orig, np.int64)
    nodes_box = np.stack([
        bmin[ti, 0], bmin[ti, 1], bmin[ti, 2],
        bmax[ti, 0], bmax[ti, 1], bmax[ti, 2]]).astype(np.float32)
    nodes_link = np.stack([miss, np.asarray(top_page, np.int32)])
    return PagedBVH(
        nodes_box=jnp.asarray(nodes_box),
        nodes_link=jnp.asarray(nodes_link),
        page_first=jnp.asarray(pfirst),
        pages=jnp.asarray(rec),
    )


def build_bvh(geometry, max_leaf: int = MAX_LEAF):
    """Build a BVH over the *active* triangles of ``geometry`` and return
    (BVH, geometry with triangles permuted so leaves are contiguous).

    The native SAH builder is used when available; leaf ranges never touch
    the padded (inactive) triangles, which are moved to the tail."""
    active = np.asarray(geometry.active)
    act_idx = np.nonzero(active)[0]
    pad_idx = np.nonzero(~active)[0]
    v0 = np.ascontiguousarray(np.asarray(geometry.v0)[act_idx])
    e1 = np.ascontiguousarray(np.asarray(geometry.e1)[act_idx])
    e2 = np.ascontiguousarray(np.asarray(geometry.e2)[act_idx])

    if _NATIVE is not None:
        bmin, bmax, left, right, lfirst, lcount, order = _build_arrays_native(
            v0, e1, e2, max_leaf)
    else:
        bmin, bmax, left, right, lfirst, lcount, order = _build_arrays_numpy(
            v0, e1, e2, max_leaf)

    miss = _thread_links(left, right)
    paged = _build_paged(bmin, bmax, left, right, lfirst, lcount,
                         v0[order], e1[order], e2[order])

    # Verify the contracts the threaded traversal and the paged cut rely on
    # (both builders): DFS preorder — every inner node's left child directly
    # follows it — and leaf ranges partitioning [0, n_active) in node order.
    inner = left >= 0
    assert np.array_equal(left[inner], np.nonzero(inner)[0] + 1), (
        "BVH builder violated DFS preorder (left child != parent + 1)")
    starts = lfirst[~inner]
    ends = starts + lcount[~inner]
    assert (len(starts) > 0 and starts[0] == 0
            and np.array_equal(starts[1:], ends[:-1])
            and int(ends[-1]) == len(v0)), (
        "BVH leaf ranges do not partition [0, n) in preorder")

    perm = np.concatenate([act_idx[order], pad_idx]).astype(np.int32)
    geometry = geometry.replace(
        **{f: jnp.asarray(np.asarray(getattr(geometry, f))[perm])
           for f in ("v0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1",
                     "uv2", "mat_id", "geom_id", "active")})
    from ..scene.scene import repack_rows

    geometry = repack_rows(geometry)  # keep packed row tables in sync

    bvh = BVH(
        bmin_x=jnp.asarray(bmin[:, 0]), bmin_y=jnp.asarray(bmin[:, 1]),
        bmin_z=jnp.asarray(bmin[:, 2]), bmax_x=jnp.asarray(bmax[:, 0]),
        bmax_y=jnp.asarray(bmax[:, 1]), bmax_z=jnp.asarray(bmax[:, 2]),
        miss_link=jnp.asarray(miss), leaf_first=jnp.asarray(lfirst),
        leaf_count=jnp.asarray(lcount), paged=paged,
    )
    return bvh, geometry


def with_bvh(geometry, max_leaf: int = MAX_LEAF):
    """Attach a BVH to a Geometry: builds over the active triangles, permutes
    them leaf-contiguously, and stores the BVH on geometry.bvh so every
    ops.intersect entry point dispatches to the wavefront traversal."""
    bvh, geometry = build_bvh(geometry, max_leaf)
    return geometry.replace(bvh=bvh)


def sah_cost(bvh: BVH) -> float:
    """Total SAH cost (for build-quality tests/diagnostics)."""
    bmin = np.stack([np.asarray(bvh.bmin_x), np.asarray(bvh.bmin_y),
                     np.asarray(bvh.bmin_z)], -1)
    bmax = np.stack([np.asarray(bvh.bmax_x), np.asarray(bvh.bmax_y),
                     np.asarray(bvh.bmax_z)], -1)
    d = np.maximum(bmax - bmin, 0)
    area = 2 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])
    counts = np.asarray(bvh.leaf_count)
    root = max(area[0], 1e-12)
    return float((area * np.maximum(counts, 1)).sum() / root)
