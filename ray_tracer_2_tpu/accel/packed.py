"""Packed per-octant node rows — one gather per traversal step.

TPU random gathers are latency-bound per ROW, and a row of up to 128 lanes
costs the same as one float (the hardware fetches a full tile either way).
So the traversal's entire working set for one step is packed into a single
64-float row per (octant, node):

  cols  0:3   aabb min            cols 10:14  material id per leaf slot
  cols  3:6   aabb max            cols 14:18  backface-cull flag per slot
  col   6     hit_next  (float)   cols 18:54  4 triangles × (v0,v1,v2)
  col   7     miss_next (float)   cols 54:64  pad
  col   8     leaf count (0 ⇒ internal)
  col   9     first global triangle index (attributes/ids)

Leaf triangles are stored INLINE (duplicated per octant), so a leaf visit
costs the same single gather as an internal visit. Integer fields ride as
floats — all indices stay below 2^24 so the round trip is exact.

The per-octant hit/miss links come from accel/threading.py; everything else
is octant-invariant but duplicated to keep the step at exactly one gather.
"""
from __future__ import annotations

import numpy as np

from ray_tracer_2_tpu.accel.bvh import BVH
from ray_tracer_2_tpu.accel.threading import compute_skip_links

ROW_WIDTH = 64
#: leaf slots per row; must equal scene.LEAF_CHUNK
ROW_TRIS = 4


def pack_octant_rows(bvh: BVH, v0, v1, v2, tri_mat, tri_cull,
                     node_offset: int, tri_offset: int) -> np.ndarray:
    """Build the (8, N, 64) packed rows for one group BVH.

    v0/v1/v2/tri_mat/tri_cull are the group's LEAF-ORDERED triangle arrays
    (i.e. already permuted by bvh.tri_order). Links and ``first`` are
    globalized with node_offset/tri_offset.
    """
    n = bvh.n_nodes
    rows = np.zeros((8, n, ROW_WIDTH), np.float32)
    lhit, lmiss = compute_skip_links(bvh)

    base = np.zeros((n, ROW_WIDTH), np.float32)
    base[:, 0:3] = bvh.node_min
    base[:, 3:6] = bvh.node_max
    base[:, 8] = bvh.node_count.astype(np.float32)
    base[:, 9] = (bvh.node_first + tri_offset).astype(np.float32)

    # Inline leaf triangle slabs.
    leaves = np.flatnonzero(bvh.node_count > 0)
    first = bvh.node_first[leaves]
    count = bvh.node_count[leaves]
    n_tris = len(v0)
    for j in range(ROW_TRIS):
        tri = np.minimum(first + j, max(n_tris - 1, 0))
        valid = j < count
        base[leaves, 10 + j] = np.where(valid, tri_mat[tri], 0).astype(np.float32)
        # invalid slots cull everything: flag 1 with degenerate zero triangle
        base[leaves, 14 + j] = np.where(valid, tri_cull[tri], 1.0)
        o = 18 + j * 9
        for k, arr in enumerate((v0, v1, v2)):
            vals = np.where(valid[:, None], arr[tri], 0.0)
            base[leaves, o + 3 * k:o + 3 * k + 3] = vals

    for oct_ in range(8):
        rows[oct_] = base
        rows[oct_, :, 6] = np.where(lhit[oct_] >= 0,
                                    lhit[oct_] + node_offset, -1).astype(np.float32)
        rows[oct_, :, 7] = np.where(lmiss[oct_] >= 0,
                                    lmiss[oct_] + node_offset, -1).astype(np.float32)
    return rows


def pack_tri_attributes(n0, n1, n2, uv0, uv1, uv2) -> np.ndarray:
    """(T, 16) shading-attribute rows: normals (9), uvs (6), pad — one gather
    resolves the winning triangle's attributes after traversal."""
    t = len(n0)
    attr = np.zeros((t, 16), np.float32)
    attr[:, 0:3] = n0
    attr[:, 3:6] = n1
    attr[:, 6:9] = n2
    attr[:, 9:11] = uv0
    attr[:, 11:13] = uv1
    attr[:, 13:15] = uv2
    return attr
