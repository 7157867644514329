"""Substitute-geometry equivalence evidence (VERDICT r3 missing #3).

The reference mount omits Dragon_80K.obj (/root/reference/.MISSING_LARGE_BLOBS)
and zero egress means it cannot be fetched, so the headline benchmark runs on
a midpoint-subdivided dragon.obj (assets/procedural.py). This script records
the evidence that the substitute is a fair BVH stress for an ~80k-tri scan:

  * BVH topology: node/leaf counts, leaf-depth distribution, tris/leaf,
    total SAH cost — for the original 8,712-face dragon.obj AND the 80,001-
    tri substitute, built by the SAME builder at the same quality.
  * Traversal work: measured visits/ray (inner + leaf wide-row fetches) on
    identical camera rays through both, via the wide-BVH replay used for
    every kernel design decision (scripts/sim_wide256.py machinery).

The concern midpoint subdivision raises is that 4 coplanar children of one
parent triangle could make the tree *easier* than a real scan (more
coherent leaves). The visits/ray comparison quantifies exactly that: if the
substitute needed fewer fetches per ray than the coarse original, the
benchmark would be flattered. Output is one JSON line per row, suitable for
pasting into docs/BENCH provenance.

Run (CPU): python scripts/geometry_equivalence.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def bvh_stats(bvh, tag):
    count = np.asarray(bvh.node_count)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    n = len(count)
    # leaf depth distribution
    depth = np.zeros(n, np.int32)
    stack = [0]
    while stack:
        nd = stack.pop()
        if count[nd] == 0:
            for c in (int(left[nd]), int(right[nd])):
                depth[c] = depth[nd] + 1
                stack.append(c)
    leaf = count > 0
    ld = depth[leaf]
    tl = count[leaf]
    # SAH cost: sum over nodes of half-area * count (leaves) — the
    # reference's cost model (bvh.rs:68-74)
    ext = np.maximum(nmax - nmin, 0)
    half_area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] \
        + ext[:, 2] * ext[:, 0]
    root_ha = max(float(half_area[0]), 1e-30)
    sah = float((half_area[leaf] * tl).sum() / root_ha)
    return dict(
        tag=tag, nodes=int(n), leaves=int(leaf.sum()),
        tris=int(tl.sum()),
        tris_per_leaf_mean=round(float(tl.mean()), 2),
        tris_per_leaf_max=int(tl.max()),
        leaf_depth_mean=round(float(ld.mean()), 2),
        leaf_depth_p5=int(np.percentile(ld, 5)),
        leaf_depth_p50=int(np.percentile(ld, 50)),
        leaf_depth_p95=int(np.percentile(ld, 95)),
        leaf_depth_max=int(ld.max()),
        sah_cost=round(sah, 2))


def visits(bvh, v0, v1, v2, o, d):
    """Wide-32 fetches/ray (inner+leaf) via the replay machinery."""
    from ray_tracer_2_tpu.accel.wide import pack_wide_rows, \
        traverse_wide_numpy
    tri_mat = np.zeros(len(v0), np.int32)
    tri_cull = np.ones(len(v0), np.float32)
    order = bvh.tri_order
    rows, n_rows, depth = pack_wide_rows(
        bvh, v0[order], v1[order], v2[order], tri_mat, tri_cull, 0, 0)
    f = []
    for i in range(len(o)):
        *_, fetches = traverse_wide_numpy(rows, o[i], d[i])
        f.append(fetches)
    f = np.array(f)
    return dict(rows=int(n_rows), wide_depth=int(depth),
                fetches_mean=round(float(f.mean()), 2),
                fetches_p95=int(np.percentile(f, 95)))


def main():
    from ray_tracer_2_tpu.accel.bvh import BVHQuality, build_bvh
    from ray_tracer_2_tpu.assets.manager import AssetManager

    assets = AssetManager()
    out = []
    rng = np.random.default_rng(3)
    for name, loader in (
            ("dragon.obj (original)",
             lambda: assets.load_model("dragon.obj", use_mtl=False)),
            ("Dragon_80K substitute",
             lambda: assets.load_model("Dragon_80K.obj", use_mtl=False))):
        parts = loader()
        tris = []
        for mesh, _mat, _label in parts:
            pos = np.asarray(mesh.positions, np.float32)
            idx = np.asarray(mesh.indices, np.int64)
            tris.append(pos[idx])
        v = np.concatenate(tris)
        v0, v1, v2 = v[0::3], v[1::3], v[2::3]
        bvh = build_bvh(v0, v1, v2, BVHQuality.HIGH)
        st = bvh_stats(bvh, name)

        # identical ray bundle through both models: random directions from
        # a ring of viewpoints toward the shared bounding-sphere centre
        centre = (v.min(0) + v.max(0)) / 2
        radius = float(np.linalg.norm(v.max(0) - v.min(0))) / 2
        n_rays = 512
        theta = rng.uniform(0, 2 * np.pi, n_rays)
        o = centre + radius * 2.5 * np.stack(
            [np.cos(theta), 0.3 * np.ones(n_rays), np.sin(theta)], 1)
        jitter = rng.normal(scale=radius * 0.35, size=(n_rays, 3))
        d = (centre + jitter - o)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        st.update(visits(bvh, v0, v1, v2,
                         o.astype(np.float32), d.astype(np.float32)))
        out.append(st)
        print(json.dumps(st), flush=True)

    a, b = out
    print(json.dumps(dict(
        tag="ratio substitute/original",
        fetches_mean=round(b["fetches_mean"] / a["fetches_mean"], 2),
        leaf_depth_mean=round(b["leaf_depth_mean"] / a["leaf_depth_mean"], 2),
        sah_cost=round(b["sah_cost"] / a["sah_cost"], 2))), flush=True)


if __name__ == "__main__":
    main()
