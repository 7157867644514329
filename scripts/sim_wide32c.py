"""Simulate COMPACT 32-ary wide rows: child AABBs stored in 16-bit floats
(bf16 or f16, conservatively rounded) packed pairwise into the existing
128-f32 rows — fetch count drops to ~0.78x at UNCHANGED per-fetch cost.

The risk is box inflation: rounding outward by one 16-bit ulp can double a
tiny leaf box near coordinate 1.0 (bf16 ulp there = 0.0039). This measures
the real visit-count inflation on the dragon BVH for bf16 vs f16 vs exact.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.sim_treelet import build_scene, ray_dirs, trace_visits  # noqa
from scripts.sim_wide import collapse  # noqa

INF = np.float32(1.7014118e38)


def round_out(lo, hi, mode):
    """Conservative outward rounding of box bounds to a 16-bit float."""
    if mode == "exact":
        return lo.astype(np.float32), hi.astype(np.float32)
    if mode == "f16":
        lo16 = lo.astype(np.float16)
        bad = lo16.astype(np.float32) > lo
        lo16 = np.where(bad, np.nextafter(lo16, np.float16(-np.inf)), lo16)
        hi16 = hi.astype(np.float16)
        bad = hi16.astype(np.float32) < hi
        hi16 = np.where(bad, np.nextafter(hi16, np.float16(np.inf)), hi16)
        return lo16.astype(np.float32), hi16.astype(np.float32)
    if mode == "bf16":
        import ml_dtypes
        bf = ml_dtypes.bfloat16
        lo16 = lo.astype(bf)
        bad = lo16.astype(np.float32) > lo
        lo16 = np.where(bad, np.nextafter(lo16, bf(-np.inf)), lo16)
        hi16 = hi.astype(bf)
        bad = hi16.astype(np.float32) < hi
        hi16 = np.where(bad, np.nextafter(hi16, bf(np.inf)), hi16)
        return lo16.astype(np.float32), hi16.astype(np.float32)
    raise ValueError(mode)


def visits(scene, o, d, w2m, K, mode):
    children, wide_of, _ = collapse(scene, K)
    nmin = np.asarray(scene.node_min)
    nmax = np.asarray(scene.node_max)
    count = np.asarray(scene.node_count)
    first = np.asarray(scene.node_first)
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)
    rmin, rmax = round_out(nmin, nmax, mode)

    om = o @ w2m[:3, :3].T + w2m[:3, 3]
    dm = d @ w2m[:3, :3].T
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)

    tot = []
    for i in range(len(o)):
        oi, di = om[i], dm[i]
        inv = 1.0 / np.where(np.abs(di) > 1e-30, di, 1e-30)
        best = INF
        nf = 1

        def slab(c):
            t1 = (rmin[c] - oi) * inv
            t2 = (rmax[c] - oi) * inv
            tn = np.minimum(t1, t2).max()
            tf = np.maximum(t1, t2).min()
            return tn if (tf >= tn and tn < best and tf > 0) else INF

        def leaf_hit(c):
            nonlocal best
            for t in range(first[c], first[c] + count[c]):
                e1, e2 = v1[t] - v0[t], v2[t] - v0[t]
                nrm = np.cross(e1, e2)
                det = -np.dot(di, nrm)
                if abs(det) < 1e-8:
                    continue
                ao = oi - v0[t]
                dao = np.cross(ao, di)
                dst = np.dot(ao, nrm) / det
                u = np.dot(e2, dao) / det
                v = -np.dot(e1, dao) / det
                if dst > 1e-5 and u >= 0 and v >= 0 and u + v <= 1 \
                        and dst < best:
                    best = dst

        stack = [children[wide_of[0]]]
        while stack:
            kids = stack.pop()
            hits = [(slab(c), c) for c in kids]
            hits = [(dn, c) for dn, c in hits if dn < INF]
            hits.sort(key=lambda x: x[0])
            for _, c in hits:
                nf += 1
                if count[c]:
                    leaf_hit(c)
                else:
                    stack.append(children[wide_of[c]])
        tot.append(nf)
    return np.array(tot)


def main():
    scene = build_scene()
    w2m = np.asarray(scene.inst_world_to_model[0], np.float32)
    W, H = 1920, 1080
    ys, xs = np.meshgrid(np.arange(500, 532), np.arange(940, 972),
                         indexing="ij")
    pixels = (ys * W + xs).ravel()
    o, d = ray_dirs(scene, pixels, W, H)

    _, hits = trace_visits(scene, o, d, w2m)
    rng = np.random.default_rng(0)
    m2w = np.asarray(scene.inst_model_to_world[0], np.float32)
    bo, bd = [], []
    for dst, n, hp_model in hits:
        if n is None:
            continue
        hp = hp_model @ m2w[:3, :3].T + m2w[:3, 3]
        nw = n @ m2w[:3, :3].T
        nw /= np.linalg.norm(nw)
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        dirn = nw + v
        nl = np.linalg.norm(dirn)
        bo.append(hp + 1e-4 * nw)
        bd.append(nw if nl < 1e-6 else dirn / nl)
    bo = np.asarray(bo, np.float32)
    bd = np.asarray(bd, np.float32)

    for K in (16, 32):
        for mode in ("exact", "f16", "bf16"):
            for tag, (oo, dd) in (("primary", (o, d)), ("bounce", (bo, bd))):
                f = visits(scene, oo, dd, w2m, K, mode)
                print(json.dumps(dict(K=K, mode=mode, tag=tag,
                                      mean=round(float(f.mean()), 2),
                                      p95=int(np.percentile(f, 95)))),
                      flush=True)


if __name__ == "__main__":
    main()
