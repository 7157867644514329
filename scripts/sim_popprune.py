"""Simulate pop-time pruning on the real dragon BVH (32-ary wide rows).

The kernel's resume stack stores (base, hitmask); entries are evaluated
against best_dst at PUSH time but never re-checked at pop time, although
best_dst shrinks as leaves hit. Variants (fetch counts, kernel descend
order = nearest child first, positional resume of the remainder):

  a) baseline      no pop pruning (today's kernel)
  b) entrymin      stack entry also stores min entry-distance over its
                   remaining children; on pop, if min >= best the WHOLE
                   entry is dropped (implementable: one extra f32 stack
                   column)
  c) perchild      every resumed child re-checked dn < best individually
                   (NOT implementable with the mask scheme — upper bound)
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.sim_treelet import build_scene, ray_dirs, trace_visits  # noqa
from scripts.sim_wide import collapse  # noqa

INF = np.float32(1.7014118e38)
K = 32


def visits(scene, o, d, w2m, mode):
    children, wide_of, _ = collapse(scene, K)
    nmin = np.asarray(scene.node_min)
    nmax = np.asarray(scene.node_max)
    count = np.asarray(scene.node_count)
    first = np.asarray(scene.node_first)
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)

    om = o @ w2m[:3, :3].T + w2m[:3, 3]
    dm = d @ w2m[:3, :3].T
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)

    fetches = []
    for i in range(len(o)):
        oi, di = om[i], dm[i]
        inv = 1.0 / np.where(np.abs(di) > 1e-30, di, 1e-30)
        best = INF
        nf = 0

        def slab(c):
            t1 = (nmin[c] - oi) * inv
            t2 = (nmax[c] - oi) * inv
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

        # stack entries: list of (child_id, dn) in POSITIONAL order
        stack = []

        def visit(c):
            """Fetch + process binary node c (root of a wide row or leaf)."""
            nonlocal nf
            nf += 1
            if count[c] > 0:
                leaf_hit(c)
                return
            kids = children[wide_of[c]]
            hits = [(k, slab(k)) for k in kids]
            hits = [(k, dn) for k, dn in hits if dn < INF]
            if not hits:
                return
            jmin = min(range(len(hits)), key=lambda j: hits[j][1])
            nearest = hits.pop(jmin)
            if hits:
                stack.append(hits)   # positional remainder
            visit(nearest[0])

        sys.setrecursionlimit(100000)
        visit(0)
        while stack:
            entries = stack[-1]
            if mode == "entrymin" and min(dn for _, dn in entries) >= best:
                stack.pop()
                continue
            c, dn = entries.pop(0)
            if not entries:
                stack.pop()
            if mode == "perchild" and dn >= best:
                continue
            visit(c)
        fetches.append(nf)
    return np.array(fetches)


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

    for mode in ("baseline", "entrymin", "perchild"):
        for tag, (oo, dd) in (("primary", (o, d)), ("bounce", (bo, bd))):
            f = visits(scene, oo, dd, w2m, mode)
            print(json.dumps(dict(mode=mode, tag=tag,
                                  mean=round(float(f.mean()), 2),
                                  p95=int(np.percentile(f, 95)))),
                  flush=True)


if __name__ == "__main__":
    main()
