"""Round-4 treelet-coherence sim on the REAL dragon BVH (CPU, numpy).

Models the candidate whole-path Mosaic kernel (VERDICT r3 next-round #1):
a grid of 1024-lane blocks; INTERNAL 32-ary wide rows live in per-column
two-level (8,128) LUTs (always serviceable — the dragon has ~1057 internal
rows); LEAF rows are grouped into 1024-row treelets (DFS subtree order, so
each treelet is a contiguous spatial region) and each iteration the block
activates ONE leaf treelet (min-active policy), servicing only lanes whose
pending leaf visit lies in it.

Questions answered (probes can't):
  1. leaf-wait inflation: iterations / ideal when leaf visits must wait for
     their treelet, under realistic persistent-queue lane desync (lanes
     claim pixels from a contiguous block pool; primary + diffuse-bounce
     segments interleave as lanes progress).
  2. distinct leaf-treelets demanded per iteration (decides whether one
     activation per iteration is enough or K activations are needed).
  3. visit mix: internal vs leaf visits per segment at 32-ary/1024-treelets
     (anchors the per-iteration cost model from scripts/probe_lut.py).

Run: python scripts/sim_lut_treelet.py [--pixels N] [--lanes B]
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo")

from scripts.sim_treelet import build_scene, ray_dirs  # noqa: E402
from ray_tracer_2_tpu.accel.wide import collapse  # noqa: E402

INF = np.float32(1.7014118e38)


def build_wide(scene, arity=32, treelet_rows=1024):
    """Collapse to wide nodes; assign leaf rows DFS-subtree-contiguous ids
    and treelet ids. Returns dict with children lists + treelet map."""
    # group-0 BVH arrays live on the RenderScene (single-instance dragon)
    class BB:  # minimal BVH view over the scene arrays
        node_left = np.asarray(scene.node_left)
        node_right = np.asarray(scene.node_right)
        node_count = np.asarray(scene.node_count)
        node_first = np.asarray(scene.node_first)
        node_min = np.asarray(scene.node_min)
        node_max = np.asarray(scene.node_max)
        n_nodes = len(np.asarray(scene.node_count))

    wb = collapse(BB, arity)
    count = BB.node_count

    # DFS over wide nodes; leaf rows numbered in DFS encounter order
    leaf_id = {}
    order = [wb.wide_of[0]]
    seen = []
    while order:
        w = order.pop()
        seen.append(w)
        for c in wb.children[w]:
            if count[c] > 0:
                leaf_id[c] = len(leaf_id)
            else:
                order.append(wb.wide_of[c])
    n_leaves = len(leaf_id)
    tl_of = {c: i // treelet_rows for c, i in leaf_id.items()}
    n_tl = (n_leaves + treelet_rows - 1) // treelet_rows
    return dict(wb=wb, bvh=BB, leaf_id=leaf_id, tl_of=tl_of,
                n_leaves=n_leaves, n_treelets=n_tl)


def trace_seq(W, oi, di, best_init=INF):
    """Wide traversal (nearest-first + resume stack) recording the ordered
    visit sequence [("i", None) | ("l", treelet_id)], plus hit info."""
    wb, bvh = W["wb"], W["bvh"]
    count, left, right = bvh.node_count, bvh.node_left, bvh.node_right
    nmin, nmax = bvh.node_min, bvh.node_max
    tl_of = W["tl_of"]
    inv = 1.0 / np.where(np.abs(di) > 1e-30, di, 1e-30)
    best = np.float32(best_init)
    best_tri = -1
    seq = []

    v0 = np.asarray(scene_g.tri_v0)
    v1 = np.asarray(scene_g.tri_v1)
    v2 = np.asarray(scene_g.tri_v2)
    first = bvh.node_first

    def slab(c):
        t1 = (nmin[c] - oi) * inv
        t2 = (nmax[c] - oi) * inv
        tn = np.minimum(t1, t2).max()
        tf = np.maximum(t1, t2).min()
        return tn if (tf >= tn and tn < best and tf > 0) else INF

    def leaf(c):
        nonlocal best, best_tri
        f0, k = int(first[c]), int(count[c])
        for t in range(f0, f0 + k):
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
                best, best_tri = dst, t

    stack = [("w", wb.wide_of[0])]
    seq.append(("i", None))  # root row fetch
    while stack:
        kind, x = stack.pop()
        if kind == "l":
            seq.append(("l", tl_of[x]))
            leaf(x)
            continue
        kids = wb.children[x]
        hits = []
        for c in kids:
            dn = slab(c)
            if dn < INF:
                hits.append((dn, c))
        hits.sort(key=lambda h: -h[0])  # nearest popped last
        for _, c in hits:
            if count[c] > 0:
                stack.append(("l", c))
            else:
                seq.append(("i", None))  # will fetch this wide row
                stack.append(("w", wb.wide_of[c]))
    return seq, best, best_tri


def gen_paths(W, scene, pixels, width, height, rng):
    """Per-pixel visit streams: primary segment + (if hit) one diffuse
    bounce segment. Returns list of per-pixel segment lists."""
    o, d = ray_dirs(scene, pixels, width, height)
    w2m = np.asarray(scene.inst_world_to_model[0], np.float32)
    m2w = np.asarray(scene.inst_model_to_world[0], np.float32)
    om = o @ w2m[:3, :3].T + w2m[:3, 3]
    dm = d @ w2m[:3, :3].T
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)

    paths = []
    for i in range(len(pixels)):
        segs = []
        seq, best, tri = trace_seq(W, om[i], dm[i])
        segs.append(seq)
        if tri >= 0:
            # diffuse bounce from the hit point
            nrm = np.cross(v1[tri] - v0[tri], v2[tri] - v0[tri])
            nrm = nrm / np.linalg.norm(nrm)
            if np.dot(nrm, dm[i]) > 0:
                nrm = -nrm
            hp = om[i] + dm[i] * best
            v = rng.normal(size=3)
            v /= np.linalg.norm(v)
            bd = nrm + v
            nl = np.linalg.norm(bd)
            bd = nrm if nl < 1e-6 else bd / nl
            bseq, _, _ = trace_seq(W, hp + 1e-4 * nrm, bd.astype(np.float32))
            segs.append(bseq)
        paths.append(segs)
    return paths


def simulate_block(paths, B, policy="min", activations=1):
    """Persistent-lane block sim: B lanes claim pixels in order from
    ``paths``; each iteration every lane advances its next visit if it is
    internal, or a leaf visit whose treelet is among the ``activations``
    selected this iteration (policy: 'min' = smallest active treelet id,
    'demand' = most-demanded first).  Boundary (segment switch) is free
    (the real kernel runs it fused).  Returns stats."""
    lanes = [None] * B          # (flattened visit list, pos)
    next_pixel = 0
    iters = 0
    total_visits = sum(len(s) for p in paths for s in p)
    served = 0
    demand_hist = Counter()     # distinct treelets demanded per iteration
    leaf_wait = 0               # lane-iterations stalled on treelet

    def claim(i):
        nonlocal next_pixel
        if next_pixel < len(paths):
            flat = [v for s in paths[next_pixel] for v in s]
            lanes[i] = [flat, 0]
            next_pixel += 1
        else:
            lanes[i] = None

    for i in range(B):
        claim(i)

    while any(lanes):
        iters += 1
        # collect demanded treelets
        want = Counter()
        for ln in lanes:
            if ln and ln[1] < len(ln[0]):
                k, t = ln[0][ln[1]]
                if k == "l":
                    want[t] += 1
        demand_hist[len(want)] += 1
        if policy == "min":
            sel = set(sorted(want)[:activations])
        else:
            sel = set(t for t, _ in want.most_common(activations))
        for i in range(B):
            ln = lanes[i]
            if not ln:
                continue
            if ln[1] >= len(ln[0]):
                claim(i)
                ln = lanes[i]
                if not ln:
                    continue
            k, t = ln[0][ln[1]]
            if k == "i" or t in sel:
                ln[1] += 1
                served += 1
            else:
                leaf_wait += 1
            if ln[1] >= len(ln[0]):
                claim(i)  # boundary fused: next pixel next iteration
    ideal = total_visits / B
    return dict(iters=iters, ideal=round(ideal, 1),
                inflation=round(iters / ideal, 2),
                leaf_wait_frac=round(leaf_wait / (iters * B), 3),
                demanded_treelets_mean=round(
                    sum(k * v for k, v in demand_hist.items())
                    / max(sum(demand_hist.values()), 1), 1),
                demanded_treelets_p95=int(np.percentile(
                    np.repeat(list(demand_hist.keys()),
                              list(demand_hist.values())), 95)))


scene_g = None


def main():
    global scene_g
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", type=int, default=6144)
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--treelet-rows", type=int, default=1024)
    ap.add_argument("--arity", type=int, default=32)
    args = ap.parse_args()

    scene_g = build_scene()
    W, H = 1920, 1080
    Wd = build_wide(scene_g, args.arity, args.treelet_rows)
    print(json.dumps(dict(arity=args.arity, treelet_rows=args.treelet_rows,
                          n_internal=len(Wd["wb"].children),
                          n_leaf_rows=Wd["n_leaves"],
                          n_treelets=Wd["n_treelets"])), flush=True)

    # block pixel pool: contiguous scanline slab at image center (the real
    # kernel partitions the frame into contiguous per-block pools)
    rows = args.pixels // W + 1
    y0 = 540 - rows // 2
    pix = np.arange(y0 * W, y0 * W + args.pixels)
    rng = np.random.default_rng(7)
    paths = gen_paths(Wd, scene_g, pix, W, H, rng)

    n_int = sum(1 for p in paths for s in p for k, _ in s if k == "i")
    n_leaf = sum(1 for p in paths for s in p for k, _ in s if k == "l")
    n_seg = sum(len(p) for p in paths)
    print(json.dumps(dict(segments=n_seg,
                          int_per_seg=round(n_int / n_seg, 2),
                          leaf_per_seg=round(n_leaf / n_seg, 2))), flush=True)

    for policy in ("min", "demand"):
        for act in (1, 2, 4):
            r = simulate_block(paths, args.lanes, policy, act)
            print(json.dumps(dict(policy=policy, activations=act, **r)),
                  flush=True)


if __name__ == "__main__":
    main()
