"""Treelet scheduling simulator (CPU, numpy) on the REAL dragon BVH.

Answers the two design questions the TPU probes can't:
  1. util(R, K, policy): fraction of lane-steps that advance when a chunk of
     coherent rays is scheduled one-treelet-at-a-time (demand argmax) with a
     rescheduling cadence of K steps.
  2. visits/segment and treelet-run statistics for primary and bounce rays.

Combining util with the measured per-step kernel rate (scripts/probe_trav.py)
gives projected Mrays/s per design point before writing the real kernel.

Traversal semantics mirror kernels/megakernel.py traversal_step exactly
(packed octant rows, near/far/skip links, inline 8-tri leaf slabs).
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from ray_tracer_2_tpu.accel import packed as pk  # noqa: E402

INF = np.float32(1.7014118e38)


def build_scene():
    """RenderScene + locally-packed octant rows. The 8-octant packed table
    was dropped from the device pytree (debug path reads unpacked arrays
    now), so this sim packs it on the fly from the host staging data — the
    row semantics the simulator models are unchanged."""
    from bench import dragon_scene
    host = dragon_scene()
    rs = host.render_scene
    mat_flags = np.array([r.flag for r in host.records] or [0], np.int32)
    groups = []
    for (bvh, v0, v1, v2, mats, node_off, tri_off, deltas) in host._staging:
        cull = np.ones(len(mats), np.float32)
        for d in deltas:
            cull *= (mat_flags[mats + d] != 1).astype(np.float32)
        groups.append(pk.pack_octant_rows(bvh, v0, v1, v2, mats, cull,
                                          node_offset=node_off,
                                          tri_offset=tri_off))
    packed = np.concatenate(groups, axis=1).reshape(-1, pk.ROW_WIDTH)
    object.__setattr__(rs, "_sim_packed_rows", packed)
    return rs


def ray_dirs(scene, pixels, width=1920, height=1080):
    """Central camera rays (no jitter) for pixel ids."""
    cam = np.asarray(scene.cam_to_world, np.float32)
    vp = np.asarray(scene.view_params, np.float32)
    x = (pixels % width).astype(np.float32)
    y = (pixels // width).astype(np.float32)
    u = x / (width - 1.0)
    v = y / (height - 1.0)
    lf = np.stack([(u - 0.5) * vp[0], (v - 0.5) * vp[1],
                   np.full_like(u, vp[2])], axis=1)
    fp = lf @ cam[:3, :3].T + cam[:3, 3]
    o = np.broadcast_to(cam[:3, 3], fp.shape).copy()
    d = fp - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def trace_visits(scene, o, d, w2m):
    """Skip-link traversal per ray; returns (visit node-id sequences,
    hit info (dst, point-normal approx))."""
    rows8 = np.asarray(scene._sim_packed_rows, np.float32)
    n_nodes = int(scene.node_count.shape[0])
    rows8 = rows8.reshape(8, n_nodes, pk.ROW_WIDTH)

    om = o @ w2m[:3, :3].T + w2m[:3, 3]
    dm = d @ w2m[:3, :3].T
    dm /= np.linalg.norm(dm, axis=1, keepdims=True)

    seqs, hits = [], []
    for i in range(len(o)):
        oi, di = om[i], dm[i]
        inv = 1.0 / np.where(np.abs(di) > 1e-30, di, 1e-30)
        octant = int(di[0] < 0) + 2 * int(di[1] < 0) + 4 * int(di[2] < 0)
        rows = rows8[octant]
        cur = 0
        best = INF
        best_n = None
        seq = []
        while cur >= 0 and len(seq) < 4096:
            seq.append(cur)
            r = rows[cur]
            count = r[pk.COL_COUNT]
            if count > 0.5:  # leaf: inline tri slab
                for j in range(int(count)):
                    s = pk.COL_TRIS + j * 9
                    v0, v1, v2 = r[s:s+3], r[s+3:s+6], r[s+6:s+9]
                    e1, e2 = v1 - v0, v2 - v0
                    nrm = np.cross(e1, e2)
                    det = -np.dot(di, nrm)
                    if abs(det) < 1e-8:
                        continue
                    ao = oi - v0
                    dao = np.cross(ao, di)
                    invd = 1.0 / det
                    dst = np.dot(ao, nrm) * invd
                    u = np.dot(e2, dao) * invd
                    v = -np.dot(e1, dao) * invd
                    if dst > 1e-5 and u >= 0 and v >= 0 and u + v <= 1 \
                            and dst < best:
                        best = dst
                        best_n = nrm / np.linalg.norm(nrm) * np.sign(det)
                cur = int(r[pk.COL_SKIP])
            else:
                def slab(mn, mx):
                    t1 = (mn - oi) * inv
                    t2 = (mx - oi) * inv
                    tn = np.minimum(t1, t2).max()
                    tf = np.maximum(t1, t2).min()
                    return tn if (tf >= tn and tn < best and tf > 0) else INF
                dn = slab(r[0:3], r[3:6])
                dfar = slab(r[6:9], r[9:12])
                if dn < INF:
                    cur = int(r[pk.COL_LINK_NEAR])
                elif dfar < INF:
                    cur = int(r[pk.COL_LINK_FAR])
                else:
                    cur = int(r[pk.COL_SKIP])
        seqs.append(seq)
        hits.append((best, best_n, oi + di * min(best, 1e6)))
    return seqs, hits


def treelet_cut(scene, cap):
    """Cap-based subtree cut: BFS-fill treelets of <= cap nodes from each
    pending root. Returns node -> treelet id."""
    left = np.asarray(scene.node_left)
    right = np.asarray(scene.node_right)
    count = np.asarray(scene.node_count)
    n = len(count)
    tid = np.full(n, -1, np.int32)
    roots = [0]
    t = 0
    while roots:
        r = roots.pop()
        frontier = [r]
        filled = 0
        while frontier and filled < cap:
            nd = frontier.pop(0)
            tid[nd] = t
            filled += 1
            if count[nd] == 0:
                frontier.append(int(left[nd]))
                frontier.append(int(right[nd]))
        roots.extend(frontier)  # spill: new treelet roots
        t += 1
    return tid, t


def simulate_sched(tseqs, K, verbose_tag, n_treelets):
    """Demand-argmax scheduling: every step all lanes pay 1 slot; lanes whose
    current treelet == selected advance 1 visit. Reselect every K steps."""
    lanes = [list(s) for s in tseqs]
    pos = [0] * len(lanes)
    total_visits = sum(len(s) for s in lanes)
    steps = 0
    advanced = 0
    sel = -1
    since = K
    while True:
        active = [i for i in range(len(lanes)) if pos[i] < len(lanes[i])]
        if not active:
            break
        if since >= K:
            cnt = np.zeros(n_treelets + 1, np.int64)
            for i in active:
                cnt[lanes[i][pos[i]]] += 1
            sel = int(cnt.argmax())
            since = 0
        moved = 0
        for i in active:
            if lanes[i][pos[i]] == sel:
                pos[i] += 1
                moved += 1
        steps += 1
        since += 1
        advanced += moved
        if moved == 0:
            since = K  # force reselect (idle step still counted)
    util = advanced / (steps * len(lanes))
    return dict(tag=verbose_tag, K=K, util=round(util, 4),
                steps=steps, mean_visits=round(total_visits / len(lanes), 1))


def main():
    scene = build_scene()
    w2m = np.asarray(scene.inst_world_to_model[0], np.float32)
    W, H = 1920, 1080

    # 32x32 coherent pixel tile at image center (dragon fills the middle)
    ys, xs = np.meshgrid(np.arange(500, 532), np.arange(940, 972),
                         indexing="ij")
    pixels = (ys * W + xs).ravel()
    o, d = ray_dirs(scene, pixels, W, H)
    seqs, hits = trace_visits(scene, o, d, w2m)
    lens = np.array([len(s) for s in seqs])
    print(json.dumps(dict(probe="visits_primary",
                          mean=float(lens.mean()), p50=int(np.median(lens)),
                          p95=int(np.percentile(lens, 95)),
                          max=int(lens.max()))), flush=True)

    # bounce rays: diffuse from primary hit points
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
        dirn = nw if nl < 1e-6 else dirn / nl
        bo.append(hp + 1e-4 * nw)
        bd.append(dirn)
    bo, bd = np.asarray(bo, np.float32), np.asarray(bd, np.float32)
    bseqs, _ = trace_visits(scene, bo, bd, w2m)
    blens = np.array([len(s) for s in bseqs])
    print(json.dumps(dict(probe="visits_bounce", n=len(bseqs),
                          mean=float(blens.mean()),
                          p95=int(np.percentile(blens, 95)))), flush=True)

    for cap in (64, 128, 256, 512):
        tid, n_t = treelet_cut(scene, cap)
        for tag, ss in (("primary", seqs), ("bounce", bseqs)):
            tseqs = [[int(tid[n]) for n in s] for s in ss]
            runs = []
            for s in tseqs:
                r = 1
                for a, b in zip(s, s[1:]):
                    if a == b:
                        r += 1
                    else:
                        runs.append(r)
                        r = 1
                runs.append(r)
            for K in (8, 16):
                out = simulate_sched(tseqs, K, tag, n_t)
                out.update(probe="sched", cap=cap, n_treelets=n_t,
                           mean_run=round(float(np.mean(runs)), 2))
                print(json.dumps(out), flush=True)




def union_stats(scene=None):
    """Packet-traversal economics: union of visited-node sets per packet vs
    mean individual visits, for primary/bounce and packet sizes."""
    scene = scene or build_scene()
    w2m = np.asarray(scene.inst_world_to_model[0], np.float32)
    W, H = 1920, 1080
    for tag, (yy0, xx0) in (("center", (500, 940)), ("edge", (100, 200))):
        ys, xs = np.meshgrid(np.arange(yy0, yy0 + 32),
                             np.arange(xx0, xx0 + 32), indexing="ij")
        pixels = (ys * W + xs).ravel()
        o, d = ray_dirs(scene, pixels, W, H)
        seqs, hits = trace_visits(scene, o, d, w2m)
        _emit_union(tag, seqs)
        if tag == "center":
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
            bseqs, _ = trace_visits(scene, bo, bd, w2m)
            _emit_union("bounce", bseqs)
            # Morton-ish sort: by direction octant then position
            key = []
            for i in range(len(bo)):
                oct_ = (int(bd[i][0] < 0) + 2 * int(bd[i][1] < 0)
                        + 4 * int(bd[i][2] < 0))
                key.append((oct_, tuple((bo[i] * 8).astype(int))))
            order = sorted(range(len(bo)), key=lambda i: key[i])
            _emit_union("bounce_sorted", [bseqs[i] for i in order])


def _emit_union(tag, seqs):
    mean_ind = float(np.mean([len(s) for s in seqs]))
    for P in (32, 64, 128, 256, 1024):
        unions = []
        for s0 in range(0, len(seqs) - P + 1, P):
            u = set()
            for s in seqs[s0:s0 + P]:
                u.update(s)
            unions.append(len(u))
        if not unions:
            continue
        print(json.dumps(dict(
            probe="union", tag=tag, packet=P,
            mean_individual=round(mean_ind, 1),
            mean_union=round(float(np.mean(unions)), 1),
            work_ratio=round(float(np.mean(unions)) / mean_ind, 2))),
            flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "union":
        union_stats()
    else:
        main()
