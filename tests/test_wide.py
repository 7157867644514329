"""16-ary wide-BVH builder + reference traversal (accel/wide.py)."""
import numpy as np
import pytest

from ray_tracer_2_tpu.accel.bvh import build_bvh
from ray_tracer_2_tpu.accel import wide as wd

INF = np.float32(1.7014118e38)


@pytest.fixture(scope="module")
def mesh():
    rng = np.random.default_rng(0)
    T = 3000
    c = rng.random((T, 3)).astype(np.float32) * 4 - 2
    v0 = c + rng.normal(0, 0.05, (T, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.05, (T, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.05, (T, 3)).astype(np.float32)
    bvh = build_bvh(v0, v1, v2, max_leaf=8)
    o = bvh.tri_order
    return bvh, v0[o], v1[o], v2[o]


def test_collapse_invariants(mesh):
    bvh, *_ = mesh
    wb = wd.collapse(bvh)
    count = bvh.node_count
    seen_internal = set()
    seen_leaves = []
    for kids in wb.children:
        assert 2 <= len(kids) <= wd.MAX_ARITY
        for c in kids:
            if count[c] > 0:
                seen_leaves.append(c)
            else:
                assert c not in seen_internal
                seen_internal.add(c)
    # every binary leaf appears exactly once as a wide child
    all_leaves = set(np.flatnonzero(count > 0).tolist())
    assert set(seen_leaves) == all_leaves
    assert len(seen_leaves) == len(all_leaves)
    # every collapsed internal node got its own wide node
    assert set(wb.wide_of.keys()) == seen_internal | {0}


def test_rows_and_traversal_match_brute(mesh):
    bvh, v0, v1, v2 = mesh
    T = len(v0)
    mats = np.zeros(T, np.float32)
    culls = np.ones(T, np.float32)
    rows, n_rows, depth = wd.pack_wide_rows(bvh, v0, v1, v2, mats, culls,
                                            row_offset=0, tri_offset=0)
    assert rows.shape == (n_rows, wd.ROW_WIDTH)
    assert depth >= 1
    widerows = rows[rows[:, wd.COL_COUNT] == 0]
    top = widerows[:, wd.COL_BASE] + widerows[:, wd.COL_K]
    assert top.max() <= n_rows

    def brute(o, d):
        best, tri = INF, -1
        for t in range(T):
            e1, e2 = v1[t] - v0[t], v2[t] - v0[t]
            n = np.cross(e1, e2)
            det = -np.dot(d, n)
            if det < 1e-8:  # culled
                continue
            ao = o - v0[t]
            dao = np.cross(ao, d)
            dst = np.dot(ao, n) / det
            u = np.dot(e2, dao) / det
            v = -np.dot(e1, dao) / det
            if dst > 1e-5 and u >= 0 and v >= 0 and u + v <= 1 and dst < best:
                best, tri = dst, t
        return best, tri

    rng = np.random.default_rng(7)
    fetches = []
    for _ in range(40):
        o = rng.random(3).astype(np.float32) * 8 - 4
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        dst, tri, u, v, det, nf = wd.traverse_wide_numpy(rows, o, d)
        bdst, btri = brute(o, d)
        fetches.append(nf)
        assert tri == btri and abs(min(dst, 1e30) - min(bdst, 1e30)) < 1e-3
    # the whole point: far fewer fetches than binary node visits
    assert np.mean(fetches) < 12
