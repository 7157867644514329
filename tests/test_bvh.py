"""BVH invariants (SURVEY.md §4.3) + traversal-vs-bruteforce equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracer_2_tpu.accel.bvh import BVHQuality, build_bvh


def random_soup(n, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-5, 5, size=(n, 1, 3)).astype(np.float32)
    verts = base + r.uniform(-0.4, 0.4, size=(n, 3, 3)).astype(np.float32)
    return verts[:, 0], verts[:, 1], verts[:, 2]


@pytest.mark.parametrize("quality", [BVHQuality.HIGH, BVHQuality.LOW])
def test_invariants(quality):
    v0, v1, v2 = random_soup(500)
    bvh = build_bvh(v0, v1, v2, quality=quality, max_leaf=4)

    # Every triangle appears exactly once across leaves.
    assert sorted(bvh.tri_order.tolist()) == list(range(500))
    covered = np.zeros(500, bool)
    leaves = np.flatnonzero(bvh.node_count > 0)
    for li in leaves:
        f, c = bvh.node_first[li], bvh.node_count[li]
        assert not covered[f:f + c].any()
        covered[f:f + c] = True
        assert c <= 4 or bvh.stats.leaf_max_depth >= 32
    assert covered.all()

    # Child AABBs fit inside parents; leaf AABBs contain their triangles.
    tmin = np.minimum(np.minimum(v0, v1), v2)[bvh.tri_order]
    tmax = np.maximum(np.maximum(v0, v1), v2)[bvh.tri_order]
    internal = np.flatnonzero(bvh.node_count == 0)
    for ni in internal:
        for ci in (bvh.node_left[ni], bvh.node_right[ni]):
            assert (bvh.node_min[ci] >= bvh.node_min[ni] - 1e-5).all()
            assert (bvh.node_max[ci] <= bvh.node_max[ni] + 1e-5).all()
    for li in leaves:
        f, c = bvh.node_first[li], bvh.node_count[li]
        assert (tmin[f:f + c] >= bvh.node_min[li] - 1e-5).all()
        assert (tmax[f:f + c] <= bvh.node_max[li] + 1e-5).all()


def test_empty_and_single():
    import numpy as np
    z = np.zeros((0, 3), np.float32)
    bvh = build_bvh(z, z, z)
    assert bvh.n_nodes == 1
    one = np.array([[0, 0, 0.0]], np.float32)
    bvh1 = build_bvh(one, one + [1, 0, 0], one + [0, 1, 0])
    assert bvh1.node_count[0] == 1


def _scene_stub(v0, v1, v2, bvh):
    from ray_tracer_2_tpu.scene.render_scene import LEAF_CHUNK
    from ray_tracer_2_tpu.scene.material import MaterialTable, MaterialRecord
    from ray_tracer_2_tpu.accel.threading import compute_skip_links

    o = bvh.tri_order
    pad = np.zeros((LEAF_CHUNK, 3), np.float32)
    lhit, lmiss = compute_skip_links(bvh)

    class SceneStub:
        tri_v0 = jnp.asarray(np.concatenate([v0[o], pad]))
        tri_v1 = jnp.asarray(np.concatenate([v1[o], pad]))
        tri_v2 = jnp.asarray(np.concatenate([v2[o], pad]))
        tri_mat = jnp.zeros(len(v0) + LEAF_CHUNK, jnp.int32)
        node_min = jnp.asarray(bvh.node_min); node_max = jnp.asarray(bvh.node_max)
        node_left = jnp.asarray(bvh.node_left); node_right = jnp.asarray(bvh.node_right)
        node_first = jnp.asarray(bvh.node_first); node_count = jnp.asarray(bvh.node_count)
        link_hit = jnp.asarray(lhit); link_miss = jnp.asarray(lmiss)
        materials = MaterialTable.from_records([MaterialRecord()])

    return SceneStub()


@pytest.mark.parametrize("variant", ["skiplink", "stack"])
def test_traversal_matches_bruteforce(variant):
    from ray_tracer_2_tpu.kernels.traverse import traverse_bvh, traverse_bvh_stack
    from ray_tracer_2_tpu.kernels.intersect import ray_triangle, INF
    from ray_tracer_2_tpu.scene.render_scene import LEAF_CHUNK

    v0, v1, v2 = random_soup(300, seed=3)
    bvh = build_bvh(v0, v1, v2, max_leaf=LEAF_CHUNK)
    o = bvh.tri_order
    stub = _scene_stub(v0, v1, v2, bvh)

    r = np.random.default_rng(7)
    B = 64
    origin = r.uniform(-8, 8, (B, 3)).astype(np.float32)
    direction = r.normal(size=(B, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)

    fn = traverse_bvh if variant == "skiplink" else traverse_bvh_stack
    res = fn(stub, jnp.asarray(origin), jnp.asarray(direction),
             jnp.asarray(1.0 / direction), jnp.int32(0), jnp.int32(0), None)

    # brute force over all triangles (cull_backface=True: default material)
    hit, dst, u, v, det = ray_triangle(
        jnp.asarray(origin)[:, None, :], jnp.asarray(direction)[:, None, :],
        jnp.asarray(v0[o])[None], jnp.asarray(v1[o])[None],
        jnp.asarray(v2[o])[None], True)
    bf_dst = np.asarray(dst).min(axis=1)
    got_dst = np.asarray(res["dst"])
    miss = bf_dst >= float(INF)
    np.testing.assert_allclose(got_dst[~miss], bf_dst[~miss], rtol=1e-5)
    assert (np.asarray(res["tri"])[miss] == -1).all()


def test_skiplink_equals_stack_traversal():
    """The threaded walk must find identical hits to the stack walk."""
    from ray_tracer_2_tpu.kernels.traverse import traverse_bvh, traverse_bvh_stack
    from ray_tracer_2_tpu.scene.render_scene import LEAF_CHUNK

    v0, v1, v2 = random_soup(800, seed=11)
    bvh = build_bvh(v0, v1, v2, max_leaf=LEAF_CHUNK)
    stub = _scene_stub(v0, v1, v2, bvh)
    r = np.random.default_rng(5)
    B = 128
    origin = r.uniform(-7, 7, (B, 3)).astype(np.float32)
    direction = r.normal(size=(B, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    a = traverse_bvh(stub, jnp.asarray(origin), jnp.asarray(direction),
                     jnp.asarray(1.0 / direction), jnp.int32(0), jnp.int32(0))
    b = traverse_bvh_stack(stub, jnp.asarray(origin), jnp.asarray(direction),
                           jnp.asarray(1.0 / direction), jnp.int32(0),
                           jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    np.testing.assert_allclose(np.asarray(a["dst"]), np.asarray(b["dst"]),
                               rtol=1e-6)


def test_native_matches_numpy_semantics():
    """The C++ builder must produce a valid tree with equivalent quality and
    identical traversal results."""
    from ray_tracer_2_tpu.accel import native
    if native.get_lib() is None:
        pytest.skip("native builder unavailable")
    from ray_tracer_2_tpu.kernels.traverse import traverse_bvh
    import jax.numpy as jnp

    v0, v1, v2 = random_soup(5000, seed=9)
    b_np = build_bvh(v0, v1, v2, use_native=False)
    b_cc = build_bvh(v0, v1, v2, use_native=True)
    assert sorted(b_cc.tri_order.tolist()) == list(range(5000))
    assert abs(b_cc.n_nodes - b_np.n_nodes) / b_np.n_nodes < 0.05
    leaves = b_cc.node_count > 0
    assert b_cc.node_count[leaves].max() <= 4

    r = np.random.default_rng(2)
    B = 64
    origin = r.uniform(-8, 8, (B, 3)).astype(np.float32)
    direction = r.normal(size=(B, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    res_a = traverse_bvh(_scene_stub(v0, v1, v2, b_np), jnp.asarray(origin),
                         jnp.asarray(direction), jnp.asarray(1.0 / direction),
                         jnp.int32(0), jnp.int32(0))
    res_b = traverse_bvh(_scene_stub(v0, v1, v2, b_cc), jnp.asarray(origin),
                         jnp.asarray(direction), jnp.asarray(1.0 / direction),
                         jnp.int32(0), jnp.int32(0))
    # same closest distances (tri indices may differ across orderings)
    np.testing.assert_allclose(np.asarray(res_a["dst"]),
                               np.asarray(res_b["dst"]), rtol=1e-5)
