"""Vectorized BVH traversal — the TPU re-design of ray_tracer.wgsl:292-335.

The reference walks the tree with one stack per SIMT thread. TPU lanes are not
independent threads, so here a whole **batch of rays walks in lockstep**: each
ray owns a row of a (B, 32) stack array and every loop iteration pops one node
per ray, intersects either the node's child AABBs (internal) or a fixed
LEAF_CHUNK-wide triangle slab (leaf), fully masked. Rays that finish idle
until the batch's ``while_loop`` predicate — ``any(stack nonempty)`` — drops.
Ordered near-child-first descent and closest-hit pruning are preserved
exactly, so traversal counts match the reference's heatmap semantics
(debug modes 5-7).

All node/triangle data is gathered with ``jnp.take`` from flat SoA arrays;
swap-in point for a Pallas kernel holding the tables in VMEM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.intersect import INF, ray_aabb_dist, ray_triangle
from ray_tracer_2_tpu.scene.render_scene import LEAF_CHUNK, RenderScene

# The reference uses a 32-entry stack (ray_tracer.wgsl:297) for max depth 32;
# a depth-32 path can momentarily need 33-34 slots, so we pad for safety.
STACK_DEPTH = 40


def traverse_bvh(scene: RenderScene, origin, direction, inv_dir,
                 node_offset, tri_offset, cull_backface):
    """Closest-hit traversal of one instance-group BVH for a batch of rays.

    origin/direction/inv_dir: (B, 3) model-space rays (direction normalized).
    node_offset/tri_offset: scalars (int32). cull_backface: per-ray or
    per-triangle culling is resolved inside via triangle material flags.

    Returns dict with: dst (B,), tri (B,) global triangle index (-1 = miss),
    u, v (B,) barycentrics, stats (B, 2) [node tests, tri tests].
    """
    B = origin.shape[0]
    arange_b = jnp.arange(B)

    stack = jnp.zeros((B, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(node_offset)  # root
    sp = jnp.ones((B,), jnp.int32)

    init = dict(
        stack=stack, sp=sp,
        best_dst=jnp.full((B,), INF),
        best_tri=jnp.full((B,), -1, jnp.int32),
        best_u=jnp.zeros((B,)), best_v=jnp.zeros((B,)),
        stats=jnp.zeros((B, 2), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["sp"] > 0)

    def body(s):
        active = s["sp"] > 0
        pos = jnp.maximum(s["sp"] - 1, 0)
        node_idx = jnp.take_along_axis(s["stack"], pos[:, None], axis=1)[:, 0]
        sp = jnp.where(active, s["sp"] - 1, s["sp"])

        count = jnp.take(scene.node_count, node_idx)
        first = jnp.take(scene.node_first, node_idx)
        left = jnp.take(scene.node_left, node_idx)
        right = jnp.take(scene.node_right, node_idx)
        is_leaf = active & (count > 0)
        is_internal = active & (count == 0)

        # ---- leaf: fixed-width triangle chunk (<= LEAF_CHUNK by build) ----
        best_dst, best_tri = s["best_dst"], s["best_tri"]
        best_u, best_v = s["best_u"], s["best_v"]
        tri_base = tri_offset + first
        for j in range(LEAF_CHUNK):
            tri_idx = tri_base + j
            valid = is_leaf & (j < count)
            safe_idx = jnp.where(valid, tri_idx, 0)
            v0 = jnp.take(scene.tri_v0, safe_idx, axis=0)
            v1 = jnp.take(scene.tri_v1, safe_idx, axis=0)
            v2 = jnp.take(scene.tri_v2, safe_idx, axis=0)
            mat = jnp.take(scene.tri_mat, safe_idx)
            cull = jnp.take(scene.materials.flag, mat) != 1  # != GLASS
            hit, dst, u, v, _ = ray_triangle(origin, direction, v0, v1, v2, cull)
            better = valid & hit & (dst < best_dst)
            best_tri = jnp.where(better, safe_idx, best_tri)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
            best_dst = jnp.where(better, dst, best_dst)

        # ---- internal: ordered children push (ray_tracer.wgsl:315-332) ----
        li = node_offset + left
        ri = node_offset + right
        safe_li = jnp.where(is_internal, li, 0)
        safe_ri = jnp.where(is_internal, ri, 0)
        a_min = jnp.take(scene.node_min, safe_li, axis=0)
        a_max = jnp.take(scene.node_max, safe_li, axis=0)
        b_min = jnp.take(scene.node_min, safe_ri, axis=0)
        b_max = jnp.take(scene.node_max, safe_ri, axis=0)
        dst_a = ray_aabb_dist(origin, inv_dir, a_min, a_max, best_dst)
        dst_b = ray_aabb_dist(origin, inv_dir, b_min, b_max, best_dst)

        left_closer = dst_a < dst_b
        near_dst = jnp.where(left_closer, dst_a, dst_b)
        far_dst = jnp.where(left_closer, dst_b, dst_a)
        near_idx = jnp.where(left_closer, safe_li, safe_ri)
        far_idx = jnp.where(left_closer, safe_ri, safe_li)

        stack = s["stack"]
        # push far first, near last (near popped first)
        push_far = is_internal & (far_dst < best_dst)
        cur = jnp.take_along_axis(stack, sp[:, None], axis=1)[:, 0]
        stack = stack.at[arange_b, sp].set(jnp.where(push_far, far_idx, cur))
        sp = sp + push_far.astype(jnp.int32)

        push_near = is_internal & (near_dst < best_dst)
        cur = jnp.take_along_axis(stack, sp[:, None], axis=1)[:, 0]
        stack = stack.at[arange_b, sp].set(jnp.where(push_near, near_idx, cur))
        sp = sp + push_near.astype(jnp.int32)

        stats = s["stats"]
        stats = stats.at[:, 0].add(jnp.where(is_internal, 2, 0))
        stats = stats.at[:, 1].add(jnp.where(is_leaf, count, 0))

        return dict(stack=stack, sp=sp, best_dst=best_dst, best_tri=best_tri,
                    best_u=best_u, best_v=best_v, stats=stats)

    out = jax.lax.while_loop(cond, body, init)
    return dict(dst=out["best_dst"], tri=out["best_tri"],
                u=out["best_u"], v=out["best_v"], stats=out["stats"])
