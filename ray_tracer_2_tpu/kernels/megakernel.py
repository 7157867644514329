"""Flat single-loop path tracer for BVH scenes ("megakernel" state machine).

The layered loop (bounce while → per-instance for → traversal while) makes
every ray wait at every bounce for the slowest ray in the batch — measured
~5-10× lockstep waste on the dragon scene, because most rays terminate after
1-2 segments while a few trace deep paths. Here the whole path runs in ONE
while_loop: each ray advances its own (segment, instance, node) state every
iteration, and the expensive segment-boundary work (shading + RNG + sphere
and brute-force prepass for the next segment) runs as a masked phase gated by
``lax.cond`` every SHADE_EVERY iterations, so its cost is amortized while
traversal — one packed-row gather per step — stays the steady-state body.

Ray phase encoding (int state):
  bounce < 0                  not yet started (first boundary skips shading)
  cur >= 0                    traversing BVH instance bvh_ptr
  cur == -1, bvh_ptr < n_bvh  instance finished → merge, advance (inline)
  cur == -1, bvh_ptr == n_bvh segment done → wait for the boundary phase
  bounce == DONE              terminated

Physics is identical to kernels/trace.py (same RNG stream, same shading) —
tested bit-compatible on the goldens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracer_2_tpu import rng
from ray_tracer_2_tpu.kernels.brute import BRUTE_MAX_TRIS, brute_force_intersect
from ray_tracer_2_tpu.kernels.gatherlib import fetch_rows
from ray_tracer_2_tpu.kernels.intersect import INF, ray_sphere, ray_triangle, \
    ray_aabb_dist, sphere_normal_uv
from ray_tracer_2_tpu.kernels.texture import sample_bilinear
from ray_tracer_2_tpu.math.vec import dot, lerp, normalize, reflect, refract
from ray_tracer_2_tpu.scene.render_scene import LEAF_CHUNK, RenderScene

SHADE_EVERY = 4   # boundary phase cadence (iterations)
DONE = 1 << 20    # bounce sentinel for terminated rays

GLASS = 1
TEXTURE = 2


def _bvh_instances(scene: RenderScene):
    return [i for i, (_, _, c) in enumerate(scene.inst_spans)
            if c > BRUTE_MAX_TRIS]


def trace_batch_flat(scene: RenderScene, origin, direction, seed, *,
                     bounces: int, skybox: bool):
    """Drop-in replacement for trace_batch when the scene has BVH instances.
    Returns (incoming (B,4), seed, segments (B,))."""
    B = origin.shape[0]
    direction = normalize(direction)
    bvh_ids = _bvh_instances(scene)
    n_bvh = len(bvh_ids)
    assert n_bvh >= 1
    roots = [scene.inst_spans[i][0] for i in bvh_ids]
    n_nodes = scene.node_count.shape[0]

    # static per-instance matrices as stacked constants
    w2m_all = scene.inst_world_to_model  # (I,4,4) traced but loop-invariant
    m2w_all = scene.inst_model_to_world

    def w2m_for(ptr):  # (B,4,4) via unrolled select over the bvh list
        out = jnp.broadcast_to(w2m_all[bvh_ids[0]], (B, 4, 4))
        for k in range(1, n_bvh):
            out = jnp.where((ptr == k)[:, None, None],
                            jnp.broadcast_to(w2m_all[bvh_ids[k]], (B, 4, 4)),
                            out)
        return out

    def m2w_for(ptr):
        out = jnp.broadcast_to(m2w_all[bvh_ids[0]], (B, 4, 4))
        for k in range(1, n_bvh):
            out = jnp.where((ptr == k)[:, None, None],
                            jnp.broadcast_to(m2w_all[bvh_ids[k]], (B, 4, 4)),
                            out)
        return out

    def m2w_raw(raw):
        """Select model_to_world by RAW instance index (any instance)."""
        out = jnp.broadcast_to(m2w_all[0], (B, 4, 4))
        for k in range(1, scene.n_instances):
            out = jnp.where((raw == k)[:, None, None],
                            jnp.broadcast_to(m2w_all[k], (B, 4, 4)), out)
        return out

    bvh_raw_ids = jnp.asarray(bvh_ids, jnp.int32)

    def root_for(ptr):
        out = jnp.full((B,), roots[0], jnp.int32)
        for k in range(1, n_bvh):
            out = jnp.where(ptr == k, roots[k], out)
        return out

    # ---------------- state ------------------------------------------
    # F (B,14) f32: origin3 dir3 trans4 incoming4          (world ray)
    # M (B,10) f32: om3 dm3 cur_best: dst u v det          (model-space walk)
    # W (B,12) f32: seg best: dst, u, v, det, point3, normal3, uv2 (world)
    # I (B,12) i32: seed, bounce, segments, cur, bvh_ptr, tri, mat,
    #               seg_tri, seg_mat, seg_backface, stat_nodes, stat_tris
    F0 = jnp.concatenate([origin, direction, jnp.ones((B, 4)),
                          jnp.zeros((B, 4))], axis=1)
    M0 = jnp.concatenate([jnp.zeros((B, 6)), jnp.full((B, 1), INF),
                          jnp.zeros((B, 3))], axis=1)
    W0 = jnp.concatenate([jnp.full((B, 1), INF), jnp.zeros((B, 11))], axis=1)
    I0 = jnp.stack([
        jax.lax.bitcast_convert_type(seed, jnp.int32),
        jnp.full((B,), -1, jnp.int32),            # bounce: -1 = not started
        jnp.zeros((B,), jnp.int32),               # segments
        jnp.full((B,), -1, jnp.int32),            # cur node
        jnp.full((B,), n_bvh, jnp.int32),         # bvh_ptr: at boundary
        jnp.full((B,), -1, jnp.int32),            # per-instance best tri
        jnp.zeros((B,), jnp.int32),               # per-instance best mat
        jnp.full((B,), -1, jnp.int32),            # segment best tri
        jnp.zeros((B,), jnp.int32),               # segment best mat
        jnp.zeros((B,), jnp.int32),               # segment backface
        jnp.zeros((B,), jnp.int32),               # stat nodes
        jnp.zeros((B,), jnp.int32),               # stat tris
    ], axis=1)

    from ray_tracer_2_tpu.accel import packed as pk
    from ray_tracer_2_tpu.kernels.trace import (
        _gather_material, _mat4_apply, _reflectance, environment_light,
    )

    # ------------------------------------------------ traversal step --
    def traversal_step(F, M, W, I):
        cur = I[:, 3]
        active = cur >= 0
        om, dm = M[:, 0:3], M[:, 3:6]
        inv_dm = 1.0 / dm
        octant = ((dm[:, 0] < 0).astype(jnp.int32)
                  + 2 * (dm[:, 1] < 0).astype(jnp.int32)
                  + 4 * (dm[:, 2] < 0).astype(jnp.int32))
        safe = jnp.where(active, cur, 0)
        row = jnp.take(scene.packed_rows, octant * n_nodes + safe, axis=0)

        best_dst = M[:, 6]
        count = row[:, pk.COL_COUNT]
        is_leaf = active & (count > 0.5)
        is_int = active & (count < 0.5)

        d_near = ray_aabb_dist(om, inv_dm, row[:, 0:3], row[:, 3:6], best_dst)
        d_far = ray_aabb_dist(om, inv_dm, row[:, 6:9], row[:, 9:12], best_dst)
        hit_near = is_int & (d_near < INF)
        hit_far = is_int & (d_far < INF)
        next_int = jnp.where(
            hit_near, row[:, pk.COL_LINK_NEAR],
            jnp.where(hit_far, row[:, pk.COL_LINK_FAR], row[:, pk.COL_SKIP]))

        best_u, best_v, best_det = M[:, 7], M[:, 8], M[:, 9]
        best_tri, best_mat = I[:, 5], I[:, 6]
        first = row[:, pk.COL_FIRST].astype(jnp.int32)
        for j in range(LEAF_CHUNK):
            o = pk.COL_TRIS + j * 9
            cull = row[:, pk.COL_CULLS + j] > 0.5
            hit, dst, u, v, det = ray_triangle(
                om, dm, row[:, o:o + 3], row[:, o + 3:o + 6],
                row[:, o + 6:o + 9], cull)
            better = is_leaf & hit & (dst < best_dst)
            best_tri = jnp.where(better, first + j, best_tri)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
            best_det = jnp.where(better, det, best_det)
            best_mat = jnp.where(better,
                                 row[:, pk.COL_MATS + j].astype(jnp.int32),
                                 best_mat)
            best_dst = jnp.where(better, dst, best_dst)

        nxt = jnp.where(is_leaf, row[:, pk.COL_SKIP], next_int
                        ).astype(jnp.int32)
        M = jnp.concatenate([om, dm, best_dst[:, None], best_u[:, None],
                             best_v[:, None], best_det[:, None]], axis=1)
        I = I.at[:, 3].set(jnp.where(active, nxt, cur))
        I = I.at[:, 5].set(best_tri)
        I = I.at[:, 6].set(best_mat)
        I = I.at[:, 10].add(jnp.where(is_int, 2, 0))
        I = I.at[:, 11].add(jnp.where(is_leaf, count.astype(jnp.int32), 0))
        return F, M, W, I

    # ------------------------------------ instance advance (inline) --
    def advance_instance(F, M, W, I):
        """Rays with cur==-1 and bvh_ptr < n_bvh: fold the finished
        instance's model-space best into the segment-best (world space) and
        enter the next instance."""
        cur = I[:, 3]
        ptr = I[:, 4]
        at_end = (cur == -1) & (ptr < n_bvh) & (I[:, 1] != DONE)

        om, dm = M[:, 0:3], M[:, 3:6]
        got = at_end & (I[:, 5] >= 0)
        m2w = m2w_for(ptr)
        local_hp = om + dm * M[:, 6:7]
        world_hp = jnp.einsum("bij,bj->bi", m2w[:, :3, :3], local_hp) \
            + m2w[:, :3, 3]
        o = F[:, 0:3]
        world_dst = jnp.sqrt(dot(world_hp - o, world_hp - o))
        better = got & (world_dst < W[:, 0])
        W = jnp.where(better[:, None], jnp.concatenate([
            world_dst[:, None], M[:, 7:10], world_hp, jnp.zeros((B, 5))],
            axis=1), W)
        I = I.at[:, 7].set(jnp.where(better, I[:, 5], I[:, 7]))
        I = I.at[:, 8].set(jnp.where(better, I[:, 6], I[:, 8]))
        # record the RAW winning instance index (backface comes from det sign)
        raw = jnp.take(bvh_raw_ids, jnp.clip(ptr, 0, n_bvh - 1))
        I = I.at[:, 9].set(jnp.where(better, raw, I[:, 9]))

        # enter next instance
        new_ptr = jnp.where(at_end, ptr + 1, ptr)
        entering = at_end & (new_ptr < n_bvh)
        w2m = w2m_for(new_ptr)
        d = F[:, 3:6]
        om_n = jnp.einsum("bij,bj->bi", w2m[:, :3, :3], o) + w2m[:, :3, 3]
        dm_n = normalize(jnp.einsum("bij,bj->bi", w2m[:, :3, :3], d))
        M = jnp.where(entering[:, None], jnp.concatenate(
            [om_n, dm_n, jnp.full((B, 1), INF), jnp.zeros((B, 3))], axis=1), M)
        I = I.at[:, 3].set(jnp.where(entering, root_for(new_ptr), I[:, 3]))
        I = I.at[:, 5].set(jnp.where(entering, -1, I[:, 5]))
        I = I.at[:, 4].set(new_ptr)
        return F, M, W, I

    # --------------------------------------------- boundary phase ----
    def boundary(F, M, W, I):
        """Rays at a segment boundary (bvh_ptr == n_bvh, cur == -1): resolve
        the hit record, shade (kernels/trace.py physics), then prepass the
        next segment (spheres + brute instances) and enter the first BVH
        instance."""
        at_b = (I[:, 4] >= n_bvh) & (I[:, 1] != DONE)
        o, d = F[:, 0:3], F[:, 3:6]
        trans, incoming = F[:, 6:10], F[:, 10:14]
        seed = jax.lax.bitcast_convert_type(I[:, 0], jnp.uint32)
        bounce = I[:, 1]
        started = bounce >= 0

        # ---- resolve segment hit record
        seg_tri = I[:, 7]
        seg_mat_mesh = I[:, 8]
        won_inst = I[:, 9]   # raw instance index for mesh winners
        hit_mesh = seg_tri >= 0
        attr = fetch_rows(scene.tri_attr, jnp.maximum(seg_tri, 0))
        m2w = m2w_raw(jnp.clip(won_inst, 0, scene.n_instances - 1))
        u, v, det = W[:, 1], W[:, 2], W[:, 3]
        w_bar = 1.0 - u - v
        n_model = normalize(attr[:, 0:3] * w_bar[:, None]
                            + attr[:, 3:6] * u[:, None]
                            + attr[:, 6:9] * v[:, None]) * jnp.sign(det)[:, None]
        n_world = normalize(jnp.einsum("bij,bj->bi", m2w[:, :3, :3], n_model))
        uv_mesh = (attr[:, 9:11] * w_bar[:, None] + attr[:, 11:13] * u[:, None]
                   + attr[:, 13:15] * v[:, None])

        hit = dict(
            hit=hit_mesh & started & at_b,
            dst=W[:, 0],
            point=W[:, 4:7],
            normal=n_world,
            uv=uv_mesh,
            backface=det < 0.0,
            mat_id=seg_mat_mesh,
        )
        # fold in the segment prepass results stored in W cols 7:12?  The
        # prepass for THIS segment ran at the previous boundary and its best
        # was already merged into W/I (same record layout as mesh hits when
        # sphere_won encoded via seg_tri == -2).  Sphere hits carry their
        # normal/uv in W[4:7]/W[10:12] directly.
        sphere_won = seg_tri == -2
        hit["hit"] = (hit_mesh | sphere_won) & started & at_b
        hit["normal"] = jnp.where(sphere_won[:, None], W[:, 7:10], n_world)
        hit["uv"] = jnp.where(sphere_won[:, None], W[:, 10:12], uv_mesh)
        hit["backface"] = jnp.where(sphere_won, I[:, 9] > 0, det < 0.0)

        # ---- shading (identical physics to kernels/trace.py) ----------
        alive = at_b & started & (bounce <= bounces)
        missed = alive & ~hit["hit"]
        if skybox:
            incoming = jnp.where(missed[:, None],
                                 incoming + trans * environment_light(d),
                                 incoming)
        shading = alive & hit["hit"]

        m = _gather_material(scene, hit["mat_id"])
        is_glass = m["flag"] == GLASS
        normal = hit["normal"]
        backface = hit["backface"]

        absorb = jnp.exp(-hit["dst"][:, None] * m["absorption"][:, :3]
                         * m["absorption_strength"][:, None])
        trans_g = jnp.where((is_glass & backface)[:, None],
                            jnp.concatenate([trans[:, :3] * absorb,
                                             jnp.ones((B, 1))], axis=1),
                            trans)
        ior = jnp.where(backface, m["ior"], 1.0 / m["ior"])
        reflect_dir = reflect(d, normal)
        refract_dir = refract(d, normal, ior[:, None])
        cos_theta = jnp.minimum(dot(-d, normal), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        cannot_refract = ior * sin_theta > 1.0
        r_refl, seed_refl = rng.rand(seed)
        seed_g = jnp.where(cannot_refract, seed, seed_refl)
        follow_reflection = cannot_refract | (_reflectance(cos_theta, ior)
                                              > r_refl)
        rand_dir_g, seed_g = rng.rand_direction(seed_g)
        diffuse_g = normalize(normal + rand_dir_g)
        reflect_mix = normalize(lerp(diffuse_g, reflect_dir,
                                     m["specular"][:, None]))
        refract_mix = normalize(lerp(-diffuse_g, refract_dir,
                                     m["smoothness"][:, None]))
        dir_g = jnp.where(follow_reflection[:, None], reflect_mix, refract_mix)
        origin_g = hit["point"] + 1e-4 * normal \
            * jnp.sign(dot(normal, dir_g))[:, None]

        r_spec, seed_n = rng.rand(seed)
        is_specular = m["specular"] >= r_spec
        diffuse_n, seed_n = rng.rand_hemisphere(normal, seed_n)
        specular_dir = reflect(d, normal)
        emitted = m["emission_color"] * m["emission_strength"][:, None]
        dir_n = normalize(lerp(diffuse_n, specular_dir,
                               (m["smoothness"] * is_specular)[:, None]))
        incoming_n = incoming + emitted * trans
        textured = (m["flag"] == TEXTURE) & (m["diffuse_index"] != -1)
        tex_color = sample_bilinear(scene.tex_texels, scene.tex_meta,
                                    m["diffuse_index"], hit["uv"])
        color = jnp.where(textured[:, None], tex_color, m["color"])
        trans_n = trans * jnp.where(is_specular[:, None],
                                    m["specular_color"], color)

        g = is_glass[:, None]
        new_dir = jnp.where(g, dir_g, dir_n)
        new_origin = jnp.where(g, origin_g, hit["point"])
        new_trans = jnp.where(g, trans_g, trans_n)
        new_incoming = jnp.where(is_glass[:, None] | ~shading[:, None],
                                 incoming, incoming_n)
        new_seed = jnp.where(is_glass, seed_g, seed_n)

        p = jnp.max(new_trans[:, :3], axis=1)
        r_rr, new_seed = rng.rand(new_seed)
        survive = r_rr < p
        new_trans = new_trans / jnp.where(p > 0.0, p, 1.0)[:, None]

        live = shading[:, None]
        o = jnp.where(live, new_origin, o)
        d = jnp.where(live, new_dir, d)
        trans = jnp.where(live, new_trans, trans)
        incoming = jnp.where(at_b[:, None] & started[:, None],
                             new_incoming, incoming)
        seed = jnp.where(shading, new_seed, seed)

        # next-segment viability: first boundary (bounce -1) always starts
        next_bounce = bounce + 1
        continues = at_b & (
            (~started) | (shading & survive)) & (next_bounce <= bounces)
        dies = at_b & ~continues

        # ---- prepass for the NEW segment: spheres + brute instances ----
        seg_dst = jnp.full((B,), INF)
        seg_tri2 = jnp.full((B,), -1, jnp.int32)
        seg_mat2 = jnp.zeros((B,), jnp.int32)
        seg_flag2 = jnp.zeros((B,), jnp.int32)   # sphere backface flag
        seg_point = jnp.zeros((B, 3))
        seg_norm = jnp.zeros((B, 3))
        seg_uv = jnp.zeros((B, 2))
        seg_u = jnp.zeros((B,))
        seg_v = jnp.zeros((B,))
        seg_det = jnp.zeros((B,))
        seg_inst = jnp.zeros((B,), jnp.int32)

        if scene.n_spheres > 0:
            S = scene.n_spheres
            s_hit, s_dst, s_inside = ray_sphere(
                o[:, None, :], d[:, None, :],
                scene.sphere_pos[None, :, :], scene.sphere_radius[None, :])
            sidx = jnp.argmin(s_dst, axis=1)
            is_win = jnp.arange(S, dtype=jnp.int32)[None, :] == sidx[:, None]
            sd = jnp.sum(jnp.where(is_win, s_dst, 0.0), axis=1)
            inside = jnp.any(is_win & s_inside, axis=1)
            won = jnp.any(is_win & s_hit, axis=1)
            centre = jnp.dot(is_win.astype(jnp.float32), scene.sphere_pos,
                             precision=jax.lax.Precision.HIGHEST)
            hp = o + d * sd[:, None]
            sn, s_uv = sphere_normal_uv(hp, centre, inside)
            smat = jnp.sum(jnp.where(is_win, scene.sphere_mat[None, :], 0),
                           axis=1)
            better = won & (sd < seg_dst)
            seg_dst = jnp.where(better, sd, seg_dst)
            seg_tri2 = jnp.where(better, -2, seg_tri2)
            seg_mat2 = jnp.where(better, smat, seg_mat2)
            seg_flag2 = jnp.where(better, inside.astype(jnp.int32), seg_flag2)
            seg_point = jnp.where(better[:, None], hp, seg_point)
            seg_norm = jnp.where(better[:, None], sn, seg_norm)
            seg_uv = jnp.where(better[:, None], s_uv, seg_uv)

        for i, (node_off, tri_off, tri_count) in enumerate(scene.inst_spans):
            if tri_count > BRUTE_MAX_TRIS:
                continue
            w2m_i = scene.inst_world_to_model[i]
            m2w_i = scene.inst_model_to_world[i]
            o_m = _mat4_apply(w2m_i, o, 1)
            d_m = normalize(_mat4_apply(w2m_i, d, 0))
            res = brute_force_intersect(scene, o_m, d_m, tri_off, tri_count)
            got = res["tri"] >= 0
            local_hp = o_m + d_m * res["dst"][:, None]
            world_hp = _mat4_apply(m2w_i, local_hp, 1)
            wd = jnp.sqrt(dot(world_hp - o, world_hp - o))
            better = got & (wd < seg_dst)
            seg_dst = jnp.where(better, wd, seg_dst)
            seg_tri2 = jnp.where(better, res["tri"], seg_tri2)
            seg_mat2 = jnp.where(better, res["mat"], seg_mat2)
            seg_u = jnp.where(better, res["u"], seg_u)
            seg_v = jnp.where(better, res["v"], seg_v)
            seg_det = jnp.where(better, res["det"], seg_det)
            seg_point = jnp.where(better[:, None], world_hp, seg_point)
            seg_inst = jnp.where(better, i, seg_inst)

        # brute mesh winners need attr resolution at the NEXT boundary via
        # tri index; sphere winners carry normal/uv inline.
        W_new = jnp.concatenate([
            seg_dst[:, None], seg_u[:, None], seg_v[:, None],
            seg_det[:, None], seg_point, seg_norm, seg_uv], axis=1)
        I_flag = jnp.where(seg_tri2 == -2, seg_flag2, seg_inst)

        # enter the first BVH instance
        w2m0 = scene.inst_world_to_model[bvh_ids[0]]
        om0 = _mat4_apply(w2m0, o, 1)
        dm0 = normalize(_mat4_apply(w2m0, d, 0))
        M_new = jnp.concatenate([om0, dm0, jnp.full((B, 1), INF),
                                 jnp.zeros((B, 3))], axis=1)

        cb = continues[:, None]
        F = jnp.concatenate([o, d, trans, incoming], axis=1)
        M = jnp.where(cb, M_new, M)
        W = jnp.where(cb, W_new, W)
        I = I.at[:, 0].set(jax.lax.bitcast_convert_type(seed, jnp.int32))
        I = I.at[:, 1].set(jnp.where(dies, DONE,
                                     jnp.where(continues, next_bounce,
                                               I[:, 1])))
        I = I.at[:, 2].add(continues.astype(jnp.int32))
        I = I.at[:, 3].set(jnp.where(continues, root_for(jnp.zeros(
            (B,), jnp.int32)), jnp.where(dies, -1, I[:, 3])))
        I = I.at[:, 4].set(jnp.where(continues, 0,
                                     jnp.where(dies, n_bvh, I[:, 4])))
        I = I.at[:, 5].set(jnp.where(continues, -1, I[:, 5]))
        I = I.at[:, 7].set(jnp.where(continues, seg_tri2, I[:, 7]))
        I = I.at[:, 8].set(jnp.where(continues, seg_mat2, I[:, 8]))
        I = I.at[:, 9].set(jnp.where(continues, I_flag, I[:, 9]))
        return F, M, W, I

    # ------------------------------------------------------- loop ----
    def cond(state):
        it, F, M, W, I = state
        return jnp.any(I[:, 1] != DONE)

    def body(state):
        it, F, M, W, I = state
        F, M, W, I = traversal_step(F, M, W, I)
        F, M, W, I = traversal_step(F, M, W, I)
        F, M, W, I = advance_instance(F, M, W, I)

        at_boundary = (I[:, 4] >= n_bvh) & (I[:, 1] != DONE)
        run_boundary = ((it % SHADE_EVERY) == 0) & jnp.any(at_boundary)
        F, M, W, I = jax.lax.cond(run_boundary, boundary,
                                  lambda *s: s, F, M, W, I)
        return it + 1, F, M, W, I

    it0 = jnp.int32(1)
    _, F, M, W, I = jax.lax.while_loop(
        cond, body, (it0, F0, M0, W0, I0))
    incoming = F[:, 10:14]
    seed_out = jax.lax.bitcast_convert_type(I[:, 0], jnp.uint32)
    return incoming, seed_out, I[:, 2]