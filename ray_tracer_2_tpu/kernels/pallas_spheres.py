"""Whole-path Pallas megakernel for SMALL scenes (spheres + small meshes).

metal / balls / random_balls have no BVH instances and no textures;
cornell_box (32 tris) and room (12 tris + glass spheres) add only small
meshes. For all of them the entire path trace — camera rays, dense
sphere AND triangle intersection, glass/diffuse/specular shading, russian
roulette, rays_per_pixel accumulation — fits in ONE Mosaic kernel with
zero HBM traffic in the loop. Mesh triangles are pre-baked to WORLD space
(instance transforms applied once at table build, winding swapped under
reflecting transforms), so the kernel needs no per-ray instance math; the
hit distances it produces are world distances, directly comparable with
the sphere pass for winner selection (the XLA brute path reaches the same
world distance via model-space rays + a world re-measure, so results
match to FP noise rather than bit-exactly).

Mosaic layout laws learned the hard way (docs/PERF_NOTES.md):
  * Mosaic UNROLLS array ops into (8, 128)-tile instructions, and the remote
    compile helper dies somewhere around ~2k tile-instructions per kernel;
    (B, 1) per-lane columns therefore both waste 128x lanes AND explode the
    program. Per-ray state here lives in NATIVE (8, 128) tiles (1024 rays
    per grid block, one instruction per elementwise op).
  * Nested lax loops are fine, but two sequential copies of a big loop body
    are not — the rays_per_pixel loop is FOLDED into the bounce loop as a
    masked camera restart, so exactly one bounce body exists in the program.
  * No cross-layout reshapes/transposes in-kernel: the sphere table arrives
    (S, 8) so a chunk slice puts spheres on sublanes, crossing naturally
    with a (1, 128) ray row; the material table arrives TRANSPOSED
    (F_ROWS, S) so winner fields come out of one MXU one-hot dot per ray
    row, already ray-major.
  * No u32<->f32 casts (emulated exactly via 16-bit halves), no scalar
    bitcasts, no jax arrays captured from module scope, no per-lane value
    dynamic_slice (masked row selects instead).

Physics and RNG stream are identical to kernels/trace.py trace_batch
(ray_tracer.wgsl:398-471) — outputs match the XLA path near-bitwise
(tests/test_pallas_spheres.py runs the kernel in interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracer_2_tpu import rng
from ray_tracer_2_tpu.scene.render_scene import RenderScene

INF = float(np.float32(1.7014118e38))
GLASS = 1
BLOCK_ROWS = 8              # ray rows per block
LANES = 128
BLOCK = BLOCK_ROWS * LANES  # 1024 rays per grid step
MAX_SCHUNK = 128            # max spheres per chunk (sublane axis)


def _schunk(S: int) -> int:
    """Sphere-chunk height: small scenes only pay for the tiles they use
    (metal has 9 spheres — a 128-row chunk wastes 93% of the cross)."""
    return min(MAX_SCHUNK, max(8, -(-S // 8) * 8))

# transposed field-table rows (see _pack_tables): 0:32 = the mat_rows
# layout, then the winner sphere's centre + radius, then the winner
# triangle's three WORLD-space vertex normals (for barycentric shading)
F_PX, F_PY, F_PZ, F_RAD = 32, 33, 34, 35
F_N0 = 36   # n0 (3 rows), n1 (3), n2 (3) — rows 36..44
F_ROWS = 48
F_ROWS_SPHERES = 36   # no-mesh scenes skip the 9 normal rows (the extra
                      # fields_for carries measured ~10% on metal)


def _n_frows(T: int) -> int:
    return F_ROWS if T else F_ROWS_SPHERES

#: small-MESH scenes also fit whole-path: triangles baked to world space
#: stream on sublanes exactly like spheres. Measured cap (round 4,
#: scripts/probe_pallas_caps.py displaced-grid scenes at 1080p): the
#: kernel WINS on cornell-class tiny scenes (cornell 34 tris: 65 vs ~41
#: Mrays/s; room 12 tris: 90 vs ~53) but LOSES to the XLA brute path at
#: 128/192 tris (29.2/28.9 vs 38.6/33.3) and only ties at 256 — so the
#: gate engages where it is measured to win. RT2_PALLAS_TRI_CAP overrides
#: for cap A/Bs.
MAX_TRIS = 64


def _tri_cap() -> int:
    import os
    return int(os.environ.get("RT2_PALLAS_TRI_CAP", MAX_TRIS))


def _tri_count(scene: RenderScene) -> int:
    return sum(c for _, _, c in scene.inst_spans)


def eligible(scene: RenderScene) -> bool:
    """Whole-path kernel: scenes whose geometry is spheres plus SMALL
    meshes (total tris <= MAX_TRIS, e.g. Cornell Box's 32), with no
    texture sampling. Mesh triangles are pre-baked to world space so the
    kernel needs no per-ray instance transforms."""
    T = _tri_count(scene)
    if T > _tri_cap():
        return False
    if T == 0 and scene.n_spheres == 0:
        return False
    flags = np.asarray(scene.materials.flag)
    diff = np.asarray(scene.materials.diffuse_index)
    return bool((flags != 2).all() and (diff < 0).all())


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _u32_to_f32(bits):
    """Exact emulation of bits.astype(float32) — Mosaic has no u32->f32
    cast. hi*65536 is exact in f32 and the single add rounds to nearest,
    identical to the direct conversion."""
    hi = jax.lax.bitcast_convert_type(bits >> jnp.uint32(16), jnp.int32)
    lo = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF), jnp.int32)
    return hi.astype(jnp.float32) * 65536.0 + lo.astype(jnp.float32)


def _rand(seed):
    """rng.rand with the Mosaic-safe u32->f32 conversion (bit-identical)."""
    bits, seed = rng.next_u32(seed)
    return _u32_to_f32(bits) / np.float32(4294967295.0), seed


def _rand_normal(seed):
    u1, seed = _rand(seed)
    u2, seed = _rand(seed)
    theta = 2.0 * 3.1415926 * u1
    rho = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u2, np.float32(2.33e-10))))
    return rho * jnp.cos(theta), seed


def _rand_direction(seed):
    """rng.rand_direction, component-wise (draw order x, y, z preserved)."""
    x, seed = _rand_normal(seed)
    y, seed = _rand_normal(seed)
    z, seed = _rand_normal(seed)
    x, y, z = _norm3(x, y, z)
    return x, y, z, seed


def _make_kernel(S: int, S_pad: int, SCHUNK: int, T: int, T_pad: int,
                 TCHUNK: int, bounces: int, rpp: int,
                 skybox: bool, width: int, total: int, row_start: int):
    from ray_tracer_2_tpu.kernels import trace as _t
    from ray_tracer_2_tpu.kernels.trace import _reflectance

    HORIZON = [float(v) for v in np.asarray(_t.SKY_HORIZON)]
    ZENITH = [float(v) for v in np.asarray(_t.SKY_ZENITH)]
    GROUND = [float(v) for v in np.asarray(_t.GROUND_COLOR)]
    SUN_FOCUS = float(_t.SUN_FOCUS)
    SUN_INTENSITY = float(_t.SUN_INTENSITY)
    n_chunks = S_pad // SCHUNK
    n_tchunks = T_pad // TCHUNK
    has_spheres = S > 0
    has_tris = T > 0
    from ray_tracer_2_tpu.kernels.intersect import sphere_fast_min
    fast = S >= sphere_fast_min()
    NF = _n_frows(T)
    C = S_pad + T_pad   # combined one-hot id space; id C = miss
    span = bounces + 1
    SHAPE = (BLOCK_ROWS, LANES)

    def smoothstep(e0, e1, x):
        t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    def env_light(dx, dy, dz):
        sky_t = smoothstep(0.0, 0.4, dy) ** 0.35
        g2s = smoothstep(-0.01, 0.0, dy)
        sun = jnp.maximum(0.0, dx * 0.1 + dy * 1.0 + dz * 0.1) \
            ** SUN_FOCUS * SUN_INTENSITY
        sun = sun * (g2s >= 1.0)
        out = []
        for c in range(4):
            sky = HORIZON[c] + (ZENITH[c] - HORIZON[c]) * sky_t
            comp = GROUND[c] + (sky - GROUND[c]) * g2s
            out.append(comp + sun)
        return out

    def kernel(frames_ref, cam_ref, sph_ref, tri_ref, mT_ref,
               or_ref, og_ref, ob_ref, oa_ref, seg_ref):
        frames = frames_ref[0, 0]
        cam = [cam_ref[0, i] for i in range(18)]
        (r00, r01, r02, r10, r11, r12, r20, r21, r22,
         cx, cy, cz, vp0, vp1, vp2, defocus, diverge, im_h) = cam

        rows8 = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 1), 0)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SCHUNK, 1), 0)

        block = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 0)
        pixel = block * BLOCK + row * LANES + lane
        in_image = pixel < total
        x = (pixel % width).astype(jnp.float32)
        y = (row_start + pixel // width).astype(jnp.float32)
        gpix = (row_start + pixel // width) * width + pixel % width
        seed0 = jax.lax.bitcast_convert_type(
            gpix + jnp.abs(frames) * 719393, jnp.uint32)

        u = x / jnp.maximum(jnp.float32(width) - 1.0, 1.0)
        v = y / jnp.maximum(im_h - 1.0, 1.0)
        lfx = (u - 0.5) * vp0
        lfy = (v - 0.5) * vp1
        fx = r00 * lfx + r01 * lfy + r02 * vp2 + cx
        fy = r10 * lfx + r11 * lfy + r12 * vp2 + cy
        fz = r20 * lfx + r21 * lfy + r22 * vp2 + cz

        def _disk(seed):
            u1, seed = _rand(seed)
            angle = u1 * 2.0 * 3.1415926
            u2, seed = _rand(seed)
            rr = jnp.sqrt(u2)
            return jnp.cos(angle) * rr, jnp.sin(angle) * rr, seed

        def sphere_pass(ox, oy, oz, dx, dy, dz):
            """Dense closest-hit over all spheres: row-by-row (rays on
            lanes) x sphere chunks (spheres on sublanes). Returns
            (best_dst, winner id, inside) as (8, 128) arrays."""

            def do_row(r, carry):
                best_d, best_i, best_in = carry
                sel = rows8 == r

                def pick_row(arr):
                    return jnp.sum(jnp.where(sel, arr, 0.0), axis=0,
                                   keepdims=True)

                rox, roy, roz = pick_row(ox), pick_row(oy), pick_row(oz)
                rdx, rdy, rdz = pick_row(dx), pick_row(dy), pick_row(dz)
                a = rdx * rdx + rdy * rdy + rdz * rdz
                if fast:
                    # shared-term hoists (intersect.ray_sphere_fast): one
                    # divide per RAY ROW instead of two per (sphere, ray)
                    inv_a = 1.0 / a
                    oo = rox * rox + roy * roy + roz * roz
                    od = rox * rdx + roy * rdy + roz * rdz

                def chunk(k, c2):
                    bd, bi, bin_ = c2
                    blk = sph_ref[pl.ds(k * SCHUNK, SCHUNK), :]  # (128, 8)
                    px, py, pz = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                    if fast:
                        # SAME formula + op order as ray_sphere_fast so the
                        # Pallas/XLA paths keep near-bitwise agreement
                        # (tests/test_pallas_spheres.py)
                        kq = blk[:, 4:5]
                        cd = px * rdx + py * rdy + pz * rdz
                        co = px * rox + py * roy + pz * roz
                        h = od - cd
                        cq = oo - 2.0 * co + kq
                        disc = h * h - a * cq
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        dn = jnp.maximum(0.0, (-h - sq) * inv_a)
                        df = (-h + sq) * inv_a
                    else:
                        rad = blk[:, 3:4]
                        ocx, ocy, ocz = rox - px, roy - py, roz - pz
                        b = 2.0 * (ocx * rdx + ocy * rdy + ocz * rdz)
                        cq = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                        disc = b * b - 4.0 * a * cq
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        dn = jnp.maximum(0.0, (-b - sq) / (2.0 * a))
                        df = (-b + sq) / (2.0 * a)
                    inside = dn == 0.0
                    hit_s = (disc >= 0.0) & (df >= 0.001)
                    dstw = jnp.where(hit_s, jnp.where(inside, df, dn), INF)
                    m = jnp.min(dstw, axis=0, keepdims=True)     # (1, 128)
                    gid = sub_iota + k * SCHUNK                  # (128, 1)
                    cand = dstw == m
                    idw = jnp.min(jnp.where(cand, gid, S_pad), axis=0,
                                  keepdims=True)
                    winc = cand & (gid == idw)
                    ins = jnp.max(jnp.where(winc & inside, 1.0, 0.0),
                                  axis=0, keepdims=True)  # f32: Mosaic
                    # crashes on BOOL loop carries
                    better = m < bd
                    return (jnp.where(better, m, bd),
                            jnp.where(better, idw, bi),
                            jnp.where(better, ins, bin_))

                bd, bi, bin_ = jax.lax.fori_loop(
                    0, n_chunks, chunk,
                    (jnp.full((1, LANES), INF),
                     jnp.full((1, LANES), S_pad, jnp.int32),
                     jnp.zeros((1, LANES), jnp.float32)))
                return (jnp.where(sel, bd, best_d),
                        jnp.where(sel, bi, best_i),
                        jnp.where(sel, bin_, best_in))

            return jax.lax.fori_loop(
                0, BLOCK_ROWS, do_row,
                (jnp.full(SHAPE, INF), jnp.full(SHAPE, S_pad, jnp.int32),
                 jnp.zeros(SHAPE, jnp.float32)))

        tsub_iota = jax.lax.broadcasted_iota(jnp.int32, (TCHUNK, 1), 0)

        def tri_pass(ox, oy, oz, dx, dy, dz):
            """Dense closest-hit over all WORLD-baked triangles, same
            row-by-row x sublane-chunk structure as sphere_pass.
            Möller–Trumbore per kernels/intersect.py:ray_triangle (the
            geometric normal is precomputed per triangle at bake time).
            Returns (best_dst, winner id, u, v, det) as (8, 128) arrays."""

            def do_row(r, carry):
                bd, bi, bu, bv, bdet = carry
                sel = rows8 == r

                def pick_row(arr):
                    return jnp.sum(jnp.where(sel, arr, 0.0), axis=0,
                                   keepdims=True)

                rox, roy, roz = pick_row(ox), pick_row(oy), pick_row(oz)
                rdx, rdy, rdz = pick_row(dx), pick_row(dy), pick_row(dz)

                def chunk(k, c2):
                    cd, ci, cu, cv, cdet = c2
                    blk = tri_ref[pl.ds(k * TCHUNK, TCHUNK), :]  # (T, 16)
                    v0x, v0y, v0z = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                    e1x, e1y, e1z = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
                    e2x, e2y, e2z = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
                    gnx, gny, gnz = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
                    cullc = blk[:, 12:13]
                    det = -(rdx * gnx + rdy * gny + rdz * gnz)
                    # NOTE: jnp.where on two BOOL vectors lowers to an i1
                    # truncation Mosaic rejects — use boolean algebra
                    cull_b = cullc > 0.5
                    keep = (cull_b & (det >= 1e-8)) \
                        | (~cull_b & (jnp.abs(det) >= 1e-8))
                    inv = 1.0 / jnp.where(keep, det, 1.0)
                    aox, aoy, aoz = rox - v0x, roy - v0y, roz - v0z
                    daox = aoy * rdz - aoz * rdy
                    daoy = aoz * rdx - aox * rdz
                    daoz = aox * rdy - aoy * rdx
                    dst = (aox * gnx + aoy * gny + aoz * gnz) * inv
                    u = (e2x * daox + e2y * daoy + e2z * daoz) * inv
                    v = -(e1x * daox + e1y * daoy + e1z * daoz) * inv
                    w = 1.0 - u - v
                    hitt = keep & (dst > 1e-5) & (u >= 0.0) & (v >= 0.0) \
                        & (w >= 0.0)
                    dstw = jnp.where(hitt, dst, INF)
                    m = jnp.min(dstw, axis=0, keepdims=True)     # (1, 128)
                    gid = tsub_iota + k * TCHUNK                 # (T, 1)
                    cand = dstw == m
                    idw = jnp.min(jnp.where(cand, gid, T_pad), axis=0,
                                  keepdims=True)
                    winc = cand & (gid == idw)
                    uw = jnp.sum(jnp.where(winc, u, 0.0), axis=0,
                                 keepdims=True)
                    vw = jnp.sum(jnp.where(winc, v, 0.0), axis=0,
                                 keepdims=True)
                    dw = jnp.sum(jnp.where(winc, det, 0.0), axis=0,
                                 keepdims=True)
                    better = m < cd
                    return (jnp.where(better, m, cd),
                            jnp.where(better, idw, ci),
                            jnp.where(better, uw, cu),
                            jnp.where(better, vw, cv),
                            jnp.where(better, dw, cdet))

                cd, ci, cu, cv, cdet = jax.lax.fori_loop(
                    0, n_tchunks, chunk,
                    (jnp.full((1, LANES), INF),
                     jnp.full((1, LANES), T_pad, jnp.int32),
                     jnp.zeros((1, LANES), jnp.float32),
                     jnp.zeros((1, LANES), jnp.float32),
                     jnp.zeros((1, LANES), jnp.float32)))
                return (jnp.where(sel, cd, bd), jnp.where(sel, ci, bi),
                        jnp.where(sel, cu, bu), jnp.where(sel, cv, bv),
                        jnp.where(sel, cdet, bdet))

            return jax.lax.fori_loop(
                0, BLOCK_ROWS, do_row,
                (jnp.full(SHAPE, INF), jnp.full(SHAPE, T_pad, jnp.int32),
                 jnp.zeros(SHAPE, jnp.float32), jnp.zeros(SHAPE, jnp.float32),
                 jnp.zeros(SHAPE, jnp.float32)))

        def fields_for(winner):
            """Winner field rows via one MXU one-hot dot per ray row:
            (F_ROWS, C) @ onehot(C, 128) — fields land ray-major. ids are
            COMBINED: sphere s = s, triangle t = S_pad + t, miss = C."""
            sfull = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

            def do_row(r, out):
                sel = rows8 == r
                widr = jnp.sum(jnp.where(sel, winner, 0), axis=0,
                               keepdims=True)                     # (1, 128)
                oh = (sfull == widr).astype(jnp.float32)          # (S, 128)
                f = jax.lax.dot_general(
                    mT_ref[:], oh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)          # (F, 128)
                return [jnp.where(sel, f[c:c + 1, :], out[c])
                        for c in range(NF)]

            return jax.lax.fori_loop(
                0, BLOCK_ROWS, do_row,
                [jnp.zeros(SHAPE, jnp.float32) for _ in range(NF)])

        def _unpack(st):
            return [st[k * BLOCK_ROWS:(k + 1) * BLOCK_ROWS] for k in range(20)]

        def _pack(arrs):
            return jnp.concatenate(arrs, axis=0)

        def body(i, c):
            st, seed = c
            (ox, oy, oz, dx, dy, dz, t0, t1, t2, t3,
             i0, i1, i2, i3, alive, segs, a0, a1, a2, a3) = _unpack(st)
            tr = [t0, t1, t2, t3]
            inc = [i0, i1, i2, i3]
            acc = [a0, a1, a2, a3]

            # ---- masked sample restart (frag(), wgsl:487-497) ------------
            restart = (i % span) == 0
            d0x, d0y, seed_r = _disk(seed)
            jx = d0x * defocus
            jy = d0y * defocus
            rox = cx + r00 * jx + r01 * jy      # camera right/up = columns
            roy = cy + r10 * jx + r11 * jy
            roz = cz + r20 * jx + r21 * jy
            v0x, v0y, seed_r = _disk(seed_r)
            vx = v0x * diverge
            vy = v0y * diverge
            fjx = fx + r00 * vx + r01 * vy
            fjy = fy + r10 * vx + r11 * vy
            fjz = fz + r20 * vx + r21 * vy
            rdx, rdy, rdz = _norm3(fjx - rox, fjy - roy, fjz - roz)
            acc = [jnp.where(restart, ac + ic, ac)
                   for ac, ic in zip(acc, inc)]
            inc = [jnp.where(restart, 0.0, vv) for vv in inc]
            tr = [jnp.where(restart, 1.0, vv) for vv in tr]
            ox = jnp.where(restart, rox, ox)
            oy = jnp.where(restart, roy, oy)
            oz = jnp.where(restart, roz, oz)
            dx = jnp.where(restart, rdx, dx)
            dy = jnp.where(restart, rdy, dy)
            dz = jnp.where(restart, rdz, dz)
            seed = jnp.where(restart, seed_r, seed)
            # alive is carried as f32 0/1 (Mosaic crashes on bool carries)
            alive = jnp.where(restart, in_image_f, alive)
            alive_b = alive > 0.0
            segs = segs + alive

            # ---- intersection + winner fields ----------------------------
            # spheres first, then world-baked triangles; distance ties go
            # to the sphere (matches the XLA prepass's strict < merge)
            if has_spheres:
                sd, swin, sins = sphere_pass(ox, oy, oz, dx, dy, dz)
            else:
                sd = jnp.full(SHAPE, INF)
                swin = jnp.full(SHAPE, C, jnp.int32)
                sins = jnp.zeros(SHAPE, jnp.float32)
            if has_tris:
                td, tid, tu, tv, tdet = tri_pass(ox, oy, oz, dx, dy, dz)
            else:
                td = jnp.full(SHAPE, INF)
                tid = jnp.zeros(SHAPE, jnp.int32)
                tu = tv = tdet = jnp.zeros(SHAPE, jnp.float32)
            tri_win = td < sd
            sd = jnp.minimum(sd, td)   # winner distance from here on
            winner = jnp.where(tri_win, S_pad + tid, swin)
            backface_f = jnp.where(
                tri_win, jnp.where(tdet < 0.0, 1.0, 0.0), sins)
            backface = backface_f > 0.0
            hit = alive_b & (sd < INF)
            F = fields_for(jnp.where(hit, winner, C))
            m_color = F[0:4]
            m_emis = F[4:8]
            m_spec_c = F[8:12]
            m_abs = F[12:15]
            m_abs_k = F[16]
            m_emis_k = F[17]
            m_smooth = F[18]
            m_spec = F[19]
            m_ior = jnp.where(hit, F[20], 1.0)  # no 1/0 on miss lanes
            is_glass = F[21] == float(GLASS)
            pcx, pcy, pcz = F[F_PX], F[F_PY], F[F_PZ]

            hx, hy, hz = ox + dx * sd, oy + dy * sd, oz + dz * sd
            if has_spheres:
                nx, ny, nz = _norm3(hx - pcx, hy - pcy, hz - pcz)
                flip = jnp.where(backface, -1.0, 1.0)
                nx, ny, nz = nx * flip, ny * flip, nz * flip
            else:
                nx = ny = nz = jnp.zeros(SHAPE, jnp.float32)
            if has_tris:
                # barycentric world-normal interpolation; sign(det) points
                # the normal back toward the ray (trace.py semantics)
                wbar = 1.0 - tu - tv
                sgn = jnp.where(tdet < 0.0, -1.0, 1.0)
                inx = F[F_N0] * wbar + F[F_N0 + 3] * tu + F[F_N0 + 6] * tv
                iny = (F[F_N0 + 1] * wbar + F[F_N0 + 4] * tu
                       + F[F_N0 + 7] * tv)
                inz = (F[F_N0 + 2] * wbar + F[F_N0 + 5] * tu
                       + F[F_N0 + 8] * tv)
                tnx, tny, tnz = _norm3(inx * sgn, iny * sgn, inz * sgn)
                nx = jnp.where(tri_win, tnx, nx)
                ny = jnp.where(tri_win, tny, ny)
                nz = jnp.where(tri_win, tnz, nz)

            # ---- miss: environment light ---------------------------------
            missed = alive_b & ~hit
            if skybox:
                env = env_light(dx, dy, dz)
                for ch in range(4):
                    inc[ch] = jnp.where(missed, inc[ch] + tr[ch] * env[ch],
                                        inc[ch])
            alive_b = hit

            # reflect dir shared by both branches
            ddn = dx * nx + dy * ny + dz * nz
            rfx, rfy, rfz = dx - 2.0 * ddn * nx, dy - 2.0 * ddn * ny, \
                dz - 2.0 * ddn * nz

            # ---- glass branch (ray_tracer.wgsl:414-436) ------------------
            gb = is_glass & backface
            tr_g = [jnp.where(gb,
                              tr[ch] * jnp.exp(-sd * m_abs[ch] * m_abs_k),
                              tr[ch]) for ch in range(3)] \
                + [jnp.where(gb, 1.0, tr[3])]
            ior = jnp.where(backface, m_ior, 1.0 / m_ior)
            cos_i = nx * dx + ny * dy + nz * dz
            kk = 1.0 - ior * ior * (1.0 - cos_i * cos_i)
            okk = kk >= 0.0
            kr = jnp.sqrt(jnp.maximum(kk, 0.0))
            rrx = jnp.where(okk, ior * dx - (ior * cos_i + kr) * nx, 0.0)
            rry = jnp.where(okk, ior * dy - (ior * cos_i + kr) * ny, 0.0)
            rrz = jnp.where(okk, ior * dz - (ior * cos_i + kr) * nz, 0.0)
            cos_t = jnp.minimum(-(dx * nx + dy * ny + dz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            cannot = ior * sin_t > 1.0
            r_refl, seed_refl = _rand(seed)
            seed_g = jnp.where(cannot, seed, seed_refl)
            follow = cannot | (_reflectance(cos_t, ior) > r_refl)
            gxx, gyy, gzz, seed_g = _rand_direction(seed_g)
            dfx, dfy, dfz = _norm3(nx + gxx, ny + gyy, nz + gzz)
            remx, remy, remz = _norm3(dfx + (rfx - dfx) * m_spec,
                                      dfy + (rfy - dfy) * m_spec,
                                      dfz + (rfz - dfz) * m_spec)
            rmx, rmy, rmz = _norm3(-dfx + (rrx + dfx) * m_smooth,
                                   -dfy + (rry + dfy) * m_smooth,
                                   -dfz + (rrz + dfz) * m_smooth)
            gdx = jnp.where(follow, remx, rmx)
            gdy = jnp.where(follow, remy, rmy)
            gdz = jnp.where(follow, remz, rmz)
            gsgn = jnp.sign(nx * gdx + ny * gdy + nz * gdz)
            gox = hx + 1e-4 * nx * gsgn
            goy = hy + 1e-4 * ny * gsgn
            goz = hz + 1e-4 * nz * gsgn

            # ---- diffuse/specular branch (wgsl:437-459) ------------------
            r_spec, seed_n = _rand(seed)
            is_spec = m_spec >= r_spec
            ux, uy, uz, seed_n = _rand_direction(seed_n)
            hemi = jnp.sign(nx * ux + ny * uy + nz * uz)
            hemi = jnp.where(hemi == 0.0, 1.0, hemi)
            hdx, hdy, hdz = ux * hemi, uy * hemi, uz * hemi
            mix_t = m_smooth * is_spec.astype(jnp.float32)
            ndx, ndy, ndz = _norm3(hdx + (rfx - hdx) * mix_t,
                                   hdy + (rfy - hdy) * mix_t,
                                   hdz + (rfz - hdz) * mix_t)
            inc_n = [inc[ch] + m_emis[ch] * m_emis_k * tr[ch]
                     for ch in range(4)]
            tr_n = [tr[ch] * jnp.where(is_spec, m_spec_c[ch], m_color[ch])
                    for ch in range(4)]

            # ---- select branch + russian roulette ------------------------
            ndx = jnp.where(is_glass, gdx, ndx)
            ndy = jnp.where(is_glass, gdy, ndy)
            ndz = jnp.where(is_glass, gdz, ndz)
            nox = jnp.where(is_glass, gox, hx)
            noy = jnp.where(is_glass, goy, hy)
            noz = jnp.where(is_glass, goz, hz)
            ntr = [jnp.where(is_glass, tr_g[ch], tr_n[ch])
                   for ch in range(4)]
            ninc = [jnp.where(is_glass | ~alive_b, inc[ch], inc_n[ch])
                    for ch in range(4)]
            nseed = jnp.where(is_glass, seed_g, seed_n)

            p = jnp.maximum(ntr[0], jnp.maximum(ntr[1], ntr[2]))
            r_rr, nseed = _rand(nseed)
            survive = r_rr < p
            pd = jnp.where(p > 0.0, p, 1.0)
            ntr = [t / pd for t in ntr]

            ox = jnp.where(alive_b, nox, ox)
            oy = jnp.where(alive_b, noy, oy)
            oz = jnp.where(alive_b, noz, oz)
            dx2 = jnp.where(alive_b, ndx, dx)
            dy2 = jnp.where(alive_b, ndy, dy)
            dz2 = jnp.where(alive_b, ndz, dz)
            tr = [jnp.where(alive_b, ntr[ch], tr[ch]) for ch in range(4)]
            seed = jnp.where(alive_b, nseed, seed)
            alive = jnp.where(alive_b & survive, 1.0, 0.0)
            return _pack([ox, oy, oz, dx2, dy2, dz2, *tr, *ninc,
                          alive, segs, *acc]), seed

        in_image_f = jnp.where(in_image, 1.0, 0.0)
        zeroc = jnp.zeros(SHAPE, jnp.float32)
        onec = jnp.ones(SHAPE, jnp.float32)
        st0 = jnp.concatenate(
            [zeroc, zeroc, zeroc, zeroc, zeroc, onec,
             onec, onec, onec, onec,
             zeroc, zeroc, zeroc, zeroc,
             zeroc, zeroc, zeroc, zeroc, zeroc, zeroc], axis=0)
        def body_or_skip(i, c):
            """Dead-block early-out: once every path in the block has
            terminated (sky strips die after 1-2 bounces) the remaining
            span iterations are pure masked no-ops — skip them on a scalar
            branch. BIT-IDENTICAL: dead lanes never advance seed or state
            (every write above is masked by alive_b), so skipping the
            iteration is the same as running it. Restart iterations
            (i % span == 0) must still run — they revive lanes for the
            next sample."""
            st, _ = c
            alive_rows = st[14 * BLOCK_ROWS:15 * BLOCK_ROWS]
            run = ((i % span) == 0) | (jnp.max(alive_rows) > 0.0)
            return jax.lax.cond(run, lambda cc: body(i, cc),
                                lambda cc: cc, c)

        st, _seed = jax.lax.fori_loop(0, rpp * span, body_or_skip,
                                      (st0, seed0))
        fin = [st[k * BLOCK_ROWS:(k + 1) * BLOCK_ROWS] for k in range(20)]
        inv = np.float32(1.0 / rpp)
        or_ref[0] = (fin[16] + fin[10]) * inv
        og_ref[0] = (fin[17] + fin[11]) * inv
        ob_ref[0] = (fin[18] + fin[12]) * inv
        oa_ref[0] = (fin[19] + fin[13]) * inv
        seg_ref[0] = fin[15]

    return kernel


def _pack_tables(scene: RenderScene):
    # traced-friendly (runs under jit): jnp ops only, static shapes from
    # scene array shapes + the static inst_spans tuple
    S = scene.n_spheres
    SCHUNK = _schunk(S)
    S_pad = max(-(-S // SCHUNK) * SCHUNK, SCHUNK)
    T = _tri_count(scene)
    TCHUNK = min(MAX_SCHUNK, max(8, -(-max(T, 1) // 8) * 8))
    T_pad = max(-(-T // TCHUNK) * TCHUNK, TCHUNK)
    C = S_pad + T_pad

    sph = jnp.zeros((S_pad, 8), jnp.float32)
    sph = sph.at[:, 0].set(1e30)  # dummy spheres can never be hit
    sph = sph.at[:S, 0:3].set(scene.sphere_pos)
    sph = sph.at[:S, 3].set(scene.sphere_radius)
    # col 4: K = |c|² - r² for the shared-term pass (sphere_fast_min);
    # EXACT op order of intersect.ray_sphere_fast's in-trace ck
    # (jnp.sum reduction over 3 = ((xx+yy)+zz)) so XLA/Pallas agree
    # bit-for-bit. Dummy rows overflow to inf → disc4 ends -inf/NaN →
    # the hit gate rejects them (no finite sentinel needed).
    p = sph[:, 0:3]
    sph = sph.at[:, 4].set(jnp.sum(p * p, axis=1) - sph[:, 3] * sph[:, 3])

    mT = jnp.zeros((_n_frows(T), C), jnp.float32)
    if S:
        mrows = jnp.take(scene.mat_rows, scene.sphere_mat, axis=0)  # (S, 32)
        mT = mT.at[:32, :S].set(mrows.T)
        mT = mT.at[F_PX:F_PZ + 1, :S].set(scene.sphere_pos.T)
        mT = mT.at[F_RAD, :S].set(scene.sphere_radius)

    # ---- triangles baked to WORLD space (no per-ray instance math) ------
    # Rows T..T_pad stay zero: a zero geometric normal gives det == 0,
    # which ray_triangle's keep-gate rejects — dummies can never be hit.
    tri = jnp.zeros((T_pad, 16), jnp.float32)
    if T:
        v0l, v1l, v2l, n0l, n1l, n2l, matl = [], [], [], [], [], [], []
        for i, (_n, toff, cnt) in enumerate(scene.inst_spans):
            if cnt == 0:
                continue
            m2w = scene.inst_model_to_world[i]
            R, t = m2w[:3, :3], m2w[:3, 3]
            sl = slice(toff, toff + cnt)
            v0w = scene.tri_v0[sl] @ R.T + t
            v1w = scene.tri_v1[sl] @ R.T + t
            v2w = scene.tri_v2[sl] @ R.T + t
            # a reflecting transform (det < 0) flips winding: swap v1/v2
            # (and the matching vertex normals) so backface/cull semantics
            # track the model-space orientation
            detR = (R[0, 0] * (R[1, 1] * R[2, 2] - R[1, 2] * R[2, 1])
                    - R[0, 1] * (R[1, 0] * R[2, 2] - R[1, 2] * R[2, 0])
                    + R[0, 2] * (R[1, 0] * R[2, 1] - R[1, 1] * R[2, 0]))
            neg = detR < 0.0
            n0w = scene.tri_n0[sl] @ R.T
            n1w = scene.tri_n1[sl] @ R.T
            n2w = scene.tri_n2[sl] @ R.T
            v0l.append(v0w)
            v1l.append(jnp.where(neg, v2w, v1w))
            v2l.append(jnp.where(neg, v1w, v2w))
            n0l.append(n0w)
            n1l.append(jnp.where(neg, n2w, n1w))
            n2l.append(jnp.where(neg, n1w, n2w))
            matl.append(scene.tri_mat[sl] + scene.inst_mat_deltas[i])
        v0 = jnp.concatenate(v0l)
        e1 = jnp.concatenate(v1l) - v0
        e2 = jnp.concatenate(v2l) - v0
        gn = jnp.cross(e1, e2)
        mats = jnp.concatenate(matl)
        cull = (jnp.take(scene.materials.flag, mats) != 1)
        tri = tri.at[:T, 0:3].set(v0)
        tri = tri.at[:T, 3:6].set(e1)
        tri = tri.at[:T, 6:9].set(e2)
        tri = tri.at[:T, 9:12].set(gn)
        tri = tri.at[:T, 12].set(cull.astype(jnp.float32))
        trows = jnp.take(scene.mat_rows, mats, axis=0)          # (T, 32)
        mT = mT.at[:32, S_pad:S_pad + T].set(trows.T)
        mT = mT.at[F_N0:F_N0 + 3, S_pad:S_pad + T].set(
            jnp.concatenate(n0l).T)
        mT = mT.at[F_N0 + 3:F_N0 + 6, S_pad:S_pad + T].set(
            jnp.concatenate(n1l).T)
        mT = mT.at[F_N0 + 6:F_N0 + 9, S_pad:S_pad + T].set(
            jnp.concatenate(n2l).T)
    return sph, tri, mT, S_pad, T_pad, TCHUNK


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "bounces", "rays_per_pixel", "skybox", "rows",
    "row_start", "interpret"))
def render_spheres_pallas(scene: RenderScene, frames, *, width: int,
                          height: int, bounces: int, rays_per_pixel: int,
                          skybox: bool, row_start=0, rows: int | None = None,
                          interpret: bool = False):
    """Whole-image sphere-scene render. Returns ((rows, width, 4), segments).
    Same RNG streams as the tiled/megakernel paths."""
    rows = height if rows is None else rows
    total = rows * width
    rpp = max(rays_per_pixel, 1)
    n_blocks = -(-total // BLOCK)

    sph, tri, mT, S_pad, T_pad, TCHUNK = _pack_tables(scene)

    cam = scene.cam_to_world
    cam_c = jnp.concatenate([
        cam[:3, :3].reshape(-1), cam[:3, 3],
        scene.view_params,
        (scene.defocus_strength / width)[None],
        (scene.diverge_strength / width)[None],
        jnp.asarray([jnp.float32(height)]),
    ]).reshape(1, 18)

    kernel = _make_kernel(scene.n_spheres, S_pad, _schunk(scene.n_spheres),
                          _tri_count(scene), T_pad, TCHUNK, bounces, rpp,
                          skybox, width, total, int(row_start))
    px_shape = jax.ShapeDtypeStruct((n_blocks, BLOCK_ROWS, LANES),
                                    jnp.float32)
    px_spec = pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    r, g, b, a, segs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 18), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_n_frows(_tri_count(scene)), S_pad + T_pad),
                         lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(px_spec,) * 5,
        out_shape=(px_shape,) * 5,
        interpret=interpret,
    )(jnp.asarray(frames, jnp.int32).reshape(1, 1), cam_c, sph, tri, mT)
    img = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1),
                     a.reshape(-1)], axis=1)[:total].reshape(rows, width, 4)
    return img, jnp.sum(segs.reshape(-1)[:total])
