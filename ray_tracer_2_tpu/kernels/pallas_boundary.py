"""Fused boundary/shade Mosaic kernel for wide-BVH scenes.

The XLA megakernel's per-iteration cost on the dragon headline decomposes as
~150 us of row gathers (the VMEM issue-rate floor — unbeatable, see
docs/PERF_NOTES.md round-4 writeup) plus ~230-275 us of BOUNDARY machinery:
resolve/shade, RNG, claim/log bookkeeping, camera regen, sphere prepass and
root re-entry, compiled by XLA into ~90 sub-2-us fusions with relayout copies
between them (PERF_NOTES "Round-4 deep profile tail").  This module replaces
that entire boundary phase with ONE Mosaic kernel: every per-lane register
lives as a ``(B//128, 128)`` f32/i32 plane in VMEM, the whole phase is one
fused VPU program, and the only parts left in XLA are the things Mosaic
cannot beat or express:

  * the triangle-attribute + material row gathers (dependent gathers run at
    the same hardware wall either way — probe_lut.py),
  * the completion-log compaction (argsort) + append (dynamic_update_slice),
  * the three resume-stack column-0 writes.

Cross-lane work the kernel keeps: the two claim cumsums run as exact
tril-ones matmuls on the MXU (same construction as megakernel._cumsum_i32 —
integer-exact, so claim ranks are bit-identical).

Scope (v1 — the headline scene class): exactly one wide-BVH triangle
instance, no sphere BVH, <= 32 dense prepass spheres (exact ``ray_sphere``
path), no glass / texture / normal-map / NEE lanes, packet == 1. Routing is
measurement-gated (tuned.json ``fused_boundary``); the XLA boundary remains
the fallback for everything else.

Reference semantics carried over (cited per function below): shading =
ray_tracer.wgsl:398-471, camera rays = ray_tracer.wgsl:473-500, RNG =
ray_tracer.wgsl:164-206.  Physics and claim protocol are mirrored
op-for-op from kernels/megakernel.py so interpret-mode execution is
bit-identical to the XLA boundary (tests/test_fused_boundary.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from ray_tracer_2_tpu.accel import wide as wd
from ray_tracer_2_tpu.kernels.gatherlib import ONEHOT_MAX_ROWS, fetch_attr
from ray_tracer_2_tpu.kernels.intersect import INF, sphere_fast_min

_INF = float(INF)   # python literal: Pallas kernels cannot capture jnp consts
from ray_tracer_2_tpu.scene.render_scene import RenderScene

DONE = 1 << 20
IDLE = -2
_PI = 3.1415926

# f32 output-plane map (see _kernel): F | W | M | A | payload
_NF_F, _NF_W, _NF_M, _NF_A, _NF_PAY = 14, 12, 10, 4, 5
_NF = _NF_F + _NF_W + _NF_M + _NF_A + _NF_PAY          # 45
# i32 planes: 13 I-state columns + push/valid masks + sm0/sd0 stack values
_I_COLS = 13   # seed bounce segs cur ptr tri stri smat flag sn pixel sample sp
_NI = _I_COLS + 4

# scal SMEM f32 vector offsets
_SC_CAM = 0          # cam[:3, :4] row-major (12)
_SC_VIEW = 12        # view_params (3)
_SC_DEFOCUS = 15
_SC_DIVERGE = 16
_SC_W2M = 17         # w2m0[:3, :4] (12)
_SC_M2W = 29         # m2w0[:3, :4] (12)
_SC_BASE = 41        # root row base
_SC_K = 42           # root row child count
_SC_LO = 43          # unpacked root child lo bounds, blocked x|y|z (96)
_SC_HI = 139         # hi bounds (96)
_SC_SPH = 235        # spheres: S x (cx, cy, cz, radius, mat)
_SPH_STRIDE = 5


def eligible(scene: RenderScene, *, n_bvh: int, sph: bool, nee_mode: int,
             packet: int, cohorts: int, claim: str, shade_every: int,
             normal_maps: bool, B: int) -> bool:
    """Static routing gate for the fused boundary (see module docstring)."""
    return (n_bvh == 1 and not sph
            and scene.n_instances == 1
            and packet == 1 and cohorts == 1
            and claim == "queue" and shade_every == 0
            and nee_mode == 0 and not normal_maps
            and "glass" not in scene.shade_classes
            and "texture" not in scene.shade_classes
            and B % 128 == 0
            and scene.n_spheres <= 32
            and scene.n_spheres < sphere_fast_min())


def scene_profile_eligible(scene: RenderScene) -> bool:
    """Scene-only precheck of :func:`eligible` (no knob / BVH-structure
    terms): the megakernel uses it to pick the ``"fused"`` tuning profile
    BEFORE knobs resolve (tuned.json ``tpu:fused`` carries the measured
    fused-class optimum — round-5 sweep: unroll=4 beats 5 once the boundary
    is fused). May be true for scenes the full gate later rejects (e.g. a
    brute-path mesh with no wide BVH) — that only mis-profiles scheduling
    knobs, never routing or image content."""
    return (scene.n_instances == 1
            and "glass" not in scene.shade_classes
            and "texture" not in scene.shade_classes
            and scene.n_spheres <= 32
            and scene.n_spheres < sphere_fast_min())


def _f16_bits_to_f32_np(bits):
    """numpy twin of megakernel.f16_bits_to_f32 for jnp arrays outside jit."""
    sign = (bits & 0x8000) << 16
    mag = (bits & 0x7FFF) << 13
    magic = jax.lax.bitcast_convert_type(jnp.uint32(0x77800000), jnp.float32)
    return jax.lax.bitcast_convert_type(
        (sign | mag).astype(jnp.uint32), jnp.float32) * magic


def _unpack_root_bounds(row):
    """(128,) root wide row -> ((96,) lo, (96,) hi) child slabs in blocked
    component order (accel/wide.py; same arithmetic as
    megakernel.unpack_child_aabbs on a 1-row batch)."""
    cols = row[wd.COL_CHILD_AABB:wd.COL_CHILD_AABB + wd.N_AABB_COLS]
    u = jax.lax.bitcast_convert_type(cols, jnp.uint32)
    return _f16_bits_to_f32_np(u & 0xFFFF), _f16_bits_to_f32_np(u >> 16)


def _fetch_mat_t(scene: RenderScene, mat_id):
    """(15, B) transposed material planes for shading: color4 |
    emission_color4 | specular_color4 | emission_strength | smoothness |
    specular (kernels/trace.py:_gather_material cols 0:12, 17:20). The
    one-hot path computes the transposed product directly (exact —
    products against exact 0/1 rows)."""
    cols = list(range(12)) + [17, 18, 19]
    tbl = scene.mat_rows[:, jnp.asarray(cols)]                    # (K, 15)
    K = scene.mat_rows.shape[0]
    if K <= ONEHOT_MAX_ROWS:
        oh_t = (jnp.arange(K, dtype=jnp.int32)[:, None]
                == mat_id[None, :]).astype(jnp.float32)           # (K, B)
        return jnp.dot(tbl.T, oh_t, precision=jax.lax.Precision.HIGHEST)
    return jnp.take(tbl, mat_id, axis=0).T


# ---- RNG on i32 planes ---------------------------------------------------
# Mosaic has no uint32->float32 cast (measured lowering failure, round-5
# on-chip log), so the kernel carries seeds as i32 (the same bits I_SEED
# stores) and reproduces rng.py op-for-op with wraparound-identical i32
# arithmetic + logical shifts.  _i32_bits_to_f32 performs EXACTLY ONE
# round-to-nearest of the integer value (hi*2^24 exact + lo exact, one
# rounding at the add), which is the same result as the u32->f32 convert.


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _i32_bits_to_f32(bits):
    hi = _srl(bits, 24).astype(jnp.float32)
    lo = (bits & 0xFFFFFF).astype(jnp.float32)
    return hi * 16777216.0 + lo


def _next_u32_i(seed):
    """rng.next_u32 (ray_tracer.wgsl:195-200) on i32 bits."""
    seed = seed * jnp.int32(747796405) + jnp.int32(-1403630843)  # 2891336453
    sh = _srl(seed, 28) + 4
    word = (_srl(seed, sh) ^ seed) * jnp.int32(277803737)
    return _srl(word, 22) ^ word, seed


def _rand_i(seed):
    bits, seed = _next_u32_i(seed)
    return _i32_bits_to_f32(bits) / jnp.float32(4294967295.0), seed


def _rand_normal_i(seed):
    """rng.rand_normal (Box-Muller cos branch, clamped log)."""
    u1, seed = _rand_i(seed)
    u2, seed = _rand_i(seed)
    theta = 2.0 * _PI * u1
    rho = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u2, jnp.float32(2.33e-10))))
    return rho * jnp.cos(theta), seed


def _rand_direction_c(seed):
    """Componentwise rng.rand_direction (ray_tracer.wgsl:168-174): returns
    ((x, y, z), seed) as planes; same draw order and normalize op order."""
    x, seed = _rand_normal_i(seed)
    y, seed = _rand_normal_i(seed)
    z, seed = _rand_normal_i(seed)
    n = jnp.sqrt((x * x + y * y) + z * z)
    return (x / n, y / n, z / n), seed


def _rand_hemisphere_c(nx, ny, nz, seed):
    """Componentwise rng.rand_hemisphere (ray_tracer.wgsl:176-179)."""
    (x, y, z), seed = _rand_direction_c(seed)
    flip = (nx * x + ny * y) + nz * z >= 0.0
    return (jnp.where(flip, x, -x), jnp.where(flip, y, -y),
            jnp.where(flip, z, -z)), seed


def _rand_disk_c(seed):
    """Componentwise rng.rand_in_unit_disk (ray_tracer.wgsl:202-206)."""
    u1, seed = _rand_i(seed)
    angle = u1 * 2.0 * _PI
    r2, seed = _rand_i(seed)
    s = jnp.sqrt(r2)
    return (jnp.cos(angle) * s, jnp.sin(angle) * s), seed


def _normalize3(x, y, z):
    n = jnp.sqrt((x * x + y * y) + z * z)
    return x / n, y / n, z / n


def _dot3(ax, ay, az, bx, by, bz):
    return (ax * bx + ay * by) + az * bz


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _cumsum_planes(x_i32, R):
    """Inclusive i32 cumsum over row-major (R, 128) planes via two exact
    tril-ones matmuls (MXU) — the same construction as
    megakernel._cumsum_i32, so claim ranks match it bit-for-bit."""
    g = x_i32.astype(jnp.float32)                                # (R, 128)
    lt = jnp.tril(jnp.ones((128, 128), jnp.float32))
    within = jnp.dot(g, lt.T, precision=jax.lax.Precision.HIGHEST)
    ltn = jnp.tril(jnp.ones((R, R), jnp.float32), -1)
    prefix = jnp.dot(ltn, within[:, 127:128],
                     precision=jax.lax.Precision.HIGHEST)        # (R, 1)
    return (within + prefix).astype(jnp.int32)


def make_fused_boundary(scene: RenderScene, B: int, *, bounces: int,
                        rpp: int, skybox: bool, antialias: bool,
                        width: int, height: int, row_start, frames,
                        total: int, log_cap: int, claim_mul: int,
                        stack_cols, interpret: bool):
    """Build the fused boundary: returns ``boundary(F, M, W, I, S, A, logv,
    logp, cursor, wcursor) -> same tuple`` — a drop-in for the XLA boundary
    closure in megakernel.render_persistent (queue claim, ungated).

    ``row_start``/``frames`` may be traced (multi-chip row offsets / frame
    index); everything else is static. ``interpret`` runs the kernel in the
    Pallas interpreter (CPU tests — bit-identical to the XLA boundary by
    construction)."""
    assert B % 128 == 0, B
    import numpy as np
    R = B // 128
    S = scene.n_spheres
    n_phase = 1
    # the single wide-BVH instance is instance 0 by eligibility
    root = scene.wide_roots[0]
    defer_on = log_cap < B
    frames_t = jnp.asarray(frames, jnp.int32)
    row_start_t = jnp.asarray(row_start, jnp.int32)
    # divisors kept as literal f32 divides (not reciprocal multiplies) so
    # every camera value matches megakernel.camera_ray bit-for-bit
    w1 = float(max(width - 1, 1))
    h1 = float(max(height - 1, 1))
    inv_size_x = float(np.float32(1.0) / np.float32(width))

    def kernel(scal, misc, fin, iin, fout, iout, sout):
        sc = lambda i: scal[i]

        def fi(i):
            return fin[i]

        def ii(i):
            return iin[i]

        # ---- unpack state planes ------------------------------------
        ox, oy, oz = fi(0), fi(1), fi(2)
        dx, dy, dz = fi(3), fi(4), fi(5)
        tr0, tr1, tr2, tr3 = fi(6), fi(7), fi(8), fi(9)
        in0, in1, in2, in3 = fi(10), fi(11), fi(12), fi(13)
        w_dst, w_u, w_v, w_det = fi(14), fi(15), fi(16), fi(17)
        w_px, w_py, w_pz = fi(18), fi(19), fi(20)
        w_nx, w_ny, w_nz = fi(21), fi(22), fi(23)
        w_uu, w_vv = fi(24), fi(25)
        m_in = [fi(26 + i) for i in range(10)]
        a0, a1, a2, a3 = fi(36), fi(37), fi(38), fi(39)
        attr = [fi(40 + i) for i in range(15)]
        mc = [fi(55 + i) for i in range(15)]

        iseed, bounce, segs = ii(0), ii(1), ii(2)
        cur, ptr, tri = ii(3), ii(4), ii(5)
        stri, smat, flag = ii(6), ii(7), ii(8)
        sn, pix_old, sample_i = ii(9), ii(10), ii(11)
        sp = ii(12)

        cursor = misc[0]
        wcursor = misc[1]
        frames_s = misc[2]
        row_start_s = misc[3]

        seed = iseed   # RNG runs on i32 bits in-kernel (see _rand_i)
        at_b = (ptr >= n_phase) & (bounce != DONE)
        started = bounce >= 0

        # ---- resolve + shade (megakernel.resolve_and_shade; physics =
        # ray_tracer.wgsl:398-471, diffuse/specular branch only) --------
        hit_mesh = stri >= 0
        w_bar = 1.0 - w_u - w_v
        nmx = attr[0] * w_bar + attr[3] * w_u + attr[6] * w_v
        nmy = attr[1] * w_bar + attr[4] * w_u + attr[7] * w_v
        nmz = attr[2] * w_bar + attr[5] * w_u + attr[8] * w_v
        nmx, nmy, nmz = _normalize3(nmx, nmy, nmz)
        sgn = jnp.sign(w_det)
        nmx, nmy, nmz = nmx * sgn, nmy * sgn, nmz * sgn
        m2w = [sc(_SC_M2W + i) for i in range(12)]
        nwx = (m2w[0] * nmx + m2w[1] * nmy) + m2w[2] * nmz
        nwy = (m2w[4] * nmx + m2w[5] * nmy) + m2w[6] * nmz
        nwz = (m2w[8] * nmx + m2w[9] * nmy) + m2w[10] * nmz
        nwx, nwy, nwz = _normalize3(nwx, nwy, nwz)
        uvx = attr[9] * w_bar + attr[11] * w_u + attr[13] * w_v
        uvy = attr[10] * w_bar + attr[12] * w_u + attr[14] * w_v

        sphere_won = stri == -2
        hit_hit = (hit_mesh | sphere_won) & started & at_b
        nx = jnp.where(sphere_won, w_nx, nwx)
        ny = jnp.where(sphere_won, w_ny, nwy)
        nz = jnp.where(sphere_won, w_nz, nwz)

        alive = at_b & started & (bounce <= bounces)
        missed = alive & ~hit_hit
        if skybox:
            # environment_light (ray_tracer.wgsl:214-221), componentwise
            sky_t = _smoothstep(0.0, 0.4, dy) ** 0.35
            g2s = _smoothstep(-0.01, 0.0, dy)
            skyr = 1.0 + (0.0788092 - 1.0) * sky_t
            skyg = 1.0 + (0.36480793 - 1.0) * sky_t
            skyb = 1.0 + (0.7264151 - 1.0) * sky_t
            sun = jnp.maximum(
                0.0, (dx * 0.1 + dy * 1.0) + dz * 0.1) ** 500.0 * 0.1
            compr = 0.35 + (skyr - 0.35) * g2s
            compg = 0.3 + (skyg - 0.3) * g2s
            compb = 0.35 + (skyb - 0.35) * g2s
            sun_on = sun * (g2s >= 1.0)
            in0 = jnp.where(missed, in0 + tr0 * (compr + sun_on), in0)
            in1 = jnp.where(missed, in1 + tr1 * (compg + sun_on), in1)
            in2 = jnp.where(missed, in2 + tr2 * (compb + sun_on), in2)
            in3 = jnp.where(missed, in3 + tr3 * (0.0 + sun_on), in3)
        shading = alive & hit_hit

        r_spec, seed_n = _rand_i(seed)
        is_specular = mc[14] >= r_spec
        (dnx, dny, dnz), seed_n = _rand_hemisphere_c(nx, ny, nz, seed_n)
        idn = 2.0 * _dot3(dx, dy, dz, nx, ny, nz)
        sdx, sdy, sdz = dx - idn * nx, dy - idn * ny, dz - idn * nz
        tmix = mc[13] * is_specular
        ndx = dnx + (sdx - dnx) * tmix
        ndy = dny + (sdy - dny) * tmix
        ndz = dnz + (sdz - dnz) * tmix
        ndx, ndy, ndz = _normalize3(ndx, ndy, ndz)
        emis = mc[12]
        inew0 = in0 + mc[4] * emis * tr0
        inew1 = in1 + mc[5] * emis * tr1
        inew2 = in2 + mc[6] * emis * tr2
        inew3 = in3 + mc[7] * emis * tr3
        ntr0 = tr0 * jnp.where(is_specular, mc[8], mc[0])
        ntr1 = tr1 * jnp.where(is_specular, mc[9], mc[1])
        ntr2 = tr2 * jnp.where(is_specular, mc[10], mc[2])
        ntr3 = tr3 * jnp.where(is_specular, mc[11], mc[3])

        p_rr = jnp.maximum(jnp.maximum(ntr0, ntr1), ntr2)
        r_rr, seed_n = _rand_i(seed_n)
        survive = r_rr < p_rr
        pdiv = jnp.where(p_rr > 0.0, p_rr, 1.0)
        ntr0, ntr1, ntr2, ntr3 = (ntr0 / pdiv, ntr1 / pdiv, ntr2 / pdiv,
                                  ntr3 / pdiv)

        ox = jnp.where(shading, w_px, ox)
        oy = jnp.where(shading, w_py, oy)
        oz = jnp.where(shading, w_pz, oz)
        dx = jnp.where(shading, ndx, dx)
        dy = jnp.where(shading, ndy, dy)
        dz = jnp.where(shading, ndz, dz)
        tr0 = jnp.where(shading, ntr0, tr0)
        tr1 = jnp.where(shading, ntr1, tr1)
        tr2 = jnp.where(shading, ntr2, tr2)
        tr3 = jnp.where(shading, ntr3, tr3)
        upd = at_b & started
        in0 = jnp.where(upd & ~shading, in0, jnp.where(upd, inew0, in0))
        in1 = jnp.where(upd & ~shading, in1, jnp.where(upd, inew1, in1))
        in2 = jnp.where(upd & ~shading, in2, jnp.where(upd, inew2, in2))
        in3 = jnp.where(upd & ~shading, in3, jnp.where(upd, inew3, in3))
        seed = jnp.where(shading, seed_n, seed)

        next_bounce = bounce + 1
        continues_path = at_b & started & shading & survive \
            & (next_bounce <= bounces)

        # ---- boundary bookkeeping (megakernel.boundary) ---------------
        idle = bounce == IDLE
        continues = at_b & ~idle & continues_path & (next_bounce <= bounces)
        sample_end = at_b & ~continues
        more_samples = sample_end & ~idle & (sample_i + 1 < rpp)
        pixel_done = sample_end & ~more_samples
        valid_px = pixel_done & (pix_old >= 0)

        if defer_on:
            vcnt = _cumsum_planes(valid_px.astype(jnp.int32), R)
            defer = valid_px & (vcnt > log_cap)
            sample_end = sample_end & ~defer
            pixel_done = pixel_done & ~defer
            valid_px = valid_px & ~defer
            ox = jnp.where(defer, fi(0), ox)
            oy = jnp.where(defer, fi(1), oy)
            oz = jnp.where(defer, fi(2), oz)
            dx = jnp.where(defer, fi(3), dx)
            dy = jnp.where(defer, fi(4), dy)
            dz = jnp.where(defer, fi(5), dz)
            tr0 = jnp.where(defer, fi(6), tr0)
            tr1 = jnp.where(defer, fi(7), tr1)
            tr2 = jnp.where(defer, fi(8), tr2)
            tr3 = jnp.where(defer, fi(9), tr3)
            in0 = jnp.where(defer, fi(10), in0)
            in1 = jnp.where(defer, fi(11), in1)
            in2 = jnp.where(defer, fi(12), in2)
            in3 = jnp.where(defer, fi(13), in3)
            seed = jnp.where(defer, iseed, seed)
            continues = continues & ~defer

        bank = sample_end & ~idle
        a0 = jnp.where(bank, a0 + in0, a0)
        a1 = jnp.where(bank, a1 + in1, a1)
        a2 = jnp.where(bank, a2 + in2, a2)
        a3 = jnp.where(bank, a3 + in3, a3)

        # payload (pixel id bit 0x40000000 keeps the f32 view normal —
        # megakernel boundary log comments)
        inv_rpp = 1.0 / jnp.float32(rpp)
        fout[40] = a0 * inv_rpp
        fout[41] = a1 * inv_rpp
        fout[42] = a2 * inv_rpp
        fout[43] = a3 * inv_rpp
        fout[44] = jax.lax.bitcast_convert_type(
            pix_old | jnp.int32(0x40000000), jnp.float32)
        n_valid = jnp.sum(valid_px.astype(jnp.int32))
        sout[1] = jnp.minimum(wcursor + n_valid, total)

        # claim (queue): rank via exact MXU cumsum
        claiming = pixel_done
        ci = claiming.astype(jnp.int32)
        rank = _cumsum_planes(ci, R) - ci
        new_idx = cursor + rank
        got_job = claiming & (new_idx < total)
        if claim_mul > 1:
            # i32 twin of the u32 shuffle: idx*A < 2^31 by construction
            # (megakernel claim_mul cap), so values are identical
            new_pixel = (new_idx * jnp.int32(claim_mul)) % jnp.int32(total)
            new_pixel = jnp.where(got_job, new_pixel, new_idx)
        else:
            new_pixel = new_idx
        sout[0] = jnp.minimum(cursor + jnp.sum(ci), total)

        pixel = jnp.where(got_job, new_pixel, pix_old)
        # rng.seed_for_pixel on i32 bits (wraparound mul == u32 mul)
        fresh_seed = ((row_start_s + pixel // width) * width
                      + pixel % width) \
            + jnp.abs(frames_s) * jnp.int32(719393)
        seed = jnp.where(got_job, fresh_seed, seed)
        sample_o = jnp.where(got_job, 0,
                             jnp.where(more_samples, sample_i + 1, sample_i))
        a0 = jnp.where(got_job, 0.0, a0)
        a1 = jnp.where(got_job, 0.0, a1)
        a2 = jnp.where(got_job, 0.0, a2)
        a3 = jnp.where(got_job, 0.0, a3)

        # ---- camera rays for restarted lanes (megakernel.camera_ray =
        # frag(), ray_tracer.wgsl:473-500) ------------------------------
        restart = got_job | more_samples
        px_f = (pixel % width).astype(jnp.float32)
        py_f = (row_start_s + pixel // width).astype(jnp.float32)
        u0 = px_f / w1
        u1 = py_f / h1
        vp0, vp1, vp2 = sc(_SC_VIEW), sc(_SC_VIEW + 1), sc(_SC_VIEW + 2)
        lf0 = (u0 - 0.5) * vp0
        lf1 = (u1 - 0.5) * vp1
        # fp = local_focus @ cam[:3,:3].T + cam[:3,3]
        cam = [sc(_SC_CAM + i) for i in range(12)]
        fpx = (lf0 * cam[0] + lf1 * cam[1]) + vp2 * cam[2] + cam[3]
        fpy = (lf0 * cam[4] + lf1 * cam[5]) + vp2 * cam[6] + cam[7]
        fpz = (lf0 * cam[8] + lf1 * cam[9]) + vp2 * cam[10] + cam[11]
        cox, coy, coz = cam[3], cam[7], cam[11]
        crx, cry, crz = cam[0], cam[4], cam[8]
        cux, cuy, cuz = cam[1], cam[5], cam[9]
        if antialias:
            ju, seed = _rand_i(seed)
            jv, seed = _rand_i(seed)
            du = (ju - 0.5) * vp0 / w1
            dv = (jv - 0.5) * vp1 / h1
            fpx = fpx + crx * du + cux * dv
            fpy = fpy + cry * du + cuy * dv
            fpz = fpz + crz * du + cuz * dv
        (dj0, dj1), seed = _rand_disk_c(seed)
        dj0 = dj0 * sc(_SC_DEFOCUS) * inv_size_x
        dj1 = dj1 * sc(_SC_DEFOCUS) * inv_size_x
        ocx = cox + crx * dj0 + cux * dj1
        ocy = coy + cry * dj0 + cuy * dj1
        ocz = coz + crz * dj0 + cuz * dj1
        (vj0, vj1), seed_c = _rand_disk_c(seed)
        vj0 = vj0 * sc(_SC_DIVERGE) * inv_size_x
        vj1 = vj1 * sc(_SC_DIVERGE) * inv_size_x
        fpjx = fpx + crx * vj0 + cux * vj1
        fpjy = fpy + cry * vj0 + cuy * vj1
        fpjz = fpz + crz * vj0 + cuz * vj1
        dcx, dcy, dcz = _normalize3(fpjx - ocx, fpjy - ocy, fpjz - ocz)

        ox = jnp.where(restart, ocx, ox)
        oy = jnp.where(restart, ocy, oy)
        oz = jnp.where(restart, ocz, oz)
        dx = jnp.where(restart, dcx, dx)
        dy = jnp.where(restart, dcy, dy)
        dz = jnp.where(restart, dcz, dz)
        seed = jnp.where(restart, seed_c, seed)
        tr0 = jnp.where(restart, 1.0, tr0)
        tr1 = jnp.where(restart, 1.0, tr1)
        tr2 = jnp.where(restart, 1.0, tr2)
        tr3 = jnp.where(restart, 1.0, tr3)
        clr = restart | sample_end
        in0 = jnp.where(clr, 0.0, in0)
        in1 = jnp.where(clr, 0.0, in1)
        in2 = jnp.where(clr, 0.0, in2)
        in3 = jnp.where(clr, 0.0, in3)

        starts = continues | restart
        new_bounce = jnp.where(restart, 0,
                               jnp.where(continues, next_bounce, bounce))

        # ---- start_segments: dense sphere prepass (exact ray_sphere
        # order, ray_tracer.wgsl:223-256) + instance-0 entry ------------
        seg_dst = jnp.full((R, 128), _INF)
        seg_tri2 = jnp.full((R, 128), -1, jnp.int32)
        seg_mat2 = jnp.zeros((R, 128), jnp.int32)
        # all-False masks come from a comparison, NOT jnp.bool_ zeros: the
        # Mosaic backend rejects the i8->i1 truncation a materialized bool
        # constant lowers to ("Unsupported target bitwidth for truncation",
        # round-5 probe log)
        false_p = jnp.zeros((R, 128)) > 1.0
        seg_inside = false_p
        best_cx = jnp.zeros((R, 128))
        best_cy = jnp.zeros((R, 128))
        best_cz = jnp.zeros((R, 128))
        if S > 0:
            a_q = _dot3(dx, dy, dz, dx, dy, dz)
            sdst = jnp.full((R, 128), _INF)
            sidx_best = jnp.zeros((R, 128), jnp.int32)
            s_in_best = false_p
            s_hit_best = false_p
            for s_i in range(S):
                cxs = sc(_SC_SPH + _SPH_STRIDE * s_i)
                cys = sc(_SC_SPH + _SPH_STRIDE * s_i + 1)
                czs = sc(_SC_SPH + _SPH_STRIDE * s_i + 2)
                rs = sc(_SC_SPH + _SPH_STRIDE * s_i + 3)
                socx, socy, socz = ox - cxs, oy - cys, oz - czs
                b_q = 2.0 * _dot3(socx, socy, socz, dx, dy, dz)
                c_q = _dot3(socx, socy, socz, socx, socy, socz) - rs * rs
                disc = b_q * b_q - 4.0 * a_q * c_q
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                dn = jnp.maximum(0.0, (-b_q - sq) / (2.0 * a_q))
                df = (-b_q + sq) / (2.0 * a_q)
                is_in = dn == 0.0
                s_hit = (disc >= 0.0) & (df >= 0.001)
                ds = jnp.where(is_in, df, dn)
                ds = jnp.where(s_hit, ds, _INF)
                # strict < keeps the first index on ties == argmin
                newb = ds < sdst
                sdst = jnp.where(newb, ds, sdst)
                sidx_best = jnp.where(newb, s_i, sidx_best)
                # logical ops, NOT jnp.where: a select_n on BOOL operands
                # lowers through an i8 materialization whose trunci back to
                # i1 Mosaic rejects ("Unsupported target bitwidth for
                # truncation", round-5 probe log)
                s_in_best = (newb & is_in) | (~newb & s_in_best)
                s_hit_best = (newb & s_hit) | (~newb & s_hit_best)
            for s_i in range(S):
                selw = sidx_best == s_i
                best_cx = jnp.where(selw, sc(_SC_SPH + _SPH_STRIDE * s_i),
                                    best_cx)
                best_cy = jnp.where(selw, sc(_SC_SPH + _SPH_STRIDE * s_i + 1),
                                    best_cy)
                best_cz = jnp.where(selw, sc(_SC_SPH + _SPH_STRIDE * s_i + 2),
                                    best_cz)
                seg_mat2 = jnp.where(
                    selw & s_hit_best,
                    sc(_SC_SPH + _SPH_STRIDE * s_i + 4).astype(jnp.int32),
                    seg_mat2)
            won_any = s_hit_best
            hpx = ox + dx * sdst
            hpy = oy + dy * sdst
            hpz = oz + dz * sdst
            # sphere_normal_uv (ray_tracer.wgsl:246-251)
            snx, sny, snz = hpx - best_cx, hpy - best_cy, hpz - best_cz
            snx, sny, snz = _normalize3(snx, sny, snz)
            snx = jnp.where(s_in_best, -snx, snx)
            sny = jnp.where(s_in_best, -sny, sny)
            snz = jnp.where(s_in_best, -snz, snz)
            # Spherical UVs (ray_tracer.wgsl:246-251) are DEAD in the fused
            # class: uv feeds sample_texture only, and textured scenes are
            # ineligible. Mosaic also lacks acos/atan2 lowering (measured,
            # round-5 probe log) — so the kernel stores zeros where the XLA
            # boundary stores real UVs (image-invariant for this class).
            suu = jnp.zeros((R, 128))
            svv = jnp.zeros((R, 128))
            better = won_any & (sdst < seg_dst)
            seg_dst = jnp.where(better, sdst, seg_dst)
            seg_tri2 = jnp.where(better, -2, seg_tri2)
            seg_mat2 = jnp.where(better, seg_mat2, 0)
            seg_inside = better & s_in_best
            seg_px = jnp.where(better, hpx, 0.0)
            seg_py = jnp.where(better, hpy, 0.0)
            seg_pz = jnp.where(better, hpz, 0.0)
            seg_nx = jnp.where(better, snx, 0.0)
            seg_ny = jnp.where(better, sny, 0.0)
            seg_nz = jnp.where(better, snz, 0.0)
            seg_uu = jnp.where(better, suu, 0.0)
            seg_vv = jnp.where(better, svv, 0.0)
        else:
            z = jnp.zeros((R, 128))
            seg_px = seg_py = seg_pz = z
            seg_nx = seg_ny = seg_nz = z
            seg_uu = seg_vv = z
        seg_flag = jnp.where(seg_tri2 == -2, seg_inside.astype(jnp.int32), 0)

        # instance-0 model ray + exact prepass-seeded pruning limit
        # (megakernel.start_segments)
        w2m = [sc(_SC_W2M + i) for i in range(12)]
        omx = (w2m[0] * ox + w2m[1] * oy) + w2m[2] * oz + w2m[3]
        omy = (w2m[4] * ox + w2m[5] * oy) + w2m[6] * oz + w2m[7]
        omz = (w2m[8] * ox + w2m[9] * oy) + w2m[10] * oz + w2m[11]
        drx = (w2m[0] * dx + w2m[1] * dy) + w2m[2] * dz
        dry = (w2m[4] * dx + w2m[5] * dy) + w2m[6] * dz
        drz = (w2m[8] * dx + w2m[9] * dy) + w2m[10] * dz
        dmx, dmy, dmz = _normalize3(drx, dry, drz)
        wvx = (m2w[0] * dmx + m2w[1] * dmy) + m2w[2] * dmz
        wvy = (m2w[4] * dmx + m2w[5] * dmy) + m2w[6] * dmz
        wvz = (m2w[8] * dmx + m2w[9] * dmy) + m2w[10] * dmz
        slack0 = 8e-6 * (1.0 + jnp.sqrt(_dot3(ox, oy, oz, ox, oy, oz)))
        limit0 = (seg_dst * (1.0 + 4e-6) + slack0) \
            / jnp.sqrt(_dot3(wvx, wvy, wvz, wvx, wvy, wvz))

        # inline root evaluation (megakernel.wide_enter on root row 0):
        # bounds come pre-unpacked in SMEM (bit-identical — same
        # f16_bits_to_f32 arithmetic, done once per call in XLA)
        inv_dmx, inv_dmy, inv_dmz = 1.0 / dmx, 1.0 / dmy, 1.0 / dmz
        k_root = sc(_SC_K).astype(jnp.int32)
        base_root = sc(_SC_BASE).astype(jnp.int32)
        m1 = jnp.full((R, 128), _INF)
        m2 = jnp.full((R, 128), _INF)
        i1 = jnp.zeros((R, 128), jnp.int32)
        mask = jnp.zeros((R, 128), jnp.int32)
        for c in range(wd.MAX_ARITY):
            t1x = (sc(_SC_LO + c) - omx) * inv_dmx
            t2x = (sc(_SC_HI + c) - omx) * inv_dmx
            t1y = (sc(_SC_LO + 32 + c) - omy) * inv_dmy
            t2y = (sc(_SC_HI + 32 + c) - omy) * inv_dmy
            t1z = (sc(_SC_LO + 64 + c) - omz) * inv_dmz
            t2z = (sc(_SC_HI + 64 + c) - omz) * inv_dmz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                         jnp.minimum(t1y, t2y)),
                             jnp.minimum(t1z, t2z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                         jnp.maximum(t1y, t2y)),
                             jnp.maximum(t1z, t2z))
            hit_c = (tf >= tn) & (tn < limit0) & (tf > 0.0) & (c < k_root)
            dn_c = jnp.where(hit_c, tn, _INF)
            mask = mask | (hit_c.astype(jnp.int32) << c)
            # running (min, argmin-first, second-min) — same tie semantics
            # as argmin + masked-min (megakernel.wide_eval)
            take1 = dn_c < m1
            m2 = jnp.where(take1, m1, jnp.minimum(m2, dn_c))
            i1 = jnp.where(take1, c, i1)
            m1 = jnp.where(take1, dn_c, m1)
        has = mask != 0
        rem = mask & ~jnp.left_shift(jnp.int32(1), i1)
        push = starts & has & (rem != 0)
        cur0 = jnp.where(has, base_root + i1, -1)
        sp0 = push.astype(jnp.int32)
        ptr0 = jnp.where(cur0 < 0, n_phase, 0)   # dead-traversal fast-fwd

        # ---- write-back ----------------------------------------------
        retire = pixel_done & ~got_job
        stall = at_b & ~starts

        fout[0], fout[1], fout[2] = ox, oy, oz
        fout[3], fout[4], fout[5] = dx, dy, dz
        fout[6], fout[7], fout[8], fout[9] = tr0, tr1, tr2, tr3
        fout[10], fout[11], fout[12], fout[13] = in0, in1, in2, in3
        fout[14] = jnp.where(starts, seg_dst, w_dst)
        fout[15] = jnp.where(starts, 0.0, w_u)
        fout[16] = jnp.where(starts, 0.0, w_v)
        fout[17] = jnp.where(starts, 0.0, w_det)
        fout[18] = jnp.where(starts, seg_px, w_px)
        fout[19] = jnp.where(starts, seg_py, w_py)
        fout[20] = jnp.where(starts, seg_pz, w_pz)
        fout[21] = jnp.where(starts, seg_nx, w_nx)
        fout[22] = jnp.where(starts, seg_ny, w_ny)
        fout[23] = jnp.where(starts, seg_nz, w_nz)
        fout[24] = jnp.where(starts, seg_uu, w_uu)
        fout[25] = jnp.where(starts, seg_vv, w_vv)
        m_new = [omx, omy, omz, dmx, dmy, dmz, limit0,
                 jnp.zeros((R, 128)), jnp.zeros((R, 128)),
                 jnp.zeros((R, 128))]
        for i in range(10):
            fout[26 + i] = jnp.where(starts, m_new[i], m_in[i])
        fout[36], fout[37], fout[38], fout[39] = a0, a1, a2, a3

        iout[0] = seed
        b_out = jnp.where(starts, new_bounce, bounce)
        iout[1] = jnp.where(retire, DONE, b_out)
        iout[2] = segs + starts.astype(jnp.int32)
        c_out = jnp.where(starts, cur0, cur)
        iout[3] = jnp.where(stall, -1, c_out)
        p_out = jnp.where(starts, ptr0, ptr)
        iout[4] = jnp.where(stall, n_phase, p_out)
        iout[5] = jnp.where(starts, -1, tri)
        iout[6] = jnp.where(starts, seg_tri2, stri)
        iout[7] = jnp.where(starts, seg_mat2, smat)
        iout[8] = jnp.where(starts, seg_flag, flag)
        iout[9] = sn + jnp.where(starts, k_root, 0)
        iout[10] = pixel
        iout[11] = sample_o
        iout[12] = jnp.where(starts, sp0, sp)
        iout[13] = push.astype(jnp.int32)
        iout[14] = valid_px.astype(jnp.int32)
        iout[15] = rem
        iout[16] = jax.lax.bitcast_convert_type(m2, jnp.int32)

    def boundary(F, M, W, I, Sk, A, logv, logp, cursor, wcursor):
        # ---- XLA prologue: the two dependent row gathers ---------------
        stri = I[:, 7]                                # I_STRI
        attr = fetch_attr(scene.tri_attr, jnp.maximum(stri, 0))   # (B, 32)
        attr_t = attr[:, :15].T                                   # (15, B)
        mat_t = _fetch_mat_t(scene, I[:, 8])          # I_SMAT    # (15, B)

        root_row = scene.wide_rows[root]                          # (128,)
        lo, hi = _unpack_root_bounds(root_row)
        if S > 0:
            sph_tab = jnp.concatenate(
                [scene.sphere_pos,
                 scene.sphere_radius[:, None],
                 scene.sphere_mat.astype(jnp.float32)[:, None]],
                axis=1).reshape(-1)
        else:
            sph_tab = jnp.zeros((_SPH_STRIDE,), jnp.float32)
        cam = scene.cam_to_world
        scal = jnp.concatenate([
            cam[:3, :4].reshape(-1), scene.view_params,
            scene.defocus_strength.reshape(1),
            scene.diverge_strength.reshape(1),
            scene.inst_world_to_model[0][:3, :4].reshape(-1),
            scene.inst_model_to_world[0][:3, :4].reshape(-1),
            root_row[wd.COL_BASE].reshape(1), root_row[wd.COL_K].reshape(1),
            lo, hi, sph_tab])
        misc = jnp.stack([jnp.asarray(cursor, jnp.int32),
                          jnp.asarray(wcursor, jnp.int32),
                          frames_t, row_start_t])

        fin = jnp.stack(
            [F[:, i].reshape(R, 128) for i in range(14)]
            + [W[:, i].reshape(R, 128) for i in range(12)]
            + [M[:, i].reshape(R, 128) for i in range(10)]
            + [A[:, i].reshape(R, 128) for i in range(4)]
            + [attr_t[i].reshape(R, 128) for i in range(15)]
            + [mat_t[i].reshape(R, 128) for i in range(15)])
        icols = [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 12, 13, 14]
        # (I column map: SEED BOUNCE SEGS CUR PTR TRI STRI SMAT FLAG SN
        #  PIXEL SAMPLE SP — megakernel I_* indices)
        iin = jnp.stack([I[:, c].reshape(R, 128) for c in icols])

        fout, iout, sout = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((_NF, R, 128), jnp.float32),
                jax.ShapeDtypeStruct((_NI, R, 128), jnp.int32),
                jax.ShapeDtypeStruct((2,), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(scal, misc, fin, iin)

        Fo = fout[0:14].reshape(14, B).T
        Wo = fout[14:26].reshape(12, B).T
        Mo = fout[26:36].reshape(10, B).T
        Ao = fout[36:40].reshape(4, B).T
        payload = fout[40:45].reshape(5, B)

        iflat = iout.reshape(_NI, B)
        Io = I
        for j, c in enumerate(icols):
            Io = Io.at[:, c].set(iflat[j])
        push = iflat[13] != 0
        valid_px = iflat[14] != 0
        sm0 = iflat[15]
        sd0 = iflat[16]

        # ---- XLA epilogue: stack col-0 writes + log compaction ---------
        SB, SM, SD = Sk
        at0 = (stack_cols == 0) & push[:, None]
        base_i = root_row[wd.COL_BASE].astype(jnp.int32)
        SB = jnp.where(at0, base_i, SB)
        SM = jnp.where(at0, sm0[:, None], SM)
        SD = jnp.where(at0, sd0[:, None], SD)

        perm = jnp.argsort(jnp.logical_not(valid_px), stable=True)
        pay_c = jnp.take(payload, perm[:log_cap], axis=1)
        logv = jax.lax.dynamic_update_slice(logv, pay_c, (0, wcursor))
        cursor = sout[0]
        wcursor_new = sout[1]
        return Fo, Mo, Wo, Io, (SB, SM, SD), Ao, logv, logp, cursor, \
            wcursor_new

    return boundary
