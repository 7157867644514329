"""Ablate the wide traversal step's cost on the real dragon tables.

Runs 256 dependent iterations over B lanes with variants that strip parts
of the step, isolating: raw gather, +16 slabs, +leaf MT, +stack ops.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def bench(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from bench import dragon_scene
    from ray_tracer_2_tpu.accel import wide as wd
    from ray_tracer_2_tpu.kernels.intersect import INF

    scene = dragon_scene().render_scene
    rows_all = scene.wide_rows
    n_wide = scene.n_wide_rows
    B, K = 16384, 256
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_wide, B).astype(np.int32))
    om = jnp.asarray(rng.random((B, 3)).astype(np.float32))
    dm = jnp.asarray(rng.random((B, 3)).astype(np.float32) + 0.1)

    A = wd.MAX_ARITY
    child_lane = jnp.arange(A, dtype=jnp.int32)[None, :]
    F16_MAGIC = jax.lax.bitcast_convert_type(jnp.uint32(0x77800000),
                                             jnp.float32)

    def f16_bits_to_f32(bits):
        sign = (bits & 0x8000) << 16
        mag = (bits & 0x7FFF) << 13
        return jax.lax.bitcast_convert_type(
            (sign | mag).astype(jnp.uint32), jnp.float32) * F16_MAGIC

    def make(variant):
        # mirrors megakernel.traversal_step's blocked layout (accel/wide.py:
        # COL_CHILD_AABB packed f16 pairs; COL_LEAF_GEO component blocks)
        def step(idx, best):
            row = jnp.take(rows_all, idx, axis=0)
            nxt = row[:, wd.COL_BASE].astype(jnp.int32)
            if variant in ("slabs", "slabs_leaf", "full"):
                inv = 1.0 / dm
                cols = row[:, wd.COL_CHILD_AABB:
                           wd.COL_CHILD_AABB + wd.N_AABB_COLS]
                u = jax.lax.bitcast_convert_type(cols, jnp.uint32)
                lo = f16_bits_to_f32(u & 0xFFFF)
                hi = f16_bits_to_f32(u >> 16)
                t1x = (lo[:, 0:A] - om[:, 0:1]) * inv[:, 0:1]
                t2x = (hi[:, 0:A] - om[:, 0:1]) * inv[:, 0:1]
                t1y = (lo[:, A:2*A] - om[:, 1:2]) * inv[:, 1:2]
                t2y = (hi[:, A:2*A] - om[:, 1:2]) * inv[:, 1:2]
                t1z = (lo[:, 2*A:3*A] - om[:, 2:3]) * inv[:, 2:3]
                t2z = (hi[:, 2*A:3*A] - om[:, 2:3]) * inv[:, 2:3]
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                             jnp.minimum(t1y, t2y)),
                                 jnp.minimum(t1z, t2z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                             jnp.maximum(t1y, t2y)),
                                 jnp.maximum(t1z, t2z))
                hit = (tf >= tn) & (tn < best[:, None]) & (tf > 0.0)
                mask = jnp.sum(hit.astype(jnp.int32) << child_lane, axis=1)
                low = mask & -mask
                nxt = nxt + jax.lax.population_count(jnp.maximum(low - 1, 0))
            if variant in ("slabs_leaf", "full"):
                G = wd.COL_LEAF_GEO
                v0x, v0y, v0z = row[:, G:G+8], row[:, G+8:G+16], \
                    row[:, G+16:G+24]
                e1x, e1y, e1z = row[:, G+24:G+32], row[:, G+32:G+40], \
                    row[:, G+40:G+48]
                e2x, e2y, e2z = row[:, G+48:G+56], row[:, G+56:G+64], \
                    row[:, G+64:G+72]
                nx_, ny_, nz_ = row[:, G+72:G+80], row[:, G+80:G+88], \
                    row[:, G+88:G+96]
                omx, omy, omz = om[:, 0:1], om[:, 1:2], om[:, 2:3]
                dmx, dmy, dmz = dm[:, 0:1], dm[:, 1:2], dm[:, 2:3]
                det8 = -(dmx * nx_ + dmy * ny_ + dmz * nz_)
                keep8 = jnp.abs(det8) >= 1e-8
                inv8 = 1.0 / jnp.where(keep8, det8, 1.0)
                aox, aoy, aoz = omx - v0x, omy - v0y, omz - v0z
                daox = aoy * dmz - aoz * dmy
                daoy = aoz * dmx - aox * dmz
                daoz = aox * dmy - aoy * dmx
                dst8 = (aox * nx_ + aoy * ny_ + aoz * nz_) * inv8
                u8 = (e2x * daox + e2y * daoy + e2z * daoz) * inv8
                v8 = -(e1x * daox + e1y * daoy + e1z * daoz) * inv8
                w8 = 1.0 - u8 - v8
                hit8 = keep8 & (dst8 > 1e-5) & (u8 >= 0.0) & (v8 >= 0.0) \
                    & (w8 >= 0.0) & (dst8 < best[:, None])
                dstw8 = jnp.where(hit8, dst8, INF)
                jstar = jnp.argmin(dstw8, axis=1).astype(jnp.int32)
                best = jnp.where(jnp.any(hit8, axis=1),
                                 jnp.min(dstw8, axis=1), best)
                nxt = nxt + jstar
            if variant == "full":
                # stack-ish ops: 2 one-hot column writes + reads over D=8
                cols = jnp.arange(8, dtype=jnp.int32)[None, :]
                sp = (idx & 7)
                at = cols == sp[:, None]
                stk = jnp.where(at, nxt[:, None], jnp.zeros((B, 8), jnp.int32))
                nxt = nxt + jnp.sum(jnp.where(at, stk, 0), axis=1) % 3
            return nxt % n_wide, best * 0.9999

        def run(idx0):
            def body(_, c):
                return step(*c)
            idx, best = jax.lax.fori_loop(
                0, K, body, (idx0, jnp.full((B,), 1e9, jnp.float32)))
            return idx
        return jax.jit(run)

    for variant in ("gather", "slabs", "slabs_leaf", "full"):
        t = bench(make(variant), idx0)
        print(json.dumps(dict(variant=variant, us_per_step=t / K * 1e6,
                              grows_per_s=B * K / t / 1e9)), flush=True)


if __name__ == "__main__":
    main()
