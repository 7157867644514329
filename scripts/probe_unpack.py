"""Probe f16-AABB unpack strategies inside the dependent-gather loop.

Variants (all: one (B,128)-row gather + slab tests + dependent next index):
  f32x16      16 children, f32 AABBs straight from row cols (round-1 format)
  sel         bitcast -> (B,96,2) f16, strided select halves, cast f32
  reshape     bitcast -> (B,96,2) f16, reshape (B,192), cast f32
  intarith    uint32 shift/mask + exponent-fix multiply (no minor-dim
              bitcast, no relayout) -> 32 children
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ray_tracer_2_tpu.kernels.intersect import INF, ray_aabb_dist

B = 16384
ITERS = 64
R = 15017

MAGIC = jnp.asarray(np.uint32(0x77800000)).view(jnp.float32)  # 2^112


def f16_bits_to_f32(bits):
    """f16 bit pattern (uint32, low 16 bits) -> f32 value, elementwise.
    Denormals exact via the exponent-fix multiply; f16 inf maps to 2^143
    (finite but larger than any scene value — fine for box bounds)."""
    sign = (bits & 0x8000) << 16
    mag = (bits & 0x7FFF) << 13
    return jax.lax.bitcast_convert_type(
        (sign | mag).astype(jnp.uint32), jnp.float32) * MAGIC


def bench(step, rows, tag):
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, R, B), jnp.int32)
    om = jnp.asarray(np.random.default_rng(2).random((B, 3)), jnp.float32)
    dm = jnp.asarray(np.random.default_rng(3).random((B, 3)) + 0.1,
                     jnp.float32)
    inv = 1.0 / dm

    @jax.jit
    def run(idx0):
        def body(_, c):
            idx, acc = c
            row = jnp.take(rows, idx, axis=0)
            nxt, hitsum = step(row, om, inv)
            nxt = jax.lax.rem(jnp.abs(nxt ^ idx * 7919), jnp.int32(R))
            return nxt, acc + hitsum
        return jax.lax.fori_loop(0, ITERS, body, (idx0, jnp.zeros(B)))

    out = run(idx0)
    out[1].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(idx0)
    out[1].block_until_ready()
    dt = (time.perf_counter() - t0) / (3 * ITERS)
    print(f"{tag:10s}: {dt*1e6:7.1f} us/step", flush=True)


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.random((R, 128)), jnp.float32)

    def f32x16(row, om, inv):
        nxt = row[:, 12].astype(jnp.int32)
        acc = jnp.zeros(B)
        for c in range(16):
            o = 16 + 6 * c
            dn = ray_aabb_dist(om, inv, row[:, o:o+3], row[:, o+3:o+6],
                               jnp.full((B,), INF))
            acc += (dn < INF)
        return nxt, acc
    bench(f32x16, rows, "f32x16")

    def sel(row, om, inv):
        nxt = row[:, 12].astype(jnp.int32)
        pairs = jax.lax.bitcast_convert_type(row[:, 16:112], jnp.float16)
        lo = pairs[..., 0].astype(jnp.float32)
        hi = pairs[..., 1].astype(jnp.float32)
        acc = jnp.zeros(B)
        for c in range(32):
            o = 3 * c
            dn = ray_aabb_dist(om, inv, lo[:, o:o+3], hi[:, o:o+3],
                               jnp.full((B,), INF))
            acc += (dn < INF)
        return nxt, acc
    bench(sel, rows, "sel")

    def reshape(row, om, inv):
        nxt = row[:, 12].astype(jnp.int32)
        aab = jax.lax.bitcast_convert_type(row[:, 16:112], jnp.float16) \
            .reshape(B, 192).astype(jnp.float32)
        acc = jnp.zeros(B)
        for c in range(32):
            o = 6 * c
            dn = ray_aabb_dist(om, inv, aab[:, o:o+3], aab[:, o+3:o+6],
                               jnp.full((B,), INF))
            acc += (dn < INF)
        return nxt, acc
    bench(reshape, rows, "reshape")

    def intarith(row, om, inv):
        nxt = row[:, 12].astype(jnp.int32)
        u = jax.lax.bitcast_convert_type(row[:, 16:112], jnp.uint32)
        lo = f16_bits_to_f32(u & 0xFFFF)
        hi = f16_bits_to_f32(u >> 16)
        acc = jnp.zeros(B)
        for c in range(32):
            o = 3 * c
            dn = ray_aabb_dist(om, inv, lo[:, o:o+3], hi[:, o:o+3],
                               jnp.full((B,), INF))
            acc += (dn < INF)
        return nxt, acc
    bench(intarith, rows, "intarith")


def blocked_variants():
    """Component-blocked layouts: slab tests as wide (B,K) vector ops
    instead of K narrow (B,3) slices (which waste 125/128 lanes each)."""
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.random((R, 128)), jnp.float32)

    def slab_blocked(minx, miny, minz, maxx, maxy, maxz, om, inv, limit):
        t1x = (minx - om[:, 0:1]) * inv[:, 0:1]
        t2x = (maxx - om[:, 0:1]) * inv[:, 0:1]
        t1y = (miny - om[:, 1:2]) * inv[:, 1:2]
        t2y = (maxy - om[:, 1:2]) * inv[:, 1:2]
        t1z = (minz - om[:, 2:3]) * inv[:, 2:3]
        t2z = (maxz - om[:, 2:3]) * inv[:, 2:3]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        hit = (tf >= tn) & (tn < limit[:, None]) & (tf > 0)
        return hit, tn

    def finish(hit, tn, base):
        K = hit.shape[1]
        shifts = jnp.arange(K, dtype=jnp.int32)[None, :]
        mask = jnp.sum(hit.astype(jnp.int32) << shifts, axis=1)
        dn = jnp.where(hit, tn, INF)
        c_min = jnp.argmin(dn, axis=1).astype(jnp.int32)
        return base + c_min, mask

    def f32x16_blk(row, om, inv):
        base = row[:, 12].astype(jnp.int32)
        b = row[:, 16:112]
        hit, tn = slab_blocked(b[:, 0:16], b[:, 16:32], b[:, 32:48],
                               b[:, 48:64], b[:, 64:80], b[:, 80:96],
                               om, inv, jnp.full((B,), INF))
        nxt, mask = finish(hit, tn, base)
        return nxt, mask.astype(jnp.float32)
    bench(f32x16_blk, rows, "f32x16_blk")

    def f16x32_blk(row, om, inv):
        base = row[:, 12].astype(jnp.int32)
        u = jax.lax.bitcast_convert_type(row[:, 16:112], jnp.uint32)
        lo = f16_bits_to_f32(u & 0xFFFF)   # (B,96): min x|y|z blocks of 32
        hi = f16_bits_to_f32(u >> 16)      # (B,96): max x|y|z blocks of 32
        hit, tn = slab_blocked(lo[:, 0:32], lo[:, 32:64], lo[:, 64:96],
                               hi[:, 0:32], hi[:, 32:64], hi[:, 64:96],
                               om, inv, jnp.full((B,), INF))
        nxt, mask = finish(hit, tn, base)
        return nxt, mask.astype(jnp.float32)
    bench(f16x32_blk, rows, "f16x32_blk")

    def f16x32_blk_sel(row, om, inv):
        base = row[:, 12].astype(jnp.int32)
        pairs = jax.lax.bitcast_convert_type(row[:, 16:112], jnp.float16)
        lo = pairs[..., 0].astype(jnp.float32)
        hi = pairs[..., 1].astype(jnp.float32)
        hit, tn = slab_blocked(lo[:, 0:32], lo[:, 32:64], lo[:, 64:96],
                               hi[:, 0:32], hi[:, 32:64], hi[:, 64:96],
                               om, inv, jnp.full((B,), INF))
        nxt, mask = finish(hit, tn, base)
        return nxt, mask.astype(jnp.float32)
    bench(f16x32_blk_sel, rows, "f16x32blkS")


if __name__ == "__main__":
    if "all" in sys.argv:
        main()
    blocked_variants()
