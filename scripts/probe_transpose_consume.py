"""Probe: kill the post-gather relayout copies by consuming transposed.

The dragon op profile (docs/PERF_NOTES.md round-3 on-chip session) shows
each of the 6 per-iteration row gathers followed by an ~8 us relayout copy
f32[16384,128] {1,0} -> {0,1} (~56 us/iter total): the gather emits
row-major, the elementwise consumers want column-major. But a {1,0} layout
on (B, 128) is BIT-IDENTICAL memory to (128, B) {0,1} — if the consumer
math runs on the TRANSPOSED view (blocks shaped (32, B)/(8, B), per-ray
scalars broadcast along axis 0, winner reduces along axis 0), XLA can
lower the transpose as a bitcast and the copy disappears.

Variants (all one dependent gather chain, B=16384, shapes of the real
slab step: 96 f16-pair AABB cols + unpack + slab test + two reduces):

  baseline   take -> (B, 128), slice (B, 32) blocks  (the shipping form)
  transposed take -> .T -> (128, B), slice (32, B) blocks, reduce axis 0
  gather_ax1 take(table_T, idx, axis=1) -> (128, B) directly

Run on chip: python scripts/probe_transpose_consume.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 16384
ITERS = 64
R = 15017
INF = jnp.float32(3.4e38)
A = 32

F16_MAGIC = jax.lax.bitcast_convert_type(jnp.uint32(0x77800000), jnp.float32)


def f16_bits_to_f32(bits):
    sign = (bits & 0x8000) << 16
    mag = (bits & 0x7FFF) << 13
    return jax.lax.bitcast_convert_type(
        (sign | mag).astype(jnp.uint32), jnp.float32) * F16_MAGIC


def slab(lo, hi, om, inv, axis):
    """om/inv: 3 broadcastable per-ray scalars; lo/hi: 3 blocks each."""
    tn = None
    tf = None
    for c in range(3):
        t1 = (lo[c] - om[c]) * inv[c]
        t2 = (hi[c] - om[c]) * inv[c]
        lo_c, hi_c = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
        tn = lo_c if tn is None else jnp.maximum(tn, lo_c)
        tf = hi_c if tf is None else jnp.minimum(tf, hi_c)
    hit = (tf >= tn) & (tf > 0.0)
    dn = jnp.where(hit, jnp.maximum(tn, 0.0), INF)
    mn = jnp.min(dn, axis=axis)
    am = jnp.argmin(dn, axis=axis).astype(jnp.int32)
    return mn, am


def bench(fn, idx0, tag):
    run = jax.jit(fn)
    out = run(idx0)
    out[1].block_until_ready()
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out = run(idx0)
    out[1].block_until_ready()
    dt = (time.perf_counter() - t0) / (REP * ITERS)
    print(f"{tag:12s} {dt * 1e6:8.1f} us/iter", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    # 128-col rows: col 0 = base idx, cols 16:112 = 96 packed f16-pair cols
    rows = rng.random((R, 128), np.float32)
    base = rng.integers(0, R, R).astype(np.float32)
    rows[:, 0] = base
    rows = jnp.asarray(rows)
    rows_T = jnp.asarray(np.ascontiguousarray(np.asarray(rows).T))
    idx0 = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
    om = [jnp.asarray(rng.random(B).astype(np.float32)) for _ in range(3)]
    dm = [jnp.asarray(rng.random(B).astype(np.float32) + 0.1)
          for _ in range(3)]
    inv = [1.0 / x for x in dm]

    def unpack(cols):
        u = jax.lax.bitcast_convert_type(cols, jnp.uint32)
        return f16_bits_to_f32(u & 0xFFFF), f16_bits_to_f32(u >> 16)

    def baseline(idx0):
        def body(_, c):
            idx, acc = c
            row = jnp.take(rows, idx, axis=0)        # (B, 128)
            lo, hi = unpack(row[:, 16:112])           # (B, 96)
            lo3 = [lo[:, c * A:(c + 1) * A] for c in range(3)]
            hi3 = [hi[:, c * A:(c + 1) * A] for c in range(3)]
            mn, am = slab(lo3, hi3, [x[:, None] for x in om],
                          [x[:, None] for x in inv], axis=1)
            nxt = (row[:, 0].astype(jnp.int32) + am) % R
            return nxt, acc + jnp.where(mn < INF, mn, 0.0)
        return jax.lax.fori_loop(0, ITERS, body, (idx0, jnp.zeros(B)))

    def transposed(idx0):
        def body(_, c):
            idx, acc = c
            row = jnp.take(rows, idx, axis=0).T       # (128, B) view
            lo, hi = unpack(row[16:112, :])            # (96, B)
            lo3 = [lo[c * A:(c + 1) * A, :] for c in range(3)]
            hi3 = [hi[c * A:(c + 1) * A, :] for c in range(3)]
            mn, am = slab(lo3, hi3, [x[None, :] for x in om],
                          [x[None, :] for x in inv], axis=0)
            nxt = (row[0, :].astype(jnp.int32) + am) % R
            return nxt, acc + jnp.where(mn < INF, mn, 0.0)
        return jax.lax.fori_loop(0, ITERS, body, (idx0, jnp.zeros(B)))

    def gather_ax1(idx0):
        def body(_, c):
            idx, acc = c
            row = jnp.take(rows_T, idx, axis=1)       # (128, B) direct
            lo, hi = unpack(row[16:112, :])
            lo3 = [lo[c * A:(c + 1) * A, :] for c in range(3)]
            hi3 = [hi[c * A:(c + 1) * A, :] for c in range(3)]
            mn, am = slab(lo3, hi3, [x[None, :] for x in om],
                          [x[None, :] for x in inv], axis=0)
            nxt = (row[0, :].astype(jnp.int32) + am) % R
            return nxt, acc + jnp.where(mn < INF, mn, 0.0)
        return jax.lax.fori_loop(0, ITERS, body, (idx0, jnp.zeros(B)))

    t_b = bench(baseline, idx0, "baseline")
    t_t = bench(transposed, idx0, "transposed")
    t_g = bench(gather_ax1, idx0, "gather_ax1")
    print(f"transposed speedup: {t_b / t_t:.2f}x   "
          f"gather_ax1 speedup: {t_b / t_g:.2f}x")


if __name__ == "__main__":
    main()
