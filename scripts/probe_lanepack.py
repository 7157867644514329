"""Probe: VPU lane occupancy of the slab/leaf blocks — narrow vs packed.

The shipping traversal step computes slab tests as (B, 32) blocks and leaf
Möller–Trumbore as (B, 8) blocks; with f32 tiling (8, 128) those use 32 and
8 of 128 lanes per vreg (docs/PERF_NOTES.md round-3 profile: ~175 us VPU
arithmetic). A row-major reshape (B, C) -> (B/(128/C), 128) preserves linear
element order (b*C + c invariant), so the same elementwise math can run at
full lane occupancy at the cost of: one relayout per input block, a
repeat-expansion per per-ray scalar, and one relayout back before the winner
extraction. This probe measures both variants on a dependent-gather chain
shaped like the real loop to decide whether a packed slab/leaf variant is
worth building:

  narrow32 / packed32   slab-test analog   (~20 elementwise ops, 6 blocks)
  narrow8  / packed8    leaf-test analog   (~25 elementwise ops, 9 blocks)

Run on chip: python scripts/probe_lanepack.py
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


def tourney_min(dn):
    """Reduction-free first-index min over axis 1 (power-of-two width)."""
    idx = jnp.broadcast_to(jnp.arange(dn.shape[1], dtype=jnp.int32)[None, :],
                           dn.shape)
    w = dn.shape[1]
    while w > 1:
        h = w // 2
        take_l = dn[:, :h] <= dn[:, h:w]
        dn = jnp.where(take_l, dn[:, :h], dn[:, h:w])
        idx = jnp.where(take_l, idx[:, :h], idx[:, h:w])
        w = h
    return dn[:, 0], idx[:, 0]


def slab_math(lox, loy, loz, hix, hiy, hiz, om, inv):
    """~20 elementwise ops, shapes all equal (any layout)."""
    t1x = (lox - om[0]) * inv[0]
    t2x = (hix - om[0]) * inv[0]
    t1y = (loy - om[1]) * inv[1]
    t2y = (hiy - om[1]) * inv[1]
    t1z = (loz - om[2]) * inv[2]
    t2z = (hiz - om[2]) * inv[2]
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                 jnp.minimum(t1y, t2y)),
                     jnp.minimum(t1z, t2z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                 jnp.maximum(t1y, t2y)),
                     jnp.maximum(t1z, t2z))
    hit = (tn <= tf) & (tf > 0.0)
    return jnp.where(hit, jnp.maximum(tn, 0.0), INF)


def leaf_math(cols, o, d):
    """Möller–Trumbore-weight analog: 9 geometry blocks, ~25 ops."""
    e1x, e1y, e1z, e2x, e2y, e2z, v0x, v0y, v0z = cols
    px = d[1] * e2z - d[2] * e2y
    py = d[2] * e2x - d[0] * e2z
    pz = d[0] * e2y - d[1] * e2x
    det = e1x * px + e1y * py + e1z * pz
    tx = o[0] - v0x
    ty = o[1] - v0y
    tz = o[2] - v0z
    u = (tx * px + ty * py + tz * pz) / det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d[0] * qx + d[1] * qy + d[2] * qz) / det
    dst = (e2x * qx + e2y * qy + e2z * qz) / det
    ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (dst > 1e-5)
    return jnp.where(ok, dst, INF)


def pack(a, C):
    return a.reshape(B // (128 // C), 128)


def expand_scalar(s, C):
    """(B,) per-ray scalar -> packed (B/(128/C), 128), value repeated C x."""
    g = 128 // C
    return jnp.repeat(s.reshape(B // g, g), C, axis=1)


def bench(step, rows, tag):
    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, R, B), jnp.int32)
    om = [jnp.asarray(np.random.default_rng(10 + i).random(B), jnp.float32)
          for i in range(3)]
    dm = [jnp.asarray(np.random.default_rng(20 + i).random(B) + 0.1,
                      jnp.float32) for i in range(3)]
    inv = [1.0 / x for x in dm]

    @jax.jit
    def run(idx0):
        def body(_, c):
            idx, acc = c
            row = jnp.take(rows, idx, axis=0)
            mn, win = step(row, om, inv)
            nxt = jax.lax.rem(jnp.abs(win * 7919 + idx), jnp.int32(R))
            return nxt, acc + jnp.where(mn < INF, mn, 0.0)
        return jax.lax.fori_loop(0, ITERS, body, (idx0, jnp.zeros(B)))

    out = run(idx0)
    out[1].block_until_ready()
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        out = run(idx0)
    out[1].block_until_ready()
    dt = (time.perf_counter() - t0) / (REP * ITERS)
    print(f"{tag:10s} {dt * 1e6:8.1f} us/iter")
    return dt


def step_narrow32(row, om, inv):
    blk = [row[:, i * 32:(i + 1) * 32] for i in range(6)]
    dn = slab_math(*blk, [x[:, None] for x in om], [x[:, None] for x in inv])
    return tourney_min(dn)


def step_packed32(row, om, inv):
    blk = [pack(row[:, i * 32:(i + 1) * 32], 32) for i in range(6)]
    omp = [expand_scalar(x, 32) for x in om]
    invp = [expand_scalar(x, 32) for x in inv]
    dn = slab_math(*blk, omp, invp)
    return tourney_min(dn.reshape(B, 32))


def step_narrow8(row, om, inv):
    cols = [row[:, i * 8:(i + 1) * 8] for i in range(9)]
    dn = leaf_math(cols, [x[:, None] for x in om],
                   [x[:, None] for x in inv])
    return tourney_min(dn)


def step_packed8(row, om, inv):
    cols = [pack(row[:, i * 8:(i + 1) * 8], 8) for i in range(9)]
    omp = [expand_scalar(x, 8) for x in om]
    invp = [expand_scalar(x, 8) for x in inv]
    dn = leaf_math(cols, omp, invp)
    return tourney_min(dn.reshape(B, 8))


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    rows192 = jnp.asarray(rng.random((R, 192)), jnp.float32)
    rows72 = jnp.asarray(rng.random((R, 72)) * 2 - 1, jnp.float32)
    t_n32 = bench(step_narrow32, rows192, "narrow32")
    t_p32 = bench(step_packed32, rows192, "packed32")
    t_n8 = bench(step_narrow8, rows72, "narrow8")
    t_p8 = bench(step_packed8, rows72, "packed8")
    print(f"packed32 speedup: {t_n32 / t_p32:.2f}x   "
          f"packed8 speedup: {t_n8 / t_p8:.2f}x")


if __name__ == "__main__":
    main()
