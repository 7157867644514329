"""Probe #2: traversal-shaped Pallas kernel rates (real chip).

Measures the exact primitives of the planned treelet traversal kernel:
  launch      pallas_call fixed overhead
  trav        dependent one-hot node fetch chain + AABB-ish VPU math,
              table dynamic-sliced from a stacked VMEM array, at several
              (B lanes, R treelet rows)
  sched       same + histogram/argmax demand scheduling every 8 steps
  leaf        split-bf16 (hi+mid) 2-dot leaf fetch + 8x Moller-Trumbore VPU
  grid        chunked grid variant: per-chunk state in/out via BlockSpec
              (does pipelining hide the state DMA?)
"""
from __future__ import annotations

import functools
import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench(fn, *args, iters=10, warmup=2):
    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return jax.device_get(leaf.ravel()[0])
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def guarded(name, fn):
    try:
        fn()
    except Exception as e:
        emit(probe=name, error=f"{type(e).__name__}: {e}"[:300])
        traceback.print_exc(file=sys.stderr)


# ---------------------------------------------------------------- launch --
def p_launch():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    t = bench(f, x, iters=50)
    emit(probe="launch", ms_per_call=t * 1e3)


# ------------------------------------------------------------------ trav --
def make_trav(B, R, T, K, sched_every=0, seed=0):
    """Dependent chain: fetch row (one-hot from a dynamically sliced table),
    ~AABB VPU math, next local index from the row. Table switch every
    `sched_every` steps via histogram+argmax over lane treelet ids
    (0 = fixed table, no scheduling)."""
    C = 16

    def kernel(tabs_ref, idx_ref, tid_ref, out_ref):
        def fetch(t, idx):
            tab = tabs_ref[pl.ds(pl.multiple_of(t * R, R), R), :]
            oh = (idx == jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                  ).astype(jnp.bfloat16)
            return jnp.dot(oh, tab, preferred_element_type=jnp.float32)

        def body(k, carry):
            idx, tid, acc = carry
            if sched_every:
                # demand scheduling: most-populated treelet
                ohT = (tid == jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
                       ).astype(jnp.float32)
                hist = jnp.sum(ohT, axis=0)
                t = jnp.argmax(hist).astype(jnp.int32)
            else:
                t = jnp.int32(0)
            row = fetch(t, idx)
            # ~AABB slab math (12 muls, mins/maxs, compares) on the VPU
            near = row[:, 0:3] * acc[:, 0:3] - row[:, 3:6] * acc[:, 0:3]
            far = row[:, 6:9] * acc[:, 0:3] - row[:, 9:12] * acc[:, 0:3]
            tn = jnp.max(jnp.minimum(near, far), axis=1, keepdims=True)
            tf = jnp.min(jnp.maximum(near, far), axis=1, keepdims=True)
            hit = (tf >= tn) & (tn < acc[:, 3:4])
            nxt = jnp.where(hit, row[:, 12:13], row[:, 13:14])
            idx = nxt.astype(jnp.int32) % R
            if sched_every:
                tid = (tid + (row[:, 14:15].astype(jnp.int32) % 3)) % T
            acc = jnp.concatenate([acc[:, 0:3], acc[:, 3:4] + 0.001], axis=1)
            return idx, tid, acc

        idx = idx_ref[:]
        tid = tid_ref[:]
        acc = jnp.concatenate(
            [jnp.full((B, 3), 0.5, jnp.float32),
             jnp.full((B, 1), 1e9, jnp.float32)], axis=1)
        idx, tid, acc = jax.lax.fori_loop(0, K, body, (idx, tid, acc))
        out_ref[:] = idx.astype(jnp.float32) + acc[:, 3:4]

    rng = np.random.default_rng(seed)
    tabs = jnp.asarray(rng.integers(0, R, (T * R, C)).astype(np.float32),
                       jnp.bfloat16)
    idx0 = jnp.asarray(rng.integers(0, R, (B, 1)).astype(np.int32))
    tid0 = jnp.asarray(rng.integers(0, T, (B, 1)).astype(np.int32))
    f = jax.jit(lambda tabs, idx0, tid0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tabs, idx0, tid0))
    return f, (tabs, idx0, tid0)


def p_trav():
    K = 256
    for B, R in ((1024, 64), (8192, 64), (32768, 64), (8192, 128),
                 (8192, 256)):
        T = max(20480 // R, 1)
        f, args = make_trav(B, R, T, K)
        t = bench(f, *args, iters=5)
        emit(probe="trav", B=B, R=R, us_per_step=t / K * 1e6,
             gvisit_per_s=B * K / t / 1e9)


def p_sched():
    K = 256
    for B, R, T in ((8192, 64, 320), (8192, 64, 64), (32768, 64, 320)):
        f, args = make_trav(B, R, T, K, sched_every=1)
        t = bench(f, *args, iters=5)
        emit(probe="sched", B=B, R=R, T=T, us_per_step=t / K * 1e6,
             gvisit_per_s=B * K / t / 1e9)


# ------------------------------------------------------------------ leaf --
def p_leaf():
    B, R, K = 8192, 64, 128
    C = 128  # split leaf row: 8 tris x 9 coords = 72 cols per half

    def kernel(hi_ref, mid_ref, idx_ref, o_ref, d_ref, out_ref):
        def body(k, carry):
            idx, best = carry
            oh = (idx == jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                  ).astype(jnp.bfloat16)
            row = (jnp.dot(oh, hi_ref[:], preferred_element_type=jnp.float32)
                   + jnp.dot(oh, mid_ref[:],
                             preferred_element_type=jnp.float32))
            o, d = o_ref[:], d_ref[:]

            def cross(ax, ay, az, bx, by, bz):
                return (ay * bz - az * by, az * bx - ax * bz,
                        ax * by - ay * bx)

            ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
            dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
            for j in range(8):
                s = j * 9
                v0x, v0y, v0z = row[:, s:s+1], row[:, s+1:s+2], row[:, s+2:s+3]
                v1x, v1y, v1z = row[:, s+3:s+4], row[:, s+4:s+5], row[:, s+5:s+6]
                v2x, v2y, v2z = row[:, s+6:s+7], row[:, s+7:s+8], row[:, s+8:s+9]
                e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
                e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
                nx, ny, nz = cross(e1x, e1y, e1z, e2x, e2y, e2z)
                aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
                dax, day, daz = cross(aox, aoy, aoz, dx, dy, dz)
                det = -(dx * nx + dy * ny + dz * nz)
                inv = 1.0 / jnp.where(jnp.abs(det) > 1e-8, det, 1.0)
                dst = (aox * nx + aoy * ny + aoz * nz) * inv
                u = (e2x * dax + e2y * day + e2z * daz) * inv
                v = -(e1x * dax + e1y * day + e1z * daz) * inv
                ok = (dst > 1e-5) & (u >= 0) & (v >= 0) & (u + v <= 1)
                best = jnp.where(ok & (dst < best), dst, best)
            idx = (idx + best.astype(jnp.int32) % 7 + 1) % R
            return idx, best
        idx, best = jax.lax.fori_loop(
            0, K, body, (idx_ref[:], jnp.full((B, 1), 1e9, jnp.float32)))
        out_ref[:] = best + idx.astype(jnp.float32)

    rng = np.random.default_rng(0)
    base = rng.random((R, C)).astype(np.float32)
    hi = jnp.asarray(base, jnp.bfloat16)
    mid = jnp.asarray(base - np.asarray(hi, np.float32), jnp.bfloat16)
    idx0 = jnp.asarray(rng.integers(0, R, (B, 1)).astype(np.int32))
    o = jnp.asarray(rng.random((B, 3)).astype(np.float32))
    d = jnp.asarray(rng.random((B, 3)).astype(np.float32))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*a))
    t = bench(f, hi, mid, idx0, o, d, iters=5)
    emit(probe="leaf", B=B, R=R, us_per_step=t / K * 1e6,
         gleaf_per_s=B * K / t / 1e9)


# ------------------------------------------------------------------ grid --
def p_grid():
    """Chunked persistent state: grid over chunks, chunk state streamed via
    BlockSpec, K steps per chunk against a VMEM table stack."""
    Bc, R, T, K, n_chunks = 1024, 64, 320, 64, 64
    C = 16

    def kernel(tabs_ref, st_ref, out_ref):
        def body(k, idx):
            tab = tabs_ref[pl.ds(0, R), :]
            oh = (idx == jax.lax.broadcasted_iota(jnp.int32, (Bc, R), 1)
                  ).astype(jnp.bfloat16)
            row = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            return row[:, 12:13].astype(jnp.int32) % R
        idx = st_ref[:, :1].astype(jnp.int32)
        idx = jax.lax.fori_loop(0, K, body, idx)
        out_ref[:] = st_ref[:] + idx.astype(jnp.float32)

    rng = np.random.default_rng(0)
    tabs = jnp.asarray(rng.integers(0, R, (T * R, C)).astype(np.float32),
                       jnp.bfloat16)
    state = jnp.asarray(rng.integers(0, R, (n_chunks * Bc, 16)
                                     ).astype(np.float32))
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((T * R, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bc, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(lambda tabs, st: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        grid_spec=grid_spec)(tabs, st))
    t = bench(f, tabs, state, iters=5)
    emit(probe="grid", chunks=n_chunks, Bc=Bc, K=K, ms=t * 1e3,
         gvisit_per_s=n_chunks * Bc * K / t / 1e9)


if __name__ == "__main__":
    emit(probe="env", device=str(jax.devices()[0]))
    for name, fn in [("launch", p_launch), ("trav", p_trav),
                     ("sched", p_sched), ("leaf", p_leaf), ("grid", p_grid)]:
        t0 = time.perf_counter()
        guarded(name, fn)
        emit(probe="wall", name=name, s=time.perf_counter() - t0)
