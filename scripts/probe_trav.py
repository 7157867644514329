"""Probe #2 (v2): traversal-shaped Pallas kernel rates (real chip).

v1 lesson: (B,3)-shaped math forces pathological tiling/relayouts in Mosaic
(29 us/step at B=1024). v2 keeps ALL per-lane math in (B,128) slot layout:
the fetched row IS the compute operand; slab terms come from precomputed
(B,128) IV/OFF maps; cross-slot mins use static non-negative rolls.

  launch  pallas_call fixed overhead
  trav    one-hot node fetch from a dynamically sliced table + slot-layout
          slab math + link select, dependent chain
  sched   + histogram/argmax table scheduling every step
  leaf    split-bf16 (hi+mid) 2-dot fetch + ~720 slot-ops of MT-proxy math
"""
from __future__ import annotations

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
        emit(probe=name, error=f"{type(e).__name__}: {e}"[:250])
        traceback.print_exc(file=sys.stderr)


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


def make_trav(B, R, T, K, sched=False):
    C = 128  # node row width in lanes (only ~16 slots meaningful)

    def kernel(tabs_ref, iv_ref, off_ref, idx_ref, tid_ref, out_ref):
        iv = iv_ref[:]
        off = off_ref[:]

        def body(k, carry):
            idx, tid, tbest = carry
            if sched:
                ohT = (tid == jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
                       ).astype(jnp.float32)
                hist = jnp.sum(ohT, axis=0)
                t = jnp.argmax(hist).astype(jnp.int32)
            else:
                t = jnp.int32(0)
            tab = tabs_ref[pl.ds(pl.multiple_of(t * R, R), R), :]
            oh = (idx == jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                  ).astype(jnp.bfloat16)
            row = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
            # slab test entirely in (B,128) slot space
            tt = row * iv + off
            tmin = jnp.minimum(tt, pltpu.roll(tt, 3, 1))
            tmax = jnp.maximum(tt, pltpu.roll(tt, 3, 1))
            tn = jnp.maximum(jnp.maximum(tmin, pltpu.roll(tmin, 1, 1)),
                             pltpu.roll(tmin, 2, 1))
            tf = jnp.minimum(jnp.minimum(tmax, pltpu.roll(tmax, 1, 1)),
                             pltpu.roll(tmax, 2, 1))
            hit = (tf >= tn) & (tn < tbest)
            nxt = jnp.where(hit[:, 0:1], row[:, 12:13], row[:, 13:14])
            idx = nxt.astype(jnp.int32) % R
            if sched:
                tid = (tid + (row[:, 14:15].astype(jnp.int32) & 3)) % T
            tbest = tbest * 0.9999
            return idx, tid, tbest

        idx, tid, tbest = jax.lax.fori_loop(
            0, K, body,
            (idx_ref[:], tid_ref[:], jnp.full((B, 128), 1e9, jnp.float32)))
        out_ref[:] = idx.astype(jnp.float32) + tbest[:, 0:1]

    rng = np.random.default_rng(0)
    tabs = jnp.asarray(rng.integers(0, R, (T * R, C)).astype(np.float32),
                       jnp.bfloat16)
    iv = jnp.asarray(rng.random((B, C)).astype(np.float32))
    off = jnp.asarray(rng.random((B, C)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, (B, 1)).astype(np.int32))
    tid0 = jnp.asarray(rng.integers(0, T, (B, 1)).astype(np.int32))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*a))
    return f, (tabs, iv, off, idx0, tid0)


def p_trav():
    K = 256
    for B, R in ((1024, 64), (4096, 64), (8192, 64), (8192, 128),
                 (16384, 64)):
        T = max(20480 // R, 1)
        f, args = make_trav(B, R, T, K)
        t = bench(f, *args, iters=5)
        emit(probe="trav", B=B, R=R, us_per_step=t / K * 1e6,
             gvisit_per_s=B * K / t / 1e9)


def p_sched():
    K = 256
    for B, R, T in ((8192, 64, 320), (16384, 64, 320)):
        f, args = make_trav(B, R, T, K, sched=True)
        t = bench(f, *args, iters=5)
        emit(probe="sched", B=B, R=R, T=T, us_per_step=t / K * 1e6,
             gvisit_per_s=B * K / t / 1e9)


def p_leaf():
    B, R, K = 8192, 64, 128

    def kernel(hi_ref, mid_ref, iv_ref, idx_ref, out_ref):
        iv = iv_ref[:]

        def body(k, carry):
            idx, best = carry
            oh = (idx == jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                  ).astype(jnp.bfloat16)
            row = (jnp.dot(oh, hi_ref[:], preferred_element_type=jnp.float32)
                   + jnp.dot(oh, mid_ref[:],
                             preferred_element_type=jnp.float32))
            # MT proxy: ~6 rounds of mul/roll/select in slot space
            acc = row * iv
            for _ in range(6):
                acc = jnp.minimum(acc * iv + row,
                                  pltpu.roll(acc, 3, 1))
            best = jnp.minimum(best, acc)
            idx = (best[:, 0:1].astype(jnp.int32) & 63)
            return idx, best

        idx, best = jax.lax.fori_loop(
            0, K, body, (idx_ref[:], jnp.full((B, 128), 1e9, jnp.float32)))
        out_ref[:] = best[:, 0:1] + idx.astype(jnp.float32)

    rng = np.random.default_rng(0)
    base = rng.random((R, 128)).astype(np.float32)
    hi = jnp.asarray(base, jnp.bfloat16)
    mid = jnp.asarray(base - np.asarray(hi, np.float32), jnp.bfloat16)
    iv = jnp.asarray(rng.random((B, 128)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, (B, 1)).astype(np.int32))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*a))
    t = bench(f, hi, mid, iv, idx0, iters=5)
    emit(probe="leaf", B=B, R=R, us_per_step=t / K * 1e6,
         gleaf_per_s=B * K / t / 1e9)


if __name__ == "__main__":
    emit(probe="env", device=str(jax.devices()[0]))
    for name, fn in [("launch", p_launch), ("trav", p_trav),
                     ("sched", p_sched), ("leaf", p_leaf)]:
        t0 = time.perf_counter()
        guarded(name, fn)
        emit(probe="wall", name=name, s=time.perf_counter() - t0)
