"""Round-2 TPU microbenchmark probes (run on the real chip).

Measures the primitives that decide the round-2 traversal design:
  sort/argsort/cumsum  -> wavefront binning viability
  standalone gathers   -> compaction cost per treelet round
  dependent gathers    -> super-row (BVH8/16/32) economics vs row width
  one-hot MXU fetch    -> bf16 vs f32 HIGHEST rates at treelet sizes
  pallas probes        -> compile-ability + in-kernel one-hot rate,
                          per-lane gather support re-probe

Each probe prints one JSON line; failures print {"probe": ..., "error": ...}
so a compiler crash doesn't kill the run.
"""
from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20, warmup=2):
    """Times fn(*args). Forces one output element to the host at the end —
    on the remote-relay platform block_until_ready alone has been seen to
    return early for some programs; device_get cannot."""
    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf)

    for _ in range(warmup):
        out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters


def bench_varying(fn, argiter, iters=10, warmup=2):
    """bench() but each call gets the next value from argiter."""
    for _ in range(warmup):
        out = fn(next(argiter))
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(next(argiter))
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def emit(probe, **kw):
    print(json.dumps({"probe": probe, **kw}), flush=True)


def guard(name):
    def deco(f):
        def run():
            # Returns True on success, False on failure — callers that re-run
            # a probe programmatically (scripts/onchip_r4c.py Mosaic
            # re-probes) must not infer success from "no exception raised",
            # because the guard eats the exception by design.
            try:
                f()
                return True
            except Exception as e:
                emit(name, error=f"{type(e).__name__}: {e}"[:300])
                traceback.print_exc(file=sys.stderr)
                return False
        run.__name__ = name
        return run
    return deco


PROBES = []


def probe(name):
    def deco(f):
        PROBES.append(guard(name)(f))
        return f
    return deco


# ------------------------------------------------------------- sorts --
@probe("sort")
def _():
    # keys generated on-device from the seed so every call is distinct work;
    # returns a data-dependent reduction so nothing can be elided.
    for n in (1 << 20, 4 << 20, 16 << 20):
        def f(seed):
            k = jax.random.randint(jax.random.key(seed), (n,), 0, 64,
                                   jnp.int32)
            v = jax.random.randint(jax.random.key(seed + 1), (n,), 0, n,
                                   jnp.int32)
            ks, vs = jax.lax.sort_key_val(k, v)
            return ks[:: 1 << 16].sum() + vs[:: 1 << 16].sum()

        fj = jax.jit(f)
        # subtract the generation-only cost
        gj = jax.jit(lambda seed: (
            jax.random.randint(jax.random.key(seed), (n,), 0, 64, jnp.int32
                               )[:: 1 << 16].sum()
            + jax.random.randint(jax.random.key(seed + 1), (n,), 0, n,
                                 jnp.int32)[:: 1 << 16].sum()))
        seeds = iter(range(1, 10000))
        t = bench_varying(fj, seeds)
        t_gen = bench_varying(gj, seeds)
        emit("sort", n=n, ms=t * 1e3, gen_ms=t_gen * 1e3,
             mkeys_per_s=n / max(t - t_gen, 1e-9) / 1e6)


@probe("argsort_small_range")
def _():
    # binning by treelet id (small key range) with a 4-payload gather after
    n = 4 << 20
    keys = jnp.asarray(np.random.randint(0, 64, n, np.int32))
    payload = jnp.asarray(np.random.rand(n, 4), jnp.float32)

    def f(k, p):
        order = jnp.argsort(k)
        return jnp.take(p, order, axis=0)

    t = bench(jax.jit(f), keys, payload)
    emit("argsort_small_range", n=n, ms=t * 1e3, mkeys_per_s=n / t / 1e6)


@probe("cumsum")
def _():
    for n in (2 << 20, 16 << 20):
        x = jnp.ones((n,), jnp.int32)
        t = bench(jax.jit(jnp.cumsum), x)
        emit("cumsum", n=n, ms=t * 1e3)


# -------------------------------------------- standalone gathers ------
@probe("standalone_gather")
def _():
    # compaction-style: gather R rows of C floats from an N-row table, once
    for (n_rows, batch, width) in ((20480, 1 << 21, 16), (20480, 1 << 21, 52),
                                   (131072, 1 << 22, 16), (20480, 65536, 128)):
        table = jnp.asarray(np.random.rand(n_rows, width), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, n_rows, batch, np.int32))
        f = jax.jit(lambda t_, i: jnp.take(t_, i, axis=0))
        t = bench(f, table, idx)
        emit("standalone_gather", n_rows=n_rows, batch=batch, width=width,
             ms=t * 1e3, grows_per_s=batch / t / 1e9)


# ------------------------------------- dependent gathers vs width -----
@probe("dep_gather_width")
def _():
    B, N, steps = 15360, 16384, 64
    for width in (64, 128, 256, 512, 1024):
        table = jnp.asarray(
            np.random.randint(0, N, (N, width)).astype(np.float32))

        def f(tab, idx0):
            def body(_, idx):
                rows = jnp.take(tab, idx, axis=0)
                return rows[:, 0].astype(jnp.int32) % N
            return jax.lax.fori_loop(0, steps, body, idx0)

        idx0 = jnp.asarray(np.random.randint(0, N, B, np.int32))
        t = bench(jax.jit(f), table, idx0, iters=5)
        emit("dep_gather_width", width_f32=width, bytes_=width * 4,
             us_per_step=t / steps * 1e6,
             grows_per_s=B * steps / t / 1e9)


# ------------------------------------------ one-hot MXU rates ---------
@probe("onehot_rates")
def _():
    B, steps = 15360, 64
    for R in (256, 512, 1024, 2048):
        for C, prec in ((16, "bf16"), (64, "bf16"), (16, "highest"),
                        (64, "highest")):
            tab_f = jnp.asarray(
                np.random.randint(0, R, (R, C)).astype(np.float32))
            tab = tab_f.astype(jnp.bfloat16) if prec == "bf16" else tab_f

            def f(tab, idx0):
                def body(_, idx):
                    oh = (idx[:, None] ==
                          jnp.arange(R, dtype=jnp.int32)[None, :])
                    if prec == "bf16":
                        rows = jnp.dot(oh.astype(jnp.bfloat16), tab,
                                       preferred_element_type=jnp.float32)
                    else:
                        rows = jnp.dot(oh.astype(jnp.float32), tab,
                                       precision=jax.lax.Precision.HIGHEST)
                    return rows[:, 0].astype(jnp.int32) % R
                return jax.lax.fori_loop(0, steps, body, idx0)

            idx0 = jnp.asarray(np.random.randint(0, R, B, np.int32))
            t = bench(jax.jit(f), tab, idx0, iters=5)
            emit("onehot_rates", R=R, C=C, prec=prec,
                 us_per_step=t / steps * 1e6,
                 grows_per_s=B * steps / t / 1e9)


# ------------------------------------------------- pallas probes ------
@probe("pallas_hello")
def _():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((256, 128), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
    t = bench(f, x)
    emit("pallas_hello", ms=t * 1e3, ok=True)


@probe("pallas_onehot_loop")
def _():
    # in-kernel dependent one-hot chain: the VMEM-resident traversal core.
    # B lanes x R-row table, `steps` dependent fetches, all inside one kernel.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = 256
    for (B, R, C, dt) in ((1024, 256, 128, jnp.float32),
                          (1024, 256, 128, jnp.bfloat16),
                          (2048, 512, 128, jnp.bfloat16),
                          (8192, 512, 128, jnp.bfloat16)):
        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]

            def body(_, idx):
                oh = (idx == jax.lax.broadcasted_iota(
                    jnp.int32, (B, R), 1)).astype(dt)
                rows = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
                return rows[:, :1].astype(jnp.int32) % R

            out_ref[:] = jax.lax.fori_loop(
                0, steps, body, idx_ref[:]).astype(jnp.float32)

        tab = jnp.asarray(np.random.randint(0, R, (R, C)).astype(np.float32),
                          dt)
        idx0 = jnp.asarray(np.random.randint(0, R, (B, 1), np.int32))
        f = jax.jit(lambda tab, idx0: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx0))
        t = bench(f, tab, idx0, iters=5)
        emit("pallas_onehot_loop", B=B, R=R, C=C, dtype=str(dt.__name__),
             us_per_step=t / steps * 1e6,
             gfetch_per_s=B * steps / t / 1e9)


@probe("pallas_lane_gather")
def _():
    # re-probe: per-lane dynamic gather along the LANE axis in Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, steps = 1024, 128, 256

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (B, R): per-lane private table slice

        def body(_, idx):
            v = jnp.take_along_axis(tab, idx, axis=1)
            return v.astype(jnp.int32) % R

        out_ref[:] = jax.lax.fori_loop(
            0, steps, body, idx_ref[:]).astype(jnp.float32)

    tab = jnp.asarray(np.random.randint(0, R, (B, R)).astype(np.float32))
    idx0 = jnp.asarray(np.random.randint(0, R, (B, 1), np.int32))
    f = jax.jit(lambda tab, idx0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx0))
    t = bench(f, tab, idx0, iters=5)
    emit("pallas_lane_gather", B=B, R=R, us_per_step=t / steps * 1e6,
         gfetch_per_s=B * steps / t / 1e9)


@probe("pallas_sublane_gather")
def _():
    # re-probe: per-lane row gather along the SUBLANE axis (crashed before)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, C = 256, 512, 128

    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]  # (B, 1)
        out_ref[:] = jnp.take(tab_ref[:], idx[:, 0], axis=0)

    tab = jnp.asarray(np.random.rand(R, C), jnp.float32)
    idx0 = jnp.asarray(np.random.randint(0, R, (B, 1), np.int32))
    f = jax.jit(lambda tab, idx0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx0))
    t = bench(f, tab, idx0, iters=5)
    emit("pallas_sublane_gather", B=B, R=R, ms=t * 1e3,
         grows_per_s=B / t / 1e9, ok=True)


@probe("pallas_dyn_dma")
def _():
    # scalar-prefetch driven per-grid-step block fetch (treelet DMA pattern)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_treelets, rows, C = 64, 256, 128
    n_bins = 128
    table = jnp.asarray(np.random.rand(n_treelets * rows, C), jnp.float32)
    bins = jnp.asarray(np.random.randint(0, n_treelets, n_bins, np.int32))

    def kernel(bins_ref, block_ref, out_ref):
        out_ref[:] = block_ref[:] * 2.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bins,),
        in_specs=[pl.BlockSpec((rows, C), lambda i, bins: (bins[i], 0))],
        out_specs=pl.BlockSpec((rows, C), lambda i, bins: (i, 0)),
    )
    f = jax.jit(lambda bins, table: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_bins * rows, C), jnp.float32),
        grid_spec=grid_spec)(bins, table))
    t = bench(f, bins, table, iters=5)
    gb = n_bins * rows * C * 4 / 1e9
    emit("pallas_dyn_dma", n_bins=n_bins, block_kb=rows * C * 4 // 1024,
         ms=t * 1e3, gb_per_s=gb / t)


if __name__ == "__main__":
    names = sys.argv[1:]
    emit("env", platform=jax.devices()[0].platform,
         device=str(jax.devices()[0]))
    for p in PROBES:
        if names and p.__name__ not in names:
            continue
        t0 = time.perf_counter()
        p()
        emit("done", name=p.__name__, wall_s=time.perf_counter() - t0)
