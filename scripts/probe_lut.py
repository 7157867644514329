"""Round-4 on-chip probes: Mosaic per-lane LUT fetch primitives.

These decide the round-4 structural bet (VERDICT r3 next-round #1): a
whole-path Mosaic kernel for BVH scenes is blocked on per-lane random row
fetch. Mosaic supports per-lane dynamic indexing only within ONE vreg
(128-entry lane LUT / 8-entry sublane LUT, docs/PERF_NOTES.md round-2
re-probe). Composing the two gives a per-lane 1024-entry LUT in 2 gather
ops:

    g[s][l]   = chunk_s[ (idx % 128)[s][l] ]     (lane gather, axis=1)
    out[s][l] = g[ (idx // 128)[s][l] ][l]       (sublane gather, axis=0)

where the (8, 128) source vreg holds table chunk s on sublane s. A 16-ary
wide-BVH's INTERNAL rows for the dragon fit in ~700 rows -> every internal
traversal step could run in-kernel from such LUTs. Leaf geometry (~10k rows)
needs per-block treelet selection (scalar-indexed dynamic slice loads) or an
MXU dense pass. Each probe measures one primitive; together they give the
cost model for the kernel design.

Run on the chip: python scripts/probe_lut.py [probe_name ...]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from probe_r2 import PROBES, bench, emit, probe

_N_INHERITED = len(PROBES)  # probe_r2's own probes: not run from here



def _pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


# ------------------------------------------------- lane gather chain --
@probe("lane_gather_chain")
def _():
    """Dependent chain of same-shape lane gathers (axis=1) at several batch
    shapes. Source = per-sublane 128-entry tables (the exact primitive).
    Dependent (idx_{t+1} derived from fetched value) like real traversal."""
    pl, pltpu = _pallas()
    for rows in (8, 32, 128):  # B = rows*128 lanes
        B = rows * 128
        steps = 512

        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]  # (rows, 128)

            def body(_, idx):
                v = jnp.take_along_axis(tab, idx, axis=1)
                return v.astype(jnp.int32) % 128

            out_ref[:] = jax.lax.fori_loop(
                0, steps, body, idx_ref[:]).astype(jnp.float32)

        tab = jnp.asarray(
            np.random.randint(0, 128, (rows, 128)).astype(np.float32))
        idx0 = jnp.asarray(np.random.randint(0, 128, (rows, 128), np.int32))
        f = jax.jit(lambda tab, idx0: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
        t = bench(f, tab, idx0, iters=5)
        emit("lane_gather_chain", B=B, us_per_step=t / steps * 1e6,
             ns_per_vreg=t / steps / max(rows // 8, 1) * 1e9,
             gfetch_per_s=B * steps / t / 1e9)


# ------------------------------------------- sublane gather (axis=0) --
@probe("sublane_gather_samey")
def _():
    """Same-shape per-lane sublane gather: out[s][l] = tab[idx[s][l]][l],
    idx in [0, 8). The second half of the 1024-LUT recipe."""
    pl, pltpu = _pallas()
    B, steps = 1024, 512

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (8, 128)

        def body(_, idx):
            v = jnp.take_along_axis(tab, idx, axis=0)
            return v.astype(jnp.int32) % 8

        out_ref[:] = jax.lax.fori_loop(
            0, steps, body, idx_ref[:]).astype(jnp.float32)

    tab = jnp.asarray(np.random.randint(0, 8, (8, 128)).astype(np.float32))
    idx0 = jnp.asarray(np.random.randint(0, 8, (8, 128), np.int32))
    f = jax.jit(lambda tab, idx0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
    t = bench(f, tab, idx0, iters=5)
    emit("sublane_gather_samey", B=B, us_per_step=t / steps * 1e6,
         gfetch_per_s=B * steps / t / 1e9)


# --------------------------------------------- two-level 1024 LUT -----
def _lut1024(tab, idx):
    """Per-lane fetch from a 1024-entry table stored as (8, 128) with chunk
    s on sublane s. idx: (8, 128) int32 in [0, 1024)."""
    lo = idx & 127
    hi = idx >> 7
    g = jnp.take_along_axis(tab, lo, axis=1)
    return jnp.take_along_axis(g, hi, axis=0)


def _lut1024_sel(tab, idx):
    """Same but the sublane level via 8 broadcast-compare selects (fallback
    if the axis=0 gather doesn't lower)."""
    lo = idx & 127
    hi = idx >> 7
    g = jnp.take_along_axis(tab, lo, axis=1)
    out = jnp.zeros_like(g)
    for s in range(8):
        out = jnp.where(hi == s, jnp.broadcast_to(g[s:s + 1, :], g.shape),
                        out)
    return out


@probe("lut1024_chain")
def _():
    """Dependent chain of two-level 1024-entry LUT fetches (the internal-
    node fetch primitive), gather and select variants."""
    pl, pltpu = _pallas()
    steps = 512
    for name, lut in (("gather", _lut1024), ("select", _lut1024_sel)):
        def kernel(tab_ref, idx_ref, out_ref, lut=lut):
            tab = tab_ref[:]  # (8, 128) = 1024 entries

            def body(_, idx):
                v = lut(tab, idx)
                return v.astype(jnp.int32) % 1024

            out_ref[:] = jax.lax.fori_loop(
                0, steps, body, idx_ref[:]).astype(jnp.float32)

        tab = jnp.asarray(
            np.random.randint(0, 1024, (8, 128)).astype(np.float32))
        idx0 = jnp.asarray(np.random.randint(0, 1024, (8, 128), np.int32))
        f = jax.jit(lambda tab, idx0: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
        t = bench(f, tab, idx0, iters=5)
        emit("lut1024_chain", variant=name, us_per_step=t / steps * 1e6,
             gfetch_per_s=1024 * steps / t / 1e9)


# ------------------------------------- realistic internal-step fetch --
@probe("lut_row_fetch")
def _():
    """Fetch C columns per lane from a (1024, C) table (stored as C chunked
    (8,128) LUTs) for one vreg-block of 1024 lanes, inside a dependent
    traversal-like loop. C=50 ~ a 16-ary internal row (48 packed f16 box
    cols + base + k). Reports us per full row-fetch step."""
    pl, pltpu = _pallas()
    steps = 128
    for C in (8, 26, 50):
        def kernel(tab_ref, idx_ref, out_ref, C=C):
            tabs = tab_ref[:]  # (C*8, 128)

            def body(_, idx):
                acc = jnp.zeros((8, 128), jnp.float32)
                nxt = jnp.zeros((8, 128), jnp.int32)
                for c in range(C):
                    v = _lut1024(tabs[c * 8:(c + 1) * 8, :], idx)
                    acc = acc + v
                    if c == 0:
                        nxt = v.astype(jnp.int32) % 1024
                # make every fetched column feed the next index
                return (nxt + acc.astype(jnp.int32)) % 1024

            out_ref[:] = jax.lax.fori_loop(
                0, steps, body, idx_ref[:]).astype(jnp.float32)

        tab = jnp.asarray(
            np.random.randint(0, 1024, (C * 8, 128)).astype(np.float32))
        idx0 = jnp.asarray(np.random.randint(0, 1024, (8, 128), np.int32))
        f = jax.jit(lambda tab, idx0: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
        t = bench(f, tab, idx0, iters=5)
        emit("lut_row_fetch", C=C, us_per_step=t / steps * 1e6,
             us_per_col=t / steps / C * 1e6)


# ------------------------- scalar-selected treelet activation cost ----
@probe("scalar_treelet_select")
def _():
    """Per-block leaf-treelet activation: vector min over active lane ids ->
    scalar -> dynamic-slice load of that treelet's column vregs -> per-lane
    LUT gathers. Measures the vector->scalar->load turnaround that a
    per-block treelet scheduler would pay every leaf step.

    Table: N_TREELETS treelets x C columns, each column an (8,128) LUT
    (1024 rows per treelet)."""
    pl, pltpu = _pallas()
    steps, C, NT = 128, 12, 16

    def kernel(tab_ref, idx_ref, out_ref):
        def body(_, carry):
            idx = carry  # (8, 128) in [0, NT*1024)
            tid = jnp.min(idx) >> 10          # scalar treelet id
            local = idx & 1023
            acc = jnp.zeros((8, 128), jnp.float32)
            for c in range(C):
                col = tab_ref[pl.ds(tid * (C * 8) + c * 8, 8), :]
                acc = acc + _lut1024(col, local)
            return (idx + acc.astype(jnp.int32) + 1) % (NT * 1024)

        out_ref[:] = jax.lax.fori_loop(
            0, steps, body, idx_ref[:]).astype(jnp.float32)

    tab = jnp.asarray(
        np.random.randint(0, 3, (NT * C * 8, 128)).astype(np.float32))
    idx0 = jnp.asarray(
        np.random.randint(0, NT * 1024, (8, 128), np.int32))
    f = jax.jit(lambda tab, idx0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
    t = bench(f, tab, idx0, iters=5)
    emit("scalar_treelet_select", C=C, n_treelets=NT,
         us_per_step=t / steps * 1e6)


# ----------------------------------- MXU dense leaf-test alternative --
@probe("mxu_leaf_dense")
def _():
    """In-kernel (1024, K) x (K, T) matmul chain: the cost of one dense
    Moller-Trumbore treelet pass (ray features x tri features) per block.
    f32 and bf16 variants; K=16 features, T tris per treelet."""
    pl, pltpu = _pallas()
    steps = 64
    for dt, prec in ((jnp.float32, jax.lax.Precision.HIGHEST),
                     (jnp.bfloat16, jax.lax.Precision.DEFAULT)):
        for T in (128, 512):
            def kernel(rays_ref, tris_ref, out_ref, dt=dt, prec=prec, T=T):
                rays = rays_ref[:]   # (1024, 16)
                tris = tris_ref[:]   # (16, T)

                def body(_, acc):
                    prod = jnp.dot(rays + acc[:, :16].astype(dt), tris,
                                   precision=prec,
                                   preferred_element_type=jnp.float32)
                    return prod[:, :16].astype(dt) * 0.5

                out_ref[:] = jax.lax.fori_loop(
                    0, steps, body,
                    jnp.zeros((1024, 16), dt)).astype(jnp.float32)

            rays = jnp.asarray(np.random.rand(1024, 16), dt)
            tris = jnp.asarray(np.random.rand(16, T), dt)
            f = jax.jit(lambda rays, tris: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1024, 16), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(rays, tris))
            t = bench(f, rays, tris, iters=5)
            emit("mxu_leaf_dense", dtype=dt.__name__, T=T,
                 us_per_step=t / steps * 1e6,
                 g_raytri_per_s=1024 * T * steps / t / 1e9)


# -------------------------------- compile viability: big fetch body ---
@probe("big_body_compile")
def _():
    """A loop body with a full 50-col LUT row fetch + slab-test-scale
    arithmetic at one vreg block: does Mosaic swallow it, and total cost."""
    pl, pltpu = _pallas()
    steps, C = 64, 50

    def kernel(tab_ref, idx_ref, out_ref):
        tabs = tab_ref[:]

        def body(_, carry):
            idx, best = carry
            cols = []
            for c in range(C):
                cols.append(_lut1024(tabs[c * 8:(c + 1) * 8, :], idx))
            # slab-test-scale arithmetic: ~6 ops per column fetched
            tmin = jnp.full((8, 128), -3e38)
            tmax = jnp.full((8, 128), 3e38)
            for c in range(0, C - 2, 2):
                t1 = (cols[c] - best) * 0.5
                t2 = (cols[c + 1] - best) * 0.5
                tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
                tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
            hit = (tmax >= tmin).astype(jnp.float32)
            nxt = (cols[0].astype(jnp.int32) + idx) % 1024
            return nxt, best + hit * 0.25

        idx, best = jax.lax.fori_loop(
            0, steps, body, (idx_ref[:], jnp.zeros((8, 128), jnp.float32)))
        out_ref[:] = best + idx.astype(jnp.float32)

    tab = jnp.asarray(
        np.random.randint(0, 1024, (C * 8, 128)).astype(np.float32))
    idx0 = jnp.asarray(np.random.randint(0, 1024, (8, 128), np.int32))
    f = jax.jit(lambda tab, idx0: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() == "cpu")(tab, idx0))
    t = bench(f, tab, idx0, iters=5)
    emit("big_body_compile", C=C, us_per_step=t / steps * 1e6)


if __name__ == "__main__":
    want = set(sys.argv[1:])
    for p in PROBES[_N_INHERITED:]:
        if not want or p.__name__ in want:
            p()
