"""Probe: does splitting one dependent-chain row gather into N PARALLEL
sub-gathers (lane partitions) cut per-step latency?

Context (docs/PERF_NOTES.md round-3): one gather op issues rows serially at
~86 M rows/s; N INDEPENDENT chains overlap to ~273 M rows/s at 8 chains.
Lane i's next row depends only on lane i's current row, so a traversal
step's single (B,)-row gather can be split into N independent sub-gathers
joined by concat — if XLA schedules them concurrently, the step latency
approaches B/N rows' issue time + fixed latency, bit-exactly.

Also re-probes the aggregate ceiling at 12/16/24/32 independent chains
(round-3 probes stopped at 8 = 273 M rows/s, still rising).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

R, C = 16384, 128      # ~8 MB table (dragon-class)
B = 16384
STEPS = 64


def bench(fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / 5


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((R, C), np.float32))
    idx0 = jnp.asarray(rng.integers(0, R, B, dtype=np.int32))

    def step_idx(row):
        # next index depends on the fetched row (dependent chain)
        return (jnp.abs(row[:, 7]) * R).astype(jnp.int32) % R

    def chain_split(n_split):
        h = B // n_split

        def f(idx):
            for _ in range(STEPS):
                parts = [jnp.take(table, idx[i * h:(i + 1) * h], axis=0)
                         for i in range(n_split)]
                row = jnp.concatenate(parts, axis=0) if n_split > 1 \
                    else parts[0]
                idx = step_idx(row)
            return idx
        return f

    for n in (1, 2, 4, 8, 16):
        dt = bench(chain_split(n), idx0)
        us = dt / STEPS * 1e6
        print(json.dumps(dict(probe="split", n_split=n,
                              us_per_step=round(us, 1),
                              mrows_s=round(B / us, 1))), flush=True)

    # aggregate ceiling: n fully independent chains, B rows each
    def chains(n):
        def f(idxs):
            idxs = list(idxs)
            for _ in range(STEPS):
                for i in range(n):
                    row = jnp.take(table, idxs[i], axis=0)
                    idxs[i] = step_idx(row)
            return tuple(idxs)
        return f

    for n in (8, 12, 16, 24, 32):
        idxs = tuple(jnp.asarray(rng.integers(0, R, B, dtype=np.int32))
                     for _ in range(n))
        dt = bench(chains(n), idxs)
        us = dt / STEPS * 1e6
        print(json.dumps(dict(probe="chains", n=n,
                              us_per_step=round(us, 1),
                              agg_mrows_s=round(B * n / us, 1))), flush=True)

    # small-B latency floor: one dependent chain at shrinking B
    for b in (16384, 8192, 4096, 2048, 1024):
        ii = jnp.asarray(rng.integers(0, R, b, dtype=np.int32))

        def f(idx):
            for _ in range(STEPS):
                row = jnp.take(table, idx, axis=0)
                idx = step_idx(row)
            return idx
        dt = bench(f, ii)
        us = dt / STEPS * 1e6
        print(json.dumps(dict(probe="latency", B=b,
                              us_per_step=round(us, 1),
                              mrows_s=round(b / us, 1))), flush=True)


if __name__ == "__main__":
    main()
