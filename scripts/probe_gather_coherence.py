"""Probe: gather cost vs index DISTRIBUTION at B=16k, (16k, 128) f32 table.

Questions (round-3, after split/chain probes showed the gather engine issues
rows serially with no op overlap):
  1. repeated: fraction f of indices pinned to row 0 (the masked-lane case
     of a dual top-table/deep-table traversal step) — does the engine charge
     less for repeated rows?
  2. clustered: indices uniform over a window of W consecutive rows (ray
     coherence) — quantifies the locality effect that makes the dragon
     kernel ~2x faster than uniform-random probes.
  3. onehot overlap: does an MXU one-hot fetch (R=324) overlap a dependent
     take chain, or serialize with it?
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

R, C = 16384, 128
B = 16384
STEPS = 32


def bench(fn, *args):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / 5


def chain(table):
    def f(idx_stream):
        acc = jnp.zeros((B,), jnp.float32)
        for s in range(STEPS):
            row = jnp.take(table, idx_stream[s], axis=0)
            acc = acc + row[:, 7]  # consume
        return acc
    return f


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((R, C), np.float32))

    import os
    fracs = () if os.environ.get("SKIP_REPEATED") else \
        (0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    # 1. repeated-zero fraction (independent steps — isolates issue cost)
    for f0 in fracs:
        idx = rng.integers(0, R, (STEPS, B), dtype=np.int32)
        zmask = rng.random((STEPS, B)) < f0
        idx = np.where(zmask, 0, idx)
        dt = bench(chain(table), jnp.asarray(idx))
        us = dt / STEPS * 1e6
        print(json.dumps(dict(probe="repeated0", frac=f0,
                              us_per_step=round(us, 1))), flush=True)

    # 2. clustered window
    for W in (R, 4096, 1024, 256, 64, 16):
        base = rng.integers(0, max(R - W, 1), (STEPS, 1), dtype=np.int32)
        idx = base + rng.integers(0, W, (STEPS, B), dtype=np.int32)
        dt = bench(chain(table), jnp.asarray(idx))
        us = dt / STEPS * 1e6
        print(json.dumps(dict(probe="window", W=W,
                              us_per_step=round(us, 1))), flush=True)

    # 2b. sorted indices (perfectly coherent scan)
    idx = np.sort(rng.integers(0, R, (STEPS, B), dtype=np.int32), axis=1)
    dt = bench(chain(table), jnp.asarray(idx))
    print(json.dumps(dict(probe="sorted",
                          us_per_step=round(dt / STEPS * 1e6, 1))),
          flush=True)

    # 3. one-hot (R=324) alongside the take chain: measure take-only,
    # onehot-only, and both per step
    top = jnp.asarray(rng.random((324, C), np.float32))
    idx = jnp.asarray(rng.integers(0, R, (STEPS, B), dtype=np.int32))
    tidx = jnp.asarray(rng.integers(0, 324, (STEPS, B), dtype=np.int32))
    iota = jnp.arange(324, dtype=jnp.int32)[None, :]

    def take_only(idx_s):
        acc = jnp.zeros((B,), jnp.float32)
        for s in range(STEPS):
            acc = acc + jnp.take(table, idx_s[s], axis=0)[:, 7]
        return acc

    def onehot_only(tidx_s):
        acc = jnp.zeros((B,), jnp.float32)
        for s in range(STEPS):
            oh = (tidx_s[s][:, None] == iota).astype(jnp.float32)
            acc = acc + jnp.dot(oh, top,
                                precision=jax.lax.Precision.HIGHEST)[:, 7]
        return acc

    def both(idx_s, tidx_s):
        acc = jnp.zeros((B,), jnp.float32)
        for s in range(STEPS):
            row = jnp.take(table, idx_s[s], axis=0)
            oh = (tidx_s[s][:, None] == iota).astype(jnp.float32)
            rt = jnp.dot(oh, top, precision=jax.lax.Precision.HIGHEST)
            acc = acc + row[:, 7] + rt[:, 7]
        return acc

    for name, fn, args in (("take_only", take_only, (idx,)),
                           ("onehot324_only", onehot_only, (tidx,)),
                           ("take+onehot", both, (idx, tidx))):
        dt = bench(fn, *args)
        print(json.dumps(dict(probe=name,
                              us_per_step=round(dt / STEPS * 1e6, 1))),
              flush=True)


if __name__ == "__main__":
    main()
