"""Probe: in-loop dependent gather cost vs row WIDTH and DTYPE.

Decides the round-2 wide-row format: if a 256-f32 (1 KB) or 256-bf16
(512 B) row costs ~the same per fetch as today's 128-f32 (512 B) row,
doubling the row payload (32-ary nodes / 16-tri leaves) halves the
dependent-fetch count for free.

Run on the TPU chip: python scripts/probe_rowwidth.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 16384
STEPS = 64


def bench(R, W, dtype):
    rows = jnp.asarray(
        np.random.default_rng(0).integers(0, R, size=(R, W)), dtype)

    @jax.jit
    def run(idx0):
        def body(_, carry):
            idx, acc = carry
            row = jnp.take(rows, idx, axis=0)
            # dependent next index: derived from the fetched row
            nxt = (row[:, 0].astype(jnp.int32)
                   ^ jax.lax.rem(idx * 1103515245 + 12345, jnp.int32(R)))
            nxt = jax.lax.rem(jnp.abs(nxt), jnp.int32(R))
            return nxt, acc + row[:, 1].astype(jnp.float32)
        idx, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, jnp.zeros(B)))
        return idx, acc

    idx0 = jnp.asarray(np.random.default_rng(1).integers(0, R, size=B),
                       jnp.int32)
    run(idx0)[1].block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(idx0)
    out[1].block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * STEPS)
    bytes_per_row = W * dtype.dtype.itemsize if hasattr(dtype, "dtype") \
        else W * jnp.dtype(dtype).itemsize
    mb = R * bytes_per_row / 1e6
    print(f"R={R:6d} W={W:4d} {jnp.dtype(dtype).name:9s} "
          f"table={mb:7.1f}MB  {dt*1e6:7.1f} us/step  "
          f"{B/dt/1e9:.3f} G rows/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for dtype in (jnp.float32, jnp.bfloat16):
        for W in (128, 256, 512):
            for R in (11520, 23040, 46080):
                bench(R, W, dtype)
        print()
