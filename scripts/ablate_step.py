"""Ablate the wide traversal step's cost on the real dragon tables.

Runs 256 dependent iterations over B lanes with variants that strip parts
of the step, isolating: raw gather, +16 slabs, +leaf MT, +stack ops.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def bench(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from bench import dragon_scene
    from ray_tracer_2_tpu.accel import wide as wd
    from ray_tracer_2_tpu.kernels.intersect import INF, ray_aabb_dist, \
        ray_triangle

    scene = dragon_scene().render_scene
    rows_all = scene.wide_rows
    n_wide = scene.n_wide_rows
    B, K = 16384, 256
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n_wide, B).astype(np.int32))
    om = jnp.asarray(rng.random((B, 3)).astype(np.float32))
    dm = jnp.asarray(rng.random((B, 3)).astype(np.float32) + 0.1)

    def make(variant):
        def step(idx, best):
            row = jnp.take(rows_all, idx, axis=0)  # octant 0
            nxt = row[:, wd.COL_BASE].astype(jnp.int32)
            if variant in ("slabs", "slabs_leaf", "full"):
                inv = 1.0 / dm
                mask = jnp.zeros((B,), jnp.int32)
                for c in range(16):
                    o = wd.COL_CHILD_AABB + 6 * c
                    dn = ray_aabb_dist(om, inv, row[:, o:o + 3],
                                       row[:, o + 3:o + 6], best)
                    mask = mask | ((dn < INF).astype(jnp.int32) << c)
                low = mask & -mask
                nxt = nxt + jax.lax.population_count(jnp.maximum(low - 1, 0))
            if variant in ("slabs_leaf", "full"):
                bt = jnp.zeros((B,), jnp.int32)
                for j in range(8):
                    o = wd.COL_TRIS + j * 9
                    hit, dst, u, v, det = ray_triangle(
                        om, dm, row[:, o:o + 3], row[:, o + 3:o + 6],
                        row[:, o + 6:o + 9], True)
                    better = hit & (dst < best)
                    best = jnp.where(better, dst, best)
                    bt = jnp.where(better, j, bt)
                nxt = nxt + bt
            if variant == "full":
                # stack-ish ops: 2 one-hot column writes + reads over D=8
                cols = jnp.arange(8, dtype=jnp.int32)[None, :]
                sp = (idx & 7)
                at = cols == sp[:, None]
                stk = jnp.where(at, nxt[:, None], jnp.zeros((B, 8), jnp.int32))
                nxt = nxt + jnp.sum(jnp.where(at, stk, 0), axis=1) % 3
            return nxt % n_wide, best * 0.9999

        def run(idx0):
            def body(_, c):
                return step(*c)
            idx, best = jax.lax.fori_loop(
                0, K, body, (idx0, jnp.full((B,), 1e9, jnp.float32)))
            return idx
        return jax.jit(run)

    for variant in ("gather", "slabs", "slabs_leaf", "full"):
        t = bench(make(variant), idx0)
        print(json.dumps(dict(variant=variant, us_per_step=t / K * 1e6,
                              grows_per_s=B * K / t / 1e9)), flush=True)


if __name__ == "__main__":
    main()
