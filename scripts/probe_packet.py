"""Probe #3: packet-traversal inner loop cost in Mosaic.

A packet of P rays traverses a synthetic BVH with SHARED control flow:
scalar stack in SMEM, node row fetched by scalar dynamic slice (1,128),
sublane-broadcast to (P,128), slab math on static lane slots, two
lane-reductions driving the (scalar) push/pop decisions. Measures
ns per packet-visit — the c_fixed + P*c_lane of the design model.
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


def run(P, K, N=16384, depth=48):
    def kernel(nodes_ref, iv_ref, b_ref, out_ref, stack_ref):
        # seed the stack with the root
        stack_ref[0] = 0

        def cond(c):
            sp, visits, tbest = c
            return (sp > 0) & (visits < K)

        def body(c):
            sp, visits, tbest = c
            node = stack_ref[sp - 1]
            row = nodes_ref[pl.ds(node, 1), :]           # (1, 128)
            t = jnp.broadcast_to(row, (P, 128)) * iv_ref[:] + b_ref[:]
            # slab: min/max across the two bound rows 3 lanes apart, then
            # across the three axes (static rolls)
            tmin = jnp.minimum(t, pltpu.roll(t, 3, 1))
            tmax = jnp.maximum(t, pltpu.roll(t, 3, 1))
            tn = jnp.maximum(jnp.maximum(tmin, pltpu.roll(tmin, 1, 1)),
                             pltpu.roll(tmin, 2, 1))
            tf = jnp.minimum(jnp.minimum(tmax, pltpu.roll(tmax, 1, 1)),
                             pltpu.roll(tmax, 2, 1))
            hit = (tf >= tn) & (tn < tbest)
            # child hit masks live at static lane slots 0 (near), 6 (far)
            near_any = jnp.any(hit[:, 0:1])
            far_any = jnp.any(hit[:, 6:7])
            # children ids from the row (scalar VMEM reads)
            c_near = jnp.maximum(row[0, 12].astype(jnp.int32) % N, 1)
            c_far = jnp.maximum(row[0, 13].astype(jnp.int32) % N, 1)
            # branchless double push then pop of current
            sp = sp - 1
            stack_ref[sp] = c_far
            sp = sp + far_any.astype(jnp.int32)
            stack_ref[sp] = c_near
            sp = sp + near_any.astype(jnp.int32)
            sp = jnp.minimum(sp, depth - 1)
            tbest = tbest * 0.9995 + 0.001
            return sp, visits + 1, tbest

        sp, visits, tbest = jax.lax.while_loop(
            cond, body, (jnp.int32(1), jnp.int32(0),
                         jnp.full((P, 1), 1e9, jnp.float32)))
        out_ref[:] = tbest + visits.astype(jnp.float32)

    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.random((N, 128)).astype(np.float32))
    iv = jnp.asarray(rng.random((P, 128)).astype(np.float32))
    b = jnp.asarray(rng.random((P, 128)).astype(np.float32))
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((depth,), jnp.int32)])(*a))
    t = bench(f, nodes, iv, b, iters=5)
    emit(probe="packet", P=P, K=K, ns_per_visit=t / K * 1e9,
         mvisit_per_s=K / t / 1e6, ray_gvisit_per_s=P * K / t / 1e9)


if __name__ == "__main__":
    emit(probe="env", device=str(jax.devices()[0]))
    for P, K in ((8, 4096), (64, 4096), (256, 4096), (1024, 2048)):
        try:
            run(P, K)
        except Exception as e:
            emit(probe="packet", P=P, error=f"{type(e).__name__}: {e}"[:250])
            traceback.print_exc(file=sys.stderr)
