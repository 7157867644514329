"""Pallas TPU kernel: streaming brute-force triangle intersection.

The only part of this workload Mosaic can accelerate today is the
gather-free one: intersect a ray block against EVERY triangle of a small
instance group with the triangle table resident in VMEM (per-lane random
VMEM access — what BVH traversal would need — is still unsupported; see
docs/PERF_NOTES.md). Grid = ray blocks; each program streams the (T, 16)
packed triangle table chunk by chunk through the VPU with a running
closest-hit reduction in registers.

Used as an optional backend for kernels/brute.py (RT2_PALLAS_BRUTE=1 or
``use_pallas=True``); results are bit-compatible with the XLA path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 256
TRI_CHUNK = 256
INF = 1.7014118e38   # python floats: jnp constants can't be captured by
EPSILON = 1e-5       # a pallas kernel (must match kernels/intersect.py)

# packed triangle-table columns: v0(0:3) v1(3:6) v2(6:9) mat(9) cull(10)


def _kernel(rays_ref, tris_ref, out_ref, *, n_tris: int):
    o = rays_ref[:, 0:3]                      # (R, 3)
    d = rays_ref[:, 3:6]

    n_chunks = -(-n_tris // TRI_CHUNK)
    R = RAY_BLOCK

    best = jnp.concatenate([
        jnp.full((R, 1), INF), jnp.zeros((R, 4)),
        jnp.full((R, 1), -1.0)], axis=1)      # dst,u,v,det,mat,tri

    def chunk_body(c, best):
        t0 = c * TRI_CHUNK
        tri = tris_ref[pl.ds(t0, TRI_CHUNK), :]          # (C, 16)
        v0 = tri[:, 0:3][None]                           # (1, C, 3)
        v1 = tri[:, 3:6][None]
        v2 = tri[:, 6:9][None]
        cull = tri[:, 10][None] > 0.5                    # (1, C)

        ob = o[:, None, :]                               # (R, 1, 3)
        db = d[:, None, :]
        e1 = v1 - v0
        e2 = v2 - v0
        n = jnp.cross(e1, e2)
        ao = ob - v0
        dao = jnp.cross(ao, db)
        det = -jnp.sum(db * n, axis=-1)                  # (R, C)
        keep = jnp.where(cull, det >= 1e-8, jnp.abs(det) >= 1e-8)
        inv = 1.0 / jnp.where(keep, det, 1.0)
        dst = jnp.sum(ao * n, axis=-1) * inv
        u = jnp.sum(e2 * dao, axis=-1) * inv
        v = -jnp.sum(e1 * dao, axis=-1) * inv
        w = 1.0 - u - v
        # mask triangles beyond the real count (padded chunk tail)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, TRI_CHUNK), 1)
        valid = (t0 + col) < n_tris
        hit = keep & (dst > EPSILON) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0) \
            & valid
        dst = jnp.where(hit, dst, INF)

        k = jnp.argmin(dst, axis=1)                      # (R,)
        pick = functools.partial(jnp.take_along_axis, indices=k[:, None],
                                 axis=1)
        dstk = pick(dst)[:, 0]
        better = dstk < best[:, 0]
        cand = jnp.stack([
            dstk, pick(u)[:, 0], pick(v)[:, 0], pick(det)[:, 0],
            pick(jnp.broadcast_to(tri[:, 9][None], (R, TRI_CHUNK)))[:, 0],
            (t0 + k).astype(jnp.float32)], axis=1)
        return jnp.where(better[:, None], cand, best)

    best = jax.lax.fori_loop(0, n_chunks, chunk_body, best)
    out_ref[:, 0:6] = best
    out_ref[:, 6:8] = jnp.zeros((R, 2))


def pallas_brute_intersect(rays: jax.Array, tris: jax.Array, n_tris: int):
    """rays (B, 8) [o3 d3 pad2]; tris (Tpad, 16) with Tpad a TRI_CHUNK
    multiple. Returns (B, 8) [dst, u, v, det, mat, tri_local, 0, 0]."""
    B = rays.shape[0]
    grid = (-(-B // RAY_BLOCK),)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        functools.partial(_kernel, n_tris=n_tris),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0] * RAY_BLOCK, 8), jnp.float32),
        interpret=interpret,
    )(rays, tris)


def available() -> bool:
    return os.environ.get("RT2_PALLAS_BRUTE", "0") == "1"
