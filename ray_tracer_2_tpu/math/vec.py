"""Small-vector math on trailing-axis-3 jnp arrays.

The reference uses glam ``Vec3``/``Mat4`` host-side and WGSL builtins
device-side. Here every helper is shape-polymorphic over leading batch axes so
the same code path serves one ray or a million: SoA ``(..., 3)`` float32
arrays, fully traceable under ``jit``/``vmap``/``shard_map``.
"""
from __future__ import annotations

import os as _os

import jax.numpy as jnp


def dot(a, b, keepdims: bool = False):
    # RT2_DOT_UNROLL=1 (opt-in, read at trace time): unroll small static
    # trailing dims — a sum REDUCE is a fusion break on TPU (its (..., 3)
    # input materializes between fusions — docs/PERF_NOTES.md round-3 op
    # census), while the unrolled form is pure elementwise and fuses with
    # producer and consumer. NOT bit-identical: inside one elementwise
    # fusion XLA may contract mul+add into FMA, which a separate reduce
    # never does (measured: the balls golden moves RMSE 1.8e-3 on CPU with
    # the unroll forced on). Off by default to keep goldens/oracle streams
    # bit-stable; decided by on-chip A/B (scripts/sweep_r3.py) with an
    # RMSE-tolerance gate (tests/test_noreduce.py::test_dot_unroll_close).
    if _os.environ.get("RT2_DOT_UNROLL", "0") == "1":
        n = a.shape[-1] if hasattr(a, "shape") and a.shape else None
        if n is not None and 1 <= n <= 4:
            prod = a * b
            out = prod[..., 0]
            for i in range(1, n):
                out = out + prod[..., i]
            return out[..., None] if keepdims else out
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v, keepdims: bool = False):
    return jnp.sqrt(dot(v, v, keepdims=keepdims))


def normalize(v, eps: float = 0.0):
    """Normalize along the last axis. Matches WGSL ``normalize`` (no eps guard)
    unless ``eps`` is given."""
    n = length(v, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """WGSL ``reflect``: i - 2*dot(i,n)*n."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def refract(i, n, eta):
    """WGSL ``refract(i, n, eta)``.

    Returns the refracted direction, or the zero vector on total internal
    reflection — byte-for-byte the WGSL semantics relied on by the glass
    branch of the reference kernel (ray_tracer.wgsl:423).

    ``eta`` broadcasts against the leading axes of ``i``/``n``.
    """
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) == jnp.ndim(i) - 1 else eta
    cos_i = dot(n, i, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    refr = eta * i - (eta * cos_i + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(i), refr)


def lerp(a, b, t):
    """WGSL ``mix``."""
    return a + (b - a) * t


def smoothstep(edge0, edge1, x):
    """WGSL ``smoothstep`` (clamped Hermite)."""
    t = jnp.clip((x - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)
