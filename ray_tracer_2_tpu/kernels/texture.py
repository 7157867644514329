"""In-kernel texture sampling.

TPUs have no texture samplers — the reference's repeat-addressed bilinear
``textureSampleLevel`` (ray_tracer.rs:197-205, ray_tracer.wgsl:455) becomes
explicit wrap addressing + a 4-tap gather from the flat texel buffer.
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(texels, tex_meta, slot, uv):
    """Bilinear sample with repeat wrap.

    texels: (X, 4) f32 flat buffer; tex_meta: (64, 4) [offset, h, w, pad]
    rows (one gather resolves all slot metadata); slot: (B,) int32 (clamped
    to >= 0 by the caller's mask); uv: (B, 2). Returns (B, 4).
    """
    from ray_tracer_2_tpu.kernels.gatherlib import fetch_rows

    slot = jnp.maximum(slot, 0)
    meta = fetch_rows(tex_meta, slot)
    off = meta[:, 0].astype(jnp.int32)
    h = meta[:, 1].astype(jnp.int32)
    w = meta[:, 2].astype(jnp.int32)
    hf = meta[:, 1]
    wf = meta[:, 2]

    # Repeat wrap of the sample position, then texel-centered bilinear.
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    xf = u * wf - 0.5
    yf = v * hf - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    tx = (xf - x0)[..., None]
    ty = (yf - y0)[..., None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), n)

    x0w, x1w = wrap(x0, w), wrap(x0 + 1, w)
    y0w, y1w = wrap(y0, h), wrap(y0 + 1, h)

    def tap(y, x):
        return jnp.take(texels, off + y * w + x, axis=0)

    c00 = tap(y0w, x0w)
    c01 = tap(y0w, x1w)
    c10 = tap(y1w, x0w)
    c11 = tap(y1w, x1w)
    top = c00 * (1.0 - tx) + c01 * tx
    bot = c10 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty
