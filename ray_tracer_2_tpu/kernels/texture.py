"""In-kernel texture sampling.

TPUs have no texture samplers — the reference's repeat-addressed bilinear
``textureSampleLevel`` (ray_tracer.rs:197-205, ray_tracer.wgsl:455) becomes
explicit wrap addressing + a 4-tap gather from the texel atlas.

The atlas is stored as u8 RGBA words packed 128 texels per 512-byte row
(assets/textures.py pack_texels_u8): narrow 16-byte (X, 4) rows gathered
at barely half the rate and the f32 atlas sat 4x deeper past the ~8 MB
gather cliff (sponza: 168 -> 42 MB; measured 1129 -> 624 us per 4-tap
bilinear at B=16k, scripts/probe_texels.py). The per-lane column extract
is a one-hot multiply + lane reduction done on exact 16-bit halves (u32
payloads don't fit f32), and the u8 unpack is integer shifts — both ride
under the gather latency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

def _tap(texels, flat_idx):
    """Fetch texel ``flat_idx`` (B,) from the packed atlas -> (B, 4) f32."""
    from ray_tracer_2_tpu.kernels.gatherlib import fetch_rows

    row = fetch_rows(texels, jax.lax.shift_right_logical(flat_idx, 7))
    u = jax.lax.bitcast_convert_type(row, jnp.uint32)
    lane = jnp.arange(128, dtype=jnp.int32)[None, :]
    oh = (lane == (flat_idx & 127)[:, None]).astype(jnp.float32)
    # 16-bit halves are exact in f32; the one-hot sum is an exact select
    lo = jnp.sum((u & 0xFFFF).astype(jnp.float32) * oh, axis=1)
    hi = jnp.sum((u >> 16).astype(jnp.float32) * oh, axis=1)
    w = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)
    return jnp.stack([(w & 0xFF).astype(jnp.float32),
                      ((w >> 8) & 0xFF).astype(jnp.float32),
                      ((w >> 16) & 0xFF).astype(jnp.float32),
                      ((w >> 24) & 0xFF).astype(jnp.float32)],
                     axis=1) / 255.0


def sample_bilinear(texels, tex_meta, slot, uv):
    """Bilinear sample with repeat wrap.

    texels: (R, 128) f32 packed u8 atlas rows (pack_texels_u8);
    tex_meta: (64, 4) [offset, h, w, pad] rows (one gather resolves all
    slot metadata); slot: (B,) int32 (clamped to >= 0 by the caller's
    mask); uv: (B, 2). Returns (B, 4)."""
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

    c00 = _tap(texels, off + y0w * w + x0w)
    c01 = _tap(texels, off + y0w * w + x1w)
    c10 = _tap(texels, off + y1w * w + x0w)
    c11 = _tap(texels, off + y1w * w + x1w)
    top = c00 * (1.0 - tx) + c01 * tx
    bot = c10 * (1.0 - tx) + c11 * tx
    return top * (1.0 - ty) + bot * ty
