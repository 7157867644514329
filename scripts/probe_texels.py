"""Probe texture-tap cost on the sponza atlas: current (X, 4) f32 layout
vs u8-RGBA texels packed one-per-f32-column in 128-texel row strips
(table 4x smaller, 512-byte gather rows; per-lane column extract via
one-hot multiply + lane reduce, u8 unpack via integer ops)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 16384
ITERS = 32


def bench(run, state, tag):
    out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    print(f"{tag:12s}: {(time.perf_counter()-t0)/(3*ITERS)*1e6:7.1f} us",
          flush=True)


def loop(body):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, ITERS, body, state)
    return run


def main():
    from bench import named_scene
    h = named_scene("sponza")
    s = h.render_scene
    texels = s.tex_texels                      # (X, 4) f32
    X = texels.shape[0]
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, X - 2049, B), jnp.int32)

    # current: 4 taps, (X, 4) f32 16-byte rows
    def cur(i, st):
        idx, acc = st
        c00 = jnp.take(texels, idx, axis=0)
        c01 = jnp.take(texels, idx + 1, axis=0)
        c10 = jnp.take(texels, idx + 1024, axis=0)
        c11 = jnp.take(texels, idx + 1025, axis=0)
        mix = (c00 + c01 + c10 + c11) * 0.25
        nidx = jax.lax.rem(jnp.abs(mix[:, 0].astype(jnp.int32) ^ idx * 7919),
                           jnp.int32(X - 2049))
        return nidx, acc + mix[:, 1]
    bench(loop(cur), (idx0, jnp.zeros(B)), "cur_4tap")

    # packed: u8 RGBA one f32/texel, 128-texel strips
    Xp = -(-X // 128) * 128
    u8 = (np.clip(np.asarray(texels), 0, 1) * 255).astype(np.uint32)
    packed = (u8[:, 0] | (u8[:, 1] << 8) | (u8[:, 2] << 16)
              | (u8[:, 3] << 24)).astype(np.uint32)
    packed = np.concatenate([packed, np.zeros(Xp - X, np.uint32)])
    ptab = jnp.asarray(packed.view(np.float32).reshape(-1, 128))
    lane128 = jnp.arange(128, dtype=jnp.int32)[None, :]

    def extract(rowv, col):
        oh = (lane128 == col[:, None]).astype(jnp.float32)
        bits = jax.lax.bitcast_convert_type(
            jnp.sum(jax.lax.bitcast_convert_type(rowv, jnp.uint32)
                    .astype(jnp.float32) * oh, axis=1,
                    keepdims=True), jnp.float32)
        return bits

    def extract_u32(rowv, col):
        # one-hot select of a per-lane column, exact for u32 payloads:
        # split into 16-bit halves (each fits f32 exactly), select, rejoin
        u = jax.lax.bitcast_convert_type(rowv, jnp.uint32)
        oh = (lane128 == col[:, None]).astype(jnp.float32)
        lo = jnp.sum((u & 0xFFFF).astype(jnp.float32) * oh, axis=1)
        hi = jnp.sum((u >> 16).astype(jnp.float32) * oh, axis=1)
        return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)

    def unpack_u8(v):
        return jnp.stack([(v & 0xFF).astype(jnp.float32),
                          ((v >> 8) & 0xFF).astype(jnp.float32),
                          ((v >> 16) & 0xFF).astype(jnp.float32),
                          ((v >> 24) & 0xFF).astype(jnp.float32)],
                         axis=1) / 255.0

    def pk(i, st):
        idx, acc = st

        def tap(ix):
            row = jnp.take(ptab, jax.lax.shift_right_logical(ix, 7), axis=0)
            return unpack_u8(extract_u32(row, ix & 127))

        c00 = tap(idx)
        c01 = tap(idx + 1)
        c10 = tap(idx + 1024)
        c11 = tap(idx + 1025)
        mix = (c00 + c01 + c10 + c11) * 0.25
        nidx = jax.lax.rem(jnp.abs(mix[:, 0].astype(jnp.int32) ^ idx * 7919),
                           jnp.int32(X - 2049))
        return nidx, acc + mix[:, 1]
    bench(loop(pk), (idx0, jnp.zeros(B)), "packed_4tap")

    # packed, 2 strips fetched (y0/y1 rows), both x-taps from the same row
    def pk2(i, st):
        idx, acc = st

        def two(ix):
            row = jnp.take(ptab, jax.lax.shift_right_logical(ix, 7), axis=0)
            a = unpack_u8(extract_u32(row, ix & 127))
            b = unpack_u8(extract_u32(row, jnp.minimum((ix & 127) + 1, 127)))
            return a, b

        c00, c01 = two(idx)
        c10, c11 = two(idx + 1024)
        mix = (c00 + c01 + c10 + c11) * 0.25
        nidx = jax.lax.rem(jnp.abs(mix[:, 0].astype(jnp.int32) ^ idx * 7919),
                           jnp.int32(X - 2049))
        return nidx, acc + mix[:, 1]
    bench(loop(pk2), (idx0, jnp.zeros(B)), "packed_2tap")


if __name__ == "__main__":
    main()
