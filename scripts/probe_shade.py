"""Sub-ablate resolve_and_shade (the most expensive boundary piece,
319 us of the ~793 us dragon boundary — scripts/ablate_boundary.py).

Pieces measured in-loop (B=16384, dragon scene: no glass, no texture):
  attr      tri_attr dependent gather alone
  attr+geom + normal/uv interpolation + m2w rotate
  mat       _gather_material one-hot alone
  rngchain  the shading RNG draws alone (spec draw + hemisphere + RR)
  novpu     full shade with the attr gather replaced by zeros (VPU-only)
  full      resolve_and_shade as-is
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 16384
ITERS = 64


def bench(run, state, tag):
    out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / (reps * ITERS)
    print(f"{tag:10s}: {dt*1e6:7.1f} us", flush=True)


def loop(body):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, ITERS, body, state)
    return run


def main():
    from bench import dragon_scene
    from ray_tracer_2_tpu.kernels import megakernel as mk
    from ray_tracer_2_tpu.kernels.gatherlib import fetch_rows
    from ray_tracer_2_tpu import rng as prng
    from ray_tracer_2_tpu.math.vec import normalize, reflect, lerp, dot

    scene = dragon_scene().render_scene
    parts = mk._make_parts(scene, B, 5, True)
    rng = np.random.default_rng(0)

    F = jnp.asarray(rng.random((B, 14)).astype(np.float32))
    W = jnp.asarray(rng.random((B, 12)).astype(np.float32))
    I = mk._i0(B, jnp.zeros((B,), jnp.uint32), 1, 0)
    I = I.at[:, mk.I_PIXEL].set(jnp.arange(B, dtype=jnp.int32))
    stri = jnp.asarray(rng.integers(0, scene.tri_attr.shape[0], B), jnp.int32)
    I = I.at[:, mk.I_STRI].set(stri)
    at_b = jnp.asarray(rng.random(B) < 0.6)

    n_attr = scene.tri_attr.shape[0]

    # --- attr gather alone (dependent chain like the real boundary) ---
    def t_attr(_, st):
        idx, acc = st
        attr = fetch_rows(scene.tri_attr, idx)
        nxt = jax.lax.rem(jnp.abs(attr[:, 0].astype(jnp.int32) ^ idx * 7919),
                          jnp.int32(n_attr))
        return nxt, acc + attr[:, 1]
    bench(loop(t_attr), (stri, jnp.zeros(B)), "attr")

    # --- + geometry: normal/uv interp + m2w rotation ---
    m2w = scene.inst_model_to_world[0]

    def t_geom(_, st):
        idx, acc = st
        attr = fetch_rows(scene.tri_attr, idx)
        u, v = W[:, 1], W[:, 2]
        w_bar = 1.0 - u - v
        n_model = normalize(attr[:, 0:3] * w_bar[:, None]
                            + attr[:, 3:6] * u[:, None]
                            + attr[:, 6:9] * v[:, None])
        n_world = normalize(n_model @ m2w[:3, :3].T)
        uv = (attr[:, 9:11] * w_bar[:, None] + attr[:, 11:13] * u[:, None]
              + attr[:, 13:15] * v[:, None])
        nxt = jax.lax.rem(jnp.abs(n_world[:, 0].astype(jnp.int32)
                                  ^ idx * 7919), jnp.int32(n_attr))
        return nxt, acc + uv[:, 0]
    bench(loop(t_geom), (stri, jnp.zeros(B)), "attr+geom")

    # --- packed-4 attr: (T/4, 128) table, gather idx>>2, select idx&3 ---
    T4 = (n_attr + 3) // 4
    attr4 = np.zeros((T4 * 4, 32), np.float32)
    attr4[:n_attr, :20] = np.asarray(scene.tri_attr)
    attr4 = jnp.asarray(attr4.reshape(T4, 128))

    def t_attr4(_, st):
        idx, acc = st
        row = fetch_rows(attr4, idx >> 2)
        g = idx & 3
        out = row[:, 0:32]
        for gg in (1, 2, 3):
            out = jnp.where((g == gg)[:, None], row[:, 32*gg:32*gg+32], out)
        attr = out[:, :20]
        nxt = jax.lax.rem(jnp.abs(attr[:, 0].astype(jnp.int32) ^ idx * 7919),
                          jnp.int32(n_attr))
        return nxt, acc + attr[:, 1]
    bench(loop(t_attr4), (stri, jnp.zeros(B)), "attr4")

    # --- packed-8 attr: 16-col groups (15 used: normals+uvs, no tangent)
    # table (T/8, 128) = 5.1 MB — UNDER the ~8 MB gather cliff ---
    T8 = (n_attr + 7) // 8
    attr8 = np.zeros((T8 * 8, 16), np.float32)
    attr8[:n_attr, :15] = np.asarray(scene.tri_attr)[:, :15]
    attr8 = jnp.asarray(attr8.reshape(T8, 128))

    def t_attr8(_, st):
        idx, acc = st
        row = fetch_rows(attr8, idx >> 3)
        g = idx & 7
        out = row[:, 0:16]
        for gg in range(1, 8):
            out = jnp.where((g == gg)[:, None], row[:, 16*gg:16*gg+16], out)
        attr = out[:, :15]
        nxt = jax.lax.rem(jnp.abs(attr[:, 0].astype(jnp.int32) ^ idx * 7919),
                          jnp.int32(n_attr))
        return nxt, acc + attr[:, 1]
    bench(loop(t_attr8), (stri, jnp.zeros(B)), "attr8")

    # --- hierarchical halving selects: log2(per_row) wide wheres ---
    def t_attr4h(_, st):
        idx, acc = st
        row = fetch_rows(attr4, idx >> 2)
        g = idx & 3
        half = jnp.where((g >= 2)[:, None], row[:, 64:128], row[:, 0:64])
        out = jnp.where((g & 1 == 1)[:, None], half[:, 32:64], half[:, 0:32])
        attr = out[:, :20]
        nxt = jax.lax.rem(jnp.abs(attr[:, 0].astype(jnp.int32) ^ idx * 7919),
                          jnp.int32(n_attr))
        return nxt, acc + attr[:, 1]
    bench(loop(t_attr4h), (stri, jnp.zeros(B)), "attr4h")

    def t_attr8h(_, st):
        idx, acc = st
        row = fetch_rows(attr8, idx >> 3)
        g = idx & 7
        h1 = jnp.where((g >= 4)[:, None], row[:, 64:128], row[:, 0:64])
        h2 = jnp.where((g & 2 == 2)[:, None], h1[:, 32:64], h1[:, 0:32])
        out = jnp.where((g & 1 == 1)[:, None], h2[:, 16:32], h2[:, 0:16])
        attr = out[:, :15]
        nxt = jax.lax.rem(jnp.abs(attr[:, 0].astype(jnp.int32) ^ idx * 7919),
                          jnp.int32(n_attr))
        return nxt, acc + attr[:, 1]
    bench(loop(t_attr8h), (stri, jnp.zeros(B)), "attr8h")

    # --- material one-hot ---
    from ray_tracer_2_tpu.kernels.trace import _gather_material

    def t_mat(_, st):
        mid, acc = st
        m = _gather_material(scene, mid)
        nxt = (mid + 1) % scene.mat_rows.shape[0]
        return nxt, acc + m["color"][:, 0]
    bench(loop(t_mat), (jnp.zeros((B,), jnp.int32), jnp.zeros(B)), "mat")

    # --- RNG chain (spec + hemisphere + RR), same draws as non-glass ---
    def t_rng(_, st):
        seed, acc = st
        normal = normalize(W[:, 4:7])
        r_spec, seed = prng.rand(seed)
        diffuse_n, seed = prng.rand_hemisphere(normal, seed)
        d = normalize(F[:, 3:6])
        spec_dir = reflect(d, normal)
        dir_n = normalize(lerp(diffuse_n, spec_dir, r_spec[:, None]))
        r_rr, seed = prng.rand(seed)
        return seed, acc + dir_n[:, 0] + r_rr
    bench(loop(t_rng), (jnp.zeros((B,), jnp.uint32), jnp.zeros(B)), "rngchain")

    # --- full shade ---
    def t_full(_, st):
        F_, W_, I_ = st
        o, d, tr, inc, seed, cont, _nee, _stash = \
            parts["resolve_and_shade"](F_, W_, I_, at_b)
        F2 = jnp.concatenate([o, d, tr, inc], axis=1)
        return F2, W_, I_
    bench(loop(t_full), (F, W, I), "full")


if __name__ == "__main__":
    main()
