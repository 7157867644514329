"""Ablate the megakernel BOUNDARY phase cost on the dragon scene.

The round-2 frame anatomy (docs/PERF_NOTES.md) attributes ~0.25-0.3 s of the
0.65 s dragon frame to boundary work. This measures the pieces in-loop
(dependent chain, B=16384) to rank the levers:

  shade    resolve_and_shade (material one-hot + tri_attr gather + shading)
  prepass  segment_prepass (spheres + brute instances)
  start    start_segments (wide_enter root + state resets)
  log      completed-pixel compaction (argsort + takes + dyn-update-slice)
  claim    pixel claim (cumsum + camera rays + seeds)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 16384
ITERS = 64


def bench(run, state):
    out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(state)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / (reps * ITERS)


def main():
    from bench import dragon_scene
    from ray_tracer_2_tpu.kernels import megakernel as mk

    scene = dragon_scene().render_scene
    parts = mk._make_parts(scene, B, 5, True)
    D = parts["stack_depth"]
    rng = np.random.default_rng(0)

    F = jnp.asarray(rng.random((B, 14)).astype(np.float32))
    M = jnp.asarray(rng.random((B, 10)).astype(np.float32))
    W = jnp.asarray(rng.random((B, 12)).astype(np.float32))
    I = mk._i0(B, jnp.zeros((B,), jnp.uint32), 1, 0)
    I = I.at[:, mk.I_PIXEL].set(jnp.arange(B, dtype=jnp.int32))
    I = I.at[:, mk.I_STRI].set(
        jnp.asarray(rng.integers(-2, scene.tri_attr.shape[0], B), jnp.int32))
    S = (jnp.zeros((B, D), jnp.int32),) * 3  # (SB, SM, SD) resume stacks
    at_b = jnp.asarray(rng.random(B) < 0.6)

    def loop(body):
        @jax.jit
        def run(state):
            return jax.lax.fori_loop(0, ITERS, body, state)
        return run

    # --- traversal step as the reference cost ---
    def t_step(_, st):
        F, M, W, I, S = st
        return parts["traversal_step"](F, M, W, I, S)
    print(f"traversal_step : {bench(loop(t_step), (F, M, W, I, S))*1e6:7.1f} us", flush=True)

    # --- shade ---
    def t_shade(_, st):
        F, W, I = st
        o, d, tr, inc, seed, cont, _nee, _stash = \
            parts["resolve_and_shade"](F, W, I, at_b)
        F2 = jnp.concatenate([o, d, tr, inc], axis=1)
        return F2, W, I
    print(f"shade          : {bench(loop(t_shade), (F, W, I))*1e6:7.1f} us", flush=True)

    # --- start_segments (includes the prepass call inside) ---
    def t_start(_, st):
        F, M, W, I, S = st
        return parts["start_segments"](F, M, W, I, S, at_b, F[:, 0:3],
                                       F[:, 3:6], F[:, 6:10], F[:, 10:14],
                                       jnp.zeros((B,), jnp.uint32),
                                       I[:, mk.I_BOUNCE])
    print(f"start_segments : {bench(loop(t_start), (F, M, W, I, S))*1e6:7.1f} us", flush=True)

    # --- completion log (argsort compaction + append) ---
    total = 1920 * 1080
    logv = jnp.zeros((total + B, 4), jnp.float32)
    logp = jnp.zeros((total + B,), jnp.int32)
    A = jnp.asarray(rng.random((B, 4)).astype(np.float32))

    def t_log(_, st):
        logv, logp, wcursor = st
        valid = at_b
        perm = jnp.argsort(jnp.logical_not(valid), stable=True)
        vals_c = jnp.take(A, perm, axis=0)
        pix_c = jnp.take(I[:, mk.I_PIXEL], perm)
        logv = jax.lax.dynamic_update_slice(logv, vals_c, (wcursor, 0))
        logp = jax.lax.dynamic_update_slice(logp, pix_c, (wcursor,))
        wcursor = jnp.minimum(wcursor + jnp.sum(valid.astype(jnp.int32)),
                              total)
        return logv, logp, wcursor
    print(f"log            : {bench(loop(t_log), (logv, logp, jnp.int32(0)))*1e6:7.1f} us", flush=True)

    # --- claim + camera ---
    from ray_tracer_2_tpu import rng as prng

    cam = scene.cam_to_world
    size = jnp.array([1920, 1080], jnp.float32)

    def t_claim(_, st):
        cursor, o, d, seed = st
        claiming = at_b
        rank = mk._cumsum_i32(claiming.astype(jnp.int32)) \
            - claiming.astype(jnp.int32)
        new_pixel = cursor + rank
        got = claiming & (new_pixel < total)
        cursor = jnp.minimum(cursor + jnp.sum(claiming.astype(jnp.int32)),
                             total)
        pixel = jnp.where(got, new_pixel, I[:, mk.I_PIXEL])
        fresh = prng.seed_for_pixel(pixel.astype(jnp.uint32), jnp.int32(3))
        seed = jnp.where(got, fresh, seed)
        x = (pixel % 1920).astype(jnp.float32)
        y = (pixel // 1920).astype(jnp.float32)
        uv = jnp.stack([x, y], axis=1) / jnp.maximum(size - 1.0, 1.0)
        lf = jnp.stack([(uv[:, 0] - 0.5) * scene.view_params[0],
                        (uv[:, 1] - 0.5) * scene.view_params[1],
                        jnp.full((B,), scene.view_params[2])], axis=1)
        fp = lf @ cam[:3, :3].T + cam[:3, 3]
        dj, seed = prng.rand_in_unit_disk(seed)
        o2 = cam[:3, 3] + cam[:3, 0] * dj[:, :1] + cam[:3, 1] * dj[:, 1:]
        vj, seed = prng.rand_in_unit_disk(seed)
        fpj = fp + cam[:3, 0] * vj[:, :1] + cam[:3, 1] * vj[:, 1:]
        from ray_tracer_2_tpu.math.vec import normalize
        d2 = normalize(fpj - o2)
        return cursor, jnp.where(got[:, None], o2, o), \
            jnp.where(got[:, None], d2, d), seed
    st0 = (jnp.int32(0), F[:, 0:3], F[:, 3:6], jnp.zeros((B,), jnp.uint32))
    print(f"claim+camera   : {bench(loop(t_claim), st0)*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
