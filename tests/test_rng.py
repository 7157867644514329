"""The RNG must reproduce the reference's u32 hash stream bit-for-bit
(ray_tracer.wgsl:195-200). The oracle here is an independent scalar Python
implementation using masked integer arithmetic."""
import numpy as np
import jax.numpy as jnp

from ray_tracer_2_tpu import rng

M32 = 0xFFFFFFFF


def scalar_next(seed: int) -> tuple[int, int]:
    seed = (seed * 747796405 + 2891336453) & M32
    shift = ((seed >> 28) + 4) & M32
    result = (((seed >> shift) ^ seed) * 277803737) & M32
    result = ((result >> 22) ^ result) & M32
    return result, seed


def test_next_u32_matches_scalar_oracle():
    seeds = np.array([0, 1, 719393, 123456789, 0xFFFFFFFF, 2**31], np.uint32)
    got_bits, got_seed = rng.next_u32(jnp.asarray(seeds))
    for i, s in enumerate(seeds):
        exp_bits, exp_seed = scalar_next(int(s))
        assert int(got_bits[i]) == exp_bits
        assert int(got_seed[i]) == exp_seed


def test_stream_advances_like_reference():
    seed = jnp.asarray(np.array([42], np.uint32))
    s = 42
    for _ in range(10):
        val, seed = rng.rand(seed)
        exp_bits, s = scalar_next(s)
        assert abs(float(val[0]) - exp_bits / 4294967295.0) < 1e-7


def test_seed_for_pixel():
    idx = jnp.asarray(np.array([5], np.uint32))
    # frames = -1 → abs → 1 (ray_tracer.wgsl:475 abs(params.frames))
    s = rng.seed_for_pixel(idx, jnp.int32(-1))
    assert int(s[0]) == (5 + 719393) & M32


def test_uniformity_and_range():
    seeds = jnp.asarray(np.arange(20000, dtype=np.uint32))
    vals, _ = rng.rand(seeds)
    v = np.asarray(vals)
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 0.01
    assert abs(v.var() - 1 / 12) < 0.01


def test_direction_is_unit_and_isotropic():
    seeds = jnp.asarray(np.arange(5000, dtype=np.uint32) * 7919)
    d, _ = rng.rand_direction(seeds)
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.05


def test_hemisphere_respects_normal():
    seeds = jnp.asarray(np.arange(1000, dtype=np.uint32) * 31)
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (1000, 3))
    d, _ = rng.rand_hemisphere(n, seeds)
    assert (np.asarray(d)[:, 1] >= 0).all()


def test_disk_in_unit_circle():
    seeds = jnp.asarray(np.arange(1000, dtype=np.uint32) * 97)
    p, _ = rng.rand_in_unit_disk(seeds)
    r = np.linalg.norm(np.asarray(p), axis=1)
    assert (r <= 1.0 + 1e-6).all()
    assert abs((r**2).mean() - 0.5) < 0.05  # area-uniform
