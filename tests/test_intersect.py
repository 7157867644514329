import numpy as np
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.intersect import (
    INF, ray_aabb_dist, ray_sphere, ray_triangle, sphere_normal_uv,
)


def V(*rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_sphere_outside_hit():
    hit, dst, inside = ray_sphere(V([0, 0, -3]), V([0, 0, 1]), V([0, 0, 0]),
                                  jnp.float32(1.0))
    assert bool(hit[0]) and not bool(inside[0])
    assert abs(float(dst[0]) - 2.0) < 1e-5


def test_sphere_inside_hit_uses_far():
    hit, dst, inside = ray_sphere(V([0, 0, 0]), V([0, 0, 1]), V([0, 0, 0]),
                                  jnp.float32(1.0))
    assert bool(hit[0]) and bool(inside[0])
    assert abs(float(dst[0]) - 1.0) < 1e-5
    hp = V([0, 0, 0]) + V([0, 0, 1]) * dst[:, None]
    n, uv = sphere_normal_uv(hp, V([0, 0, 0]), inside)
    # inside hit: normal flipped inward
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-5)


def test_sphere_behind_misses():
    hit, dst, _ = ray_sphere(V([0, 0, 3]), V([0, 0, 1]), V([0, 0, 0]),
                             jnp.float32(1.0))
    assert not bool(hit[0]) and float(dst[0]) == float(INF)


def test_triangle_hit_barycentrics():
    v0, v1, v2 = V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0])
    o = V([0.25, 0.25, -1.0])
    d = V([0, 0, 1])
    hit, dst, u, v, det = ray_triangle(o, d, v0, v1, v2, jnp.array([False]))
    assert bool(hit[0])
    assert abs(float(dst[0]) - 1.0) < 1e-6
    assert abs(float(u[0]) - 0.25) < 1e-6 and abs(float(v[0]) - 0.25) < 1e-6


def test_triangle_backface_cull():
    v0, v1, v2 = V([0, 0, 0]), V([1, 0, 0]), V([0, 1, 0])
    # normal = cross(v1-v0, v2-v0) = +z; approaching along +z hits the back
    o, d = V([0.2, 0.2, -1.0]), V([0, 0, 1])
    hit_cull, *_ = ray_triangle(o, d, v0, v1, v2, jnp.array([True]))
    hit_nocull, *_, det = ray_triangle(o, d, v0, v1, v2, jnp.array([False]))
    assert not bool(hit_cull[0])
    assert bool(hit_nocull[0]) and float(det[0]) < 0


def test_aabb_slab():
    o = V([0, 0, -5])
    inv = 1.0 / V([0, 0, 1]).clip(1e-30)  # avoid warnings; dir +z
    inv = jnp.asarray(np.array([[1e30, 1e30, 1.0]], np.float32))
    d = ray_aabb_dist(o, inv, V([-1, -1, -1]), V([1, 1, 1]), jnp.float32(1e30))
    assert abs(float(d[0]) - 4.0) < 1e-4
    # beyond current best → INF
    d2 = ray_aabb_dist(o, inv, V([-1, -1, -1]), V([1, 1, 1]), jnp.float32(3.0))
    assert float(d2[0]) == float(INF)
    # behind the ray → INF
    d3 = ray_aabb_dist(V([0, 0, 5]), inv, V([-1, -1, -1]), V([1, 1, 1]),
                       jnp.float32(1e30))
    assert float(d3[0]) == float(INF)
