import numpy as np
import pytest

from ray_tracer_2_tpu.math.transform import (
    Transform, look_at_quat, quat_from_euler_yxz, quat_rotate_x,
    quat_rotate_y, quat_to_euler_yxz, quat_to_mat3,
)


def test_look_at_maps_z_to_forward():
    origin = np.array([3.0, 1.0, -2.0])
    target = np.array([-1.0, 4.0, 2.0])
    q = look_at_quat(origin, target)
    m = quat_to_mat3(q)
    f = (target - origin) / np.linalg.norm(target - origin)
    np.testing.assert_allclose(m @ [0, 0, 1], f, atol=1e-5)
    # right axis horizontal (no roll), up has positive y
    assert abs((m @ [1, 0, 0])[1]) < 1e-5
    assert (m @ [0, 1, 0])[1] > 0


def test_trs_matrix_order():
    t = Transform(pos=[1, 2, 3], rot=quat_rotate_y(np.pi / 2), scale=[2, 2, 2])
    m = t.to_matrix()
    # point (1,0,0): scale → (2,0,0); rotate Y 90° → (0,0,-2); translate
    p = m @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [1, 2, 1], atol=1e-5)


def test_euler_yxz_roundtrip():
    yaw, pitch = 0.7, -0.4
    q = quat_from_euler_yxz(yaw, pitch, 0.0)
    y2, p2, r2 = quat_to_euler_yxz(q)
    assert abs(y2 - yaw) < 1e-5 and abs(p2 - pitch) < 1e-5 and abs(r2) < 1e-5


def test_rotate_x_quarter():
    m = quat_to_mat3(quat_rotate_x(np.pi / 2))
    np.testing.assert_allclose(m @ [0, 1, 0], [0, 0, 1], atol=1e-6)


def test_vec_reflect_refract():
    import jax.numpy as jnp
    from ray_tracer_2_tpu.math.vec import reflect, refract, normalize

    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = reflect(i, n)
    np.testing.assert_allclose(np.asarray(r), [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]],
                               atol=1e-6)
    # refraction straight through at eta=1
    t = refract(i, n, jnp.array([[1.0]]))
    np.testing.assert_allclose(np.asarray(t), np.asarray(i), atol=1e-6)
    # total internal reflection returns zero vector (WGSL semantics)
    shallow = normalize(jnp.array([[1.0, -0.05, 0.0]]))
    t2 = refract(shallow, n, jnp.array([[1.5]]))
    np.testing.assert_allclose(np.asarray(t2), 0.0, atol=1e-6)
