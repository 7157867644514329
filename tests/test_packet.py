"""Ray-packet megakernel (packet=P rays per traversal lane) equality gates.

The packet kernel shares every row gather among P rays (union traversal,
kernels/megakernel.py _make_parts docstring) while keeping per-ray physics
— so its image must equal the scalar kernel's BIT-FOR-BIT: per-ray leaf /
sphere tests, winner rules, RNG streams and shading are the very same ops,
and the union visits a SUPERSET of each ray's scalar visits whose extra
leaves can never win (strict < against the ray's own best, and the scalar
path's winner is visited either way; the (dst, id) lex rule makes sphere
ties order-invariant too).

Covered compositions: plain, rays_per_pixel>1 + antialias, log-cap
deferral (inert-ray replay), multi-instance advance, NEE shadow segments,
and the sphere-BVH phase.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.megakernel import render_persistent
from ray_tracer_2_tpu.math.transform import Transform, quat_rotate_y
from ray_tracer_2_tpu.scene.definition import (
    CameraDescriptor, MaterialDefinition, MeshData, MeshFromData,
    SceneDefinition,
)
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

W, H = 64, 36


def _uv_sphere_mesh():
    lat, lon = 22, 34
    th = np.linspace(0.0, np.pi, lat + 1)
    ph = np.linspace(0.0, 2 * np.pi, lon + 1)
    P = np.stack(np.meshgrid(th, ph, indexing="ij"), axis=-1)
    xyz = np.stack([np.sin(P[..., 0]) * np.cos(P[..., 1]),
                    np.cos(P[..., 0]),
                    np.sin(P[..., 0]) * np.sin(P[..., 1])], axis=-1)
    quads = []
    for i in range(lat):
        for j in range(lon):
            a, b, c, d = xyz[i, j], xyz[i + 1, j], xyz[i + 1, j + 1], \
                xyz[i, j + 1]
            quads += [[a, b, c], [a, c, d]]
    soup = np.asarray(quads, np.float32)
    assert len(soup) > 1024   # forces the wide-BVH traversal path
    return MeshData.from_vertices(soup.reshape(-1, 3), soup.reshape(-1, 3))


@pytest.fixture(scope="module")
def mesh_scene():
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.6, 3.2], [0.0, 0.5, 0.0]),
        fov=42.0, focus_dist=3.2))
    s.add_mesh(Transform(pos=[0.0, 0.5, 0.0], rot=quat_rotate_y(0.7),
                         scale=[0.9, 0.9, 0.9]),
               MeshFromData(_uv_sphere_mesh()),
               MaterialDefinition.new().with_color([0.8, 0.3, 0.2, 1.0])
               .smooth(0.4).specular_([1.0] * 4, 0.1))
    s.add_sphere([1.1, 0.35, 0.6], 0.35,
                 MaterialDefinition.new().with_color([0.4, 0.9, 0.4, 1.0]))
    s.add_sphere([0.0, -50.0, 0.0], 49.6,
                 MaterialDefinition.new().with_color([0.6, 0.6, 0.6, 1.0]))
    return instantiate_scene(s).render_scene


@pytest.fixture(scope="module")
def two_instance_scene():
    mesh = MeshFromData(_uv_sphere_mesh())
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.6, 3.6], [0.0, 0.5, 0.0]),
        fov=48.0, focus_dist=3.6))
    s.add_mesh(Transform(pos=[-0.7, 0.5, 0.0], rot=quat_rotate_y(0.7),
                         scale=[0.6, 0.6, 0.6]), mesh,
               MaterialDefinition.new().with_color([0.8, 0.3, 0.2, 1.0]))
    s.add_mesh(Transform(pos=[0.7, 0.4, 0.2], rot=quat_rotate_y(-0.4),
                         scale=[0.5, 0.5, 0.5]), mesh,
               MaterialDefinition.new().with_color([0.2, 0.4, 0.9, 1.0]))
    return instantiate_scene(s).render_scene


def _render(scene, P, **kw):
    args = dict(width=W, height=H, bounces=3, rays_per_pixel=1,
                skybox=True, lanes=256, packet=P)
    args.update(kw)
    img, segs = render_persistent(scene, jnp.int32(2), **args)
    return np.asarray(img), float(segs)


def _assert_equal(scene, P, **kw):
    img1, seg1 = _render(scene, 1, **kw)
    imgP, segP = _render(scene, P, **kw)
    assert seg1 == segP
    np.testing.assert_array_equal(img1, imgP)


@pytest.mark.parametrize("P", [2, 4])
def test_packet_bit_equal_mesh(mesh_scene, P):
    _assert_equal(mesh_scene, P)


def test_packet_rpp_antialias(mesh_scene):
    _assert_equal(mesh_scene, 4, rays_per_pixel=2, antialias=True)


def test_packet_log_cap_deferral(mesh_scene):
    # a tiny log cap forces completions past the cap to defer and replay;
    # with packets the deferred rays ride the next traversal INERT
    _assert_equal(mesh_scene, 4, log_cap=128)


def test_packet_two_instances(two_instance_scene):
    _assert_equal(two_instance_scene, 4)


def test_packet_nee_shadow_segments(mesh_scene):
    # shadow rays are ordinary segments; packets mix shadow + bounce rays
    # in one union traversal. The scene needs a light for NEE to engage.
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.6, 3.2], [0.0, 0.5, 0.0]),
        fov=42.0, focus_dist=3.2))
    s.add_mesh(Transform(pos=[0.0, 0.5, 0.0], rot=quat_rotate_y(0.7),
                         scale=[0.9, 0.9, 0.9]),
               MeshFromData(_uv_sphere_mesh()),
               MaterialDefinition.new().with_color([0.8, 0.3, 0.2, 1.0]))
    s.add_sphere([1.5, 2.2, 0.8], 0.5,
                 MaterialDefinition.new().emissive([1.0, 0.9, 0.7, 1.0], 8.0))
    scene = instantiate_scene(s).render_scene
    _assert_equal(scene, 4, nee=True, skybox=False)


def test_packet_sphere_bvh(monkeypatch):
    monkeypatch.setenv("RT2_SPHERE_BVH", "1")
    jax.clear_caches()
    rng = np.random.default_rng(3)
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.5, 6.0], [0.0, 0.5, 0.0]),
        fov=50.0, focus_dist=6.0))
    for i in range(40):
        pos = [float(rng.uniform(-3, 3)), float(rng.uniform(0.2, 1.5)),
               float(rng.uniform(-3, 1))]
        s.add_sphere(pos, float(rng.uniform(0.1, 0.3)),
                     MaterialDefinition.new().with_color(
                         [float(x) for x in rng.uniform(0.2, 0.9, 3)] + [1.0]))
    scene = instantiate_scene(s).render_scene
    try:
        assert int(getattr(scene, "sphere_bvh_root", -1)) >= 0, \
            "sphere BVH not built; knob threshold changed?"
        _assert_equal(scene, 4)
    finally:
        jax.clear_caches()
