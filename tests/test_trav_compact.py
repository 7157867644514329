"""Compacted-traversal-window (``trav_lanes``) equality gates.

With ``trav_lanes=C`` the megakernel runs each unrolled traversal window
on a C-row sub-batch holding the lanes whose traversal is open
(``cur >= 0``), gathered as one packed row each and scattered back after
the window (kernels/megakernel.py, the window in ``body``). It is a pure
scheduling change: per-lane step arithmetic, RNG streams, claim order and
shading are the very same ops, so images must equal the full-width
kernel's BIT-FOR-BIT.

The sub-batch is a prefix of a stable sort, so when more than C lanes are
traversing the overflow lanes simply wait (their state is untouched) and
the per-iteration rotation re-prioritizes them next window — these tests
deliberately run C == lanes/2 so overflow + rotation are exercised on
every scene, not just the sparse-traversal case the knob targets.

Covered compositions mirror tests/test_packet.py: plain, rpp>1 +
antialias, log-cap deferral, multi-instance advance, NEE shadow segments,
and the sphere-BVH phase.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.megakernel import render_persistent
from ray_tracer_2_tpu.math.transform import Transform, quat_rotate_y
from ray_tracer_2_tpu.scene.definition import (
    CameraDescriptor, MaterialDefinition, MeshFromData, SceneDefinition,
)
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

from tests.test_packet import (  # noqa: F401  (reused fixtures)
    _uv_sphere_mesh, mesh_scene, two_instance_scene,
)

W, H = 64, 36


def _render(scene, C, **kw):
    args = dict(width=W, height=H, bounces=3, rays_per_pixel=1,
                skybox=True, lanes=256, trav_lanes=C)
    args.update(kw)
    img, segs = render_persistent(scene, jnp.int32(2), **args)
    return np.asarray(img), float(segs)


def _assert_equal(scene, C, **kw):
    img1, seg1 = _render(scene, 0, **kw)
    imgC, segC = _render(scene, C, **kw)
    assert seg1 == segC
    np.testing.assert_array_equal(img1, imgC)


def test_trav_compact_bit_equal_mesh(mesh_scene):
    _assert_equal(mesh_scene, 128)


def test_trav_compact_rpp_antialias(mesh_scene):
    _assert_equal(mesh_scene, 128, rays_per_pixel=2, antialias=True)


def test_trav_compact_log_cap_deferral(mesh_scene):
    _assert_equal(mesh_scene, 128, log_cap=128)


def test_trav_compact_two_instances(two_instance_scene):
    _assert_equal(two_instance_scene, 128)


def test_trav_compact_nee_shadow_segments():
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
    _assert_equal(scene, 128, nee=True, skybox=False)


def test_trav_compact_sphere_bvh(monkeypatch):
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
        _assert_equal(scene, 128)
    finally:
        jax.clear_caches()
