"""Built-in scene constructors (ref: scene.rs:280-1014).

All seven selectable scenes (Balls, RandomBalls, Room, Room2, Metal, Sponza,
CornellBox) plus the unused-but-present constructors (texture_test, obj_test,
bugatti) for API parity. RandomBalls uses a fixed numpy seed — the reference
uses an unseeded thread RNG (scene.rs:403), so its layout is nondeterministic;
ours is reproducible by design.

Missing large assets (Dragon_80K.obj, sponza.obj, f1/f1.obj are absent from
the reference mount): Dragon_80K is synthesized exactly by midpoint-subdividing
dragon.obj to 80k triangles (identical surface, 80k-triangle BVH load —
assets/procedural.py).
"""
from __future__ import annotations

import enum
import math

import numpy as np

from ray_tracer_2_tpu.math.transform import (
    Transform, quat_identity, quat_rotate_x, quat_rotate_y,
)
from ray_tracer_2_tpu.scene.camera import CameraDescriptor
from ray_tracer_2_tpu.scene.definition import (
    MeshData, MeshFromData, MeshFromFile, SceneDefinition,
)
from ray_tracer_2_tpu.scene.material import MaterialDefinition, MaterialFlag


class SceneName(enum.Enum):
    """scene.rs:34-68."""

    BALLS = "Balls"
    RANDOM_BALLS = "RandomBalls"
    ROOM = "Room"
    ROOM2 = "Room2"
    METAL = "Metal"
    SPONZA = "Sponza"
    CORNELL_BOX = "CornellBox"
    EMPTY = "Empty"

    def next(self) -> "SceneName":
        cycle = [SceneName.BALLS, SceneName.RANDOM_BALLS, SceneName.ROOM,
                 SceneName.ROOM2, SceneName.METAL, SceneName.SPONZA,
                 SceneName.CORNELL_BOX]
        if self not in cycle:
            return self
        return cycle[(cycle.index(self) + 1) % len(cycle)]

    @classmethod
    def all(cls) -> list["SceneName"]:
        """The 7 selectable scenes (scene.rs:59-67)."""
        return [cls.BALLS, cls.RANDOM_BALLS, cls.ROOM, cls.ROOM2, cls.METAL,
                cls.SPONZA, cls.CORNELL_BOX]


def _quad_mesh(verts, normal, indices) -> MeshFromData:
    verts = np.asarray(verts, np.float32)
    n = np.tile(np.asarray(normal, np.float32)[None, :], (len(verts), 1))
    data = MeshData.from_vertices(verts, n, indices=np.asarray(indices, np.uint32))
    return MeshFromData(data)


def balls() -> SceneDefinition:
    """scene.rs:802-863."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([3.089, 1.53, -3.0], [-2.0, -1.0, 2.0]),
        fov=45.0, near=0.1, far=100.0, focus_dist=0.1))
    new = MaterialDefinition.new
    s.add_sphere([-3.64, -0.42, 0.8028], 0.75,
                 new().specular_([1.0] * 4, 0.7).with_color([1.0, 1.0, 1.0, 1.0]))
    s.add_sphere([-2.54, -0.72, 0.5], 0.6,
                 new().with_color([1.0, 0.0, 0.0, 1.0]).specular_([1, 0, 0, 1], 0.5))
    s.add_sphere([-1.27, -0.72, 1.0], 0.5,
                 new().with_color([0.0, 1.0, 0.0, 1.0]).specular_([0, 1, 0, 1], 0.2))
    s.add_sphere([-0.5, -0.9, 1.55], 0.35, new().with_color([0.0, 0.0, 1.0, 1.0]))
    s.add_sphere([-3.46, -15.88, 2.76], 15.0, new().with_color([0.5, 0.0, 0.8, 1.0]))
    s.add_sphere([-7.44, -0.72, 20.0], 15.0,
                 new().with_color([0.1, 0.1, 0.1, 0.0]).emissive([1.0] * 4, 1.0))
    return s


def random_balls(seed: int = 42) -> SceneDefinition:
    """scene.rs:365-444 (RTiOW final scene; ~480 random small spheres)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([13.0, 2.0, 3.0], [0.0, 0.0, 0.0]),
        fov=20.0, aspect=16.0 / 9.0, near=0.1, far=100.0, focus_dist=10.0))
    new = MaterialDefinition.new
    s.add_sphere([0.0, -1000.0, 0.0], 1000.0, new().with_color([0.5, 0.5, 0.5, 1.0]))
    s.add_sphere([0.0, 1.0, 0.0], 1.0, new().glass(1.5))
    s.add_sphere([-4.0, 1.0, 0.0], 1.0, new().with_color([0.4, 0.2, 0.1, 1.0]))
    s.add_sphere([4.0, 1.0, 0.0], 1.0,
                 new().with_color([0.7, 0.6, 0.5, 1.0])
                 .specular_([0.7, 0.6, 0.5, 1.0], 1.0).smooth(1.0))

    rng = np.random.default_rng(seed)
    for a in range(-11, 11):
        for b in range(-11, 11):
            mat = rng.random()
            center = np.array([a + 0.9 * rng.random(), 0.2,
                               b + 0.9 * rng.random()], np.float32)
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if mat < 0.8:
                albedo = [rng.random(), rng.random(), rng.random(), 1.0]
                s.add_sphere(center, 0.2, new().with_color(albedo))
            elif mat < 0.95:
                albedo = [rng.uniform(0.5, 1.0), rng.uniform(0.5, 1.0),
                          rng.uniform(0.5, 1.0), 1.0]
                fuzz = rng.uniform(0.0, 0.5)
                s.add_sphere(center, 0.2,
                             new().with_color(albedo).specular_([1.0] * 4, fuzz))
            else:
                s.add_sphere(center, 0.2, new().glass(1.3))
    return s


def room() -> SceneDefinition:
    """scene.rs:445-573."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.0, 3.0], [0.0, 1.0, 2.0]),
        fov=45.0, near=0.1, far=100.0, focus_dist=0.1))
    new = MaterialDefinition.new
    t = Transform()
    s.add_mesh(t, _quad_mesh([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]],
                             [0, 1, 0], [2, 1, 0, 3, 2, 0]),
               new().with_color([1.0, 0.0, 0.0, 1.0]))
    s.add_mesh(t, _quad_mesh([[-2, 4, -2], [2, 4, -2], [2, 4, 2], [-2, 4, 2]],
                             [0, -1, 0], [0, 1, 2, 0, 2, 3]),
               new().with_color([0.0, 0.3, 0.3, 1.0]))
    s.add_mesh(t, _quad_mesh([[-2, 0, -2], [-2, 4, -2], [-2, 4, 2], [-2, 0, 2]],
                             [1, 0, 0], [0, 1, 2, 0, 2, 3]),
               new().specular_([1.0] * 4, 1.0).smooth(1.0))
    s.add_mesh(t, _quad_mesh([[2, 0, -2], [2, 0, 2], [2, 4, 2], [2, 4, -2]],
                             [-1, 0, 0], [0, 1, 2, 0, 2, 3]),
               new().specular_([1.0] * 4, 0.99).smooth(0.99))
    s.add_mesh(t, _quad_mesh([[-2, 0, 2], [2, 0, 2], [2, 4, 2], [-2, 4, 2]],
                             [0, 0, -1], [2, 1, 0, 3, 2, 0]),
               new().with_color([0.2, 0.2, 0.82, 1.0])
               .specular_([1.0] * 4, 0.99).smooth(0.99))
    s.add_mesh(t, _quad_mesh([[-0.4, 3.98, -0.4], [0.4, 3.98, -0.4],
                              [0.4, 3.98, 0.4], [-0.4, 3.98, 0.4]],
                             [0, -1, 0], [0, 1, 2, 0, 2, 3]),
               new().emissive([1.0] * 4, 3.0))
    s.add_sphere([0.4, 1.0, 0.0], 0.3,
                 new().with_color([0.4, 0.9, 0.4, 1.0]).glass(1.34))
    s.add_sphere([-0.4, 1.0, 0.0], 0.4,
                 new().with_color([0.7, 0.7, 0.7, 1.0]).specular_([1.0] * 4, 0.2))
    return s


def room_2() -> SceneDefinition:
    """scene.rs:574-757 ("infinite room": two dragons, DoF, warm area light)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.28, 13.5], [0.0, 1.28, 12.5]),
        fov=26.0, near=0.1, far=100.0, focus_dist=8.6,
        defocus_strength=100.0, diverge_strength=1.5))
    new = MaterialDefinition.new
    width, depth, height = 3.0, 2.0, 4.0
    dragon_mat = (new().with_color([0.96078, 0.11372, 0.4039, 1.0])
                  .smooth(0.8).specular_([1.0] * 4, 0.015))
    s.add_mesh(Transform(pos=[0.0, 1.2, -0.6], rot=quat_rotate_y(-1.5708),
                         scale=[4.7, 4.7, 4.7]),
               MeshFromFile("Dragon_80K.obj", use_mtl=False), dragon_mat)
    s.add_mesh(Transform(pos=[0.0, 7.2, 2.0], rot=quat_rotate_y(-1.5708)),
               MeshFromFile("Dragon_80K.obj", use_mtl=False), dragon_mat)
    t = Transform()
    s.add_mesh(t, _quad_mesh([[-10, -0.01, -10], [10, -0.01, -10],
                              [10, -0.01, 10], [-10, -0.01, 10]],
                             [0, 1, 0], [2, 1, 0, 3, 2, 0]),
               new().with_color([0.4, 0.4, 0.64313, 1.0]))
    s.add_mesh(t, _quad_mesh([[-10, 8.5, -10], [10, 8.5, -10],
                              [10, 8.5, 10], [-10, 8.5, 10]],
                             [0, -1, 0], [0, 1, 2, 0, 2, 3]),
               new().with_color([0.898, 0.87, 0.815, 1.0])
               .smooth(0.877).specular_([1.0] * 4, 0.327))
    s.add_mesh(t, _quad_mesh([[-width, 0, -depth], [width, 0, -depth],
                              [width, 0, depth], [-width, 0, depth]],
                             [0, 1, 0], [2, 1, 0, 3, 2, 0]),
               new().with_color([0.898, 0.87, 0.815, 1.0]))
    s.add_mesh(t, _quad_mesh([[-width, height, -depth], [width, height, -depth],
                              [width, height, depth], [-width, height, depth]],
                             [0, -1, 0], [0, 1, 2, 0, 2, 3]),
               new().with_color([1.0, 0.9647, 0.9019, 1.0]))
    s.add_mesh(t, _quad_mesh([[-width, 0, -depth], [-width, height, -depth],
                              [-width, height, depth], [-width, 0, depth]],
                             [1, 0, 0], [0, 1, 2, 0, 2, 3]),
               new().with_color([0.0705, 0.596, 0.2078, 1.0]))
    s.add_mesh(t, _quad_mesh([[width, 0, -depth], [width, 0, depth],
                              [width, height, depth], [width, height, -depth]],
                             [-1, 0, 0], [0, 1, 2, 0, 2, 3]),
               new().with_color([0.7725, 0.12156, 0.188235, 1.0]))
    s.add_mesh(t, _quad_mesh([[-width, 0, -depth], [width, 0, -depth],
                              [width, height, -depth], [-width, height, -depth]],
                             [0, 0, 1], [0, 1, 2, 0, 2, 3]),
               new().with_color([0.1254, 0.41176, 0.8274, 1.0]))
    s.add_mesh(t, _quad_mesh([[-0.8, height - 0.02, -0.8], [0.8, height - 0.02, -0.8],
                              [0.8, height - 0.02, 0.8], [-0.8, height - 0.02, 0.8]],
                             [0, -1, 0], [0, 1, 2, 0, 2, 3]),
               new().emissive([1.0, 0.8588, 0.3529, 1.0], 60.0))
    s.add_sphere([0.0, 1.0, 4.4], 1.15,
                 new().specular_([1.0] * 4, 0.517).smooth(1.0).glass(1.6))
    return s


def metal() -> SceneDefinition:
    """scene.rs:758-801."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.0, 3.0], [0.0, 0.0, -1.0]),
        fov=45.0, near=0.1, far=100.0, focus_dist=0.1))
    new = MaterialDefinition.new
    s.add_sphere([0.0, -100.5, -1.0], 100.0, new().with_color([0.8, 0.8, 0.0, 1.0]))
    s.add_sphere([0.0, 0.0, -1.0], 0.5, new().with_color([0.7, 0.3, 0.3, 1.0]))
    s.add_sphere([-1.0, 0.0, -1.0], 0.5,
                 new().with_color([0.8, 0.8, 0.8, 1.0]).glass(1.3))
    s.add_sphere([1.0, 0.0, -1.0], 0.5,
                 new().with_color([0.8, 0.6, 0.2, 1.0]).specular_([1.0] * 4, 0.15))
    return s


def sponza() -> SceneDefinition:
    """scene.rs:864-910 (0.05 scale sponza + big quad light + emissive sphere)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 4.0, 0.0], [0.0, 4.0, 1.0])))
    s.add_mesh(Transform(scale=[0.05, 0.05, 0.05]),
               MeshFromFile("sponza.obj", use_mtl=True),
               MaterialDefinition.texture_from_obj())
    s.add_mesh(Transform(pos=[-15.0, 60.0, 0.0], rot=quat_rotate_x(math.pi / 2),
                         scale=[40.0, 20.0, 1.0]),
               MeshFromData(MeshData.quad(),
                            indices=np.array([0, 1, 2, 0, 2, 3], np.uint32)),
               MaterialDefinition().emissive([1.0] * 4, 4.0))
    s.add_sphere([5.0, 2.0, 0.0], 2.0, MaterialDefinition(
        color=(1.0, 1.0, 1.0, 1.0), emission_color=(1.0, 1.0, 1.0, 1.0),
        emission_strength=10.0, specular_color=(1.0, 1.0, 1.0, 1.0),
        smoothness=0.0, specular=0.0))
    return s


def cornell_box() -> SceneDefinition:
    """scene.rs:911-933."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.0, 2.0], [0.0, 1.0, 0.0])))
    s.add_mesh(Transform(), MeshFromFile("CornellBox-Original.obj", use_mtl=True),
               MaterialDefinition.texture_from_obj())
    return s


def texture_test() -> SceneDefinition:
    """scene.rs:280-309 (earthmap-textured sphere)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.0, -1.0], [0.0, 0.0, 0.0])))
    s.add_sphere([0.0, 0.0, 0.0], 1.0, MaterialDefinition(
        color=(1.0, 0.0, 0.0, 1.0), specular_color=(1.0, 1.0, 1.0, 1.0),
        smoothness=0.0, specular=0.05, ior=1.0, flag=MaterialFlag.TEXTURE,
        diffuse_texture="earthmap.png"))
    return s


def obj_test() -> SceneDefinition:
    """scene.rs:310-364 (small dragon + quad + spheres)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([5.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        fov=45.0, near=0.1, far=100.0, focus_dist=1.0))
    new = MaterialDefinition.new
    s.add_mesh(Transform(), MeshFromFile("dragon.obj", use_mtl=False), new())
    quad = MeshData.from_vertices(
        [[0.5, 0.0, -1.0], [0.5, 1.0, -1.0], [0.0, 1.0, 1.0], [0.2, 0.0, 1.0]],
        [[1, 0, 0]] * 4, indices=np.array([0, 1, 2, 0, 2, 3], np.uint32))
    s.add_mesh(Transform(), MeshFromData(quad),
               new().with_color([1.0, 1.0, 0.0, 1.0]).emissive([1, 0, 0, 1], 0.4))
    s.add_sphere([1.8, 0.1, 1.0], 0.6, new().with_color([1.0, 0.0, 0.0, 1.0]))
    s.add_sphere([1.0, 0.5, 1.0], 0.3, new().with_color([1.0, 0.0, 0.0, 1.0]))
    s.add_sphere([0.0, -10.0, 0.0], 10.0, new().with_color([1.0, 0.0, 0.0, 1.0]))
    return s


def bugatti() -> SceneDefinition:
    """scene.rs:934-983 (f1 car; asset missing from the mount)."""
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.0, 0.0], [0.0, 0.0, 1.0])))
    s.add_mesh(Transform(scale=[0.05, 0.05, 0.05]),
               MeshFromFile("f1/f1.obj", use_mtl=True),
               MaterialDefinition.texture_from_obj())
    s.add_mesh(Transform(pos=[-15.0, 60.0, 0.0], rot=quat_rotate_x(math.pi / 2),
                         scale=[40.0, 20.0, 1.0]),
               MeshFromData(MeshData.quad(),
                            indices=np.array([0, 1, 2, 0, 2, 3], np.uint32)),
               MaterialDefinition().emissive([1.0] * 4, 4.0))
    s.add_sphere([5.0, 2.0, 0.0], 2.0, MaterialDefinition(
        color=(1.0, 1.0, 1.0, 1.0), emission_color=(1.0, 1.0, 1.0, 1.0),
        emission_strength=10.0, specular_color=(1.0, 1.0, 1.0, 1.0),
        smoothness=0.0, specular=0.0))
    return s


_BUILDERS = {
    SceneName.BALLS: balls,
    SceneName.RANDOM_BALLS: random_balls,
    SceneName.ROOM: room,
    SceneName.ROOM2: room_2,
    SceneName.METAL: metal,
    SceneName.SPONZA: sponza,
    SceneName.CORNELL_BOX: cornell_box,
}


def build_scene_definition(name: SceneName, assets=None) -> SceneDefinition:
    """Scene::from_name (scene.rs:1003-1014)."""
    if name == SceneName.EMPTY:
        raise NotImplementedError("Empty scene has no constructor (scene.rs:1012)")
    return _BUILDERS[name]()
