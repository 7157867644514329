"""Triangle-path oracle parity: the persistent-lanes megakernel's mesh
pipeline (instance merge, world-distance compare, barycentric shading —
megakernel.py:164-201) validated draw-for-draw against the scalar oracle.

Two scenes cover both mesh code paths:
  * room(): quads + glass/mirror spheres -> brute-force instance prepass
  * a >1024-tri procedural sphere mesh   -> BVH traversal path
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.math.transform import Transform, quat_rotate_y
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.camera import CameraDescriptor
from ray_tracer_2_tpu.scene.definition import (MeshData, MeshFromData,
                                               SceneDefinition)
from ray_tracer_2_tpu.scene.material import MaterialDefinition
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

from tests import oracle


def _compare_pixels(rs, W, H, frames, bounces, pixels, min_exact=0.95):
    img, _ = render_sample(rs, jnp.int32(frames), jnp.float32(1.0),
                           width=W, height=H, bounces=bounces,
                           rays_per_pixel=1, skybox=True, debug_mode=0,
                           tile_rows=8)
    img = np.asarray(img)
    spheres = oracle.spheres_from_scene(rs)
    meshes = oracle.meshes_from_scene(rs)
    cam = oracle.camera_from_scene(rs)
    errs = []
    for x, y in pixels:
        exp = oracle.render_pixel(spheres, cam, x, y, W, H, frames,
                                  bounces, 1, True, meshes)
        errs.append(np.abs(img[y, x] - exp).max())
    errs = np.asarray(errs)
    frac = (errs < 1e-3).mean()
    assert frac >= min_exact, \
        f"only {frac:.2%} pixels near-bitwise (max err {errs.max():.4f})"


def test_room_matches_oracle():
    """Quads (brute path) + glass + mirror + emissive vs the scalar oracle."""
    rs = instantiate_scene(scenes.room()).render_scene
    W, H = 48, 27
    xs = np.arange(1, W, 5)
    ys = np.arange(1, H, 5)
    pixels = [(int(x), int(y)) for y in ys for x in xs]
    _compare_pixels(rs, W, H, frames=2, bounces=3, pixels=pixels)


@pytest.fixture(scope="module")
def bvh_mesh_scene():
    # deterministic UV-sphere triangle soup, >1024 tris => BVH path
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
            a, b, c, d = xyz[i, j], xyz[i + 1, j], xyz[i + 1, j + 1], xyz[i, j + 1]
            quads += [[a, b, c], [a, c, d]]
    soup = np.asarray(quads, np.float32)          # (T, 3, 3)
    tris = len(soup)
    assert tris > 1024
    mesh = MeshData.from_vertices(soup.reshape(-1, 3),
                                  soup.reshape(-1, 3))  # normals = positions

    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.6, 3.2], [0.0, 0.5, 0.0]),
        fov=42.0, focus_dist=3.2))
    s.add_mesh(Transform(pos=[0.0, 0.5, 0.0], rot=quat_rotate_y(0.7),
                         scale=[0.9, 0.9, 0.9]),
               MeshFromData(mesh),
               MaterialDefinition.new().with_color([0.8, 0.3, 0.2, 1.0])
               .smooth(0.4).specular_([1.0] * 4, 0.1))
    s.add_sphere([1.1, 0.35, 0.6], 0.35,
                 MaterialDefinition.new().with_color([0.4, 0.9, 0.4, 1.0]))
    return instantiate_scene(s).render_scene


def test_bvh_mesh_matches_oracle(bvh_mesh_scene):
    """BVH-path instance (1496 tris) parity: pins skip-link traversal +
    world-distance merge against the scalar brute-force oracle."""
    W, H = 40, 24
    pixels = [(int(x), int(y))
              for y in range(2, H, 6) for x in range(2, W, 6)]
    _compare_pixels(bvh_mesh_scene, W, H, frames=1, bounces=2, pixels=pixels)
