"""Normal-map shading in the lit path (RenderParams.normal_maps).

The reference STUBS normal-map shading (ray_tracer.wgsl:440-447 is a
commented-out TODO; only debug mode 1 previews the map). Here it is
implemented via per-triangle tangent frames (accel/packed.py), gated off by
default for reference parity.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.math.transform import Transform
from ray_tracer_2_tpu.scene.camera import CameraDescriptor
from ray_tracer_2_tpu.scene.definition import (MeshData, MeshFromData,
                                               SceneDefinition)
from ray_tracer_2_tpu.scene.material import MaterialDefinition
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


@pytest.fixture(scope="module")
def nm_scene(tmp_path_factory):
    # synthetic normal map: left half flat (128,128,255), right half tilted
    # hard toward +tangent-x (255,128,128)
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16] = (128, 128, 255)
    img[:, 16:] = (255, 128, 128)
    path = tmp_path_factory.mktemp("nm") / "test_nm.png"
    Image.fromarray(img).save(path)

    quad = MeshData.quad()
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.0, 3.0], [0.0, 0.0, 0.0]),
        fov=40.0, focus_dist=3.0))
    mat = dataclasses.replace(
        MaterialDefinition.new().with_color([0.7, 0.7, 0.7, 1.0]),
        normal_texture=str(path))
    s.add_mesh(Transform(), MeshFromData(quad, indices=[0, 1, 2, 0, 2, 3]),
               mat)
    return instantiate_scene(s).render_scene


def _render(rs, normal_maps):
    img, _ = render_sample(rs, jnp.int32(2), jnp.float32(1.0), width=48,
                           height=32, bounces=2, rays_per_pixel=1,
                           skybox=True, debug_mode=0, tile_rows=8,
                           normal_maps=normal_maps)
    return np.asarray(img)


def test_normal_index_resolved(nm_scene):
    assert int(np.asarray(nm_scene.materials.normal_index).max()) >= 0


def test_flag_off_is_default_and_unperturbed(nm_scene):
    off = _render(nm_scene, False)
    assert np.isfinite(off).all()


def test_normal_maps_perturb_shading(nm_scene):
    off = _render(nm_scene, False)
    on = _render(nm_scene, True)
    # quad occupies the image center; the tilted half must shade differently
    diff = np.abs(on - off).max(axis=-1)
    assert diff.max() > 0.02, "normal map had no effect"
    # the flat half decodes to ~(0,0,1): near-identity perturbation, so the
    # two renders agree there (8-bit quantization leaves ~0.004 tilt)
    flat_cols = diff[:, :48 // 2 - 4]
    changed_cols = diff[:, 48 // 2 + 4:]
    assert changed_cols.max() > flat_cols.max() * 3 or flat_cols.max() < 0.05
