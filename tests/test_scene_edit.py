"""Live scene-edit semantics (egui.rs:156-365): edits hit exactly one entity
and re-upload only the affected arrays."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def render(rs, w=32, h=32):
    img, _ = render_sample(rs, jnp.int32(0), jnp.float32(1.0), width=w,
                           height=h, bounces=2, rays_per_pixel=1, skybox=True,
                           debug_mode=0, tile_rows=8)
    return np.asarray(img)


def test_sphere_move_changes_image():
    host = instantiate_scene(scenes.metal())
    before = render(host.render_scene)
    host.edit_sphere(1, centre=[0.0, 5.0, -1.0])  # move the red sphere away
    after = render(host.render_scene)
    assert not np.allclose(before, after)


def test_material_color_edit_is_per_entity():
    host = instantiate_scene(scenes.metal())
    rs = host.render_scene
    # every sphere owns a unique material row
    mats = np.asarray(rs.sphere_mat)
    assert len(set(mats.tolist())) == len(mats)
    mid = int(mats[1])
    host.edit_material(mid, color=(0.0, 0.0, 1.0, 1.0))
    row = np.asarray(host.render_scene.mat_rows[mid])
    np.testing.assert_allclose(row[0:4], [0, 0, 1, 1])
    # other rows untouched
    other = np.asarray(host.render_scene.mat_rows[int(mats[0])])
    assert not np.allclose(other[0:4], [0, 0, 1, 1])


def test_glass_toggle_repacks_cull_flags(assets):
    from tests.conftest import require_asset
    require_asset(assets, "CornellBox-Original.obj")
    host = instantiate_scene(scenes.cornell_box())
    rs = host.render_scene
    packed_before = np.asarray(rs.packed_rows)
    # toggle some mesh material to glass: cull flags for its triangles flip
    mid = int(np.asarray(rs.tri_mat)[0])
    host.edit_material(mid, flag=1, ior=1.5)
    packed_after = np.asarray(host.render_scene.packed_rows)
    assert not np.array_equal(packed_before, packed_after)
    # cull columns only
    from ray_tracer_2_tpu.accel.packed import COL_CULLS
    diff_cols = np.unique(np.nonzero(packed_before != packed_after)[1])
    assert set(diff_cols.tolist()) <= set(range(COL_CULLS, COL_CULLS + 4))


def test_instance_transform_edit():
    from ray_tracer_2_tpu.math.transform import Transform
    host = instantiate_scene(scenes.room())
    before = render(host.render_scene)
    host.edit_instance_transform(0, Transform(pos=[0.0, 10.0, 0.0]))
    after = render(host.render_scene)
    assert not np.allclose(before, after)


def test_sponza_substitute_loads(assets):
    """The procedural sponza substitute completes the 7-scene list with the
    real sponza.mtl materials + textures."""
    from tests.conftest import require_asset
    require_asset(assets, "sponza.mtl")
    host = instantiate_scene(scenes.sponza())
    assert host.n_triangles > 20000
    assert len(host.records) >= 10
    # textured materials resolved to atlas slots
    import numpy as np
    assert (np.asarray(host.render_scene.materials.diffuse_index) >= 0).sum() >= 8
