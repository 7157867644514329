"""Pallas sphere-scene megakernel vs the XLA paths (interpret mode on CPU).

The kernel reimplements the full path trace component-wise for Mosaic; the
RNG stream and op order match kernels/trace.py, so agreement must be
near-bitwise, including exact traced-segment counts.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.kernels.pallas_spheres import (eligible,
                                                     render_spheres_pallas)
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


@pytest.mark.parametrize("build,name", [(scenes.metal, "metal"),
                                        (scenes.balls, "balls")])
def test_matches_xla_paths(build, name):
    rs = instantiate_scene(build()).render_scene
    assert eligible(rs)
    W, H = 64, 36
    img_p, segs_p = render_spheres_pallas(
        rs, jnp.int32(2), width=W, height=H, bounces=3, rays_per_pixel=2,
        skybox=True, interpret=True)
    img_x, segs_x = render_sample(
        rs, jnp.int32(2), jnp.float32(1.0), width=W, height=H, bounces=3,
        rays_per_pixel=2, skybox=True, debug_mode=0, tile_rows=8)
    assert float(segs_p) == float(segs_x)
    err = np.abs(np.asarray(img_p) - np.asarray(img_x)).max(axis=-1)
    frac = (err < 1e-3).mean()
    assert frac >= 0.99, f"{name}: {frac:.2%} pixels match (max {err.max()})"


def test_glass_scene_matches():
    """random_balls includes glass + specular + ~484 spheres (4 chunks)."""
    rs = instantiate_scene(scenes.random_balls()).render_scene
    assert eligible(rs)
    W, H = 48, 27
    img_p, segs_p = render_spheres_pallas(
        rs, jnp.int32(1), width=W, height=H, bounces=2, rays_per_pixel=1,
        skybox=True, interpret=True)
    img_x, segs_x = render_sample(
        rs, jnp.int32(1), jnp.float32(1.0), width=W, height=H, bounces=2,
        rays_per_pixel=1, skybox=True, debug_mode=0, tile_rows=8)
    # float re-association can flip a rare RNG/threshold decision on one
    # lane (observed: 2246 vs 2245 segments); demand near-exact agreement
    assert abs(float(segs_p) - float(segs_x)) <= 2
    err = np.abs(np.asarray(img_p) - np.asarray(img_x)).max(axis=-1)
    assert (err < 1e-3).mean() >= 0.98


def test_eligibility_gates():
    room = instantiate_scene(scenes.room()).render_scene
    assert eligible(room)      # small mesh (12 tris): handled in-kernel
    tex = instantiate_scene(scenes.texture_test()).render_scene
    assert not eligible(tex)   # texture sampling not implemented in-kernel


@pytest.mark.parametrize("build,name", [(scenes.cornell_box, "cornell"),
                                        (scenes.room, "room")])
def test_triangle_scenes_match_xla(build, name):
    """Small-mesh scenes run whole-path with WORLD-baked triangles. The
    XLA path intersects in model space and re-measures world distance, so
    agreement is FP-noise-level (same RNG stream, same draws) rather than
    bit-exact: gate on pixel-match fraction, not segment counts."""
    rs = instantiate_scene(build()).render_scene
    assert eligible(rs)
    W, H = 64, 36
    img_p, segs_p = render_spheres_pallas(
        rs, jnp.int32(2), width=W, height=H, bounces=3, rays_per_pixel=1,
        skybox=True, interpret=True)
    img_x, segs_x = render_sample(
        rs, jnp.int32(2), jnp.float32(1.0), width=W, height=H, bounces=3,
        rays_per_pixel=1, skybox=True, debug_mode=0, tile_rows=8)
    # a boundary FP flip re-routes a whole path; allow a small tail
    rel = abs(float(segs_p) - float(segs_x)) / float(segs_x)
    assert rel < 0.02, f"{name}: segment counts diverge {rel:.3%}"
    err = np.abs(np.asarray(img_p) - np.asarray(img_x)).max(axis=-1)
    frac = (err < 1e-3).mean()
    assert frac >= 0.95, f"{name}: {frac:.2%} pixels match (max {err.max()})"
