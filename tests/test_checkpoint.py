"""Checkpoint/resume: a restored render must continue the exact RNG stream —
render N frames straight == render k, checkpoint, restore, render N-k."""
import dataclasses

import numpy as np
import pytest

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def test_resume_bitexact(tmp_path):
    host = instantiate_scene(scenes.metal())
    p = RenderParams(width=24, height=16, bounces=2, rays_per_pixel=1,
                     skybox=True)

    # straight run: frames 0..5
    r1 = Renderer()
    for f in range(6):
        fb_straight = r1.render(host.render_scene,
                                dataclasses.replace(p, frames=f))
    fb_straight = np.asarray(fb_straight)

    # run 0..2, checkpoint, restore, run 3..5
    r2 = Renderer()
    for f in range(3):
        fb = r2.render(host.render_scene, dataclasses.replace(p, frames=f))
    ck = tmp_path / "state.npz"
    save_checkpoint(ck, fb, dataclasses.replace(p, frames=2),
                    scene_name="Metal", camera=host.camera)

    loaded = load_checkpoint(ck)
    assert loaded["params"].frames == 2
    assert loaded["scene_name"] == "Metal"
    r3 = Renderer()
    r3.ensure_framebuffer(p.width, p.height)
    import jax.numpy as jnp
    r3.framebuffer = jnp.asarray(loaded["framebuffer"])
    for f in range(3, 6):
        fb_resumed = r3.render(host.render_scene,
                               dataclasses.replace(p, frames=f))
    np.testing.assert_array_equal(fb_straight, np.asarray(fb_resumed))


def test_camera_pose_roundtrip(tmp_path):
    host = instantiate_scene(scenes.metal())
    host.camera.transform.pos = np.array([1.0, 2.0, 3.0], np.float32)
    p = RenderParams(width=8, height=8)
    save_checkpoint(tmp_path / "c.npz", np.zeros((8, 8, 4), np.float32), p,
                    camera=host.camera)
    loaded = load_checkpoint(tmp_path / "c.npz")
    np.testing.assert_allclose(loaded["camera_pose"]["pos"], [1.0, 2.0, 3.0])
