"""Frame-batched dispatch (renderer.render_frames_batched /
sharding.render_frames_batched_mesh) vs sequential per-frame renders.

The batched path must be BIT-identical to n sequential ``render_frame``
calls: per-frame RNG seeds derive from the frame index and the accumulation
weight is the reference protocol 1/(frames+1) applied per frame
(ray_tracer.wgsl:154-161) — batching only changes where the loop runs
(device ``fori_loop`` vs host dispatches)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def _params(w=64, h=32):
    return RenderParams(width=w, height=h, bounces=3, rays_per_pixel=1,
                        skybox=True, frames=0)


def test_batched_matches_sequential_single_device():
    host = instantiate_scene(scenes.metal())
    p = _params()
    seq = Renderer(lanes=256, mesh=None)
    segs = 0.0
    for f in range(4):
        fb = seq.render(host.render_scene, dataclasses.replace(p, frames=f))
        segs += float(seq.last_segments)
    bat = Renderer(lanes=256, mesh=None)
    fb_b = bat.render_batch(host.render_scene, p, 4)
    assert np.array_equal(np.asarray(fb), np.asarray(fb_b))
    assert segs == float(bat.last_segments)


def test_batched_matches_sequential_mesh():
    """On the 8-virtual-device conftest mesh the Renderer auto-adopts a rows
    mesh — the batched call must route through render_frames_batched_mesh
    and stay bit-identical (sharded framebuffer case, advisor r4 finding)."""
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the multi-device conftest")
    host = instantiate_scene(scenes.metal())
    p = _params()
    seq = Renderer(lanes=256)
    for f in range(3):
        fb = seq.render(host.render_scene, dataclasses.replace(p, frames=f))
    bat = Renderer(lanes=256)
    fb_b = bat.render_batch(host.render_scene, p, 3)
    assert bat.mesh is not None
    assert np.array_equal(np.asarray(fb), np.asarray(fb_b))


def test_batched_continues_accumulation():
    """A batch starting at frames=k must blend into an existing buffer the
    same way sequential frames do (progressive protocol across batches)."""
    host = instantiate_scene(scenes.metal())
    p = _params()
    seq = Renderer(lanes=256, mesh=None)
    for f in range(5):
        fb = seq.render(host.render_scene, dataclasses.replace(p, frames=f))
    two = Renderer(lanes=256, mesh=None)
    two.render_batch(host.render_scene, dataclasses.replace(p, frames=0), 2)
    fb_b = two.render_batch(host.render_scene,
                            dataclasses.replace(p, frames=2), 3)
    assert np.array_equal(np.asarray(fb), np.asarray(fb_b))
