"""Viewer server logic (input routing, state JSON) without HTTP."""
import numpy as np
import pytest

from ray_tracer_2_tpu.engine import Engine
from ray_tracer_2_tpu.scene.scenes import SceneName
from ray_tracer_2_tpu.viewer.server import ViewerServer


@pytest.fixture(scope="module")
def viewer():
    eng = Engine(width=48, height=32, initial_scene=SceneName.METAL,
                 block_on_initial_scene=True)
    eng.update(dt=0.01)
    return ViewerServer(eng)


def test_state_shape(viewer):
    s = viewer.state()
    assert s["scene"] == "Metal"
    assert len(s["scenes"]) == 7
    assert s["params"]["bounces"] == 5
    assert s["camera"] is not None and len(s["camera"]["pos"]) == 3


def test_keyboard_moves_camera(viewer):
    eng = viewer.engine
    pos0 = eng.scene_manager.scene.camera.transform.pos.copy()
    viewer.handle_input({"keys": {"w": True}})
    eng.update(dt=0.1)
    viewer.handle_input({"keys": {"w": False}})
    assert not np.allclose(pos0, eng.scene_manager.scene.camera.transform.pos)
    # movement reset accumulation
    assert eng.params.frames <= 0


def test_param_set_resets_accumulation(viewer):
    eng = viewer.engine
    eng.update(dt=0.01)
    eng.update(dt=0.01)
    viewer.handle_input({"set": {"bounces": 3}})
    assert eng.params.bounces == 3 and eng.params.frames == -1
    viewer.handle_input({"set": {"skybox": False}})
    assert not eng.params.skybox


def test_entity_edit_via_input(viewer):
    eng = viewer.engine
    rs0 = eng.scene_manager.scene.render_scene
    viewer.handle_input({"edit_entity": {
        "kind": "sphere", "index": 0, "centre": [9.0, 9.0, 9.0]}})
    rs1 = eng.scene_manager.scene.render_scene
    np.testing.assert_allclose(np.asarray(rs1.sphere_pos[0]), [9, 9, 9])


def test_stats_refresh_under_continuous_async_dispatch(viewer):
    """A render loop that always has a frame in flight must still see
    stats advance: every settle snapshots the numbers, so the
    non-blocking property returns the LAST SETTLED frame's stats (it used
    to return the initial zeros forever, pinning the viewer debug panel
    at frame 0 / 0 fps)."""
    eng = viewer.engine
    frames_seen = []
    for _ in range(6):
        eng.update(dt=0.01)     # async dispatch, like ViewerServer's loop
        frames_seen.append(eng.stats.frame)
    assert max(frames_seen) >= frames_seen[0] + 4, frames_seen
    assert eng.stats.mrays_per_s > 0.0


def test_bad_input_is_harmless(viewer):
    viewer.handle_input({"set": {"nonexistent": 1}})
    viewer.handle_input({"edit_entity": {"kind": "sphere", "index": 999,
                                         "radius": 1.0}})
    viewer.handle_input({"keys": {"zz": True}})
