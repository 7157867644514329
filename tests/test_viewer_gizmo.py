"""Pick/drag gizmo: server-side entity selection + camera-plane translation
(viewer/server.py _pick/_drag — the egui gizmo analog, egui.rs:156-365).

Coordinates are DISPLAY-normalized (origin top-left, matching the streamed
JPEG, which is the framebuffer flipped vertically)."""
import numpy as np
import pytest

from ray_tracer_2_tpu.engine import Engine
from ray_tracer_2_tpu.scene.scenes import SceneName
from ray_tracer_2_tpu.viewer.server import ViewerServer


@pytest.fixture(scope="module")
def viewer():
    eng = Engine(width=64, height=36, initial_scene=SceneName.METAL,
                 block_on_initial_scene=True)
    eng.update(dt=0.01)
    return ViewerServer(eng)


def project(viewer, p):
    """Invert the camera model: world point -> display-normalized (u, v)."""
    scene = viewer.engine.scene_manager.scene
    cu = scene.camera.to_uniform()
    m = np.asarray(cu.cam_to_world, np.float64)
    pc = m[:3, :3].T @ (np.asarray(p, np.float64) - m[:3, 3])
    q = pc * (cu.view_params[2] / pc[2])
    u = q[0] / cu.view_params[0] + 0.5
    v_fb = q[1] / cu.view_params[1] + 0.5
    return u, 1.0 - v_fb     # display v flips the framebuffer row axis


def test_pick_selects_sphere_under_cursor(viewer):
    scene = viewer.engine.scene_manager.scene
    pos = np.asarray(scene.render_scene.sphere_pos)
    # pick each sphere via its projected centre; the centre ray must hit
    # that sphere (it can be occluded in depth order — accept any sphere
    # whose centre projects within its own screen footprint, but sphere 0
    # of Metal's row layout is unoccluded)
    u, v = project(viewer, pos[0])
    viewer.handle_input({"pick": [u, v]})
    assert viewer._selected is not None
    assert viewer._selected["kind"] == "sphere"
    sel = viewer._selected["index"]
    # the selected sphere must be sphere 0 or something occluding it
    # (no farther than sphere 0 along the view ray)
    t_sel = np.linalg.norm(pos[sel] - np.asarray(
        scene.camera.to_uniform().cam_to_world, np.float64)[:3, 3])
    t_0 = np.linalg.norm(pos[0] - np.asarray(
        scene.camera.to_uniform().cam_to_world, np.float64)[:3, 3])
    assert t_sel <= t_0 + 1e-6


def test_pick_miss_clears_selection(viewer):
    viewer.handle_input({"pick": [0.0, 0.0]})   # top-left sky corner
    assert viewer._selected is None


def test_drag_moves_sphere_on_camera_plane(viewer):
    scene = viewer.engine.scene_manager.scene
    pos0 = np.asarray(scene.render_scene.sphere_pos).copy()
    u, v = project(viewer, pos0[0])
    viewer.handle_input({"pick": [u, v]})
    assert viewer._selected is not None and viewer._drag_ctx is not None
    idx = viewer._selected["index"]
    cu = scene.camera.to_uniform()
    fwd = np.asarray(cu.cam_to_world, np.float64)[:3, 2]
    origin = np.asarray(cu.cam_to_world, np.float64)[:3, 3]
    depth0 = np.dot(pos0[idx] - origin, fwd)

    viewer.handle_input({"drag": [u + 0.1, v]})
    pos1 = np.asarray(scene.render_scene.sphere_pos)
    moved = pos1[idx] - pos0[idx]
    assert np.linalg.norm(moved) > 1e-3, "drag did not move the sphere"
    # camera-plane translation preserves view depth
    depth1 = np.dot(pos1[idx] - origin, fwd)
    assert abs(depth1 - depth0) < 1e-6 * max(1.0, abs(depth0))
    # dragging right on screen moves along +right axis in world
    right = np.asarray(cu.cam_to_world, np.float64)[:3, 0]
    assert np.dot(moved, right) > 0
    # edit reset accumulation
    assert viewer.engine.params.frames == -1

    # dragging back to the original cursor restores the position
    viewer.handle_input({"drag": [u, v]})
    pos2 = np.asarray(scene.render_scene.sphere_pos)
    np.testing.assert_allclose(pos2[idx], pos0[idx], atol=1e-5)
    viewer.handle_input({"drag_end": True})
    assert viewer._drag_ctx is None


def test_drag_without_pick_is_harmless(viewer):
    viewer.handle_input({"pick": [0.0, 0.0]})   # clears selection
    viewer.handle_input({"drag": [0.5, 0.5]})   # no-op
    viewer.handle_input({"drag_end": True})


def test_state_reports_selection(viewer):
    scene = viewer.engine.scene_manager.scene
    pos = np.asarray(scene.render_scene.sphere_pos)
    u, v = project(viewer, pos[0])
    viewer.handle_input({"pick": [u, v]})
    s = viewer.state()
    assert s["selected"] == viewer._selected


def test_pick_instance_aabb():
    eng = Engine(width=64, height=36, initial_scene=SceneName.ROOM,
                 block_on_initial_scene=True)
    eng.update(dt=0.01)
    vs = ViewerServer(eng)
    # the Room's central view hits the room geometry (instance 0)
    vs.handle_input({"pick": [0.5, 0.85]})   # floor, below centre
    assert vs._selected is not None


def test_aabb_cache_invalidated_on_scene_switch():
    """The instance-AABB pick cache must not serve boxes from a previous
    scene after a scene switch (review finding: id() reuse after gc)."""
    eng = Engine(width=64, height=36, initial_scene=SceneName.ROOM,
                 block_on_initial_scene=True)
    eng.update(dt=0.01)
    vs = ViewerServer(eng)
    scene_a = eng.scene_manager.scene
    box_a = vs._inst_aabb(scene_a, 0)
    assert box_a is not None and len(vs._aabb_cache) == 1
    eng.scene_manager.load_blocking(SceneName.ROOM)   # fresh HostScene
    eng.update(dt=0.01)
    scene_b = eng.scene_manager.scene
    assert scene_b is not scene_a
    vs.handle_input({"pick": [0.5, 0.85]})   # touches _inst_aabb again
    assert vs._aabb_scene is scene_b
    assert all(isinstance(k, int) for k in vs._aabb_cache)


def test_malformed_pick_drag_payloads_do_not_crash(viewer):
    """Garbage pick/drag/edit payloads must not raise out of handle_input
    at the WS layer (the /ws loop logs and continues — review finding)."""
    import logging
    for bad in ({"pick": 5}, {"pick": [0.3]}, {"drag": "x"},
                {"edit_entity": {"kind": "sphere", "index": "zz"}}):
        try:
            viewer.handle_input(bad)
        except Exception:
            pass  # raising is allowed at this level...
    # ...but a subsequent valid message must still work end to end
    viewer.handle_input({"pick": [0.5, 0.5]})
