"""Adaptive motion degradation (RenderParams.adaptive_motion +
config.pick_motion_scale): while the camera moves, the downscale tracks the
measured moving-frame time against motion_target_ms, quantized to
MOTION_LADDER so at most len(MOTION_LADDER) kernel shapes compile. Default
OFF = the reference's fixed half resolution (app.rs:58-73)."""
import dataclasses

from ray_tracer_2_tpu.config import (MOTION_LADDER, RenderParams,
                                     pick_motion_scale)
from ray_tracer_2_tpu.engine import Engine
from ray_tracer_2_tpu.scene.scenes import SceneName

TARGET = 0.033


def test_policy_coarsens_when_slow():
    # 100 ms at half res, 33 ms target -> needs scale 4 (100/4 = 25 ms)
    assert pick_motion_scale(2, 0.100, TARGET) == 4


def test_policy_refines_with_headroom():
    # 10 ms at scale 4 -> scale 3 predicts 17.8 ms, well under 0.8*target
    assert pick_motion_scale(4, 0.010, TARGET) == 3


def test_policy_hysteresis_blocks_borderline_refinement():
    # 15 ms at scale 4 -> scale 3 predicts 26.7 ms <= 33 but > 0.8*33
    assert pick_motion_scale(4, 0.015, TARGET) == 4


def test_policy_saturates_at_ladder_ends():
    assert pick_motion_scale(2, 10.0, TARGET) == MOTION_LADDER[-1]
    assert pick_motion_scale(8, 1e-5, TARGET) == MOTION_LADDER[0]
    assert pick_motion_scale(2, None, TARGET) == 2


def test_for_render_scale():
    p = RenderParams(width=1920, height=1080)
    assert (p.for_render(True).width, p.for_render(True).height) \
        == (960, 540)                       # reference parity default
    q = p.for_render(True, motion_scale=4)
    assert (q.width, q.height, q.bounces, q.rays_per_pixel) == (480, 270, 1, 1)
    assert p.for_render(False, motion_scale=4) == p


def test_engine_adapts_moving_resolution():
    eng = Engine(width=192, height=108, initial_scene=SceneName.METAL,
                 block_on_initial_scene=True)
    eng.params = dataclasses.replace(eng.params, adaptive_motion=True,
                                     bounces=2)
    # frame 1 moving: no measurement yet -> default ladder start (2)
    eng.update(dt=0.016, is_moving=True, sync=True)
    assert eng._last_params.width == 192 // 2
    # pretend that moving frame took 200 ms -> scale 6 predicts 22 ms <= 33
    eng._last_render_s = 0.200
    eng.update(dt=0.016, is_moving=True, sync=True)
    assert eng._last_params.width == 192 // 6
    assert eng._last_params.bounces == 1
    # pretend the scale-8 frame was instant -> refine (one ladder search)
    eng._last_render_s = 0.0001
    eng.update(dt=0.016, is_moving=True, sync=True)
    assert eng._last_params.width == 192 // 2
    # stationary frame returns to full res regardless
    eng.update(dt=0.016, is_moving=False, sync=True)
    assert eng._last_params.width == 192


def test_engine_default_stays_reference_parity():
    eng = Engine(width=128, height=72, initial_scene=SceneName.METAL,
                 block_on_initial_scene=True)
    eng.params = dataclasses.replace(eng.params, bounces=2)
    eng.update(dt=0.016, is_moving=True, sync=True)
    eng._last_render_s = 10.0   # would coarsen if adaptive were on
    eng.update(dt=0.016, is_moving=True, sync=True)
    assert eng._last_params.width == 64   # always half res
