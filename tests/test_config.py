"""RenderParams policy tests (app.rs:27-91 semantics)."""
from ray_tracer_2_tpu.config import RenderParams


def test_motion_degradation_is_relative():
    # Reference (app.rs:58-73) halves the *current* resolution while moving.
    p = RenderParams(width=960, height=540, bounces=5, rays_per_pixel=4)
    d = p.for_render(is_moving=True)
    assert (d.width, d.height) == (480, 270)
    assert d.bounces == 1 and d.rays_per_pixel == 1
    # idle: untouched
    assert p.for_render(is_moving=False) is p


def test_motion_degradation_min_clamp():
    p = RenderParams(width=20, height=18)
    d = p.for_render(is_moving=True)
    assert (d.width, d.height) == (16, 16)


def test_accumulation_protocol():
    p = RenderParams(frames=3)
    moved, reset = p.update(is_moving=True)
    assert moved.frames == -1 and reset
    idle, reset = p.update(is_moving=False)
    assert idle.frames == 4 and not reset
    no_acc, reset = RenderParams(frames=3, accumulate=False).update(False)
    assert no_acc.frames == -1 and reset
