"""Golden-render regression gates (SURVEY.md §4 item 1).

Goldens are small fixed-seed renders produced by scripts/make_goldens.py.
The tolerance absorbs float reassociation across XLA versions; a physics or
RNG regression moves RMSE by orders of magnitude more.
"""
import dataclasses
from pathlib import Path

import numpy as np
import pytest

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

GOLDEN_DIR = Path(__file__).parent / "goldens"


def texture_golden_scene():
    """texture_test's earthmap sphere with a PULLED-BACK camera: the
    reference's own texture_test camera sits exactly ON the sphere
    surface (Transform::cam(NEG_Z, ZERO) with radius 1, scene.rs:282-284)
    and renders near-black — faithful in scenes.texture_test, but useless
    as a texture-path regression signal. Same material/machinery, visible
    result."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import CameraDescriptor
    s = scenes.texture_test()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 0.0, -3.0], [0.0, 0.0, 0.0]),
        fov=45.0, focus_dist=3.0))
    return s


BUILDERS = {"metal": scenes.metal, "balls": scenes.balls,
            "room": scenes.room, "cornell": scenes.cornell_box,
            # obj_test -> 32-ary wide-BVH megakernel traversal (dragon.obj),
            # the headline code path the brute/sphere goldens miss;
            # random_balls -> the 485-sphere dense cross + glass at scale
            # (the sphere BVH is a knob, off by default — render_scene.py
            # SPHERE_BVH_MIN; its coverage lives in test_multidevice)
            "obj_test": scenes.obj_test,
            "random_balls": scenes.random_balls,
            # quality-flag goldens (NEE estimator / AA jitter stream)
            "cornell_nee": scenes.cornell_box,
            "metal_aa": scenes.metal,
            # textured path: u8 texel pack + paired-row bilinear taps
            "texture_test": texture_golden_scene,
            # f1 substitute (assets/procedural.py synthesize_f1) — closes
            # the last scene-table hole (scene.rs:934-983)
            "bugatti": scenes.bugatti}


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_golden(name, assets):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip("golden not generated (scripts/make_goldens.py)")
    if name in ("cornell", "cornell_nee"):
        from tests.conftest import require_asset
        require_asset(assets, "CornellBox-Original.obj")
    if name == "obj_test":
        from tests.conftest import require_asset
        require_asset(assets, "dragon.obj")
    if name == "texture_test":
        from tests.conftest import require_asset
        require_asset(assets, "earthmap.png")
    with np.load(path) as z:
        golden = z["framebuffer"]
        cfg = {k: int(z[k]) for k in ("width", "height", "bounces", "frames")}
        flags = {k: bool(int(z[k])) for k in ("nee", "antialias") if k in z}

    host = instantiate_scene(BUILDERS[name]())
    r = Renderer()
    p = RenderParams(width=cfg["width"], height=cfg["height"],
                     bounces=cfg["bounces"], rays_per_pixel=1, skybox=True,
                     **flags)
    fb = None
    for f in range(cfg["frames"]):
        fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
    fb = np.asarray(fb)

    err = rmse(np.clip(fb[..., :3], 0, 4), np.clip(golden[..., :3], 0, 4))
    assert err < 1e-3, f"golden {name} RMSE {err}"


def test_variance_scales_inversely(assets):
    """Monte-Carlo sanity: accumulating 4x the frames roughly halves RMSE to
    a long reference run (the convergence law behind the reference's
    progressive accumulation)."""
    host = instantiate_scene(scenes.metal())
    p = RenderParams(width=48, height=27, bounces=3, rays_per_pixel=1,
                     skybox=True)

    def accum(n):
        r = Renderer()
        fb = None
        for f in range(n):
            fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
        # tone-clamp: rare sun-specular fireflies are heavy-tailed and would
        # dominate RMSE; convergence law holds for the clamped estimator
        return np.clip(np.asarray(fb)[..., :3], 0.0, 1.0)

    ref = accum(64)
    # n-frame prefixes of the same stream: Var(mean_n - mean_64) =
    # sigma^2 (1/n - 1/64), so RMSE(16) / RMSE(4) ≈ sqrt(3/15) ≈ 0.45
    e4 = rmse(accum(4), ref)
    e16 = rmse(accum(16), ref)
    assert e16 < e4 * 0.7, (e4, e16)
