"""Next-event estimation (RenderParams.nee): explicit light sampling at
diffuse bounces on no-traversal scenes.

The estimator matches the reference's actual physics — UNIFORM-hemisphere
diffuse bounces (pdf 1/2pi, no cosine folding; rand_hemisphere is a
sign-flipped uniform sphere, ray_tracer.wgsl:176-179) and SINGLE-SIDED
lights (non-glass backface cull, ray_tracer.wgsl:268,358) — so converged
NEE images agree with converged plain path tracing, at an order of
magnitude less variance per sample. Reference-divergent sampling, off by
default."""
import dataclasses

import numpy as np
import pytest

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def _acc(rs, nee, frames, rpp, bounces=2, W=32, H=24, collect=False):
    r = Renderer()
    p = RenderParams(width=W, height=H, bounces=bounces, rays_per_pixel=rpp,
                     skybox=False, nee=nee)
    per = []
    fb = None
    for f in range(frames):
        fb = r.render(rs, dataclasses.replace(p, frames=f))
        if collect:
            per.append(np.asarray(fb).copy())
    return np.asarray(fb), per


@pytest.fixture(scope="module")
def cornell_rs(assets):
    from tests.conftest import require_asset
    require_asset(assets, "CornellBox-Original.obj")
    return instantiate_scene(scenes.cornell_box()).render_scene


def test_light_extraction():
    assert len(instantiate_scene(scenes.metal()).render_scene.lights) == 0
    room = instantiate_scene(scenes.room()).render_scene.lights
    assert len(room) == 2 and all(L[0] == 0 for L in room)   # ceiling quad
    balls = instantiate_scene(scenes.balls()).render_scene.lights
    assert len(balls) == 1 and balls[0][0] == 1               # sun sphere
    assert balls[0][4] == pytest.approx(15.0)                 # radius slot


def test_nee_unbiased_and_lower_variance(cornell_rs):
    """Converged NEE must agree with converged plain path tracing (same
    physics, different estimator) while cutting per-sample variance by
    several x (measured ~6-18x on Cornell)."""
    plain, _ = _acc(cornell_rs, False, 160, 8)    # 1280 spp
    nee, per = _acc(cornell_rs, True, 48, 2, collect=True)
    mp, mn = plain[..., :3].mean(), nee[..., :3].mean()
    assert abs(mn - mp) < 0.05 * mp, (mp, mn)
    rmse = np.sqrt(((nee - plain)[..., :3] ** 2).mean())
    assert rmse < 0.08, rmse

    # per-sample variance from the accumulation deltas of the NEE run vs a
    # plain run of the same length
    _, per_p = _acc(cornell_rs, False, 48, 2, collect=True)

    def sample_var(per):
        s = [per[0]] + [per[f] * (f + 1) - per[f - 1] * f
                        for f in range(1, len(per))]
        return np.stack([x[..., :3] for x in s]).var(axis=0).mean()

    vp, vn = sample_var(per_p), sample_var(per)
    assert vp / vn > 3.0, (vp, vn)


def test_nee_noop_on_traversal_scenes(assets):
    """Scenes with a BVH traversal phase ignore the flag entirely (the
    static gate compiles the same program): bit-identical output."""
    from tests.conftest import require_asset
    require_asset(assets, "dragon.obj")
    rs = instantiate_scene(scenes.obj_test()).render_scene
    a, _ = _acc(rs, False, 2, 1, bounces=2)
    b, _ = _acc(rs, True, 2, 1, bounces=2)
    assert (a == b).all()


def test_nee_off_matches_default(cornell_rs):
    """nee=False must be the exact pre-flag program."""
    a, _ = _acc(cornell_rs, False, 3, 1)
    b, _ = _acc(cornell_rs, False, 3, 1)
    assert (a == b).all()


def test_light_table_follows_live_edits():
    """Live edits that move or re-color emissive primitives must refresh
    the static NEE light table (otherwise NEE samples stale radiance);
    unrelated edits must leave the tuple identical (no recompile)."""
    host = instantiate_scene(scenes.balls())
    base = host.render_scene.lights
    assert len(base) == 1 and base[0][0] == 1
    # find the emissive sphere's index
    import numpy as np
    mats = np.asarray(host.render_scene.sphere_mat)
    sun = next(i for i in range(len(mats))
               if host.records[int(mats[i])].emission_strength > 0)
    other = next(i for i in range(len(mats)) if i != sun)

    # move a NON-emissive sphere: table identical (same object semantics)
    host.edit_sphere(other, centre=[9.0, 9.0, 9.0])
    assert host.render_scene.lights == base

    # move the sun: the light row's centre follows
    host.edit_sphere(sun, centre=[1.0, 2.0, 3.0])
    moved = host.render_scene.lights
    assert moved != base and moved[0][1:4] == (1.0, 2.0, 3.0)

    # dim the sun to zero: the table empties (NEE compiles out)
    host.edit_material(int(mats[sun]), emission_strength=0.0)
    assert host.render_scene.lights == ()
