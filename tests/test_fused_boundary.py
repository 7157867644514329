"""Fused Mosaic boundary (kernels/pallas_boundary.py) vs the XLA boundary.

Equivalence contract (same class as tests/test_sphere_fast.py): the fused
kernel mirrors megakernel.resolve_and_shade / boundary / start_segments
op-for-op, but XLA contracts mul+add chains into FMAs inside its fused
reduces (a 3-term ``jnp.sum`` is not bit-equal to any plain (x+y)+z
expansion — measured), so shading directions shift by ulps and chaotic paths
diverge.  The gates therefore are:

* bounces=0 (camera + prepass + claim + primary emission/sky — no chaotic
  feedback): segment counts EXACT, image agreement to 1e-5.
* bounces>0: near-total pixel agreement per frame, segment counts within
  1%, and the multi-frame mean converging to the XLA mean at the 1/sqrt(N)
  chaos rate (measured: rmse 0.035 @ 64 frames -> 0.018 @ 256 on the
  96x64 probe — no systematic bias).
* ineligible scenes: the knob must fall back to the XLA boundary
  bit-exactly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.megakernel import render_persistent
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def _wide_scene():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _wide_bvh_scene
    return _wide_bvh_scene()


def _render(rs, fused, frames=1, **over):
    kw = dict(width=64, height=32, bounces=0, rays_per_pixel=1, skybox=True,
              lanes=256, unroll=2)
    kw.update(over)
    img, segs = jax.jit(lambda s, f: render_persistent(
        s, f, fused_boundary=fused, **kw))(rs, frames)
    return np.asarray(img), float(segs)


@pytest.fixture(scope="module")
def wide_rs():
    return _wide_scene()


def test_primary_class_exact(wide_rs):
    """bounces=0: no chaotic feedback — claim/camera/prepass/log decisions
    must agree exactly; image differs only by sky/camera FMA ulps."""
    a, sa = _render(wide_rs, False)
    b, sb = _render(wide_rs, True)
    assert sa == sb
    assert np.abs(a - b).max() < 1e-5
    assert np.isfinite(b).all()


def test_defer_replay_exact(wide_rs):
    """log_cap < lanes engages the defer/replay protocol in-kernel; at
    bounces=0 it must match the XLA defer path decision-for-decision."""
    a, sa = _render(wide_rs, False, log_cap=128)
    b, sb = _render(wide_rs, True, log_cap=128)
    assert sa == sb
    assert np.abs(a - b).max() < 1e-5


def test_antialias_rpp_near_exact(wide_rs):
    """AA draws + sample continuation (rpp=2) keep the same RNG stream.

    NOT fully exact even at bounces=0: an FMA-ulp hit/miss flip on sample 1
    advances the seed differently (a hit consumes 8 shading draws), so
    sample 2's AA jitter diverges on a few silhouette pixels (measured
    75/2048). Segment counts stay exact (one segment per sample)."""
    a, sa = _render(wide_rs, False, antialias=True, rays_per_pixel=2)
    b, sb = _render(wide_rs, True, antialias=True, rays_per_pixel=2)
    assert sa == sb
    err = np.abs(a - b).max(axis=-1)
    assert (err < 1e-5).mean() > 0.9, (err < 1e-5).mean()


def test_bounced_statistical(wide_rs):
    """Full path tracing: per-frame near-total agreement + converging mean
    (chaos gate, thresholds from the measured profile with margin)."""
    kw = dict(bounces=4, width=96, height=64, lanes=512)
    n = 8
    f0 = jax.jit(lambda s, f: render_persistent(
        s, f, fused_boundary=False, rays_per_pixel=1, skybox=True,
        unroll=2, **kw))
    f1 = jax.jit(lambda s, f: render_persistent(
        s, f, fused_boundary=True, rays_per_pixel=1, skybox=True,
        unroll=2, **kw))
    acc0 = np.zeros((64, 96, 4))
    acc1 = np.zeros((64, 96, 4))
    segs0 = segs1 = 0.0
    fracs = []
    for f in range(n):
        i0, s0 = f0(wide_rs, f)
        i1, s1 = f1(wide_rs, f)
        i0, i1 = np.asarray(i0), np.asarray(i1)
        err = np.abs(i0 - i1).max(axis=-1)
        fracs.append((err < 1e-5).mean())
        acc0 += i0
        acc1 += i1
        segs0 += float(s0)
        segs1 += float(s1)
    assert min(fracs) > 0.7, fracs          # measured ~0.81 per frame
    assert abs(segs0 - segs1) / segs1 < 0.01
    merr = np.abs(acc0 / n - acc1 / n).max(axis=-1)
    assert np.sqrt((merr ** 2).mean()) < 0.15   # measured ~0.08 @ 8 frames


def test_ineligible_falls_back_bit_exact():
    """Scenes outside the fused class (glass, multi-instance, spheres-only)
    must ignore the knob — bit-identical to fused_boundary=False."""
    rs = instantiate_scene(scenes.room()).render_scene   # glass + no wide BVH
    a, sa = _render(rs, False, bounces=2)
    b, sb = _render(rs, True, bounces=2)
    assert sa == sb
    assert np.array_equal(a, b)


def test_fused_sharded_matches_single():
    """Row-sharded fused render == single-device fused render bit-exactly
    (pixel values derive from pixel ids, not lanes/shards — the same
    invariant test_multidevice pins for the XLA boundary)."""
    import jax.numpy as jnp
    from ray_tracer_2_tpu.parallel.sharding import (
        make_render_mesh, render_frame_sharded, replicate_scene,
        shard_framebuffer)

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device conftest")
    rs = _wide_scene()
    kw = dict(width=96, height=64, bounces=3, rays_per_pixel=1, skybox=True,
              lanes=256, unroll=2)
    # frames=0 => overwrite weight 1.0: render_frame_sharded's progressive
    # blend is identity and the raw samples compare directly
    single, _ = jax.jit(lambda s, f: render_persistent(
        s, f, fused_boundary=True, **kw))(rs, 0)
    mesh = make_render_mesh(8)
    scene = replicate_scene(rs, mesh)
    fb = shard_framebuffer(jnp.zeros((64, 96, 4), jnp.float32), mesh)
    sharded, _ = render_frame_sharded(
        scene, fb, jnp.int32(0), 1.0, mesh=mesh, fused_boundary=True, **kw)
    assert np.array_equal(np.asarray(single), np.asarray(sharded))


def test_scene_profile_eligible_routing(wide_rs):
    """The tuned.json "tpu:fused" profile is picked by a scene-only
    precheck (kernels/pallas_boundary.scene_profile_eligible) so the
    fused-class knob optima (round-5: unroll=3) never leak onto
    XLA-boundary scenes. Pin the classification for the bench scenes."""
    from ray_tracer_2_tpu.kernels.pallas_boundary import (
        scene_profile_eligible)
    from ray_tracer_2_tpu.scene import scenes as sc

    assert scene_profile_eligible(wide_rs)          # dragon class
    ineligible = {
        "room2": sc.room_2,          # two instances
        "texture_test": sc.texture_test,   # textured
        "balls": sc.balls,           # glass
        "random_balls": sc.random_balls,   # > 32 spheres
    }
    for name, builder in ineligible.items():
        rs = instantiate_scene(builder()).render_scene
        assert not scene_profile_eligible(rs), name
