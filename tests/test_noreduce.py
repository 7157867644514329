"""RT2_NOREDUCE replaces every per-traversal-step argmin/min/masked-sum
winner extraction with reduction-free pairwise tournaments and an unrolled
stack scan (kernels/megakernel.py) — each reduce is a fusion break that
materializes its (B, 32)/(B, 8)/(B, D) input between fusions, and the
round-3 op census counts ~13 of them per step. The rewrite must be
BIT-identical: tournament selects propagate the winner's original bits and
left-wins-ties reproduces argmin's first-index pick. Gate it on every
winner path: wide_eval (mask/c_min/dn2), triangle leaf (u/v/det/mat/dst),
sphere-BVH leaf (lex (dst, id)), and the resume-stack pop scan."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_2_tpu.kernels.megakernel import render_persistent
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

from tests.conftest import require_asset


def _render(rs, **kw):
    img, segs = render_persistent(rs, jnp.int32(2), width=32, height=18,
                                  bounces=3, rays_per_pixel=1, skybox=True,
                                  lanes=256, **kw)
    return np.asarray(img), float(segs)


@pytest.fixture(autouse=True)
def _fresh_trace_cache():
    """RT2_NOREDUCE is read at trace time; the jit cache ignores env."""
    jax.clear_caches()
    yield
    jax.clear_caches()


def test_noreduce_bitexact_wide_path(assets, monkeypatch):
    """Dragon: wide rows + triangle leaves + resume stack."""
    require_asset(assets, "dragon.obj")
    rs = instantiate_scene(scenes.obj_test()).render_scene
    monkeypatch.setenv("RT2_NOREDUCE", "0")
    base, segs0 = _render(rs)
    jax.clear_caches()
    monkeypatch.setenv("RT2_NOREDUCE", "1")
    got, segs1 = _render(rs)
    assert (base == got).all()
    assert segs0 == segs1


def test_noreduce_bitexact_sphere_bvh(monkeypatch):
    """random_balls with the sphere BVH forced on: sphere-leaf lex winner."""
    monkeypatch.setenv("RT2_SPHERE_BVH", "1")
    rs = instantiate_scene(scenes.random_balls()).render_scene
    assert int(rs.sphere_bvh_root) >= 0, "sphere BVH must be active"
    monkeypatch.setenv("RT2_NOREDUCE", "0")
    base, segs0 = _render(rs)
    jax.clear_caches()
    monkeypatch.setenv("RT2_NOREDUCE", "1")
    got, segs1 = _render(rs)
    assert (base == got).all()
    assert segs0 == segs1


@pytest.mark.parametrize("scene_name", ["random_balls", "cornell_box"])
def test_noreduce_bitexact_boundary_pass(scene_name, monkeypatch):
    """Dense boundary-phase winners: random_balls exercises the shared-term
    fast sphere pass (484 spheres, argmin+min pair), cornell_box the small-S
    sphere branch (masked one-hot reduces) plus brute.py triangle chunks."""
    rs = instantiate_scene(getattr(scenes, scene_name)()).render_scene
    monkeypatch.setenv("RT2_NOREDUCE", "0")
    base, segs0 = _render(rs)
    jax.clear_caches()
    monkeypatch.setenv("RT2_NOREDUCE", "1")
    got, segs1 = _render(rs)
    assert (base == got).all()
    assert segs0 == segs1


def test_dot_unroll_close(monkeypatch):
    """RT2_DOT_UNROLL is a ROUNDING change, not a physics change: inside one
    elementwise fusion XLA may FMA-contract mul+add, which the reduce form
    never does, so bit-equality is impossible by design (math/vec.py). Gate
    it with a tolerance instead: same scene, same rays, RMSE must stay at
    rounding scale and the segment count (pure control flow) must match."""
    rs = instantiate_scene(scenes.random_balls()).render_scene
    monkeypatch.setenv("RT2_DOT_UNROLL", "0")
    base, segs0 = _render(rs)
    jax.clear_caches()
    monkeypatch.setenv("RT2_DOT_UNROLL", "1")
    got, segs1 = _render(rs)
    rmse = float(np.sqrt(np.mean((base - got) ** 2)))
    assert rmse < 5e-3, rmse
    # a handful of rays may flip a stochastic branch from the rounding
    # change; the segment totals must stay within a fraction of a percent
    assert abs(segs0 - segs1) <= 0.005 * max(segs0, 1.0), (segs0, segs1)
