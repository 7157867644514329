"""Shared-term dense sphere pass (intersect.ray_sphere_fast) vs the
reference-order quadratic (ray_sphere, ray_tracer.wgsl:223-256).

The fast pass engages at SPHERE_FAST_MIN spheres (kernels/megakernel.py) —
random_balls' 485-sphere cross is the target. It is NOT bit-equal: |oc|² is
expanded to |o|² - 2 o·c + (|c|² - r²) and the divides are hoisted per-ray,
so grazing hits (disc ~ 0) can flip by ulps — the same contract as the
sphere-BVH knob (tests/test_sphere_bvh.py): near-total pixel agreement,
distance agreement to float tolerance everywhere both paths hit.
"""
import numpy as np
import jax.numpy as jnp

from ray_tracer_2_tpu.kernels.intersect import INF, ray_sphere, \
    ray_sphere_fast
from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def _random_rays_and_spheres(B=2048, S=128, seed=7):
    r = np.random.default_rng(seed)
    o = r.normal(0, 6, (B, 3)).astype(np.float32)
    d = r.normal(0, 1, (B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c = r.normal(0, 6, (S, 3)).astype(np.float32)
    rad = r.uniform(0.1, 1.5, (S,)).astype(np.float32)
    return map(jnp.asarray, (o, d, c, rad))


def test_unit_agreement():
    o, d, c, rad = _random_rays_and_spheres()
    h0, t0, i0 = ray_sphere(o[:, None, :], d[:, None, :],
                            c[None, :, :], rad[None, :])
    h1, t1, i1 = ray_sphere_fast(o, d, c, rad)
    h0, t0, i0, h1, t1, i1 = map(np.asarray, (h0, t0, i0, h1, t1, i1))

    both = h0 & h1
    agree = (h0 == h1).mean()
    assert agree > 0.9999, f"hit mask agreement {agree:.5%}"
    # distances: tight relative tolerance where both paths hit
    rel = np.abs(t0[both] - t1[both]) / np.maximum(t0[both], 1e-3)
    assert rel.max() < 1e-3, f"max rel dst err {rel.max()}"
    assert (i0[both] == i1[both]).mean() > 0.9999


def test_render_near_equals_exact(monkeypatch):
    import jax

    W, H = 96, 54
    kw = dict(width=W, height=H, bounces=3, rays_per_pixel=1, skybox=True,
              debug_mode=0, tile_rows=8)
    rs = instantiate_scene(scenes.random_balls()).render_scene

    # the knob is read at TRACE time (megakernel._sphere_fast_min), so the
    # second render must not reuse the first's jit cache entry
    monkeypatch.setenv("RT2_SPHERE_FAST", "0")
    jax.clear_caches()
    a, segs_a = render_sample(rs, jnp.int32(0), jnp.float32(1.0), **kw)
    a = np.asarray(a)
    segs_a = float(segs_a)
    monkeypatch.setenv("RT2_SPHERE_FAST", "1")
    jax.clear_caches()
    b, segs_b = render_sample(rs, jnp.int32(0), jnp.float32(1.0), **kw)

    err = np.abs(np.asarray(a) - np.asarray(b)).max(axis=-1)
    frac = (err < 1e-5).mean()
    assert frac >= 0.98, f"{frac:.2%} pixels match (max err {err.max()})"
    rel = abs(float(segs_a) - float(segs_b)) / float(segs_b)
    assert rel < 0.02
