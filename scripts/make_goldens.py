#!/usr/bin/env python
"""Regenerate the checked-in golden renders (tests/goldens/*.npz).

The reference repo ships converged renders as its only regression artifact
(renders/*.png, SURVEY.md §4); we formalize that into small deterministic
goldens rendered on CPU with fixed RNG frames. Run after any *intentional*
change to the physics and commit the result.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

GOLDENS = {
    "metal": (scenes.metal, dict(width=96, height=54, bounces=4, frames=8)),
    "balls": (scenes.balls, dict(width=96, height=54, bounces=4, frames=8)),
    "room": (scenes.room, dict(width=96, height=54, bounces=4, frames=8)),
    "cornell": (scenes.cornell_box, dict(width=96, height=54, bounces=4,
                                         frames=8)),
    # wide-BVH traversal golden (the headline dragon path): 8712-tri
    # dragon.obj -> _bvh_instances engages the 32-ary resume-stack kernel
    "obj_test": (scenes.obj_test, dict(width=96, height=54, bounces=3,
                                       frames=8)),
    # sphere-BVH golden (accel/wide.py pack_sphere_wide_rows)
    "random_balls": (scenes.random_balls, dict(width=96, height=54,
                                               bounces=3, frames=4)),
    # quality-flag goldens: pin the NEE estimator and the AA jitter stream
    "cornell_nee": (scenes.cornell_box, dict(width=96, height=54, bounces=4,
                                             frames=8, nee=1)),
    "metal_aa": (scenes.metal, dict(width=96, height=54, bounces=4,
                                    frames=8, antialias=1)),
    # textured-path golden: earthmap sphere — u8 texel pack, paired-row
    # atlas layout, bilinear taps in the lit path. Uses a pulled-back
    # camera (tests/test_goldens.py); the faithful texture_test camera
    # sits ON the sphere and renders near-black.
    "texture_test": (None, dict(width=96, height=54, bounces=3, frames=6)),
    # f1/bugatti scene (procedural substitute, assets/procedural.py
    # synthesize_f1 — the real f1/f1.obj is absent from the mount)
    "bugatti": (scenes.bugatti, dict(width=96, height=54, bounces=3,
                                     frames=6)),
}

OUT = Path(__file__).resolve().parents[1] / "tests" / "goldens"


def render_golden(build, width, height, bounces, frames, nee=0, antialias=0):
    host = instantiate_scene(build())
    r = Renderer()
    p = RenderParams(width=width, height=height, bounces=bounces,
                     rays_per_pixel=1, skybox=True, nee=bool(nee),
                     antialias=bool(antialias))
    fb = None
    for f in range(frames):
        fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
    return np.asarray(fb)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, (build, cfg) in GOLDENS.items():
        if build is None:   # builders that live next to the gate itself
            from tests.test_goldens import texture_golden_scene
            build = texture_golden_scene
        fb = render_golden(build, **cfg)
        np.savez_compressed(OUT / f"{name}.npz", framebuffer=fb, **cfg)
        print(f"{name}: mean={fb[..., :3].mean():.4f} max={fb[..., :3].max():.3f}")


if __name__ == "__main__":
    main()
