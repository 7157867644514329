#!/usr/bin/env python
"""Round-5 on-chip campaign A: fused Mosaic boundary A/B (ONE process).

Items (JSON lines appended to /tmp/onchip_r5.log):
1. Dragon @1080p rpp=1: XLA boundary baseline, then fused boundary —
   the VERDICT r4 #1 A/B (target >= 30 Mrays/s).
2. Fused-on dragon rpp sweep (4/8/16) + rpp=16 XLA fill-in for the
   protocol decision (BENCH best honest config, VERDICT #3).
3. On-chip fused-vs-XLA image equivalence at full size (statistical gate:
   the CPU-measured chaos profile, tests/test_fused_boundary.py).
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5.log", "a", buffering=1)


def emit(**obj):
    line = json.dumps(obj)
    print(line, flush=True)
    LOG.write(line + "\n")


def bench_scene(scene_name, rpp=1, frames=8, warmup=2, **renderer_kw):
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = named_scene(scene_name)
    p = RenderParams(width=1920, height=1080, bounces=5,
                     rays_per_pixel=rpp, skybox=True, frames=0)
    r = Renderer(**renderer_kw)
    for f in range(warmup):
        fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
    fb.block_until_ready()
    t0 = time.perf_counter()
    segc = []
    for f in range(warmup, warmup + frames):
        r.render(host.render_scene, dataclasses.replace(p, frames=f))
        segc.append(r.last_segments)
    r.framebuffer.block_until_ready()
    dt = time.perf_counter() - t0
    mrays = sum(float(s) for s in segc) / dt / 1e6
    return round(mrays, 2), round(dt / frames * 1e3, 1)


def image_check():
    """Full-size on-chip fused-vs-XLA image gate (2 frames)."""
    import numpy as np
    from bench import dragon_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = dragon_scene()
    p = RenderParams(width=1920, height=1080, bounces=5, rays_per_pixel=1,
                     skybox=True, frames=3)
    r0 = Renderer(fused_boundary=False)
    r1 = Renderer(fused_boundary=True)
    i0 = np.asarray(r0.render(host.render_scene, p))
    s0 = float(r0.last_segments)
    i1 = np.asarray(r1.render(host.render_scene, p))
    s1 = float(r1.last_segments)
    err = np.abs(i0 - i1).max(axis=-1)
    emit(item="fused_image_check",
         frac_lt_1e5=round(float((err < 1e-5).mean()), 4),
         frac_lt_1e3=round(float((err < 1e-3).mean()), 4),
         rmse=round(float(np.sqrt((err ** 2).mean())), 5),
         seg_rel=round(abs(s0 - s1) / s1, 6),
         finite=bool(np.isfinite(i1).all()))


def main():
    t_start = time.perf_counter()
    import jax
    emit(stage="devices", devices=str(jax.devices()),
         backend=jax.default_backend())

    # ---- 1. fused A/B at rpp=1 ----
    try:
        mrays, ms = bench_scene("dragon", rpp=1, frames=8,
                                fused_boundary=False)
        emit(item="dragon_fused_ab", fused=0, rpp=1, mrays=mrays,
             ms_per_frame=ms, t=round(time.perf_counter() - t_start, 1))
    except Exception:
        emit(item="dragon_fused_ab", fused=0, error=traceback.format_exc()[-600:])
    try:
        mrays, ms = bench_scene("dragon", rpp=1, frames=8,
                                fused_boundary=True)
        emit(item="dragon_fused_ab", fused=1, rpp=1, mrays=mrays,
             ms_per_frame=ms, t=round(time.perf_counter() - t_start, 1))
        fused_ok = True
    except Exception:
        emit(item="dragon_fused_ab", fused=1,
             error=traceback.format_exc()[-2000:])
        fused_ok = False

    # ---- 2. rpp sweep ----
    if fused_ok:
        for rpp, frames in [(4, 4), (8, 3), (16, 2)]:
            try:
                mrays, ms = bench_scene("dragon", rpp=rpp, frames=frames,
                                        fused_boundary=True)
                emit(item="dragon_rpp_fused", rpp=rpp, mrays=mrays,
                     ms_per_frame=ms,
                     t=round(time.perf_counter() - t_start, 1))
            except Exception:
                emit(item="dragon_rpp_fused", rpp=rpp,
                     error=traceback.format_exc()[-400:])
    try:
        mrays, ms = bench_scene("dragon", rpp=16, frames=2,
                                fused_boundary=False)
        emit(item="dragon_rpp", rpp=16, mrays=mrays, ms_per_frame=ms,
             t=round(time.perf_counter() - t_start, 1))
    except Exception:
        emit(item="dragon_rpp", rpp=16, error=traceback.format_exc()[-400:])

    # ---- 3. image equivalence on chip ----
    if fused_ok:
        try:
            image_check()
        except Exception:
            emit(item="fused_image_check",
                 error=traceback.format_exc()[-600:])

    emit(stage="done", total_s=round(time.perf_counter() - t_start, 1))


if __name__ == "__main__":
    main()
