#!/usr/bin/env python
"""Round-4 session-C on-chip campaign (ONE process, one relay warmup).

Items, in order (results appended as JSON lines to /tmp/onchip_r4c.log):

1. Dragon rpp sweep (rpp = 1/4/8/2): the headline bench runs rpp=1, so the
   ~13 ms end-of-frame reassembly sort and the relay's per-dispatch gap are
   paid per 3.3 Mrays; rpp>1 amortizes both over rpp x rays while tracing
   the SAME progressive-accumulation protocol (spp = frames x rpp,
   app.rs:43-57 / egui.rs:107-113 allow rpp up to 100). Decides whether
   bench.py's default protocol moves to rpp>1 (disclosed in the JSON line).
2. Cornell 1024-spp wall-clock at rpp 8/16 (secondary metric; rpp=4
   measured 56.7 s last session with ~27 ms/frame dispatch gaps).
3. Mosaic re-probes on the current toolchain: pallas_lane_gather /
   pallas_sublane_gather (the per-lane gather blocker that kills the
   whole-path BVH kernel; re-probe each toolchain bump per PLAN.md).
4. Completion-log drift capture (return_log_order hook): how far the log's
   completion order drifts from claim order, which bounds any banded
   replacement of the end-of-frame sort (PLAN round-5 #1c).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r4c.log", "a", buffering=1)


def emit(**obj):
    line = json.dumps(obj)
    print(line, flush=True)
    LOG.write(line + "\n")


def bench_scene(scene_name, rpp=1, frames=8, warmup=2, renderer_kw=None):
    import jax  # noqa: F401
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = named_scene(scene_name)
    p = RenderParams(width=1920, height=1080, bounces=5,
                     rays_per_pixel=rpp, skybox=True, frames=0)
    r = Renderer(**(renderer_kw or {}))
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


def cornell_1024(rpp):
    import dataclasses as dc
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = named_scene("cornell")
    p = RenderParams(width=1920, height=1080, bounces=5,
                     rays_per_pixel=rpp, skybox=True, frames=0)
    r = Renderer()
    fb = r.render(host.render_scene, dc.replace(p, frames=0))
    fb.block_until_ready()
    n_frames = 1024 // rpp
    t0 = time.perf_counter()
    rays = 0.0
    for f in range(n_frames):
        r.render(host.render_scene, dc.replace(p, frames=f))
        rays += float(r.last_segments)
    r.framebuffer.block_until_ready()
    dt = time.perf_counter() - t0
    return round(dt, 1), round(rays / dt / 1e6, 2)


def log_drift_probe():
    """Dragon @1080p, 1 frame: pull the pre-sort completion-order pixel ids
    and measure drift from claim order."""
    import jax
    import numpy as np
    from bench import dragon_scene
    from ray_tracer_2_tpu.kernels.megakernel import render_persistent

    host = dragon_scene()
    total = 1920 * 1080

    f = jax.jit(lambda s, fr: render_persistent(
        s, fr, width=1920, height=1080, bounces=5, rays_per_pixel=1,
        skybox=True, return_log_order=True))
    # claim_mul comes back from the kernel itself (it is 1 when the kernel
    # disabled the shuffle, e.g. packet > 1) — never re-derive it here
    out, segs, pix, claim_mul = f(host.render_scene, 0)
    claim_mul = int(claim_mul)
    pix = np.asarray(pix).astype(np.int64)
    inv = pow(claim_mul, -1, total) if claim_mul > 1 else 1
    c = (pix * inv) % total          # claim index of each log position
    assert np.array_equal(np.sort(c), np.arange(total)), \
        "log ids are not a permutation of claim indices"
    disp = np.abs(np.arange(total) - c)
    q = lambda p: int(np.percentile(disp, p))
    emit(probe="log_drift", scene="dragon", total=total,
         claim_mul=claim_mul, max=int(disp.max()), p50=q(50), p90=q(90),
         p99=q(99), p999=q(99.9),
         frac_gt_16k=float((disp > 16384).mean()),
         frac_gt_64k=float((disp > 65536).mean()))


def main():
    t_start = time.perf_counter()
    import jax
    emit(stage="devices", devices=str(jax.devices()),
         backend=jax.default_backend())

    # ---- 1. dragon rpp sweep ----
    for rpp, frames in [(1, 8), (4, 4), (8, 3), (2, 6)]:
        try:
            mrays, ms = bench_scene("dragon", rpp=rpp, frames=frames)
            emit(item="dragon_rpp", rpp=rpp, mrays=mrays, ms_per_frame=ms,
                 t=round(time.perf_counter() - t_start, 1))
        except Exception as e:
            emit(item="dragon_rpp", rpp=rpp, error=repr(e))

    # ---- 2. cornell 1024 spp ----
    for rpp in (8, 16):
        try:
            sec, mrays = cornell_1024(rpp)
            emit(item="cornell1024", rpp=rpp, seconds=sec, mrays=mrays,
                 t=round(time.perf_counter() - t_start, 1))
        except Exception as e:
            emit(item="cornell1024", rpp=rpp, error=repr(e))

    # ---- 3. Mosaic re-probes ----
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import probe_r2
    for name in ("pallas_lane_gather", "pallas_sublane_gather"):
        try:
            fn = next(p for p in probe_r2.PROBES if p.__name__ == name)
            # the guard eats probe exceptions and returns False — ok must
            # come from that return value, not from "nothing raised"
            emit(item="mosaic_reprobe", probe=name, ok=bool(fn()))
        except Exception as e:
            emit(item="mosaic_reprobe", probe=name, ok=False,
                 error=str(e)[:400])

    # ---- 4. completion-log drift ----
    try:
        log_drift_probe()
    except Exception:
        emit(item="log_drift", error=traceback.format_exc()[-400:])

    emit(stage="done", total_s=round(time.perf_counter() - t_start, 1))


if __name__ == "__main__":
    main()
