#!/usr/bin/env python
"""Round-5 on-chip campaign C (ONE process; run after onchip_r5b decides
the fused-boundary A/B). JSON lines to /tmp/onchip_r5c.log.

Items (select with --items, comma-separated; default all):

* fused_sweep — knob sweep of the winning boundary on dragon: lanes x
  unroll at rpp=1, then the rpp ladder at the winning (lanes, unroll).
  The r4 optimum (lanes=16384, unroll=5) was tuned for the XLA boundary;
  the fused kernel shifts the per-iteration cost split, so the optimum
  must be re-measured rather than assumed.
* room2 — iteration/segment instrumentation for the VERDICT r4 #6
  residual: compares iterations-per-segment on room2 (2 shared-table
  instances -> 2 traversal phases) vs dragon (1 phase) to quantify the
  second-phase overhead with numbers instead of attribution prose.
* headline — bench.py-protocol dragon run at the measured-best config
  (pass --fused/--rpp/--lanes/--unroll from the sweep winner).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5c.log", "a", buffering=1)
T0 = time.perf_counter()


def emit(**obj):
    obj["t"] = round(time.perf_counter() - T0, 1)
    line = json.dumps(obj)
    print(line, flush=True)
    LOG.write(line + "\n")


def bench_scene(scene_name, rpp=1, frames=6, warmup=2, scene=None,
                **renderer_kw):
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = scene if scene is not None else named_scene(scene_name)
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
    # device_get is the only TRUE sync on the relay platform —
    # block_until_ready can return early (documented artifact: a 6550
    # Mrays/s sponza row in campaign E). Per-scalar fetches cost a ~27 ms
    # round-trip each, so they stay OUTSIDE the primary timing window;
    # when the primary reading is impossibly fast, fall back to a window
    # that includes the forced fetches (biased high by the RTTs, which is
    # the conservative direction for a throughput claim).
    total_segs = sum(float(s) for s in segc)
    if dt / frames < 0.02:
        dt = time.perf_counter() - t0
    mrays = total_segs / dt / 1e6
    return round(mrays, 2), round(dt / frames * 1e3, 1)


def fused_sweep(args):
    best = (None, -1.0)
    for lanes, unroll in [(16384, 5), (24576, 5), (32768, 5),
                          (16384, 4), (16384, 6)]:
        try:
            mrays, ms = bench_scene("dragon", rpp=1, frames=6,
                                    fused_boundary=bool(args.fused),
                                    lanes=lanes, unroll=unroll)
            emit(item="fused_sweep", fused=args.fused, lanes=lanes,
                 unroll=unroll, rpp=1, mrays=mrays, ms_per_frame=ms)
            if mrays > best[1]:
                best = ((lanes, unroll), mrays)
        except Exception:
            emit(item="fused_sweep", lanes=lanes, unroll=unroll,
                 error=traceback.format_exc()[-900:])
    if best[0] is None:
        return
    lanes, unroll = best[0]
    for rpp, frames in [(4, 4), (8, 3), (16, 2)]:
        try:
            mrays, ms = bench_scene("dragon", rpp=rpp, frames=frames,
                                    fused_boundary=bool(args.fused),
                                    lanes=lanes, unroll=unroll)
            emit(item="fused_rpp", fused=args.fused, lanes=lanes,
                 unroll=unroll, rpp=rpp, mrays=mrays, ms_per_frame=ms)
        except Exception:
            emit(item="fused_rpp", rpp=rpp,
                 error=traceback.format_exc()[-900:])


def room2_iters(args):
    import jax
    from bench import named_scene
    from ray_tracer_2_tpu.kernels.megakernel import render_persistent

    for name in ("room2", "dragon"):
        try:
            host = named_scene(name)
            f = jax.jit(lambda s, fr: render_persistent(
                s, fr, width=1920, height=1080, bounces=5, rays_per_pixel=1,
                skybox=True, return_iters=True))
            img, segs, iters = f(host.render_scene, 1)
            jax.block_until_ready(img)
            t0 = time.perf_counter()
            img, segs, iters = f(host.render_scene, 2)
            jax.block_until_ready(img)
            dt = time.perf_counter() - t0
            emit(item="iters", scene=name, segments=float(segs),
                 iters=float(iters), iters_per_kseg=round(
                     float(iters) / max(float(segs), 1.0) * 1e3, 3),
                 frame_ms=round(dt * 1e3, 1),
                 mrays=round(float(segs) / dt / 1e6, 2))
        except Exception:
            emit(item="iters", scene=name,
                 error=traceback.format_exc()[-900:])


def headline(args):
    try:
        mrays, ms = bench_scene("dragon", rpp=args.rpp, frames=args.frames,
                                fused_boundary=bool(args.fused),
                                lanes=args.lanes, unroll=args.unroll)
        emit(item="headline", fused=args.fused, rpp=args.rpp,
             lanes=args.lanes, unroll=args.unroll, mrays=mrays,
             ms_per_frame=ms)
    except Exception:
        emit(item="headline", error=traceback.format_exc()[-900:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", default="fused_sweep,room2,cross")
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--rpp", type=int, default=16)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--lanes", type=int, default=None)
    ap.add_argument("--unroll", type=int, default=None)
    args = ap.parse_args()

    import jax
    emit(stage="devices", devices=str(jax.devices()),
         backend=jax.default_backend())
    items = args.items.split(",")
    if "fused_sweep" in items:
        fused_sweep(args)
    if "room2" in items:
        room2_iters(args)
    if "headline" in items:
        headline(args)
    if "cross" in items:
        # re-run the (rewritten, chaos-class-aware) converged gate in-process
        try:
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            import cross_check_onchip
            cross_check_onchip.main()
            emit(item="cross_check", rc=0)
        except SystemExit as e:
            emit(item="cross_check", rc=int(e.code or 0))
        except Exception:
            emit(item="cross_check", error=traceback.format_exc()[-500:])
    emit(stage="done")


if __name__ == "__main__":
    main()
