#!/usr/bin/env python
"""On-chip op-level profile of the shipping render loop for one scene.

Renders warmup frames, captures a jax.profiler trace of 2 frames, then
parses the trace-event JSON into a per-op-category table (µs per frame and
per loop iteration). Usage:

    python scripts/profile_scene.py dragon [--top 40]
"""
import argparse
import collections
import dataclasses
import glob
import gzip
import json
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = named_scene(args.scene)
    p = RenderParams(width=args.width, height=args.height, bounces=5,
                     rays_per_pixel=1, skybox=True, frames=0)
    r = Renderer()
    for f in range(2):
        r.render(host.render_scene, dataclasses.replace(p, frames=f))
    r.framebuffer.block_until_ready()

    t0 = time.perf_counter()
    for f in range(2, 4):
        r.render(host.render_scene, dataclasses.replace(p, frames=f))
    r.framebuffer.block_until_ready()
    frame_s = (time.perf_counter() - t0) / 2

    shutil.rmtree("/tmp/rt2_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/rt2_trace"):
        for f in range(4, 6):
            r.render(host.render_scene, dataclasses.replace(p, frames=f))
        r.framebuffer.block_until_ready()

    segs = float(r.last_segments)
    print(f"frame {frame_s*1e3:.1f} ms  segments/frame {segs:.0f}  "
          f"-> {segs/frame_s/1e6:.2f} Mrays/s")

    paths = glob.glob("/tmp/rt2_trace/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("NO TRACE FOUND")
        return
    ev = json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]
    # dur-bearing complete events from the TPU op track
    tot = collections.Counter()
    cnt = collections.Counter()
    total_us = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # keep device op events; skip host-side python/runtime tracks
        args_d = e.get("args") or {}
        if "run_id" in args_d or "group_id" in args_d or True:
            pid = e.get("pid", 0)
            # heuristically keep XLA-op-like names
            if re.match(r"^(fusion|while|copy|gather|scatter|dynamic|sort|"
                        r"transpose|reduce|broadcast|iota|convert|select|"
                        r"concatenate|dot|custom|bitcast|slice|add|multiply|"
                        r"compare|cumsum|all-reduce|tuple|parameter|constant|"
                        r"get-tuple|pad|reshape|rng|xor|and|or|not|subtract|"
                        r"negate|exponential|log|sqrt|divide|maximum|minimum)",
                        name):
                key = re.sub(r"\.\d+$", "", name)
                tot[key] += e["dur"]
                cnt[key] += 1
                total_us += e["dur"]
    print(f"\ntotal device op time {total_us/2:.0f} us/frame")
    print(f"{'op':<44}{'us/frame':>10}{'count':>8}")
    for k, v in tot.most_common(args.top):
        print(f"{k:<44}{v/2:>10.0f}{cnt[k]//2:>8}")


if __name__ == "__main__":
    main()
