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
    ap.add_argument("--no-hlo", action="store_true",
                    help="skip the compiled-HLO fusion annotation pass")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--fused", type=int, default=None, choices=[0, 1],
                    help="fused Mosaic boundary (None = tuned.json)")
    ap.add_argument("--rpp", type=int, default=1)
    args = ap.parse_args()

    import jax
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = named_scene(args.scene)
    p = RenderParams(width=args.width, height=args.height, bounces=5,
                     rays_per_pixel=args.rpp, skybox=True, frames=0)
    r = Renderer(fused_boundary=(None if args.fused is None
                                 else bool(args.fused)))
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

    # ---- per-instruction table: the aggregated view above collapses every
    # fusion.N into one "fusion" bucket — useless for attacking the VPU
    # tail. Keep the full instruction names and annotate each from the
    # compiled HLO (root metadata op_name/source + fused-op histogram). ----
    itot = collections.Counter()
    icnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if re.match(r"^(fusion|while|copy|gather|scatter|dynamic|sort|"
                    r"transpose|reduce|broadcast|iota|convert|select|"
                    r"concatenate|dot|custom|bitcast|slice|add|multiply|"
                    r"compare|cumsum|all-reduce|tuple|pad|reshape|rng)",
                    name):
            itot[name] += e["dur"]
            icnt[name] += 1

    notes = {}
    if not args.no_hlo:
        try:
            notes = hlo_annotations(r, host, p, set(itot))
        except Exception as exc:   # annotation is best-effort
            print(f"(HLO annotation unavailable: {type(exc).__name__}: {exc})")

    print(f"\nper-instruction (top {args.top}):")
    print(f"{'instruction':<22}{'us/frame':>9}{'count':>7}  note")
    for k, v in itot.most_common(args.top):
        print(f"{k:<22}{v/2:>9.1f}{icnt[k]//2:>7}  {notes.get(k, '')}")


def hlo_annotations(r, host, p, names):
    """instruction name -> 'shape | fused-op histogram | op_name@line' from
    the compiled HLO of the exact shipping render_frame call."""
    import dataclasses
    from ray_tracer_2_tpu.engine.renderer import render_frame

    fargs, fkwargs = r.frame_call(host.render_scene,
                                  dataclasses.replace(p, frames=6))
    txt = render_frame.lower(*fargs, **fkwargs).compile().as_text()
    Path("/tmp/rt2_hlo.txt").write_text(txt)
    print("(compiled HLO written to /tmp/rt2_hlo.txt)")

    # Pass 1: per-computation opcode histograms (for kLoop fusion bodies).
    comp_ops = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?([\w.\-]+) \(", line.strip())
        if not line.startswith(" ") and m:
            cur = m.group(1)
            comp_ops[cur] = collections.Counter()
            continue
        if cur and line.startswith("  "):
            mo = re.match(r"\s+(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(",
                          line)
            if mo:
                comp_ops[cur][mo.group(1)] += 1

    # Pass 2: instruction lines anywhere in the module.
    notes = {}
    pat = re.compile(
        r"%?([\w.\-]+) = (\S+) ([\w\-]+)\(.*?"
        r"(?:calls=%?([\w.\-]+))?(?:, )?"
        r"(?:metadata=\{(.*?)\})?$")
    for line in txt.splitlines():
        m = re.match(r"\s+(?:ROOT )?%?([\w.\-]+) = (\S+) ([\w\-]+)\(", line)
        if not m or m.group(1) not in names:
            continue
        name, shape, opcode = m.groups()
        parts = [shape]
        mc = re.search(r"calls=%?([\w.\-]+)", line)
        if mc and mc.group(1) in comp_ops:
            hist = comp_ops[mc.group(1)]
            parts.append(" ".join(f"{k}x{v}" for k, v in
                                  hist.most_common(6)))
        mm = re.search(r'op_name="([^"]*)"', line)
        ml = re.search(r'source_line=(\d+)', line)
        mf = re.search(r'source_file="([^"]*)"', line)
        if mm:
            src = mm.group(1)
            src = re.sub(r"^jit\(render_frame\)/", "", src)[-90:]
            if mf and ml:
                src += f" [{Path(mf.group(1)).name}:{ml.group(1)}]"
            parts.append(src)
        notes[name] = " | ".join(parts)
    return notes


if __name__ == "__main__":
    main()
