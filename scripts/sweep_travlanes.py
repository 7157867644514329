#!/usr/bin/env python
"""On-chip A/B for the compacted traversal window (trav_lanes knob).

One process (one relay warmup), prints one JSON line per config to stdout
and appends to /tmp/sweep_travlanes.log (resume-safe like sweep_r3).

Hypothesis (megakernel.py trav_lanes docstring): on open scenes most path
segments never enter the BVH (dragon ~87% fast-forward), so stepping only
the C traversing lanes cuts per-iteration row-gather issue cost, which the
round-3 op profile measured as the per-iteration floor (~163 us/iter of 6
gathers at B=16384).
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sweep_r3 import add_texture_test, bench_one  # noqa: E402

CONFIGS = [
    # baseline regression points (current defaults)
    ("dragon", {}),
    ("dragon", {"_kw": {"trav_lanes": 2048}}),
    ("dragon", {"_kw": {"trav_lanes": 4096}}),
    ("dragon", {"_kw": {"trav_lanes": 8192}}),
    # more total lanes + compact window: more boundary batching per pass
    ("dragon", {"_kw": {"lanes": 32768, "trav_lanes": 4096}}),
    ("dragon", {"_kw": {"lanes": 32768, "trav_lanes": 8192}}),
    ("sponza", {}),
    ("sponza", {"_kw": {"trav_lanes": 4096}}),
    ("sponza", {"_kw": {"trav_lanes": 8192}}),
    ("room2", {}),
    ("room2", {"_kw": {"trav_lanes": 4096}}),
    ("room2", {"_kw": {"trav_lanes": 8192}}),
]


def main():
    add_texture_test()
    out_path = "/tmp/sweep_travlanes.log"
    done = set()
    if os.path.exists(out_path):
        for ln in open(out_path):
            try:
                r = json.loads(ln)
            except ValueError:
                continue
            if "mrays" in r:
                done.add((r["scene"], json.dumps(r.get("kw"), sort_keys=True)))
    with open(out_path, "a") as fh:
        for scene, env in CONFIGS:
            kw = env.pop("_kw", None) if isinstance(env, dict) else None
            key = (scene, json.dumps(kw, sort_keys=True))
            if key in done:
                print(f"skip (done): {key}", flush=True)
                continue
            try:
                v = bench_one(scene, env, renderer_kw=kw)
                rec = {"scene": scene, "kw": kw, "mrays": v}
            except Exception as e:
                rec = {"scene": scene, "kw": kw,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            fh.write(line + "\n")
            fh.flush()


if __name__ == "__main__":
    main()
