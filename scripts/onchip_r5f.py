#!/usr/bin/env python
"""Round-5 on-chip campaign F: last cheap knob probes around the shipped
fused config (16384 lanes / unroll 3 / rpp 32 / log_cap 8192).
JSON lines to /tmp/onchip_r5f.log. ONE process on the relay.
"""
from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5f.log", "a", buffering=1)
T0 = time.perf_counter()


def emit(**obj):
    obj["t"] = round(time.perf_counter() - T0, 1)
    line = json.dumps(obj)
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax
    emit(stage="devices", devices=str(jax.devices()),
         backend=jax.default_backend())
    from onchip_r5c import bench_scene

    probes = [
        dict(tag="unroll2", rpp=1, frames=6, unroll=2),
        dict(tag="logcap16k_rpp32", rpp=32, frames=2, unroll=3,
             log_cap=16384),
        dict(tag="rpp48", rpp=48, frames=2, unroll=3),
    ]
    for pr in probes:
        tag = pr.pop("tag")
        rpp, frames = pr.pop("rpp"), pr.pop("frames")
        try:
            mrays, ms = bench_scene("dragon", rpp=rpp, frames=frames,
                                    fused_boundary=True, lanes=16384, **pr)
            emit(item=tag, rpp=rpp, mrays=mrays, ms_per_frame=ms, **pr)
        except Exception:
            emit(item=tag, error=traceback.format_exc()[-800:])
    emit(stage="done")


if __name__ == "__main__":
    main()
