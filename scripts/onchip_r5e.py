#!/usr/bin/env python
"""Round-5 on-chip campaign E: end-of-round scene-table regression sweep
(tuned defaults incl. the new tpu:fused profile) + measured-best-config
rows for the scenes with unmet round targets (room2, sponza — rpp
amortization; VERDICT r4 #5/#6). JSON lines to /tmp/onchip_r5e.log.
ONE process at a time on the relay.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5e.log", "a", buffering=1)
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
    from ray_tracer_2_tpu.scene import scenes
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

    # regression sweep at rpp=1, tuned defaults (dragon now rides the
    # tpu:fused profile; sponza rides the 32 MB budget = new bench default)
    os.environ["RT2_TEX_BUDGET_MB"] = "32"
    jobs = [("dragon", 1, 6), ("sponza", 1, 6), ("room2", 1, 6),
            ("random_balls", 1, 6), ("cornell", 1, 8), ("metal", 1, 8),
            ("balls", 1, 8), ("room", 1, 8), ("texture_test", 1, 6),
            # best-config rows (rpp amortization)
            ("room2", 8, 3), ("room2", 16, 2),
            ("sponza", 8, 3), ("sponza", 16, 2),
            ("random_balls", 8, 3)]
    for name, rpp, frames in jobs:
        try:
            host = (instantiate_scene(scenes.texture_test())
                    if name == "texture_test" else None)
            mrays, ms = bench_scene(name, rpp=rpp, frames=frames,
                                    scene=host)
            emit(item="scene", scene=name, rpp=rpp, mrays=mrays,
                 ms_per_frame=ms)
        except Exception:
            emit(item="scene", scene=name, rpp=rpp,
                 error=traceback.format_exc()[-800:])
    os.environ.pop("RT2_TEX_BUDGET_MB", None)

    # dragon at the FINAL bench default (fused profile unroll=3, rpp=32):
    # the exact driver-protocol number for BENCH_r05
    try:
        import bench
        sys.argv = ["bench.py"]
        bench.main()
        emit(item="bench_default", rc=0)
    except SystemExit as e:
        emit(item="bench_default", rc=int(e.code or 0))
    except Exception:
        emit(item="bench_default", error=traceback.format_exc()[-800:])

    # flip-aware converged cross-impl gate (4096 spp, frame-batched)
    try:
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
