#!/usr/bin/env python
"""Round-5 on-chip campaign D (ONE process; after onchip_r5c set the fused
profile): close out the headline config. JSON lines to /tmp/onchip_r5d.log.

1. unroll=3 probe at rpp=1 (r5c: 4 beat 5 by 4% under the fused boundary —
   check the trend does not continue).
2. rpp ladder extension at the winning unroll: rpp=24, 32 (r5c: 29.52 at
   rpp=16 and still rising, +1.9% from 8->16).
3. The exact driver protocol: bench.main() with default argv — validates
   BENCH_r05 end-to-end (tuned tpu:fused profile, rpp default, disclosure).
"""
from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5d.log", "a", buffering=1)
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

    best_unroll, best1 = 4, 24.67   # r5c measured
    try:
        mrays, ms = bench_scene("dragon", rpp=1, frames=6,
                                fused_boundary=True, lanes=16384, unroll=3)
        emit(item="unroll3", rpp=1, mrays=mrays, ms_per_frame=ms)
        if mrays > best1:
            best_unroll, best1 = 3, mrays
    except Exception:
        emit(item="unroll3", error=traceback.format_exc()[-800:])

    best_rpp, best = 16, 29.52      # r5c measured at unroll=4
    for rpp in (24, 32):
        try:
            mrays, ms = bench_scene("dragon", rpp=rpp, frames=2,
                                    fused_boundary=True, lanes=16384,
                                    unroll=best_unroll)
            emit(item="rpp_ladder", unroll=best_unroll, rpp=rpp,
                 mrays=mrays, ms_per_frame=ms)
            if mrays > best:
                best_rpp, best = rpp, mrays
        except Exception:
            emit(item="rpp_ladder", rpp=rpp,
                 error=traceback.format_exc()[-800:])
    emit(item="winner", unroll=best_unroll, rpp=best_rpp, mrays=best)

    # driver-protocol validation (in-process; tuned.json already carries
    # the tpu:fused profile)
    try:
        import bench
        sys.argv = ["bench.py"]
        bench.main()
        emit(item="bench_default", rc=0)
    except SystemExit as e:
        emit(item="bench_default", rc=int(e.code or 0))
    except Exception:
        emit(item="bench_default", error=traceback.format_exc()[-800:])

    # converged cross-impl gate, bias-floor version (frame-batched)
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
