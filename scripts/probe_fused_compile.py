#!/usr/bin/env python
"""Mosaic compile smoke for the fused boundary (small shapes, fast relay
turnaround): renders a tiny frame of the wide-BVH probe scene with
fused_boundary on/off on the REAL backend and reports segment counts +
image stats. Iterating lowering fixes through bench.py costs a full dragon
compile each try (~5-20 min cold); this probe compiles in a fraction.

Usage: python scripts/probe_fused_compile.py   (TPU; one process at a time)
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    t0 = time.perf_counter()
    import jax
    import numpy as np
    print(json.dumps({"devices": str(jax.devices()),
                      "backend": jax.default_backend()}), flush=True)
    from __graft_entry__ import _wide_bvh_scene
    from ray_tracer_2_tpu.kernels.megakernel import render_persistent

    rs = _wide_bvh_scene()
    kw = dict(width=128, height=64, bounces=4, rays_per_pixel=1,
              skybox=True, lanes=1024, unroll=2)
    out = {}
    variants = ((True,),) if os.environ.get("RT2_PROBE_FUSED_ONLY") == "1" \
        else ((False,), (True,))
    for (fused,) in variants:
        try:
            img, segs = jax.jit(lambda s, f, _fu=fused: render_persistent(
                s, f, fused_boundary=_fu, **kw))(rs, 1)
            img = np.asarray(img)
            out[f"fused{int(fused)}"] = dict(
                segs=float(segs), finite=bool(np.isfinite(img).all()),
                mean=round(float(img[..., :3].mean()), 5),
                t=round(time.perf_counter() - t0, 1))
            if fused and "fused0" in out:
                out["frac_match"] = round(float(
                    (np.abs(img - prev).max(axis=-1) < 1e-5).mean()), 4)
            prev = img
        except Exception:
            out[f"fused{int(fused)}"] = dict(
                error=traceback.format_exc()[-1800:])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
