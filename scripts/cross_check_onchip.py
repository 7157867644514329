#!/usr/bin/env python
"""On-chip converged cross-implementation check (VERDICT r2 item 6).

Renders Cornell Box at 128x72 through BOTH independent implementations —
the Pallas whole-path Mosaic kernel (REAL compilation, not interpret mode)
and the XLA persistent-lanes megakernel — and gates their agreement.

Two regimes (same equivalence class as tests/test_fused_boundary.py):

* interpret/CPU: the Mosaic kernel executes with XLA op semantics, so the
  same-RNG implementations track draw-for-draw and the converged images
  must agree to < 1e-3 rmse (far inside the BASELINE.md "1% at 1024 spp"
  north star).
* real TPU: Mosaic FMA-contracts mul+add chains differently from XLA's
  fused reduces, so bounce directions shift by ulps and chaotic paths
  diverge — per-sample agreement is unrecoverable BY CONSTRUCTION of the
  hardware (measured round-5: rmse 0.033 at 256 spp = MC-noise level).
  The provable property is that both estimators target the SAME image:
  |mean(diff)| stays at the noise floor (no bias) and rmse(diff) shrinks
  at the 1/sqrt(spp) Monte-Carlo rate (the residual is variance, not
  structure). Gates: |mean| < 5 standard errors + 2e-3 absolute, and
  rmse(256 spp) < 0.65 x rmse(64 spp) (pure noise gives 0.5).

Run on a TPU host: python scripts/cross_check_onchip.py
CI equivalent (interpret mode, smaller): tests/test_cross_impl.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ray_tracer_2_tpu.engine.renderer import render_sample
    from ray_tracer_2_tpu.kernels.pallas_spheres import (
        eligible, render_spheres_pallas)
    from ray_tracer_2_tpu.scene import scenes
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

    rs = instantiate_scene(scenes.cornell_box()).render_scene
    assert eligible(rs)
    W, H, RPP, FRAMES = 128, 72, 4, 64  # 256 spp total
    CHECK_AT = 16                       # 64 spp intermediate for the ratio
    interp = jax.default_backend() != "tpu"   # CPU validation runs
    t0 = time.perf_counter()

    acc_p = np.zeros((H, W, 4))
    acc_x = np.zeros((H, W, 4))
    rmse_at = {}
    for f in range(FRAMES):
        img_p, _ = render_spheres_pallas(
            rs, jnp.int32(f), width=W, height=H, bounces=5,
            rays_per_pixel=RPP, skybox=True, interpret=interp)
        img_x, _ = render_sample(
            rs, jnp.int32(f), jnp.float32(1.0), width=W, height=H,
            bounces=5, rays_per_pixel=RPP, skybox=True, debug_mode=0,
            tile_rows=8)
        acc_p += np.asarray(img_p, np.float64)
        acc_x += np.asarray(img_x, np.float64)
        if f + 1 in (CHECK_AT, FRAMES):
            d = (acc_p[..., :3] - acc_x[..., :3]) / (f + 1)
            rmse_at[(f + 1) * RPP] = float(np.sqrt(np.mean(d * d)))

    diff = (acc_p[..., :3] - acc_x[..., :3]) / FRAMES
    rmse = rmse_at[FRAMES * RPP]
    mean = float(diff.mean())
    # standard error of the mean over per-value noise
    se = float(diff.std() / np.sqrt(diff.size)) or 1e-12
    ratio = rmse / max(rmse_at[CHECK_AT * RPP], 1e-12)

    if jax.default_backend() == "tpu":
        ok = (abs(mean) < max(5 * se, 2e-3)) and (ratio < 0.65)
        gate = "unbiased + 1/sqrt(spp) convergence (Mosaic FMA chaos class)"
    else:
        ok = rmse < 1e-3
        gate = "same-RNG converged rmse < 1e-3 (interpret mode)"
    out = {"metric": "cornell_cross_impl_rmse_256spp", "value": rmse,
           "unit": "rmse", "backend": jax.default_backend(),
           "mean_diff": mean, "se": se,
           "rmse_64spp": rmse_at[CHECK_AT * RPP],
           "convergence_ratio": round(ratio, 4), "gate": gate,
           "seconds": round(time.perf_counter() - t0, 1),
           "pass": bool(ok)}
    print(json.dumps(out))
    if not out["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
