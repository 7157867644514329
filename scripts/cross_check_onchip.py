#!/usr/bin/env python
"""On-chip converged cross-implementation check (VERDICT r2 item 6).

Renders Cornell Box at 128x72, 256 spp through BOTH independent
implementations — the Pallas whole-path Mosaic kernel (REAL compilation,
not interpret mode) and the XLA persistent-lanes megakernel — and reports
the converged-image RMSE. Gate: < 1e-3 (BASELINE.md: "Cornell within 1%
RMSE at 1024 spp" is the north star; two same-RNG implementations must sit
far inside that).

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
    W, H, RPP, FRAMES = 128, 72, 4, 64  # 256 spp
    t0 = time.perf_counter()

    acc_p = np.zeros((H, W, 4))
    acc_x = np.zeros((H, W, 4))
    for f in range(FRAMES):
        img_p, _ = render_spheres_pallas(
            rs, jnp.int32(f), width=W, height=H, bounces=5,
            rays_per_pixel=RPP, skybox=True)
        img_x, _ = render_sample(
            rs, jnp.int32(f), jnp.float32(1.0), width=W, height=H,
            bounces=5, rays_per_pixel=RPP, skybox=True, debug_mode=0,
            tile_rows=8)
        acc_p += np.asarray(img_p, np.float64)
        acc_x += np.asarray(img_x, np.float64)
    acc_p /= FRAMES
    acc_x /= FRAMES

    rmse = float(np.sqrt(np.mean((acc_p[..., :3] - acc_x[..., :3]) ** 2)))
    out = {"metric": "cornell_cross_impl_rmse_256spp", "value": rmse,
           "unit": "rmse", "backend": jax.default_backend(),
           "seconds": round(time.perf_counter() - t0, 1),
           "pass": rmse < 1e-3}
    print(json.dumps(out))
    if not out["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
