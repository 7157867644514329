#!/usr/bin/env python
"""On-chip converged cross-implementation check (VERDICT r2 item 6).

Renders Cornell Box at 128x72 through BOTH independent implementations —
the Pallas whole-path Mosaic kernel (REAL compilation, not interpret mode)
and the XLA persistent-lanes/tiled megakernel — and gates their agreement.

Two regimes (same equivalence class as tests/test_fused_boundary.py):

* interpret/CPU: the Mosaic kernel executes with XLA op semantics, so the
  same-RNG implementations track draw-for-draw and the converged images
  must agree to < 1e-3 rmse (far inside the BASELINE.md "1% at 1024 spp"
  north star).
* real TPU: Mosaic compiles its own transcendental approximations and
  FMA-contracts differently from XLA, so (a) chaotic per-path divergence
  makes per-sample agreement unrecoverable, and (b) a small SYSTEMATIC
  floor can remain (e.g. sky pow/smoothstep evaluated by two different
  polynomial approximations). The residual therefore decomposes as
  rmse^2(spp) = b^2 + sigma^2/spp — Monte-Carlo variance dying at 1/spp
  over a constant bias floor b. The script measures rmse at three spp
  checkpoints, fits b from the two largest, and gates:

      b < 0.01        (the BASELINE.md north star: 1% at 1024 spp)
      |mean(diff)| < max(5 SE, 2e-3)   (no global energy bias)

  Both converged accumulations are saved to /tmp/cross_{p,x}.npy for
  structure diagnosis when the gate fails.

Accumulation runs as ONE jit per implementation (lax.fori_loop over
frames, frame-batched dispatch) — the relay's per-dispatch gap made the
frame-at-a-time variant 551 s; this shape is bounded by device time.

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
    on_tpu = jax.default_backend() == "tpu"
    W, H, RPP = 128, 72, 4
    # spp checkpoints: frames x RPP. CPU validation stays at 256 spp (the
    # interpret path is ~1 s/frame); the chip runs to the 1024-spp north
    # star inside one fori_loop dispatch per segment.
    CKPTS = (16, 64, 256) if on_tpu else (4, 16, 64)
    t0 = time.perf_counter()

    def accum(render_one):
        """Partial-mean images at each frame checkpoint, one jit call."""

        @jax.jit
        def run():
            outs = []
            acc = jnp.zeros((H, W, 4))
            lo = 0
            for hi in CKPTS:
                def body(f, a):
                    return a + render_one(jnp.int32(f))
                acc = jax.lax.fori_loop(lo, hi, body, acc)
                outs.append(acc / hi)
                lo = hi
            return outs

        return [np.asarray(o, np.float64) for o in run()]

    def one_p(f):
        img, _ = render_spheres_pallas(
            rs, f, width=W, height=H, bounces=5, rays_per_pixel=RPP,
            skybox=True, interpret=not on_tpu)
        return img

    def one_x(f):
        img, _ = render_sample(
            rs, f, jnp.float32(1.0), width=W, height=H, bounces=5,
            rays_per_pixel=RPP, skybox=True, debug_mode=0, tile_rows=8)
        return img

    outs_p = accum(one_p)
    outs_x = accum(one_x)
    np.save("/tmp/cross_p.npy", outs_p[-1])
    np.save("/tmp/cross_x.npy", outs_x[-1])

    rmse_at = {}
    for ck, ip, ix in zip(CKPTS, outs_p, outs_x):
        d = ip[..., :3] - ix[..., :3]
        rmse_at[ck * RPP] = float(np.sqrt(np.mean(d * d)))
    spps = [ck * RPP for ck in CKPTS]
    diff = outs_p[-1][..., :3] - outs_x[-1][..., :3]
    rmse = rmse_at[spps[-1]]
    mean = float(diff.mean())
    se = float(diff.std() / np.sqrt(diff.size)) or 1e-12

    # bias-floor fit from the two largest checkpoints:
    # rmse^2(spp) = b^2 + c/spp  =>  c = (r_M^2 - r_N^2) / (1/M - 1/N)
    M, N = spps[-2], spps[-1]
    c = (rmse_at[M] ** 2 - rmse ** 2) / (1.0 / M - 1.0 / N)
    b2 = rmse ** 2 - c / N
    bias_floor = float(np.sqrt(max(b2, 0.0)))

    if on_tpu:
        ok = (bias_floor < 0.01) and (abs(mean) < max(5 * se, 2e-3))
        gate = ("bias floor < 1% (north star) + unbiased mean "
                "(Mosaic chaos+approximation class)")
    else:
        ok = rmse < 1e-3
        gate = "same-RNG converged rmse < 1e-3 (interpret mode)"
    out = {"metric": f"cornell_cross_impl_rmse_{spps[-1]}spp",
           "value": rmse, "unit": "rmse",
           "backend": jax.default_backend(),
           "rmse_by_spp": {str(k): round(v, 6)
                           for k, v in rmse_at.items()},
           "bias_floor": round(bias_floor, 6),
           "mean_diff": mean, "se": se, "gate": gate,
           "seconds": round(time.perf_counter() - t0, 1),
           "pass": bool(ok)}
    print(json.dumps(out))
    if not out["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
