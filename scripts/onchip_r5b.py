#!/usr/bin/env python
"""Round-5 on-chip campaign B (ONE process; run after probe_fused_compile
is green). JSON lines to /tmp/onchip_r5b.log:

1. Dragon fused A/B at rpp=1 and the fused rpp sweep (VERDICT r4 #1/#3).
2. On-chip fused image gate (statistical, full size).
3. Sponza texel-budget sweep: RT2_TEX_BUDGET_MB in {0, 16, 32, 64}
   (VERDICT r4 #5 — the measured atlas-cliff attack).
4. cornell 1024 spp with batched dispatch (VERDICT r4 #4).
5. scripts/cross_check_onchip.py converged fidelity gate (VERDICT r4 #8c).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LOG = open("/tmp/onchip_r5b.log", "a", buffering=1)


def emit(**obj):
    line = json.dumps(obj)
    print(line, flush=True)
    LOG.write(line + "\n")


def bench_scene(scene_name, rpp=1, frames=8, warmup=2, scene=None,
                **renderer_kw):
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = scene if scene is not None else named_scene(scene_name)
    p = RenderParams(width=1920, height=1080, bounces=5,
                     rays_per_pixel=rpp, skybox=True, frames=0)
    r = Renderer(**renderer_kw)
    for f in range(warmup):
        fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
    fb.block_until_ready()
    t0 = time.perf_counter()
    segc = []
    for f in range(warmup, warmup + frames):
        r.render(host.render_scene, dataclasses.replace(p, frames=f))
        segc.append(r.last_segments)
    r.framebuffer.block_until_ready()
    dt = time.perf_counter() - t0
    mrays = sum(float(s) for s in segc) / dt / 1e6
    return round(mrays, 2), round(dt / frames * 1e3, 1)


def main():
    t_start = time.perf_counter()
    import jax
    emit(stage="devices", devices=str(jax.devices()),
         backend=jax.default_backend())

    # ---- 1. fused A/B + rpp sweep ----
    fused_ok = True
    for fused, rpp, frames in [(0, 1, 8), (1, 1, 8), (1, 4, 4), (1, 8, 3),
                               (1, 16, 2)]:
        if fused and not fused_ok:
            break
        try:
            mrays, ms = bench_scene("dragon", rpp=rpp, frames=frames,
                                    fused_boundary=bool(fused))
            emit(item="dragon", fused=fused, rpp=rpp, mrays=mrays,
                 ms_per_frame=ms, t=round(time.perf_counter() - t_start, 1))
        except Exception:
            emit(item="dragon", fused=fused, rpp=rpp,
                 error=traceback.format_exc()[-1200:])
            if fused:
                fused_ok = False

    # ---- 2. fused image gate on chip ----
    if fused_ok:
        try:
            import numpy as np
            from bench import dragon_scene
            from ray_tracer_2_tpu.config import RenderParams
            from ray_tracer_2_tpu.engine.renderer import Renderer

            host = dragon_scene()
            p = RenderParams(width=1920, height=1080, bounces=5,
                             rays_per_pixel=1, skybox=True, frames=3)
            r0 = Renderer(fused_boundary=False)
            r1 = Renderer(fused_boundary=True)
            i0 = np.asarray(r0.render(host.render_scene, p))
            s0 = float(r0.last_segments)
            i1 = np.asarray(r1.render(host.render_scene, p))
            s1 = float(r1.last_segments)
            err = np.abs(i0 - i1).max(axis=-1)
            emit(item="fused_image_check",
                 frac_lt_1e5=round(float((err < 1e-5).mean()), 4),
                 frac_lt_1e3=round(float((err < 1e-3).mean()), 4),
                 rmse=round(float(np.sqrt((err ** 2).mean())), 5),
                 seg_rel=round(abs(s0 - s1) / max(s1, 1.0), 6),
                 finite=bool(np.isfinite(i1).all()))
        except Exception:
            emit(item="fused_image_check",
                 error=traceback.format_exc()[-800:])

    # ---- 3. sponza texel-budget sweep ----
    from ray_tracer_2_tpu.scene import scenes
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene
    for mb in (0, 16, 32, 64):
        try:
            os.environ["RT2_TEX_BUDGET_MB"] = str(mb)
            host = instantiate_scene(scenes.sponza())
            atlas_mb = round(
                float(host.render_scene.tex_texels.size) * 4 / 2 ** 20, 1)
            mrays, ms = bench_scene("sponza", rpp=1, frames=6, scene=host)
            emit(item="sponza_budget", budget_mb=mb, atlas_mb=atlas_mb,
                 mrays=mrays, ms_per_frame=ms,
                 t=round(time.perf_counter() - t_start, 1))
        except Exception:
            emit(item="sponza_budget", budget_mb=mb,
                 error=traceback.format_exc()[-600:])
        finally:
            os.environ.pop("RT2_TEX_BUDGET_MB", None)

    # ---- 4. cornell 1024 spp, batched dispatch ----
    try:
        import dataclasses as dc
        from bench import named_scene
        from ray_tracer_2_tpu.config import RenderParams
        from ray_tracer_2_tpu.engine.renderer import Renderer

        host = named_scene("cornell")
        rpp = 16
        p = RenderParams(width=1920, height=1080, bounces=5,
                         rays_per_pixel=rpp, skybox=True, frames=0)
        r = Renderer()
        r.render_batch(host.render_scene, dc.replace(p, frames=0), 16)
        r.framebuffer.block_until_ready()
        n_frames = 1024 // rpp
        t0 = time.perf_counter()
        rays = 0.0
        for f in range(0, n_frames, 16):
            r.render_batch(host.render_scene, dc.replace(p, frames=f), 16)
            rays += float(r.last_segments)
        r.framebuffer.block_until_ready()
        dt = time.perf_counter() - t0
        emit(item="cornell1024_batched", rpp=rpp, batch=16,
             seconds=round(dt, 1), mrays=round(rays / dt / 1e6, 2),
             t=round(time.perf_counter() - t_start, 1))
    except Exception:
        emit(item="cornell1024_batched",
             error=traceback.format_exc()[-600:])

    # ---- 5. converged cross-impl fidelity gate on chip (IN-process —
    # a subprocess would contend on the relay with this one) ----
    try:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        import cross_check_onchip
        cross_check_onchip.main()
        emit(item="cross_check", rc=0)
    except SystemExit as e:
        emit(item="cross_check", rc=int(e.code or 0))
    except Exception:
        emit(item="cross_check", error=traceback.format_exc()[-400:])

    emit(stage="done", total_s=round(time.perf_counter() - t_start, 1))


if __name__ == "__main__":
    main()
