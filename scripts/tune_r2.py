"""On-chip knob sweep for the wide-traversal megakernel (dragon scene)."""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from bench import dragon_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    host = dragon_scene()
    p = RenderParams(width=1920, height=1080, bounces=5, rays_per_pixel=1,
                     skybox=True, frames=0)

    combos = [
        dict(),                                     # defaults
        dict(unroll=2),
        dict(unroll=6),
        dict(unroll=8),
        dict(shade_every=1),
        dict(shade_every=3),
        dict(unroll=2, shade_every=1),
        dict(lanes=8192),
        dict(lanes=32768),
        dict(lanes=32768, unroll=2),
    ]
    for kw in combos:
        r = Renderer(**kw)
        try:
            for f in range(2):
                fb = r.render(host.render_scene,
                              dataclasses.replace(p, frames=f))
            fb.block_until_ready()
            t0 = time.perf_counter()
            rays = 0.0
            for f in range(2, 5):
                r.render(host.render_scene, dataclasses.replace(p, frames=f))
                rays += float(r.last_segments)
            r.framebuffer.block_until_ready()
            dt = time.perf_counter() - t0
            print(json.dumps(dict(kw=kw, s_per_frame=round(dt / 3, 3),
                                  mrays=round(rays / dt / 1e6, 2))),
                  flush=True)
        except Exception as e:
            print(json.dumps(dict(kw=kw, error=str(e)[:200])), flush=True)


if __name__ == "__main__":
    main()
