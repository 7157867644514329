#!/usr/bin/env python
"""Round-3 session-3 on-chip sweep: one process (one relay warmup), many
configs. Prints one JSON line per config to stdout and /tmp/sweep_r3.log.

Configs cover the session's levers:
  - dragon / sponza / room2 baselines (regression check)
  - random_balls: exact vs shared-term dense pass (RT2_SPHERE_FAST)
  - random_balls via the Pallas whole-path kernel (RT2_PALLAS_SPHERE_CAP)
  - small sphere scenes through Pallas (dead-block early-out effect)
"""
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_one(scene_name, env=None, frames=8, warmup=2, width=1920,
              height=1080, bounces=5, renderer_kw=None):
    import jax
    from bench import named_scene
    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer

    env = env or {}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        jax.clear_caches()   # env knobs are read at trace time
        host = named_scene(scene_name)
        p = RenderParams(width=width, height=height, bounces=bounces,
                         rays_per_pixel=1, skybox=True, frames=0)
        r = Renderer(**(renderer_kw or {}))
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
        return round(mrays, 2)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


CONFIGS = [
    # RT2_NOREDUCE / RT2_DOT_UNROLL configs removed: measured LOSERS on
    # every scene (docs/PERF_NOTES.md round-3 on-chip session), deleted.
    ("dragon", {}),
    # ray packets (union traversal, bit-identical — tests/test_packet.py):
    # P rays share each row gather; sim_packet.py predicts 3x fewer
    # fetches at P=4 on the dragon frame mix
    ("dragon", {"_kw": {"packet": 2}}),
    ("dragon", {"_kw": {"packet": 4}}),
    ("dragon", {"_kw": {"packet": 8}}),
    ("dragon", {"_kw": {"packet": 4, "lanes": 32768}}),
    ("dragon", {"_kw": {"packet": 4, "lanes": 65536}}),
    ("dragon", {"_kw": {"packet": 4, "unroll": 8}}),
    ("sponza", {"_kw": {"packet": 4}}),
    ("room2", {"_kw": {"packet": 4}}),
    ("random_balls", {"_kw": {"packet": 4}}),
    ("random_balls", {}),                              # fast dense (new)
    ("random_balls", {"RT2_SPHERE_FAST": "0"}),        # exact dense (old)
    ("random_balls", {"RT2_PALLAS_SPHERE_CAP": "512"}),  # Pallas whole-path
    ("metal", {}),
    ("balls", {}),
    ("room", {}),
    ("cornell", {}),
    ("sponza", {}),
    ("room2", {}),
    ("texture_test", {}),
    # lanes/unroll re-sweep under the round-3 iteration structure (log cap,
    # claim shuffle, traversal-limit seeding may have moved the optimum)
    ("dragon", {"_kw": {"lanes": 24576}}),
    ("dragon", {"_kw": {"lanes": 32768}}),
    ("dragon", {"_kw": {"lanes": 49152}}),
    ("dragon", {"_kw": {"lanes": 65536}}),
    ("dragon", {"_kw": {"lanes": 8192}}),
    ("dragon", {"_kw": {"lanes": 32768, "unroll": 4}}),
    ("dragon", {"_kw": {"unroll": 4}}),
    ("dragon", {"_kw": {"unroll": 6}}),
]


def add_texture_test():
    """texture_test isn't in bench.named_scene; register it for the sweep."""
    import bench
    from ray_tracer_2_tpu.scene import scenes
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene
    orig = bench.named_scene

    def named_scene(name):
        if name == "texture_test":
            return instantiate_scene(scenes.texture_test())
        return orig(name)

    bench.named_scene = named_scene


def main():
    add_texture_test()
    names = sys.argv[1:]
    out_path = "/tmp/sweep_r3.log"
    # Resume support: skip configs already measured (by scene+env+kw key)
    # so an interrupted sweep re-run doesn't repeat finished work.
    done = set()
    if os.path.exists(out_path):
        for ln in open(out_path):
            try:
                r = json.loads(ln)
            except ValueError:
                continue
            if "mrays" in r:
                done.add((r["scene"], json.dumps(r.get("env") or {},
                                                 sort_keys=True),
                          json.dumps(r.get("kw"), sort_keys=True)))
    with open(out_path, "a") as fh:
        for scene, env in CONFIGS:
            if names and scene not in names:
                continue
            kw_peek = env.get("_kw") if isinstance(env, dict) else None
            env_peek = {k: v for k, v in env.items() if k != "_kw"}
            key = (scene, json.dumps(env_peek, sort_keys=True),
                   json.dumps(kw_peek, sort_keys=True))
            if key in done:
                print(f"skip (done): {key}", flush=True)
                continue
            try:
                kw = env.pop("_kw", None) if isinstance(env, dict) else None
                v = bench_one(scene, env, renderer_kw=kw)
                rec = {"scene": scene, "env": env, "kw": kw, "mrays": v}
            except Exception as e:  # keep sweeping on one-config failure
                rec = {"scene": scene, "env": env,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            fh.write(line + "\n")
            fh.flush()


if __name__ == "__main__":
    main()
