"""On-chip A/B for the whole-path Mosaic kernel's triangle cap (VERDICT r3
next-round #7).

The kernel streams world-baked triangles densely on sublanes
(kernels/pallas_spheres.py) — cost grows linearly in T, so there is a
crossover where the XLA megakernel's BVH traversal wins. The shipped gate is
MAX_TRIS=256, set by analogy with the measured 128-sphere cliff, never
measured directly. This probe builds procedural room-like scenes with a
displaced floor grid at T = 128..2048 world triangles and measures
Mrays/s at 1080p/5b/1rpp for:

  pallas   RT2_PALLAS_SPHERES=1 + RT2_PALLAS_TRI_CAP=<T>
  xla      RT2_PALLAS_SPHERES=0 (brute path below 1024 tris, wide BVH above)

Run on the chip: python scripts/probe_pallas_caps.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def grid_scene(n_tris: int):
    """room()-like closed box with the floor replaced by a displaced
    (bumpy) grid of ~n_tris triangles — realistic shading normals, full
    pixel coverage, glass+specular spheres kept for physics coverage."""
    from ray_tracer_2_tpu.scene.definition import MeshData, MeshFromData
    from ray_tracer_2_tpu.scene.scenes import room
    from ray_tracer_2_tpu.math.transform import Transform

    s = room()
    # replace the first mesh (the 2-tri floor) with the grid
    n_quads = max(n_tris // 2, 1)
    nx = int(np.sqrt(n_quads))
    nz = max(n_quads // nx, 1)
    xs = np.linspace(-2, 2, nx + 1, dtype=np.float32)
    zs = np.linspace(-2, 2, nz + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    gy = 0.08 * np.sin(gx * 4.1) * np.cos(gz * 3.7)  # gentle bumps
    pos = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    # analytic-ish normals from the height field
    nxv = -0.08 * 4.1 * np.cos(gx * 4.1) * np.cos(gz * 3.7)
    nzv = 0.08 * 3.7 * np.sin(gx * 4.1) * np.sin(gz * 3.7)
    nrm = np.stack([nxv, np.ones_like(gx), nzv], axis=-1).reshape(-1, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    idx = []
    for i in range(nx):
        for j in range(nz):
            a = i * (nz + 1) + j
            b = (i + 1) * (nz + 1) + j
            idx += [a, b, b + 1, a, b + 1, a + 1]
    data = MeshData.from_vertices(pos, nrm.astype(np.float32),
                                  indices=np.asarray(idx, np.uint32))
    ent = s.entities[0]
    s.entities[0] = type(ent)(transform=Transform(),
                              primitive=MeshFromData(data),
                              material=ent.material)
    return s


W = int(os.environ.get("PROBE_W", "1920"))
H = int(os.environ.get("PROBE_H", "1080"))


def bench_scene(defn, env):
    """Fresh-process-free A/B: both paths share one process; the env knobs
    are read at Renderer routing time (per-scene cache keyed by id)."""
    import dataclasses

    import jax

    from ray_tracer_2_tpu.config import RenderParams
    from ray_tracer_2_tpu.engine.renderer import Renderer
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        host = instantiate_scene(defn)
        r = Renderer()
        p = RenderParams(width=W, height=H, bounces=5,
                         rays_per_pixel=1, skybox=True, frames=0)
        def force(x):
            # the remote-relay platform's block_until_ready can return
            # early for some programs; device_get cannot (probe_r2.bench)
            return jax.device_get(x.ravel()[0])

        for f in range(2):
            fb = r.render(host.render_scene,
                          dataclasses.replace(p, frames=f))
        force(fb)
        n_frames = 6
        t0 = time.perf_counter()
        for f in range(2, 2 + n_frames):
            fb = r.render(host.render_scene,
                          dataclasses.replace(p, frames=f))
        force(fb)
        dt = (time.perf_counter() - t0) / n_frames
        segs = float(jax.device_get(r.last_segments))
        return segs / dt / 1e6
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    for T in (128, 256, 512, 1024, 2048):
        defn = grid_scene(T)
        for mode, env in (
                ("pallas", {"RT2_PALLAS_SPHERES": "1",
                            "RT2_PALLAS_TRI_CAP": str(T)}),
                ("xla", {"RT2_PALLAS_SPHERES": "0"})):
            try:
                v = bench_scene(defn, env)
                rec = {"tris": T, "mode": mode, "mrays": round(v, 2)}
            except Exception as e:
                rec = {"tris": T, "mode": mode,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
