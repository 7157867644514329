"""Render-state checkpointing (SURVEY.md §5.4).

The reference's only render state is the accumulation framebuffer + frame
counter, invalidated on camera/param changes (app.rs:55-57, egui.rs:498-507)
— it cannot persist a long render across process restarts. Here the full
progressive-render state is a tiny pytree:

    (framebuffer, frames counter, render params, camera pose, scene name)

serialized to one ``.npz``. Restoring it resumes accumulation exactly where
it stopped: the RNG is a pure counter hash keyed by (pixel, frame)
(rng.py), so frame ``n+1`` after restore draws the identical stream it would
have drawn without the restart.
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np

from ray_tracer_2_tpu.config import DebugMode, RenderParams


def save_checkpoint(path, framebuffer, params: RenderParams, *,
                    scene_name: str | None = None, camera=None) -> None:
    """framebuffer: (H, W, 4) device or host array; camera: scene Camera."""
    meta = dict(
        params={f.name: (int(getattr(params, f.name))
                         if not isinstance(getattr(params, f.name), bool)
                         else bool(getattr(params, f.name)))
                for f in dataclasses.fields(params)},
        scene_name=scene_name,
    )
    arrays = dict(framebuffer=np.asarray(framebuffer),
                  meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8))
    if camera is not None:
        arrays["camera_pos"] = np.asarray(camera.transform.pos, np.float32)
        arrays["camera_rot"] = np.asarray(camera.transform.rot, np.float32)
        arrays["camera_fov"] = np.float32(camera.fov)
        arrays["camera_focus"] = np.float32(camera.focus_dist)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path):
    """Returns dict(framebuffer, params, scene_name, camera_pose | None)."""
    with np.load(path) as z:
        fb = z["framebuffer"]
        meta = json.loads(bytes(z["meta"].tobytes()).decode())
        p = meta["params"]
        p["debug_mode"] = DebugMode(p.get("debug_mode", 0))
        params = RenderParams(**p)
        out = dict(framebuffer=fb, params=params,
                   scene_name=meta.get("scene_name"), camera_pose=None)
        if "camera_pos" in z:
            out["camera_pose"] = dict(
                pos=z["camera_pos"], rot=z["camera_rot"],
                fov=float(z["camera_fov"]), focus_dist=float(z["camera_focus"]))
    return out


def restore_engine(engine, path) -> None:
    """Resume a progressive render into an Engine: framebuffer + frame
    counter + camera pose."""
    import jax.numpy as jnp

    ckpt = load_checkpoint(path)
    engine.params = ckpt["params"]
    engine.renderer.ensure_framebuffer(ckpt["params"].width,
                                       ckpt["params"].height)
    fb = jnp.asarray(ckpt["framebuffer"])
    if engine.renderer.mesh is not None:
        # keep the restored buffer row-sharded so the donated multi-chip
        # render step resumes without a per-frame resharding transfer
        from ray_tracer_2_tpu.parallel.sharding import shard_framebuffer
        fb = shard_framebuffer(fb, engine.renderer.mesh)
    engine.renderer.framebuffer = fb
    pose = ckpt["camera_pose"]
    scene = engine.scene_manager.scene
    if pose is not None and scene is not None:
        scene.camera.transform.pos = np.asarray(pose["pos"], np.float32)
        scene.camera.transform.rot = np.asarray(pose["rot"], np.float32)
        scene.camera.fov = pose["fov"]
        scene.camera.focus_dist = pose["focus_dist"]
        scene.refresh_camera()
