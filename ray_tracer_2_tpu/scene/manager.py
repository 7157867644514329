"""Background scene loading (ref: SceneManager, scene.rs:109-146).

The reference spawns a loader thread fed by an mpsc request channel; finished
scenes come back over a result channel polled by the render loop
(scene.rs:118-146, app.rs:135-142). Same design here: a daemon thread runs
asset IO + BVH builds off the render thread, and ``poll_loaded`` hands the
finished scene (already staged as device arrays) to the caller.
"""
from __future__ import annotations

import logging
import queue
import threading

from ray_tracer_2_tpu.accel.bvh import BVHQuality
from ray_tracer_2_tpu.scene.render_scene import HostScene, instantiate_scene

log = logging.getLogger(__name__)


class SceneManager:
    def __init__(self, assets=None):
        if assets is None:
            # deferred import: assets.manager itself imports scene schema
            from ray_tracer_2_tpu.assets.manager import AssetManager
            assets = AssetManager()
        self.assets = assets
        self.scene: HostScene | None = None
        self.selected_scene = None
        self.selected_entity: int = -1
        self.bvh_quality = BVHQuality.HIGH
        self._requests: queue.Queue = queue.Queue()
        self._loaded: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loader_loop, daemon=True)
        self._thread.start()

    def _loader_loop(self) -> None:
        from ray_tracer_2_tpu.scene.scenes import build_scene_definition

        while True:
            req = self._requests.get()
            if req is None:
                return
            name, quality = req
            try:
                definition = build_scene_definition(name, self.assets)
                scene = instantiate_scene(definition, self.assets,
                                          quality=quality)
                self._loaded.put((name, scene))
            except Exception:  # surface loader errors instead of dying silently
                log.exception("scene load failed: %s", name)
                self._loaded.put((name, None))

    def request_scene(self, name, quality: BVHQuality = BVHQuality.HIGH) -> None:
        """Queue an async scene load (scene.rs:140-146). ``quality`` supports
        the debug panel's BVH quality selector + rebuild (egui.rs:404-460)."""
        log.info("Loading Scene: %s", name)
        self.selected_scene = name
        self.bvh_quality = quality
        self._requests.put((name, quality))

    def poll_loaded(self) -> HostScene | None:
        """Non-blocking poll (app.rs:135-142 try_recv)."""
        try:
            name, scene = self._loaded.get_nowait()
        except queue.Empty:
            return None
        if scene is not None:
            self.scene = scene
        return scene

    def rebuild_bvh(self, quality: BVHQuality) -> None:
        """Rebuild the current scene's BVHs at a new quality tier
        (egui.rs:404-460 rebuild button)."""
        if self.selected_scene is not None:
            self.request_scene(self.selected_scene, quality)

    def load_blocking(self, name, quality: BVHQuality = BVHQuality.HIGH) -> HostScene:
        self.request_scene(name, quality)
        while True:
            got = self._loaded.get()
            if got[0] == name:
                if got[1] is None:
                    raise RuntimeError(f"scene load failed: {name}")
                self.scene = got[1]
                return got[1]

    def shutdown(self) -> None:
        self._requests.put(None)
