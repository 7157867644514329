"""Tiled progressive renderer.

One ``jit``-compiled program renders a whole frame: the framebuffer is split
into row tiles (each a flat ray batch sized for good VPU occupancy and a tight
per-tile bounce/traversal loop), ``lax.map`` walks the tiles, and the result
is blended into the accumulation buffer with the reference's progressive
weight ``1/(frames+1)`` (ray_tracer.wgsl:154-161). The framebuffer is donated,
so accumulation is in-place in HBM.

The reference re-uploads the whole scene every frame (ray_tracer.rs:397-419);
here the scene pytree is device-resident and only replaced when it actually
changes (scene switch / UI edit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_2_tpu.config import DebugMode, RenderParams
from ray_tracer_2_tpu.kernels.trace import debug_trace_pixels, trace_pixels
from ray_tracer_2_tpu.scene.render_scene import RenderScene

DEFAULT_TILE_ROWS = 8


@partial(jax.jit, donate_argnums=(1,),
         static_argnames=("width", "height", "bounces", "rays_per_pixel",
                          "skybox", "debug_mode", "tile_rows"))
def render_frame(scene: RenderScene, framebuffer: jax.Array, frames: jax.Array,
                 debug_scale: jax.Array, *, width: int, height: int,
                 bounces: int, rays_per_pixel: int, skybox: bool,
                 debug_mode: int, tile_rows: int):
    """Render + accumulate one frame. framebuffer: (height, width, 4) f32.
    Returns (new framebuffer, traced-segment count scalar)."""
    sample, segments = render_sample(
        scene, frames, debug_scale, width=width, height=height,
        bounces=bounces, rays_per_pixel=rays_per_pixel, skybox=skybox,
        debug_mode=debug_mode, tile_rows=tile_rows)
    # Progressive average (ray_tracer.wgsl:154-161): frames <= 0 ⇒ overwrite.
    weight = jnp.where(frames >= 1, 1.0 / (frames.astype(jnp.float32) + 1.0), 1.0)
    return framebuffer * (1.0 - weight) + sample * weight, segments


def render_sample(scene: RenderScene, frames, debug_scale, *, width: int,
                  height: int, bounces: int, rays_per_pixel: int,
                  skybox: bool, debug_mode: int, tile_rows: int,
                  row_start=0, rows: int | None = None) -> jax.Array:
    """Radiance for ``rows`` rows starting at ``row_start`` (no accumulation),
    (rows, width, 4). ``row_start`` may be traced (multi-chip row blocks);
    ``width``/``height`` always describe the FULL image (camera uv space)."""
    rows = height if rows is None else rows
    n_tiles = -(-rows // tile_rows)
    pad_h = n_tiles * tile_rows
    xs = jnp.arange(width, dtype=jnp.int32)
    tile_starts = row_start + jnp.arange(n_tiles, dtype=jnp.int32) * tile_rows

    def tile_fn(y0):
        y = (y0 + jnp.arange(tile_rows, dtype=jnp.int32))[:, None]
        yy = jnp.broadcast_to(y, (tile_rows, width)).reshape(-1)
        xx = jnp.broadcast_to(xs[None, :], (tile_rows, width)).reshape(-1)
        if debug_mode != int(DebugMode.OFF):
            color = debug_trace_pixels(scene, xx, yy, width=width, height=height,
                                       debug_mode=debug_mode,
                                       debug_scale=debug_scale)
            segs = jnp.zeros((), jnp.float32)
        else:
            color, seg = trace_pixels(scene, xx, yy, frames, width=width,
                                      height=height, bounces=bounces,
                                      rays_per_pixel=rays_per_pixel,
                                      skybox=skybox)
            segs = jnp.sum(seg.astype(jnp.float32))
        return color.reshape(tile_rows, width, 4), segs

    tiles, segs = jax.lax.map(tile_fn, tile_starts)
    img = tiles.reshape(pad_h, width, 4)
    return img[:rows], jnp.sum(segs)


class Renderer:
    """Host-facing wrapper: owns the accumulation buffer and render stats
    (ref RayTracer, ray_tracer.rs:49-236 — minus the per-frame re-upload)."""

    def __init__(self, tile_rows: int = DEFAULT_TILE_ROWS):
        self.tile_rows = tile_rows
        self.framebuffer: jax.Array | None = None
        self.last_segments: jax.Array | None = None  # traced rays last frame
        self._fb_shape: tuple | None = None

    def ensure_framebuffer(self, width: int, height: int) -> None:
        if self._fb_shape != (height, width):
            self.framebuffer = jnp.zeros((height, width, 4), jnp.float32)
            self._fb_shape = (height, width)

    def render(self, scene: RenderScene, params: RenderParams) -> jax.Array:
        """Render one frame into the accumulation buffer; returns it."""
        self.ensure_framebuffer(params.width, params.height)
        self.framebuffer, self.last_segments = render_frame(
            scene, self.framebuffer,
            jnp.int32(params.frames), jnp.float32(max(params.debug_scale, 1)),
            width=params.width, height=params.height,
            bounces=int(params.bounces),
            rays_per_pixel=int(params.rays_per_pixel),
            skybox=bool(params.skybox),
            debug_mode=int(params.debug_mode),
            tile_rows=self.tile_rows,
        )
        return self.framebuffer

    def read_framebuffer(self) -> np.ndarray:
        """Device → host readback (ref: app.rs:365-408 mapped-buffer path)."""
        assert self.framebuffer is not None
        return np.asarray(jax.device_get(self.framebuffer))
