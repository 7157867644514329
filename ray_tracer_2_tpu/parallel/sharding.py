"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is strictly single-GPU (engine.rs:91-114); this module is the
scaling layer it never had, designed the TPU way (SURVEY.md §2.3):

  * **Pixel-tile sharding** (default): the framebuffer is sharded by rows
    across the ``rows`` mesh axis; every chip traces only its own rows.
    Per-pixel counter RNG makes the tiles statistically independent, so the
    hot loop has **zero collectives** — sharded output is bit-identical to
    single-chip output.
  * **Sample (spp) sharding**: every chip renders the full image with a
    different RNG frame offset and partial sums are combined with one
    ``psum`` per frame — the better axis when the image is small but the
    sample budget is large (the analog of sequence-parallel reduction,
    SURVEY.md §5.7).

Both run under ``shard_map`` so XLA lays communication (if any) on ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ray_tracer_2_tpu.engine.renderer import render_sample
from ray_tracer_2_tpu.scene.render_scene import RenderScene


def make_render_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the ``rows`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("rows",))


def render_frame_sharded(scene: RenderScene, framebuffer: jax.Array,
                         frames: jax.Array, debug_scale: jax.Array, *,
                         mesh: Mesh, width: int, height: int, bounces: int,
                         rays_per_pixel: int, skybox: bool,
                         debug_mode: int = 0, tile_rows: int = 8) -> jax.Array:
    """Render + accumulate one frame with the framebuffer row-sharded.

    framebuffer: (height, width, 4), height divisible by the mesh size.
    Returns (updated framebuffer with the same sharding, total traced
    segments across all chips — one psum, outside the pixel hot loop).
    """
    n = mesh.shape["rows"]
    assert height % n == 0, f"height {height} not divisible by mesh size {n}"
    block = height // n

    # check_vma=False: the while_loop carries mix axis-varying values (row
    # offsets / RNG seeds derived from axis_index) with invariant inits, which
    # the VMA checker rejects; the computation itself is purely per-shard.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("rows"), P(), P()),
             out_specs=(P("rows"), P()), check_vma=False)
    def step(scene, fb_block, frames, dscale):
        row0 = jax.lax.axis_index("rows") * block
        sample, segs = render_sample(
            scene, frames, dscale, width=width, height=height,
            bounces=bounces, rays_per_pixel=rays_per_pixel, skybox=skybox,
            debug_mode=debug_mode, tile_rows=tile_rows,
            row_start=row0, rows=block)
        w = jnp.where(frames >= 1, 1.0 / (frames.astype(jnp.float32) + 1.0), 1.0)
        return (fb_block * (1.0 - w) + sample * w,
                jax.lax.psum(segs, "rows"))

    return step(scene, framebuffer, jnp.int32(frames), jnp.float32(debug_scale))


def render_frame_spp_sharded(scene: RenderScene, framebuffer: jax.Array,
                             frames: jax.Array, *, mesh: Mesh, width: int,
                             height: int, bounces: int, rays_per_pixel: int,
                             skybox: bool, tile_rows: int = 8) -> jax.Array:
    """Accumulate one *round* of N samples per pixel (N = mesh size): chip i
    renders RNG frame ``frames*N + i``, partial images are mean-reduced with
    one psum. The accumulation weight treats the round as N frames.
    Returns (framebuffer, total traced segments across the round)."""
    n = mesh.shape["rows"]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def step(scene, fb, frames):
        my_frame = frames * n + jax.lax.axis_index("rows")
        sample, segs = render_sample(
            scene, my_frame, jnp.float32(1.0), width=width, height=height,
            bounces=bounces, rays_per_pixel=rays_per_pixel, skybox=skybox,
            debug_mode=0, tile_rows=tile_rows)
        mean = jax.lax.pmean(sample, "rows")
        # Blend a whole round: frames counts rounds of n samples.
        w = jnp.where(frames >= 1,
                      n / (frames.astype(jnp.float32) * n + n), 1.0)
        return fb * (1.0 - w) + mean * w, jax.lax.psum(segs, "rows")

    return step(scene, framebuffer, jnp.int32(frames))


def replicate_scene(scene: RenderScene, mesh: Mesh) -> RenderScene:
    """Place the scene pytree replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), scene)


def shard_framebuffer(fb: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(fb, NamedSharding(mesh, P("rows", None, None)))
