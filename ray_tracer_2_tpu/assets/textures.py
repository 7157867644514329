"""Texture loading + device atlas.

The reference binds a dense 64-slot ``binding_array`` of textures with a
repeat/linear sampler (ray_tracer.rs:139-205). TPUs have no texture units, so
textures live in one flat texel buffer with per-slot (offset, height, width)
tables, and the kernel does its own wrap addressing + bilinear filtering
(kernels/texture.py). Images are flipped horizontally at load — a reference
behavior scenes depend on (asset.rs:77).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ray_tracer_2_tpu.config import MAX_TEXTURES


def load_image_rgba(path) -> np.ndarray:
    """Decode to (H, W, 4) float32 in [0,1], flipped horizontally
    (asset.rs:77)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGBA")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr[:, ::-1, :].copy()  # horizontal flip


@dataclasses.dataclass
class TextureAtlas:
    """Host-side staging for the flat texel buffer; ``as_arrays`` yields the
    device tables."""

    texels: np.ndarray    # (N_texels, 4) float32
    offsets: np.ndarray   # (MAX_TEXTURES,) int32 — start texel per slot
    heights: np.ndarray   # (MAX_TEXTURES,) int32
    widths: np.ndarray    # (MAX_TEXTURES,) int32

    @staticmethod
    def from_images(images: list[np.ndarray | None]) -> "TextureAtlas":
        """Build from per-slot images (None ⇒ 1x1 black, matching the dummy
        fill of ray_tracer.rs:276-296)."""
        assert len(images) <= MAX_TEXTURES
        offsets = np.zeros(MAX_TEXTURES, np.int32)
        heights = np.ones(MAX_TEXTURES, np.int32)
        widths = np.ones(MAX_TEXTURES, np.int32)
        chunks = []
        cursor = 0
        for slot in range(MAX_TEXTURES):
            img = images[slot] if slot < len(images) else None
            if img is None:
                img = np.zeros((1, 1, 4), np.float32)
            h, w = img.shape[:2]
            offsets[slot] = cursor
            heights[slot] = h
            widths[slot] = w
            chunks.append(img.reshape(-1, 4).astype(np.float32))
            cursor += h * w
        return TextureAtlas(np.concatenate(chunks, axis=0), offsets, heights, widths)

    @staticmethod
    def empty() -> "TextureAtlas":
        return TextureAtlas.from_images([])
