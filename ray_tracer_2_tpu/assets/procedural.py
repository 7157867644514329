"""Procedural substitutes for assets missing from the reference mount.

The read-only reference omits several large blobs (.MISSING_LARGE_BLOBS):
``Dragon_80K.obj``, ``sponza.obj``, ``f1/f1.obj`` among others. Benchmarks and
scenes that need them get engineered substitutes:

  * ``Dragon_80K.obj`` — built from the present ``dragon.obj`` (8,712 faces)
    by flat midpoint subdivision to exactly ~80k triangles. Midpoint
    subdivision leaves the *surface geometry identical* — only the triangle
    count (and hence BVH size/traversal load) changes, which is precisely
    what the Dragon_80K benchmark stresses.
"""
from __future__ import annotations

import numpy as np

DRAGON_TARGET_TRIS = 80_000


def subdivide_soup(v: np.ndarray, n: np.ndarray, uv: np.ndarray,
                   mask: np.ndarray):
    """Split masked triangles 1→4 at edge midpoints.

    v/n: (T, 3, 3); uv: (T, 3, 2); mask: (T,) bool. Normals/uvs are averaged
    at midpoints (normals re-normalized).
    """
    keep_v, keep_n, keep_uv = v[~mask], n[~mask], uv[~mask]
    sv, sn, suv = v[mask], n[mask], uv[mask]

    def mid(a, b):
        return 0.5 * (a + b)

    m01v, m12v, m20v = mid(sv[:, 0], sv[:, 1]), mid(sv[:, 1], sv[:, 2]), mid(sv[:, 2], sv[:, 0])
    m01n, m12n, m20n = mid(sn[:, 0], sn[:, 1]), mid(sn[:, 1], sn[:, 2]), mid(sn[:, 2], sn[:, 0])
    m01u, m12u, m20u = mid(suv[:, 0], suv[:, 1]), mid(suv[:, 1], suv[:, 2]), mid(suv[:, 2], suv[:, 0])

    def renorm(x):
        l = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.where(l > 0, l, 1.0)

    m01n, m12n, m20n = renorm(m01n), renorm(m12n), renorm(m20n)

    def tri(a, b, c):
        return np.stack([a, b, c], axis=1)

    new_v = np.concatenate([
        keep_v,
        tri(sv[:, 0], m01v, m20v), tri(m01v, sv[:, 1], m12v),
        tri(m20v, m12v, sv[:, 2]), tri(m01v, m12v, m20v),
    ], axis=0)
    new_n = np.concatenate([
        keep_n,
        tri(sn[:, 0], m01n, m20n), tri(m01n, sn[:, 1], m12n),
        tri(m20n, m12n, sn[:, 2]), tri(m01n, m12n, m20n),
    ], axis=0)
    new_uv = np.concatenate([
        keep_uv,
        tri(suv[:, 0], m01u, m20u), tri(m01u, suv[:, 1], m12u),
        tri(m20u, m12u, suv[:, 2]), tri(m01u, m12u, m20u),
    ], axis=0)
    return new_v, new_n, new_uv


def densify_to(v, n, uv, target_tris: int):
    """Subdivide (largest-area first) until the soup has ~``target_tris``
    triangles (within +2: each split adds exactly 3)."""
    while len(v) < target_tris:
        deficit = target_tris - len(v)
        want_splits = max(deficit // 3, 1)
        area = 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
        if want_splits >= len(v):
            mask = np.ones(len(v), bool)
        else:
            thresh = np.partition(area, len(v) - want_splits)[len(v) - want_splits]
            mask = area >= thresh
            # ties could over-select; trim to the exact count
            extra = int(mask.sum()) - want_splits
            if extra > 0:
                idx = np.flatnonzero(mask & (area == thresh))[:extra]
                mask[idx] = False
        v, n, uv = subdivide_soup(v, n, uv, mask)
    return v, n, uv


def synthesize_dragon_80k(assets) -> list:
    """Load dragon.obj and densify to DRAGON_TARGET_TRIS triangles.
    Returns the (MeshData, MaterialRecord, label) list shape of
    AssetManager.load_model."""
    from ray_tracer_2_tpu.scene.definition import MeshData
    from ray_tracer_2_tpu.scene.material import MaterialRecord

    parts = assets.load_model("dragon.obj", use_mtl=False)
    mesh, _, label = parts[0]
    t = mesh.triangle_count()
    idx = mesh.indices.reshape(-1, 3)
    v = mesh.positions[idx]
    n = mesh.normals[idx]
    uv = mesh.uvs[idx]
    v, n, uv = densify_to(v, n, uv, DRAGON_TARGET_TRIS)
    data = MeshData.from_vertices(v.reshape(-1, 3), n.reshape(-1, 3),
                                  uv.reshape(-1, 2))
    return [(data, MaterialRecord(), f"{label}_80k")]


def synthesize_sponza(assets) -> list:
    """Procedural colonnaded atrium with the REAL sponza.mtl materials and
    textures (assets/sponza_builder.py) — a ~150k-triangle multi-material
    substitute for the absent sponza.obj."""
    from ray_tracer_2_tpu.assets.manager import material_from_mtl
    from ray_tracer_2_tpu.assets.obj import load_mtl
    from ray_tracer_2_tpu.assets.sponza_builder import build_atrium
    from ray_tracer_2_tpu.scene.definition import MeshData
    from ray_tracer_2_tpu.scene.material import MaterialRecord

    try:
        mtl = load_mtl(assets.resolve("sponza.mtl"))
    except Exception:
        mtl = {}

    parts = []
    for mat_name, pos, nrm, uv in build_atrium():
        m = mtl.get(mat_name)
        if m is not None:
            diffuse_index = -1
            if m.map_kd:
                try:
                    diffuse_index = assets.load_texture(m.map_kd)
                except FileNotFoundError:
                    diffuse_index = -1
            rec = material_from_mtl(m, diffuse_index, -1)
        else:
            rec = MaterialRecord()
        parts.append((MeshData.from_vertices(pos, nrm, uv), rec,
                      f"sponza_{mat_name}"))
    return parts


#: rel_path -> synthesizer(assets) -> list[(MeshData, MaterialRecord, label)]
SYNTHESIZERS = {
    "Dragon_80K.obj": synthesize_dragon_80k,
    "sponza.obj": synthesize_sponza,
}
