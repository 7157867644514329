"""Next-event estimation (RenderParams.nee): explicit light sampling at
diffuse bounces on no-traversal scenes.

The estimator matches the reference's actual physics — UNIFORM-hemisphere
diffuse bounces (pdf 1/2pi, no cosine folding; rand_hemisphere is a
sign-flipped uniform sphere, ray_tracer.wgsl:176-179) and SINGLE-SIDED
lights (non-glass backface cull, ray_tracer.wgsl:268,358) — so converged
NEE images agree with converged plain path tracing, at an order of
magnitude less variance per sample. Reference-divergent sampling, off by
default."""
import dataclasses

import numpy as np
import pytest

from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene


def _acc(rs, nee, frames, rpp, bounces=2, W=32, H=24, collect=False):
    r = Renderer()
    p = RenderParams(width=W, height=H, bounces=bounces, rays_per_pixel=rpp,
                     skybox=False, nee=nee)
    per = []
    fb = None
    for f in range(frames):
        fb = r.render(rs, dataclasses.replace(p, frames=f))
        if collect:
            per.append(np.asarray(fb).copy())
    return np.asarray(fb), per


@pytest.fixture(scope="module")
def cornell_rs(assets):
    from tests.conftest import require_asset
    require_asset(assets, "CornellBox-Original.obj")
    return instantiate_scene(scenes.cornell_box()).render_scene


def test_light_extraction():
    assert len(instantiate_scene(scenes.metal()).render_scene.lights) == 0
    room = instantiate_scene(scenes.room()).render_scene.lights
    assert len(room) == 2 and all(L[0] == 0 for L in room)   # ceiling quad
    balls = instantiate_scene(scenes.balls()).render_scene.lights
    assert len(balls) == 1 and balls[0][0] == 1               # sun sphere
    assert balls[0][4] == pytest.approx(15.0)                 # radius slot


def test_nee_unbiased_and_lower_variance(cornell_rs):
    """Converged NEE must agree with converged plain path tracing (same
    physics, different estimator) while cutting per-sample variance by
    several x (measured ~6-18x on Cornell)."""
    plain, _ = _acc(cornell_rs, False, 160, 8)    # 1280 spp
    nee, per = _acc(cornell_rs, True, 48, 2, collect=True)
    mp, mn = plain[..., :3].mean(), nee[..., :3].mean()
    assert abs(mn - mp) < 0.05 * mp, (mp, mn)
    rmse = np.sqrt(((nee - plain)[..., :3] ** 2).mean())
    assert rmse < 0.08, rmse

    # per-sample variance from the accumulation deltas of the NEE run vs a
    # plain run of the same length
    _, per_p = _acc(cornell_rs, False, 48, 2, collect=True)

    def sample_var(per):
        s = [per[0]] + [per[f] * (f + 1) - per[f - 1] * f
                        for f in range(1, len(per))]
        return np.stack([x[..., :3] for x in s]).var(axis=0).mean()

    vp, vn = sample_var(per_p), sample_var(per)
    assert vp / vn > 3.0, (vp, vn)


def test_nee_noop_without_lights(assets):
    """Scenes with NO emissive primitives ignore the flag entirely (the
    static gate compiles the same program): bit-identical output — on a
    traversal scene (dragon without obj_test's emissive quad) and on a
    sphere scene (metal)."""
    from tests.conftest import require_asset
    require_asset(assets, "dragon.obj")
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (CameraDescriptor,
                                                   MaterialDefinition,
                                                   MeshFromFile,
                                                   SceneDefinition)
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([5.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
        fov=45.0, focus_dist=1.0))
    s.add_mesh(Transform(), MeshFromFile("dragon.obj", use_mtl=False),
               MaterialDefinition.new())
    rs = instantiate_scene(s).render_scene
    assert rs.lights == () and any(c > 1024 for _, _, c in rs.inst_spans)
    a, _ = _acc(rs, False, 2, 1, bounces=2)
    b, _ = _acc(rs, True, 2, 1, bounces=2)
    assert (a == b).all()
    metal = instantiate_scene(scenes.metal()).render_scene
    c, _ = _acc(metal, False, 2, 1, bounces=2)
    d, _ = _acc(metal, True, 2, 1, bounces=2)
    assert (c == d).all()


def test_nee_off_matches_default(cornell_rs):
    """nee=False must be the exact pre-flag program."""
    a, _ = _acc(cornell_rs, False, 3, 1)
    b, _ = _acc(cornell_rs, False, 3, 1)
    assert (a == b).all()


def test_light_table_follows_live_edits():
    """Live edits that move or re-color emissive primitives must refresh
    the static NEE light table (otherwise NEE samples stale radiance);
    unrelated edits must leave the tuple identical (no recompile)."""
    host = instantiate_scene(scenes.balls())
    base = host.render_scene.lights
    assert len(base) == 1 and base[0][0] == 1
    # find the emissive sphere's index
    import numpy as np
    mats = np.asarray(host.render_scene.sphere_mat)
    sun = next(i for i in range(len(mats))
               if host.records[int(mats[i])].emission_strength > 0)
    other = next(i for i in range(len(mats)) if i != sun)

    # move a NON-emissive sphere: table identical (same object semantics)
    host.edit_sphere(other, centre=[9.0, 9.0, 9.0])
    assert host.render_scene.lights == base

    # move the sun: the light row's centre follows
    host.edit_sphere(sun, centre=[1.0, 2.0, 3.0])
    moved = host.render_scene.lights
    assert moved != base and moved[0][1:4] == (1.0, 2.0, 3.0)

    # dim the sun to zero: the table empties (NEE compiles out)
    host.edit_material(int(mats[sun]), emission_strength=0.0)
    assert host.render_scene.lights == ()


def test_light_table_follows_instance_transform_edits():
    """Moving an instance group that CONTAINS emissive triangles must
    refresh the static light table with the new world-space verts (the
    sphere-edit path is covered above; this pins the inst_m2w path of
    _extract_lights through edit_instance_transform)."""
    host = instantiate_scene(scenes.room())
    base = host.render_scene.lights
    assert len(base) == 2          # ceiling quad = 2 tris
    host.edit_instance_transform(0, pos=[0.0, 1.0, 0.0])
    moved = host.render_scene.lights
    assert moved != base
    for L0, L1 in zip(base, moved):
        np.testing.assert_allclose(
            np.asarray(L1[1:10]).reshape(3, 3),
            np.asarray(L0[1:10]).reshape(3, 3) + [0.0, 1.0, 0.0],
            atol=1e-5)


# ---------------------------------------------------------------- mode 2

def _mini_traversal_light_scene():
    """>1024-tri UV-sphere instance (engages BVH traversal) + floor + a
    single-sided emissive ceiling quad — the smallest scene that exercises
    shadow-SEGMENT NEE (nee_mode 2)."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (
        CameraDescriptor, MaterialDefinition, MeshData, MeshFromData,
        SceneDefinition)

    lat, lon = 18, 30
    th = np.linspace(0.0, np.pi, lat + 1)
    ph = np.linspace(0.0, 2 * np.pi, lon + 1)
    P = np.stack(np.meshgrid(th, ph, indexing="ij"), axis=-1)
    xyz = np.stack([np.sin(P[..., 0]) * np.cos(P[..., 1]),
                    np.cos(P[..., 0]),
                    np.sin(P[..., 0]) * np.sin(P[..., 1])], axis=-1)
    quads = []
    for i in range(lat):
        for j in range(lon):
            a, b, c, d = (xyz[i, j], xyz[i + 1, j], xyz[i + 1, j + 1],
                          xyz[i, j + 1])
            quads += [[a, b, c], [a, c, d]]
    soup = np.asarray(quads, np.float32)
    assert len(soup) > 1024

    def quad(y, s, down):
        a, b, c, d = ([-s, y, -s], [s, y, -s], [s, y, s], [-s, y, s])
        tris = [[a, b, c], [a, c, d]] if down else [[a, c, b], [a, d, c]]
        return np.asarray(tris, np.float32)

    def add_quad(s_def, tris, normal, mat):
        s_def.add_mesh(Transform(), MeshFromData(MeshData.from_vertices(
            tris.reshape(-1, 3),
            np.tile(normal, (len(tris) * 3, 1)).astype(np.float32))), mat)

    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.2, 4.0], [0.0, 0.8, 0.0]),
        fov=45.0, focus_dist=4.0))
    s.add_mesh(Transform(pos=[0.0, 0.8, 0.0], scale=[0.8] * 3),
               MeshFromData(MeshData.from_vertices(soup.reshape(-1, 3),
                                                   soup.reshape(-1, 3))),
               MaterialDefinition.new().with_color([0.75, 0.35, 0.25, 1.0]))
    add_quad(s, quad(0.0, 6.0, down=False), [0, 1, 0],
             MaterialDefinition.new().with_color([0.7, 0.7, 0.7, 1.0]))
    add_quad(s, quad(3.0, 0.8, down=True), [0, -1, 0],
             MaterialDefinition.new().emissive([1.0, 0.9, 0.7, 1.0], 14.0))
    host = instantiate_scene(s)
    assert any(c > 1024 for _, _, c in host.render_scene.inst_spans)
    assert len(host.render_scene.lights) == 2
    return host.render_scene


def test_segment_nee_bitequal_to_inline(cornell_rs):
    """RT2_NEE_SEGMENTS=1 forces the shadow-SEGMENT variant on a
    no-traversal scene, where it must reproduce the validated inline
    variant BIT-FOR-BIT (same light draws at the same seed-chain position,
    same prepass arithmetic for the occlusion answer, bounce pinned across
    the shadow leg). This is the correctness gate for the whole stash/bit
    plumbing of nee_mode 2."""
    import os

    import jax

    inline, _ = _acc(cornell_rs, True, 4, 2, bounces=4)
    os.environ["RT2_NEE_SEGMENTS"] = "1"
    try:
        jax.clear_caches()   # the knob is read at trace time
        seg, _ = _acc(cornell_rs, True, 4, 2, bounces=4)
    finally:
        del os.environ["RT2_NEE_SEGMENTS"]
        jax.clear_caches()
    assert (inline == seg).all()


def test_segment_nee_on_traversal_scene():
    """Shadow-segment NEE on a real BVH-traversal scene: the image is
    finite and lit in the same ballpark as plain path tracing at equal
    spp (converged agreement is checked offline — scripts-level, CPU
    traversal renders are too slow for a converged CI gate)."""
    rs = _mini_traversal_light_scene()
    W, H = 32, 20
    plain, _ = _acc(rs, False, 16, 1, bounces=3, W=W, H=H)
    nee, _ = _acc(rs, True, 16, 1, bounces=3, W=W, H=H)
    assert np.isfinite(nee).all()
    mp, mn = plain[..., :3].mean(), nee[..., :3].mean()
    assert mn > 0.25 * mp and mn < 2.0 * mp, (mp, mn)


def test_segment_nee_identical_view_matches_inline():
    """The far-sphere trick: the same floor+light view rendered once as a
    no-traversal scene (nee_mode 1, inline occlusion) and once with an
    off-screen >1024-tri instance added (forces nee_mode 2, shadow
    segments) must be PIXEL-IDENTICAL — the strongest cross-machinery
    gate available (seeds derive from pixels; the far instance is outside
    every ray's reach)."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (
        CameraDescriptor, MaterialDefinition, MeshData, MeshFromData,
        SceneDefinition)

    def quad(y, s, down):
        a, b, c, d = ([-s, y, -s], [s, y, -s], [s, y, s], [-s, y, s])
        tris = [[a, b, c], [a, c, d]] if down else [[a, c, b], [a, d, c]]
        return np.asarray(tris, np.float32)

    def build(with_far_instance):
        s = SceneDefinition()
        s.set_camera(CameraDescriptor(
            transform=Transform.cam([0.0, 1.2, 4.0], [0.0, 0.8, 0.0]),
            fov=45.0, focus_dist=4.0))
        if with_far_instance:
            lat, lon = 18, 30
            th = np.linspace(0.0, np.pi, lat + 1)
            ph = np.linspace(0.0, 2 * np.pi, lon + 1)
            P = np.stack(np.meshgrid(th, ph, indexing="ij"), axis=-1)
            xyz = np.stack([np.sin(P[..., 0]) * np.cos(P[..., 1]),
                            np.cos(P[..., 0]),
                            np.sin(P[..., 0]) * np.sin(P[..., 1])], axis=-1)
            quads = []
            for i in range(lat):
                for j in range(lon):
                    a, b, c, d = (xyz[i, j], xyz[i + 1, j], xyz[i + 1, j + 1],
                                  xyz[i, j + 1])
                    quads += [[a, b, c], [a, c, d]]
            soup = np.asarray(quads, np.float32)
            s.add_mesh(Transform(pos=[500.0, 0.0, 0.0]),
                       MeshFromData(MeshData.from_vertices(
                           soup.reshape(-1, 3), soup.reshape(-1, 3))),
                       MaterialDefinition.new().with_color([0.5] * 4))
        for tris, n, mat in (
                (quad(0.0, 6.0, down=False), [0, 1, 0],
                 MaterialDefinition.new().with_color([0.7, 0.7, 0.7, 1.0])),
                (quad(3.0, 0.8, down=True), [0, -1, 0],
                 MaterialDefinition.new().emissive([1.0, 0.9, 0.7, 1.0],
                                                   14.0))):
            s.add_mesh(Transform(), MeshFromData(MeshData.from_vertices(
                tris.reshape(-1, 3),
                np.tile(n, (len(tris) * 3, 1)).astype(np.float32))), mat)
        return instantiate_scene(s).render_scene

    a, _ = _acc(build(False), True, 6, 2, bounces=3, W=40, H=24)
    b, _ = _acc(build(True), True, 6, 2, bounces=3, W=40, H=24)
    assert (a == b).all()


def test_sphere_light_cone_nee_deterministic_and_analytic():
    """Cone sampling toward a sphere light's subtended solid angle makes
    the unoccluded NEE estimator's MAGNITUDE exact: with a single sphere
    light, no skybox and bounces=1 every path's contribution magnitude is
    deterministic (the random bounce leg only reaches suppressed emission
    or black), so each pixel's raw per-frame value must sit exactly ON
    the closed form — Le on the light's silhouette, albedo * Le *
    (1 - cos_max) on the floor (area-pick compensation is 1 for a single
    light) — or, rarely, on 0 when a tangent-grazing shadow sample flips
    the f32 occlusion test."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (CameraDescriptor,
                                                   MaterialDefinition,
                                                   SceneDefinition)
    from tests import oracle

    albedo = np.array([0.6, 0.55, 0.5])
    Le = np.array([1.0, 0.9, 0.7]) * 10.0
    LC, LR = np.array([0.0, 2.0, 0.0]), 0.5
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 6.0, 1.5], [0.0, 0.0, 0.0]),
        fov=25.0, focus_dist=5.0))
    # camera steep enough that every ray hits the floor within ~5 units of
    # the origin — there the WHOLE sampling cone sits far above the local
    # horizon (cos_s > 0 for every draw), which is what makes the
    # estimator per-pixel deterministic; grazing floor hits would flip
    # cos_s sample-to-sample and re-randomize the magnitude
    # specular MUST be 0: MaterialDefinition.new()'s default 0.1 makes a
    # random 10% of bounces specular — those lanes skip NEE (and keep
    # their emission unsuppressed), re-randomizing the pixel
    s.add_sphere([0.0, -100.0, 0.0], 100.0,
                 MaterialDefinition(color=(*albedo, 1.0)))
    s.add_sphere(LC.tolist(), float(LR),
                 MaterialDefinition(emission_color=(1.0, 0.9, 0.7, 1.0),
                                    emission_strength=10.0))
    rs = instantiate_scene(s).render_scene
    assert len(rs.lights) == 1 and rs.lights[0][0] == 1

    W, H = 40, 24
    f0, per = _acc(rs, True, 4, 1, bounces=1, W=W, H=H, collect=True)
    # reconstruct the RAW per-frame renders from the accumulation chain
    raws = [per[0]] + [per[f] * (f + 1) - per[f - 1] * f
                       for f in range(1, len(per))]

    # (b) closed form per pixel, camera rays via the oracle's exact math
    spheres = oracle.spheres_from_scene(rs)
    cam = oracle.camera_from_scene(rs)
    m = np.asarray(cam["cam_to_world"], np.float64)
    vp = np.asarray(cam["view_params"], np.float64)
    exp = np.zeros((H, W, 3))
    for y in range(H):
        for x in range(W):
            lf = np.array([(x / (W - 1) - 0.5) * vp[0],
                           (y / (H - 1) - 0.5) * vp[1], vp[2]])
            o = m[:3, 3]
            d = m[:3, :3] @ lf
            d = d / np.linalg.norm(d)
            h = oracle.closest_hit(spheres, o.astype(np.float32),
                                   d.astype(np.float32))
            if h is None:
                continue
            if h["mat"]["emission_strength"] > 0:
                exp[y, x] = Le
                continue
            cvec = LC - np.asarray(h["point"], np.float64)
            dl = np.linalg.norm(cvec)
            if np.dot(np.asarray(h["normal"], np.float64), cvec / dl) <= 0:
                continue
            cos_max = np.sqrt(max(1.0 - (LR / dl) ** 2, 0.0))
            exp[y, x] = albedo * Le * (1.0 - cos_max)
    # Every RAW frame value sits on the TWO-POINT support {expected, 0}:
    # the cone sampler's magnitude is exact (any estimator bias would miss
    # the expected point on every sample), and the only randomness left is
    # a rare occlusion flip when a cone-edge shadow sample grazes the
    # sphere tangentially (sqrt amplifies f32 noise in the discriminant,
    # flipping unocc) — which zeroes the pixel for that frame, never
    # shifts it. >= 97% of samples must land ON the expected point.
    tol = 1e-3 + 2e-3 * np.abs(exp).max(axis=-1)   # (H, W)
    on_exp = np.zeros((len(raws), H, W), bool)
    on_zero = np.zeros_like(on_exp)
    for f, raw in enumerate(raws):
        err = np.abs(raw[..., :3].astype(np.float64) - exp).max(axis=-1)
        # accumulation-chain reconstruction adds ~(f+1) ulps of slack
        on_exp[f] = err <= tol * (f + 2)
        on_zero[f] = np.abs(raw[..., :3]).max(axis=-1) <= 1e-3 * (f + 2)
    # f32-vs-f64 hit decisions differ on the light's silhouette pixels
    assert (on_exp | on_zero).mean() >= 0.98, (on_exp | on_zero).mean()
    assert on_exp.mean() >= 0.97, on_exp.mean()


def test_nee_composes_with_antialias(cornell_rs):
    """Quality flags must compose: nee + antialias + rpp>1 renders a
    finite image in the same energy ballpark as plain path tracing at
    equal spp (each flag's own unbiasedness is gated elsewhere)."""
    import dataclasses as dc
    r = Renderer()
    p = RenderParams(width=32, height=24, bounces=3, rays_per_pixel=2,
                     skybox=False, nee=True, antialias=True)
    fb = None
    for f in range(12):
        fb = r.render(cornell_rs, dc.replace(p, frames=f))
    both = np.asarray(fb)
    plain, _ = _acc(cornell_rs, False, 12, 2, bounces=3)
    assert np.isfinite(both).all()
    mp, mb = plain[..., :3].mean(), both[..., :3].mean()
    assert mb > 0.5 * mp and mb < 1.6 * mp, (mp, mb)


def test_emissive_glass_is_not_a_light():
    """An emissive GLASS material never contributes its emission in the
    BSDF path (the glass branch bypasses the emission term entirely,
    matching the reference's shader structure, ray_tracer.wgsl:407-436) —
    so it must not enter the NEE light table either, where it would ADD
    energy plain path tracing never sees."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (CameraDescriptor,
                                                   MaterialDefinition,
                                                   SceneDefinition)
    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.0, 4.0], [0.0, 1.0, 0.0]),
        fov=45.0, focus_dist=4.0))
    glass_sun = MaterialDefinition.new().emissive(
        [1.0, 0.9, 0.7, 1.0], 10.0).glass(1.5)
    s.add_sphere([0.0, 3.0, 0.0], 0.5, glass_sun)

    def quad(y, sz, down):
        a, b, c, d = ([-sz, y, -sz], [sz, y, -sz], [sz, y, sz], [-sz, y, sz])
        tris = [[a, b, c], [a, c, d]] if down else [[a, c, b], [a, d, c]]
        return np.asarray(tris, np.float32)

    from ray_tracer_2_tpu.scene.definition import MeshData, MeshFromData
    tris = quad(2.0, 0.5, down=True)
    s.add_mesh(Transform(), MeshFromData(MeshData.from_vertices(
        tris.reshape(-1, 3),
        np.tile([0, -1, 0], (6, 1)).astype(np.float32))), glass_sun)
    rs = instantiate_scene(s).render_scene
    assert rs.lights == ()   # neither the sphere nor the quad qualifies


def test_mirrored_instance_light_winding():
    """A mirrored instance transform (negative determinant) flips the
    world-space winding relative to the model-space backface cull. The
    light row must carry the verts SWAPPED so its front side — the
    kernel's -dot(cross(v1-v0, v2-v0), d) > 0 test — still faces where
    BSDF rays can actually hit; otherwise NEE samples the dark side and
    silently loses the light's energy."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (
        CameraDescriptor, MaterialDefinition, MeshData, MeshFromData,
        SceneDefinition)

    def quad(y, sz, down):
        a, b, c, d = ([-sz, y, -sz], [sz, y, -sz], [sz, y, sz], [-sz, y, sz])
        tris = [[a, b, c], [a, c, d]] if down else [[a, c, b], [a, d, c]]
        return np.asarray(tris, np.float32)

    def build(mirror):
        s = SceneDefinition()
        s.set_camera(CameraDescriptor(
            transform=Transform.cam([0.0, 1.2, 4.0], [0.0, 0.8, 0.0]),
            fov=45.0, focus_dist=4.0))
        floor = quad(0.0, 6.0, down=False)
        s.add_mesh(Transform(), MeshFromData(MeshData.from_vertices(
            floor.reshape(-1, 3),
            np.tile([0, 1, 0], (6, 1)).astype(np.float32))),
            MaterialDefinition.new().with_color([0.7, 0.7, 0.7, 1.0]))
        lt = quad(3.0, 0.8, down=True)   # model-space front faces DOWN
        T = Transform(scale=[-1.0, 1.0, 1.0]) if mirror else Transform()
        s.add_mesh(T, MeshFromData(MeshData.from_vertices(
            lt.reshape(-1, 3),
            np.tile([0, -1, 0], (6, 1)).astype(np.float32))),
            MaterialDefinition.new().emissive([1.0, 0.9, 0.7, 1.0], 14.0))
        return instantiate_scene(s).render_scene

    for mirror in (False, True):
        rs = build(mirror)
        assert len(rs.lights) == 2
        for L in rs.lights:
            v0, v1, v2 = (np.asarray(L[1:4]), np.asarray(L[4:7]),
                          np.asarray(L[7:10]))
            n = np.cross(v1 - v0, v2 - v0)
            # front side must face DOWN (toward the floor) either way
            assert n[1] < 0.0, (mirror, n)
        # and the energy actually arrives: NEE ballparks plain at equal
        # spp (with the un-swapped winding the light samples all fail the
        # front test and the NEE image goes dark)
        plain, _ = _acc(rs, False, 12, 1, bounces=3, W=32, H=20)
        nee, _ = _acc(rs, True, 12, 1, bounces=3, W=32, H=20)
        mp, mn = plain[..., :3].mean(), nee[..., :3].mean()
        assert mn > 0.4 * mp and mn < 2.0 * mp, (mirror, mp, mn)


def test_lights_inside_traversal_instances_are_sampled():
    """Emissive triangles inside a BVH-traversal instance must appear in
    the light table: shadow-segment NEE suppresses surface emission after
    every diffuse bounce, so an emitter missing from the table would
    silently lose its energy (review finding, fixed by extracting lights
    from every instance)."""
    from ray_tracer_2_tpu.math.transform import Transform
    from ray_tracer_2_tpu.scene.definition import (
        CameraDescriptor, MaterialDefinition, MeshData, MeshFromData,
        SceneDefinition)

    lat, lon = 18, 30
    th = np.linspace(0.0, np.pi, lat + 1)
    ph = np.linspace(0.0, 2 * np.pi, lon + 1)
    P = np.stack(np.meshgrid(th, ph, indexing="ij"), axis=-1)
    xyz = np.stack([np.sin(P[..., 0]) * np.cos(P[..., 1]),
                    np.cos(P[..., 0]),
                    np.sin(P[..., 0]) * np.sin(P[..., 1])], axis=-1)
    quads = []
    for i in range(lat):
        for j in range(lon):
            a, b, c, d = (xyz[i, j], xyz[i + 1, j], xyz[i + 1, j + 1],
                          xyz[i, j + 1])
            quads += [[a, b, c], [a, c, d]]
    soup = (np.asarray(quads, np.float32) * 0.8
            + np.array([0, 0.8, 0], np.float32))

    s = SceneDefinition()
    s.set_camera(CameraDescriptor(
        transform=Transform.cam([0.0, 1.2, 4.0], [0.0, 0.8, 0.0]),
        fov=45.0, focus_dist=4.0))
    T = Transform()   # same transform ⇒ both meshes merge into ONE
    s.add_mesh(T, MeshFromData(MeshData.from_vertices(
        soup.reshape(-1, 3), soup.reshape(-1, 3))),
        MaterialDefinition.new().with_color([0.75, 0.35, 0.25, 1.0]))
    lt = np.asarray([[[-0.8, 3, -0.8], [0.8, 3, -0.8], [0.8, 3, 0.8]],
                     [[-0.8, 3, -0.8], [0.8, 3, 0.8], [-0.8, 3, 0.8]]],
                    np.float32)
    s.add_mesh(T, MeshFromData(MeshData.from_vertices(
        lt.reshape(-1, 3), np.tile([0, -1, 0], (6, 1)).astype(np.float32))),
        MaterialDefinition.new().emissive([1.0, 0.9, 0.7, 1.0], 14.0))
    rs = instantiate_scene(s).render_scene
    # one merged >1024-tri instance (BVH traversal) holding the 2 light tris
    assert len(rs.inst_spans) == 1 and rs.inst_spans[0][2] > 1024
    assert len(rs.lights) == 2
    # and the energy is actually collected: NEE ballparks plain at equal spp
    plain, _ = _acc(rs, False, 12, 1, bounces=3, W=32, H=20)
    nee, _ = _acc(rs, True, 12, 1, bounces=3, W=32, H=20)
    mp, mn = plain[..., :3].mean(), nee[..., :3].mean()
    assert mn > 0.4 * mp and mn < 2.0 * mp, (mp, mn)
