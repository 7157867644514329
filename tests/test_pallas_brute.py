"""Pallas streaming intersector must match the XLA brute-force path
(interpreted on CPU; compiled on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracer_2_tpu.kernels.brute import _brute_pallas, brute_force_intersect
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

from tests.conftest import require_asset


def test_pallas_matches_xla_brute(assets):
    require_asset(assets, "CornellBox-Original.obj")
    rs = instantiate_scene(scenes.cornell_box()).render_scene
    node_off, tri_off, tri_count = rs.inst_spans[0]

    r = np.random.default_rng(3)
    B = 300
    origin = r.uniform(-1, 1, (B, 3)).astype(np.float32)
    direction = r.normal(size=(B, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)

    a = brute_force_intersect(rs, jnp.asarray(origin), jnp.asarray(direction),
                              tri_off, tri_count)
    b = _brute_pallas(rs, jnp.asarray(origin), jnp.asarray(direction),
                      tri_off, tri_count)
    hit = np.asarray(a["tri"]) >= 0
    np.testing.assert_allclose(np.asarray(a["dst"])[hit],
                               np.asarray(b["dst"])[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    np.testing.assert_array_equal(np.asarray(a["mat"]), np.asarray(b["mat"]))
