"""kernels/tourney.py bit-exactness contract vs the reduces it replaces.

The pairwise halving pairs position j with j+h, so candidates reach later
levels OUT of index order — a plain left-wins-ties tournament does NOT
equal jnp.argmin (counterexample [5, 3, 3, 7]: the final merge holds
idx 2 left, idx 1 right). These tests fuzz keys drawn from tiny value
sets (dense ties) and check every helper against the reduce-based
reference formulas used in kernels/megakernel.py."""
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_2_tpu.kernels import tourney

INF = jnp.float32(3.4e38)


def _tie_keys(rng, b, w, dense_ties):
    if dense_ties:
        vals = rng.integers(0, 4, (b, w)).astype(np.float32)
    else:
        vals = rng.random((b, w)).astype(np.float32)
    # sprinkle INF sentinels like the real masked inputs
    vals[rng.random((b, w)) < 0.3] = np.float32(3.4e38)
    return vals


@pytest.mark.parametrize("w", [2, 4, 8, 32])
@pytest.mark.parametrize("dense_ties", [True, False])
def test_first_min_matches_argmin_and_masked_sums(w, dense_ties):
    rng = np.random.default_rng(hash((w, dense_ties)) % 2**31)
    key = jnp.asarray(_tie_keys(rng, 257, w, dense_ties))
    pay = jnp.asarray(rng.random((257, w)), jnp.float32)
    mn, idx, pay_w = tourney.first_min(key, (pay,))
    ref_idx = jnp.argmin(key, axis=1).astype(jnp.int32)
    onehot = jnp.arange(w)[None, :] == ref_idx[:, None]
    assert (idx == ref_idx).all()
    assert (mn == jnp.sum(jnp.where(onehot, key, 0.0), axis=1)).all()
    assert (pay_w == jnp.sum(jnp.where(onehot, pay, 0.0), axis=1)).all()


def test_first_min_counterexample_5337():
    """The case where left-wins-ties diverges from argmin."""
    key = jnp.asarray([[5.0, 3.0, 3.0, 7.0]])
    _, idx, = tourney.first_min(key)[:2]
    assert int(idx[0]) == 1


@pytest.mark.parametrize("w", [2, 8, 32])
@pytest.mark.parametrize("dense_ties", [True, False])
def test_two_smallest_matches_argmin_exclusion_and_or(w, dense_ties):
    rng = np.random.default_rng(hash((w, dense_ties, 7)) % 2**31)
    key = jnp.asarray(_tie_keys(rng, 257, w, dense_ties))
    bits = jnp.asarray(
        rng.integers(0, 2, (257, w)), jnp.int32) << jnp.arange(w)[None, :]
    mn, idx, sec, orv = tourney.two_smallest(key, (bits,))
    ref_idx = jnp.argmin(key, axis=1).astype(jnp.int32)
    cols = jnp.arange(w)[None, :]
    ref_sec = jnp.min(jnp.where(cols == ref_idx[:, None], INF, key), axis=1)
    assert (idx == ref_idx).all()
    assert (mn == jnp.min(key, axis=1)).all()
    assert (sec == ref_sec).all() or w == 1
    assert (orv == jnp.sum(bits, axis=1)).all()  # disjoint bits: or == sum


@pytest.mark.parametrize("w", [2, 8, 32])
def test_lex_min_matches_sphere_winner_rule(w):
    rng = np.random.default_rng(w * 31 + 5)
    key = jnp.asarray(_tie_keys(rng, 257, w, dense_ties=True))
    ids = jnp.asarray(rng.integers(0, 50, (257, w)), jnp.float32)
    mn, idmn = tourney.lex_min(key, ids)
    ref_mn = jnp.min(key, axis=1)
    ref_id = jnp.min(jnp.where(key == ref_mn[:, None], ids, jnp.float32(1e9)),
                     axis=1)
    assert (mn == ref_mn).all()
    assert (idmn == ref_id).all()
