"""Reduction-free pairwise tournaments (the RT2_NOREDUCE winner kernels).

Every per-traversal-step argmin/min/masked-sum winner extraction in the
megakernel is a reduce, and each reduce is a fusion break on TPU — its
(B, 32)/(B, 8) input materializes between fusions (docs/PERF_NOTES.md
"Round-3 op-level profile": ~160 us/iter VPU tail of ~100 small fusions;
scripts/op_census.py reproduces the per-step reduce count). These helpers
replace them with pairwise-halving tournaments: pure elementwise selects
that fuse with the producer arithmetic.

BIT-EXACTNESS CONTRACT (tests/test_tourney.py fuzzes it with forced ties):

- The halving pairs position j with j+h, so surviving candidates arrive at
  later levels OUT of index order — a plain "left wins ties" walk does NOT
  reproduce ``jnp.argmin``'s first-index pick (counterexample [5,3,3,7]:
  the final merge holds idx 2 on the left and idx 1 on the right). Every
  tournament here therefore carries the candidate's original index and
  breaks key ties lexicographically on it, which equals argmin exactly.
- Winner payloads are propagated through the same selects, so they carry
  the winner's original bits — identical to the masked-sum extraction
  (sum of one-hot-masked values) they replace.
- Widths must be powers of two; pad keys with +INF (and ids with a
  sentinel larger than any real id) to reach one.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_pow2(key, payloads=(), fill=float("inf")):
    """Pad ``key``/``payloads`` (B, W) on axis 1 to the next power of two.

    ``key`` gets ``fill`` (+INF by default — padded candidates lose every
    tournament unless ALL real candidates are +INF too, in which case the
    lexicographic index carry still picks index 0, matching ``jnp.argmin``);
    payloads get zeros of their own dtype. Returns ``(key, payloads)``.
    """
    w = key.shape[1]
    wp = 1 << max(w - 1, 0).bit_length()
    if wp == w:
        return key, tuple(payloads)
    pad = ((0, 0), (0, wp - w))
    return (jnp.pad(key, pad, constant_values=fill),
            tuple(jnp.pad(p, pad) for p in payloads))


def lex_min(key, idkey):
    """Per-lane lexicographic minimum of ``(key, idkey)`` over axis 1.

    Equals ``(jnp.min(key), min of idkey over positions achieving it)`` —
    the sphere-phase winner rule (lowest id among equal distances) —
    without the two min reduces. ``idkey`` may be any comparable dtype.
    """
    w = key.shape[1]
    while w > 1:
        h = w // 2
        kL, kR = key[:, :h], key[:, h:w]
        iL, iR = idkey[:, :h], idkey[:, h:w]
        take_l = (kL < kR) | ((kL == kR) & (iL <= iR))
        key = jnp.where(take_l, kL, kR)
        idkey = jnp.where(take_l, iL, iR)
        w = h
    return key[:, 0], idkey[:, 0]


def first_min(key, payloads=()):
    """Per-lane first-index minimum of ``key`` (B, W) over axis 1.

    Returns ``[min_key, argmin_idx, *winner_payloads]`` where
    ``argmin_idx`` is ``jnp.argmin(key, axis=1)`` bit-for-bit (ties break
    to the LOWEST index via the lexicographic carry) and each payload is
    the winner position's original value.
    """
    w = key.shape[1]
    idx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                           key.shape)
    vals = [key, idx] + list(payloads)
    while w > 1:
        h = w // 2
        kL, kR = vals[0][:, :h], vals[0][:, h:w]
        iL, iR = vals[1][:, :h], vals[1][:, h:w]
        take_l = (kL < kR) | ((kL == kR) & (iL <= iR))
        vals = [jnp.where(take_l, v[:, :h], v[:, h:w]) for v in vals]
        w = h
    return [v[:, 0] for v in vals]


def two_smallest(key, or_payloads=()):
    """Per-lane (min, argmin, second-min) of ``key`` (B, W) over axis 1.

    ``argmin`` matches ``jnp.argmin`` (first index on ties); ``second``
    is the minimum over all positions EXCLUDING the argmin position —
    i.e. ``jnp.min(where(col == argmin, INF, key))`` bit-for-bit (for
    W >= 2 the result never touches the init sentinel, so it equals the
    caller's fill regardless of its value). Per merge the second-min is
    min(loser of the min merge, both halves' second-mins); on key ties
    the loser has the same value as the winner, so the
    exclusion-by-position semantics is preserved.

    ``or_payloads`` are integer (B, W) arrays folded with bitwise OR over
    the full width (== ``jnp.sum`` of disjoint power-of-two bits) in the
    same fused pass; their results append to the return tuple.
    """
    w = key.shape[1]
    idx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                           key.shape)
    inf = jnp.asarray(jnp.inf, key.dtype)
    sec = jnp.full_like(key, inf)
    ors = list(or_payloads)
    while w > 1:
        h = w // 2
        kL, kR = key[:, :h], key[:, h:w]
        iL, iR = idx[:, :h], idx[:, h:w]
        take_l = (kL < kR) | ((kL == kR) & (iL <= iR))
        loser = jnp.where(take_l, kR, kL)
        sec = jnp.minimum(loser, jnp.minimum(sec[:, :h], sec[:, h:w]))
        key = jnp.where(take_l, kL, kR)
        idx = jnp.where(take_l, iL, iR)
        ors = [o[:, :h] | o[:, h:w] for o in ors]
        w = h
    return (key[:, 0], idx[:, 0], sec[:, 0], *[o[:, 0] for o in ors])
