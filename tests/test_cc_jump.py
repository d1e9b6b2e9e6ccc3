"""connected_components_jump: pointer-jumping label propagation.

The r14 close profile (COVERAGE.md "Round-15 candidates") measured
dd6's CC loop as rounds × ~0.45 s fixed overhead with the round count
tracking corpus diameter (4 at sf0.1, 24 at sf1, 38 at 50×). The jump
variant shortcuts label chains (label ← label-of-label) for O(log d)
rounds; these tests pin exact equivalence with the plain loop and the
logarithmic round bound, so the r15 wiring under dd6 is a pure plan
swap with pre-proven semantics.
"""

from __future__ import annotations

import random

import pytest

from trello_github_etl_spark.operators import dedup


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_jump_matches_propagation_on_skewed_mix(spark):
    """Path (diameter), hub star (degree skew), triangle (cycle),
    isolated pairs — scrambled edge directions; labelings must be
    identical node-for-node."""
    edges = [(i + 1, i) for i in range(100, 115)]
    edges += [(200, 200 + j) for j in range(1, 30)]
    edges += [(300, 301), (301, 302), (302, 300)]
    edges += [(501, 500), (600, 601)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    jump = _labels(dedup.connected_components_jump(pairs))
    prop = _labels(dedup.connected_components(pairs))
    assert jump == prop
    assert jump[115] == 100 and jump[229] == 200 and jump[302] == 300


def test_jump_matches_propagation_on_random_graph(spark):
    """Seeded random graph: many components of varied shapes; the
    (node → component-min) map must match the plain loop exactly."""
    rng = random.Random(1405)
    edges = [
        (rng.randrange(80), rng.randrange(80)) for _ in range(120)
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    assert _labels(
        dedup.connected_components_jump(pairs)
    ) == _labels(dedup.connected_components(pairs, max_iter=128))


def test_jump_converges_logarithmically_on_long_path(spark):
    """A diameter-60 path needs ~60 plain propagation rounds
    (test_min_label_raises_on_exhausted_iterations pins that 3 is
    not enough even for 50); the jump variant must finish exactly
    within 10 — the whole point of shortcutting."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    got = _labels(dedup.connected_components_jump(pairs, max_iter=10))
    assert got == {i: 0 for i in range(61)}


def test_jump_raises_on_exhausted_iterations(spark):
    """Same loud-failure contract as the plain loop and two-star:
    a partially-shortcut labeling is NOT components."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components_jump(pairs, max_iter=1)


def test_jump_rejects_nonpositive_round_budget(spark):
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components_jump(pairs, max_iter=0)
