"""Connected components over near-dup pair graphs.

The driver oracle (`dedup_clusters` vs a DuckDB recursive-CTE transitive
closure) proves value equality on the corpus; these tests pin the
algorithmic properties: multi-round convergence on a chain (diameter >
1 round), component separation, the loud non-convergence failure, and a
reference brute-force cross-check on a random graph.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_image_to_text_spark.dedup import connected_components


def _cc_bruteforce(edges, nodes):
    """Union-find ground truth (pure Python)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long")


def test_chain_needs_multiple_rounds(spark):
    """A 12-edge chain has diameter 12: min label must walk the whole
    chain, proving the loop actually iterates past round 1."""
    edges = [(i, i + 1) for i in range(12)]
    got = {(r.doc_id, r.cluster_id)
           for r in connected_components(_pairs_df(spark, edges)).collect()}
    assert got == {(i, 0) for i in range(13)}


def test_two_components_stay_separate(spark):
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)]
    got = dict((r.doc_id, r.cluster_id)
               for r in connected_components(_pairs_df(spark, edges)).collect())
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = sorted({(min(a, b), max(a, b))
                    for a, b in (rng.sample(nodes, 2) for _ in range(55))})
    expect = _cc_bruteforce(edges, {n for e in edges for n in e})
    got = dict((r.doc_id, r.cluster_id)
               for r in connected_components(_pairs_df(spark, edges)).collect())
    assert got == expect


def test_nonconvergence_is_loud(spark):
    edges = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, edges), max_rounds=2)


def test_empty_pairs_empty_clusters(spark):
    df = _pairs_df(spark, []).filter(F.lit(False))
    assert connected_components(df).count() == 0


def test_star_contraction_chain_in_log_rounds(spark):
    """The algorithm's raison d'être: a 64-node PATH (diameter 63) where
    label propagation needs ~63 rounds, star contraction must converge
    within max_rounds=10 ≈ O(log n) — and still labels every node with
    the component min."""
    from ocr_image_to_text_spark.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(63)]
    got = {(r.doc_id, r.cluster_id)
           for r in connected_components_star(
               _pairs_df(spark, edges), max_rounds=10).collect()}
    assert got == {(i, 0) for i in range(64)}


def test_star_contraction_matches_label_propagation(spark):
    """Both algorithms agree with union-find ground truth on a random
    graph with several components and isolated chains."""
    from ocr_image_to_text_spark.dedup import connected_components_star

    rng = random.Random(7)
    nodes = list(range(80))
    edges = sorted({(min(a, b), max(a, b))
                    for a, b in (rng.sample(nodes, 2) for _ in range(45))})
    edges += [(200 + i, 201 + i) for i in range(9)]  # a chain component
    expect = _cc_bruteforce(edges, {n for e in edges for n in e})
    star = dict((r.doc_id, r.cluster_id)
                for r in connected_components_star(
                    _pairs_df(spark, edges)).collect())
    lp = dict((r.doc_id, r.cluster_id)
              for r in connected_components(_pairs_df(spark, edges)).collect())
    assert star == expect
    assert lp == expect


def test_star_contraction_releases_checkpoints(spark):
    """Every round's localCheckpoint RDDs are freed: after the consumer
    materializes and release_caches() runs, nothing stays persistent."""
    from ocr_image_to_text_spark.cachectl import release_caches
    from ocr_image_to_text_spark.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(20)]
    connected_components_star(_pairs_df(spark, edges)).collect()
    release_caches()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
