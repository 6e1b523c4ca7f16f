"""SimHash banded near-dup pairs + IVF-Flat ANN: semantics and plan shape.

The driver-level oracles already prove value equality vs DuckDB at sf0.01
(brute-force Hamming scan / full IVF restatement); these tests pin the
properties that make the operators correct AT SCALE: banding losslessness
for Hamming ≤ n_bands−1 (pigeonhole), band arithmetic, deterministic
argmin tie rules, and the broadcast/equi-join plan shape (no corpus
cartesian, no Python nodes).
"""

from __future__ import annotations

import itertools
import os

import pytest
from pyspark.sql import functions as F

from ocr_image_to_text_spark import dedup

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver-provided testdata not present")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long")


def test_banding_is_lossless_for_hamming_le_bands_minus_1(spark):
    """Every pair at Hamming ≤ 3 shares ≥ 1 of 4 bands exactly (pigeonhole)
    — the banded join must return EXACTLY the brute-force pair set."""
    import random

    rng = random.Random(7)
    base = rng.getrandbits(32)
    sigs = [base]
    for _ in range(40):  # cluster: ≤3 bit flips from base → always reported
        s = base
        for b in rng.sample(range(32), rng.randint(0, 3)):
            s ^= 1 << b
        sigs.append(s)
    sigs += [rng.getrandbits(32) for _ in range(40)]  # background noise

    got = {(r.doc_a, r.doc_b, r.hamming) for r in
           dedup.simhash_band_pairs(_sig_df(spark, sigs)).collect()}
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(sigs), 2):
        h = bin(a ^ b).count("1")
        if h <= 3:
            want.add((i, j, h))
    assert got == want
    assert len(want) > 100  # the fixture actually exercises the operator


def test_band_agreement_below_hamming_4_is_not_reported(spark):
    """A pair at Hamming 4 with one flip per band shares NO band → not even
    a candidate; a pair at Hamming 4 concentrated in one band IS a
    candidate but must be filtered by the verify step."""
    base = 0x5A5A5A5A
    spread = base ^ (1 << 0) ^ (1 << 8) ^ (1 << 16) ^ (1 << 24)
    packed = base ^ 0b1111  # 4 flips inside band 0
    got = dedup.simhash_band_pairs(_sig_df(spark, [base, spread, packed])).collect()
    # spread-vs-base shares no band; packed-vs-base is a candidate at h=4;
    # spread-vs-packed differs in 8 bits. Nothing survives the h<=3 filter.
    assert got == []


def test_simhash_pairs_plan_shape(spark):
    """Banded equi-join: SortMergeJoin/ShuffledHashJoin on the band key —
    no CartesianProduct, no BroadcastNestedLoop over the corpus, no
    Python eval anywhere."""
    from ocr_image_to_text_spark import queries as q

    plan = _plan(q.dedup_simhash_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ivf_assignment_ties_and_probing(spark):
    """Deterministic cell argmin (round-9 distance, tie → smaller cid) and
    n_probe probing reproduce a literal Python restatement on a tiny
    hand-made corpus."""
    from ocr_image_to_text_spark import similarity

    dim = 4
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # 0: centroid A
        [0.0, 1.0, 0.0, 0.0],   # 1: centroid B
        [1.0, 0.1, 0.0, 0.0],   # 2: near A
        [0.1, 1.0, 0.0, 0.0],   # 3: near B
        [0.5, 0.5, 0.0, 0.0],   # 4: equidistant → tie → cell 0
        [0.9, 0.2, 0.1, 0.0],   # 5: near A
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    out = similarity.ivf_topk(emb, n_queries=2, k=2, n_cells=2, n_probe=1,
                              dim=dim).collect()
    rows = {(r.query_id, r.rank): r.neighbor_id for r in out}
    # query 0 probes cell A = {0, 2, 4, 5}; cosine ranks 2 then 5 first
    assert rows[(0, 1)] == 2
    assert rows[(0, 2)] == 5
    # query 1 probes cell B = {1, 3}; only neighbor is 3
    assert rows[(1, 1)] == 3
    assert (1, 2) not in rows


def test_ivf_plan_shape(spark):
    """Centroids and probe set are BROADCAST; the only corpus-sized joins
    are the 1:1 cell-assignment join and the candidate equi-join on cell.
    No Python eval; the nested-loop join is the 16-row centroid broadcast,
    never corpus × corpus."""
    from ocr_image_to_text_spark import queries as q

    plan = _plan(q.ann_ivf_topk(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
