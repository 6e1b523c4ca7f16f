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


def test_sq_quantization_bruteforce(spark, tmp_path):
    """SQ8 vs a plain-Python restatement on a controlled embedding set,
    including a constant dimension (mx == mn -> code 0, zero error) and
    min/max endpoints (codes 0 and 255, zero error at the endpoints)."""
    import hashlib
    import math

    import ocr_image_to_text_spark.queries as q

    vecs = {
        0: [0.0, -1.0, 7.5],
        1: [1.0, 1.0, 7.5],
        2: [0.25, 0.5, 7.5],
        3: [0.774, -0.333, 7.5],
    }
    df = spark.createDataFrame(
        [(i, [float(v) for v in e], 0) for i, e in vecs.items()],
        "vec_id long, embedding array<float>, label int")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    got = {r.vec_id: (r.code_md5, r.err_x1e9)
           for r in q.emb_quantize_sq(spark, str(tmp_path)).collect()}

    import struct as _s
    as_f32 = lambda v: _s.unpack("f", _s.pack("f", v))[0]  # noqa: E731
    cols = list(zip(*[[as_f32(x) for x in vecs[i]] for i in sorted(vecs)]))
    mn = [min(c) for c in cols]
    mx = [max(c) for c in cols]
    want = {}
    for i, e in vecs.items():
        codes, err = [], 0
        for d, xraw in enumerate(e):
            x = as_f32(xraw)
            if mx[d] == mn[d]:
                c = 0
                xq = mn[d]
            else:
                c = math.floor(255.0 * (x - mn[d]) / (mx[d] - mn[d]) + 0.5)
                xq = mn[d] + c * ((mx[d] - mn[d]) / 255.0)
            codes.append(c)
            err += math.floor(1e9 * (x - xq) * (x - xq) + 0.5)
        digest = hashlib.md5(",".join(map(str, codes)).encode()).hexdigest()
        want[i] = (digest, err)
    assert got == want
    # endpoints and constant dims reconstruct exactly
    assert got[0][1] == 0 or want[0][1] == got[0][1]


def test_lloyd_refinement_exact_means(spark):
    """coarse_centroids n_iters=1: refined centroids are the exact
    integer-micro-unit means of each seed cell (pure-Python restatement),
    empty cells keep their seed, and n_iters=0 is the identity."""
    from ocr_image_to_text_spark import similarity

    dim = 4
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # 0: seed A
        [0.0, 1.0, 0.0, 0.0],   # 1: seed B
        [1.0, 0.1, 0.0, 0.0],   # 2: -> A
        [0.1, 1.0, 0.0, 0.0],   # 3: -> B
        [0.5, 0.5, 0.0, 0.0],   # 4: tie -> A (smaller cid)
        [0.9, 0.2, 0.1, 0.0],   # 5: -> A
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    base = similarity.with_norm(emb, dim=dim).select("vec_id", "_e", "_norm")

    seed = {r.cid: r._ce for r in
            similarity.coarse_centroids(base, 2, dim, n_iters=0).collect()}
    assert seed == {0: vecs[0], 1: vecs[1]}

    got = {r.cid: r._ce for r in
           similarity.coarse_centroids(base, 2, dim, n_iters=1).collect()}

    import math

    def mean_int(members):
        cols = zip(*members)
        return [math.floor(sum(math.floor(x * 1e6) for x in col)
                           / len(members)) / 1e6 for col in cols]

    cell_a = [vecs[i] for i in (0, 2, 4, 5)]
    cell_b = [vecs[i] for i in (1, 3)]
    assert got == {0: mean_int(cell_a), 1: mean_int(cell_b)}


def test_lloyd_empty_cell_keeps_seed(spark):
    """A seed that wins no vector (not even itself) keeps its coordinates
    through the refinement instead of becoming null/zero."""
    from ocr_image_to_text_spark import similarity

    dim = 2
    # seed 1 duplicates seed 0, so every vector (including seed 1
    # itself) ties at the same distance to both and the smaller cid
    # wins: cell 1 ends the iteration empty.
    vecs = [[1.0, 0.0], [1.0, 0.0], [1.1, 0.0], [0.95, 0.0]]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    base = similarity.with_norm(emb, dim=dim).select("vec_id", "_e", "_norm")
    got = {r.cid: r._ce for r in
           similarity.coarse_centroids(base, 2, dim, n_iters=1).collect()}
    assert got[1] == vecs[1]  # empty cell: seed carried over
    import math
    expect0 = [math.floor(sum(math.floor(x * 1e6) for x in col) / 4) / 1e6
               for col in zip(*vecs)]
    assert got[0] == expect0
