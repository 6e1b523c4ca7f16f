"""Heavy-family shuffle-volume scaling exhibit: sf0.1 vs sf1 (10×).

Runs each heavy corpus-ops query at the driver's sf0.1 (5k docs / 2k
vecs) and at the synthesized warehouse/sf1 (50k docs / 20k vecs,
tools/gen_sf1_corpus.py), back-to-back within a pair so host
credit-throttle drift hits both tiers equally, and prints the time
ratio next to the plan's claimed complexity. Expectation:

  dedup_minhash_lsh   ~O(n)         ratio ≈ 10 (band explode + verify)
  dedup_simhash_pairs ~O(n + pairs) ratio ≈ 10 (r5: the primary name is
                      now the 64-bit/16-bit-band config, whose bucket
                      fan-out stays flat where the old 8-bit bands grew
                      a birthday term — see BENCH.md r4/r5 exhibits)
  doc_bm25_topk       ~O(tokens)    ratio ≈ 10
  corpus_pipeline_v3  ~O(tokens)    ratio ≈ 10
  emb_dup_pairs       O(n²) exact-verify BY DECLARATION → ratio ≈ 100
                      (the approximate alternative ann_lsh_topk is the
                      scale path; this one exists to certify recall)

Usage: python tools/corpus_scale_bench.py [--skip-quadratic]
Writes one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_image_to_text_spark import queries as q  # noqa: E402
from ocr_image_to_text_spark.cachectl import release_all  # noqa: E402
from ocr_image_to_text_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "warehouse", "sf1")

LINEAR = [
    ("dedup_minhash_lsh", q.dedup_minhash_lsh),
    ("dedup_simhash_pairs", q.dedup_simhash_pairs),
    ("doc_bm25_topk", q.doc_bm25_topk),
    ("corpus_pipeline_v3", q.corpus_pipeline_v3),
]
QUADRATIC = [("emb_dup_pairs", q.emb_dup_pairs)]
# r4 wave 2 — documents-family additions (all claimed ~O(tokens) or
# O(lines) with one keyed shuffle; the boilerplate pair adds a 1-row
# broadcast threshold/set):
WAVE2 = [
    ("corpus_boilerplate_lines", q.corpus_boilerplate_lines),
    ("doc_strip_boilerplate", q.doc_strip_boilerplate),
    ("corpus_source_stats", q.corpus_source_stats),
    ("corpus_sample_weighted", q.corpus_sample_weighted),
    ("corpus_token_entropy", q.corpus_token_entropy),
]
# r4 wave 3 — all claimed vocab- or token-linear except IVFADC, whose
# scan grows with corpus×probed-cell occupancy (cells fixed at 16 here,
# so ~linear in vectors):
WAVE3 = [
    ("corpus_bpe_pairs", q.corpus_bpe_pairs),
    ("corpus_bpe_merge2", q.corpus_bpe_merge2),
    ("dedup_cdc_chunks", q.dedup_cdc_chunks),
    ("corpus_sample_weighted_stratified",
     q.corpus_sample_weighted_stratified),
    ("ann_ivfpq_adc_topk", q.ann_ivfpq_adc_topk),
]


# r5 exhibit (--simhash): the re-pointed primary (64-bit/16-bit bands)
# next to the historical narrow form — the direct measurement of the
# band-width knob the r4 exhibit identified (narrow grew 17.5× at 10×
# docs from the 256-bucket birthday term; wide bucket fan-out stays flat)
SIMHASH = [
    ("dedup_simhash_pairs", q.dedup_simhash_pairs),
    ("dedup_simhash_pairs_narrow", q.dedup_simhash_pairs_narrow),
]


def timed(spark, fn, sf_dir) -> float:
    release_all()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_all()
    return round(dt, 2)


def main() -> None:
    skip_quad = "--skip-quadratic" in sys.argv
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        raise SystemExit("run tools/gen_sf1_corpus.py first")
    spark = get_spark("corpus-scale", master="local[32]")
    fam = (WAVE2 if "--wave2" in sys.argv
           else WAVE3 if "--wave3" in sys.argv
           else SIMHASH if "--simhash" in sys.argv
           else LINEAR + ([] if skip_quad else QUADRATIC))
    out = {}
    for name, fn in fam:
        timed(spark, fn, SF01)  # warm JIT/page cache on the small tier
        a = timed(spark, fn, SF01)
        b = timed(spark, fn, SF1)
        out[name] = {"sf0.1_s": a, "sf1_s": b,
                     "ratio": round(b / a, 2) if a > 0 else None}
        print(f"{name}: {a}s -> {b}s  ratio {out[name]['ratio']}",
              file=sys.stderr)
    print(json.dumps({"metric": "sf0.1_vs_sf1_heavy_family", "scale": 10,
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
