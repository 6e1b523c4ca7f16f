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
