"""X7 entities: positive-row evidence across all three implementations.

The driver's documents corpus happens to contain no dates/emails/phones/
urls, so the oracle check passes trivially there (0 == 0 rows). These
fixtures carry every entity family plus near-miss negatives, and must
agree across the Spark column expr, pyref (Python re), and the DuckDB
oracle SQL shape.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from ocr_image_to_text_spark import pyref

DOCS = [
    (0, "Meeting on 12/05/2023 and again 2024-01-31; see Jan 5, 2019 notes."),
    (1, "mail me at first.last+tag@sub.example.org or call (555) 123-4567"),
    (2, "intl +44 20 7946 0958 is not matched but +1 555-123-4567 is"),
    (3, "docs at https://example.com/a/b?q=1 and http://foo.bar-baz.io"),
    (4, "no entities here, just text with numbers 12345 and at signs @ alone"),
    (5, None),
]


def test_entities_positive_three_way(spark):
    import __spark_entry__ as entry
    from ocr_image_to_text_spark.functions import textfn

    pdf = pd.DataFrame({"doc_id": [d for d, _ in DOCS],
                        "text": [t for _, t in DOCS]})

    # Spark: same single-scan shape as the doc_entities query (unary
    # lambda — a 2-arg transform lambda receives the array index!)
    def tag(et):
        return F.transform(
            textfn.entity_matches(F.coalesce(F.col("text"), F.lit("")), et),
            lambda e: F.struct(F.lit(et).alias("entity_type"),
                               e.alias("entity")))

    tagged = F.concat(*[tag(et) for et in ("date", "email", "phone", "url")])
    got_spark = sorted(
        (r.doc_id, r.s.entity_type, r.s.entity)
        for r in spark.createDataFrame(pdf)
        .select("doc_id", F.explode(tagged).alias("s")).collect())

    # pyref (Python re)
    want = []
    keymap = {"dates": "date", "emails": "email", "phones": "phone", "urls": "url"}
    for doc_id, text in DOCS:
        ents = pyref.extract_entities(text or "")
        for k, vals in ents.items():
            want.extend((doc_id, keymap[k], v) for v in vals)
    want = sorted(want)
    assert got_spark == want
    assert {t for _, t, _ in want} == {"date", "email", "phone", "url"}

    # DuckDB oracle SQL (the driver's twin), on the same rows. Since r4
    # the doc_entities oracle unions a seeded derivation (doc_id offset
    # by ENTITY_SEED_OFFSET) onto the organic corpus; the organic half
    # must still equal the pyref expectation exactly, and the seeded
    # half must be non-empty for every input doc.
    from ocr_image_to_text_spark.queries import ENTITY_SEED_OFFSET

    con = duckdb.connect()
    con.register("documents", pdf)
    sql = entry.oracle_sql()["doc_entities"]
    got_duck = sorted(tuple(r) for r in con.sql(sql).fetchall())
    organic = [r for r in got_duck if r[0] < ENTITY_SEED_OFFSET]
    seeded = [r for r in got_duck if r[0] >= ENTITY_SEED_OFFSET]
    assert organic == want
    assert {r[0] - ENTITY_SEED_OFFSET for r in seeded} == \
        {d for d, _ in DOCS}  # every doc's seeded twin yields rows


def test_entities_seeded_driver_query_nonvacuous(spark, tmp_path):
    """The driver-level seeded query yields every entity family for every
    doc — all FIVE X7 patterns (3 date + email + phone + url) produce a
    row, and the Spark result equals the DuckDB oracle twin."""
    import __spark_entry__ as entry
    from ocr_image_to_text_spark import queries as q

    pdf = pd.DataFrame({"doc_id": [0, 1, 7],
                        "text": ["plain body", "", "more text"]})
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet")

    rows = sorted(tuple(r) for r in q.doc_entities_seeded(spark, sf).collect())

    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(tuple(r)
                  for r in con.sql(entry.oracle_sql()["doc_entities_seeded"]).fetchall())
    assert rows == want
    # 6 entities per doc: slash-date, iso-date, monthname-date, email,
    # phone, url — every X7 pattern contributes.
    assert len(rows) == 3 * 6
    by_type = {t for _, t, _ in rows}
    assert by_type == {"date", "email", "phone", "url"}
    assert ("7", "email", "user7@example.com") in {(str(d), t, e) for d, t, e in rows}
