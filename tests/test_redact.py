"""PII redaction: masking completeness + count correctness.

The driver oracle certifies value-exact equality on the seeded corpus;
these fixtures add the adversarial cases the corpus lacks — adjacent
entities, an email inside URL-ish text, near-miss negatives — and check
the invariant that matters at corpus scale: NO pattern instance survives
redaction, and the reported counts equal Python-re ground truth.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from ocr_image_to_text_spark.functions import textfn

DOCS = [
    (0, "mail a@b.co and c.d+e@f-g.org, call (555) 123-4567 now"),
    (1, "see https://x.example.com/a?b=1 then http://y.io and a@b.co"),
    (2, "+1 555-123-4567 and 555 123 4567 back to back 5551234567"),
    (3, "no pii: plain text, 12345, an @ alone, http:// bare scheme"),
    (4, ""),
]


def test_redact_masks_every_match_and_counts_agree(spark):
    pdf = pd.DataFrame({"doc_id": [d for d, _ in DOCS],
                        "text": [t for _, t in DOCS]})
    out = (spark.createDataFrame(pdf)
           .select("doc_id",
                   textfn.redact_col(F.col("text")).alias("redacted"),
                   *[F.size(textfn.entity_matches(F.col("text"), e))
                     .cast("long").alias(f"n_{e}")
                     for e in textfn.REDACT_ORDER])
           .collect())
    by_id = {r.doc_id: r for r in out}
    for doc_id, text in DOCS:
        r = by_id[doc_id]
        # counts == Python-re ground truth on the ORIGINAL text
        for etype in textfn.REDACT_ORDER:
            want = sum(len(re.findall(p, text))
                       for p in textfn.ENTITY_PATTERNS[etype])
            assert getattr(r, f"n_{etype}") == want, (doc_id, etype)
        # completeness: no pattern instance survives in the redacted text
        # (url last means its placeholder can't be re-matched by others)
        for etype in textfn.REDACT_ORDER:
            for p in textfn.ENTITY_PATTERNS[etype]:
                assert not re.search(p, r.redacted), (doc_id, etype, r.redacted)
        # placeholders actually landed where counts were positive
        for etype in textfn.REDACT_ORDER:
            if getattr(r, f"n_{etype}"):
                assert f"[{etype.upper()}]" in r.redacted
