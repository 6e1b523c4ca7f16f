"""chunk_cosine_topk vs a direct numpy restatement of _embedding_search.

The reference ranks chunks by raw dot product (NOT normalized, despite
its "cosine" comment) via np.argsort(sim)[-k:][::-1] — stable ascending
argsort reversed, so at equal score the LARGER flat chunk index wins,
both for inclusion at the k boundary and for rank order. Duplicate
chunks produce identical deterministic embeddings, which forces exact
score ties and pins that semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ocr_image_to_text_spark import similarity

QUERY = "spark data engine quality filter"
DIM = 16

# chunk list with exact duplicates (forced score ties) in flat order
CHUNKS = [
    ("c0", 0, 0, "the spark data engine"),
    ("c0", 0, 1, "unrelated filler text"),
    ("c0", 1, 0, "the spark data engine"),      # dup of flat idx 0 — tie
    ("c1", 0, 0, "quality filter discussion"),
    ("c1", 0, 1, "the spark data engine"),      # dup again — tie
    ("c1", 1, 0, "another body of words"),
    ("c1", 1, 1, "quality filter discussion"),  # dup of flat idx 3 — tie
]


def _reference_topk(k: int):
    """np restatement of _embedding_search (text_utils.py:157-169)."""
    emb = np.array([similarity.embed_text_py(c[3], DIM) for c in CHUNKS])
    q = np.array(similarity.embed_text_py(QUERY, DIM))
    sims = np.round(emb @ q, 9)  # engine rounds to 9dp before ranking
    top = np.argsort(sims, kind="stable")[-k:][::-1]
    return [(r + 1, *CHUNKS[i][:3], int(np.floor(sims[i] * 1e9 + 0.5)))
            for r, i in enumerate(top)]


def test_chunk_cosine_matches_embedding_search_with_ties(spark):
    df = spark.createDataFrame(
        pd.DataFrame(CHUNKS, columns=["conv_id", "turn_idx", "chunk_idx", "chunk"]))
    for k in (3, 5):
        got = [tuple(r) for r in
               similarity.chunk_cosine_topk(df, QUERY, k=k, dim=DIM).collect()]
        assert got == _reference_topk(k), f"k={k}"


def test_chunk_cosine_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        pd.DataFrame(CHUNKS, columns=["conv_id", "turn_idx", "chunk_idx", "chunk"]))
    plan = (similarity.chunk_cosine_topk(df, QUERY, k=5, dim=DIM)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
