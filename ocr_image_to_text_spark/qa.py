"""QA / answer-extraction operators (SURVEY.md §2.8 X13-X15).

Two implementations exist per operator, per the repo's oracle strategy:

* X15 fallback QA (src/rag_module.py:57-95): pure Spark column
  expressions here, with a structurally independent DuckDB SQL twin in
  __spark_entry__.oracle_sql() — sentence split X13, substring scoring,
  stable argmax, confidence clamp.
* X14 contextual answer extraction (ocr_app/rag/rag_processor.py:167-236):
  branchy regex logic → vectorized pandas UDF here; the oracle is the
  pure-Python pyref restatement materialized to golden parquet
  (ensure_qa_golden), never this UDF.

Queries are fixed deterministic strings so every row is reproducible.
"""

from __future__ import annotations

import os
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

X15_QUERY = "what is the spark data engine quality"
X15_NO_ANSWER = ("Could not generate an answer. Please check if the document "
                 "contains relevant information.")

QA_X14_QUERIES = [
    ("when", "when was the data released"),
    ("what", "what is the spark engine quality"),
]


# ---------------------------------------------------------------------------
# X15 — column-expression implementation
# ---------------------------------------------------------------------------


def x15_cols(text: Column, query: str = X15_QUERY) -> tuple[Column, Column]:
    """Returns (answer, confidence) columns.

    Semantics: sentences = X13 split; per-sentence score = count of query
    words contained (substring) in the punctuation-stripped lowered
    sentence; stable max (first sentence wins ties); confidence =
    min(score / |query_words|, 1.0), else canned no-answer at 0.0.
    """
    qwords = sorted(set(re.sub(r"[^\w\s]", "", query.lower()).split()))
    qarr = F.array(*[F.lit(w) for w in qwords])
    sentences = F.split(text, r"(?<=[.!?])\s+", -1)
    scored = F.transform(
        sentences,
        lambda s: F.struct(
            F.size(F.filter(
                qarr,
                lambda w: F.contains(
                    F.regexp_replace(F.lower(s), r"[^\w\s]", ""), w),
            )).alias("score"),
            s.alias("sentence"),
        ),
    )
    # stable argmax: aggregate keeps the FIRST maximum (strict >)
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("score"), F.lit("").alias("sentence")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    has = best["score"] > 0
    answer = F.when(has, best["sentence"]).otherwise(F.lit(X15_NO_ANSWER))
    conf = F.when(
        has,
        F.least(best["score"] / F.lit(float(max(1, len(qwords)))), F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    return answer, conf


def qa_fallback_x15_df(docs: DataFrame, query: str = X15_QUERY) -> DataFrame:
    # NULL text → the canned no-answer row (split(NULL) would yield no
    # sentences and the DuckDB unnest twin would drop the doc entirely)
    answer, conf = x15_cols(F.coalesce(F.col("text"), F.lit("")), query)
    return docs.select(
        "doc_id", answer.alias("answer"),
        F.floor(conf * 1e6 + F.lit(0.5)).cast("long").alias("conf_x1e6"))


# ---------------------------------------------------------------------------
# X14 — pandas-UDF implementation (independent of pyref)
# ---------------------------------------------------------------------------

_STOP = {"the", "a", "an", "is", "are", "was", "were", "in", "on", "at",
         "by", "to", "for", "with", "about"}
_NAME_RE = re.compile(r"(?<!^)(?<![\.\!\?]\s)([A-Z][a-z]+(?:\s[A-Z][a-z]+)*)")
_DATE_RE = re.compile(
    r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b"
    r"|\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b"
    r"|\b\d{4}\b")
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _answer_one(query: str, context: str) -> str:
    q = re.sub(r"[^\w\s]", "", (query or "").lower().strip())
    is_who = re.search(r"\bwho\b", q) is not None
    is_when = re.search(r"\bwhen\b", q) is not None
    terms = [t for t in q.split() if t not in _STOP]
    sents = _SENT_RE.split(context or "")
    hits = [s for s in sents if any(t in s.lower() for t in terms)]
    if not hits:
        return context
    if is_who:
        for s in hits:
            names = _NAME_RE.findall(s)
            if names:
                return names[0]
    elif is_when:
        for s in hits:
            dates = _DATE_RE.findall(s)
            if dates:
                return dates[0]
    best_i, best = 0, -1
    for i, s in enumerate(hits):
        sc = sum(1 for t in terms if t in s.lower())
        if sc > best:
            best_i, best = i, sc
    return hits[best_i].strip()


def make_x14_udf(query: str):
    @pandas_udf(StringType())
    def x14_udf(text: pd.Series) -> pd.Series:
        return pd.Series([_answer_one(query, t) for t in text.to_numpy()])

    return x14_udf


def qa_answer_x14_df(docs: DataFrame) -> DataFrame:
    parts = []
    for kind, q in QA_X14_QUERIES:
        parts.append(docs.select(
            "doc_id", F.lit(kind).alias("query_kind"),
            make_x14_udf(q)(F.col("text")).alias("answer")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# X14 golden (oracle side — pyref, never the UDF above)
# ---------------------------------------------------------------------------


def ensure_qa_golden(sf_dir: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import pyref
    from .transcripts import tier_for_sf_dir, warehouse_dir

    tier = tier_for_sf_dir(sf_dir)
    path = os.path.join(warehouse_dir(), "golden", f"qa_x14_{tier}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = {"doc_id": [], "query_kind": [], "answer": []}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        for kind, q in QA_X14_QUERIES:
            rows["doc_id"].append(doc_id)
            rows["query_kind"].append(kind)
            rows["answer"].append(pyref.extract_answer_from_context(q, text or ""))
    schema = pa.schema([("doc_id", pa.int64()), ("query_kind", pa.string()),
                        ("answer", pa.string())])
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pydict(rows, schema=schema), tmp,
                   compression="zstd")
    os.replace(tmp, path)
    return path
