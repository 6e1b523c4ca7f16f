"""Per-turn extraction operators: kind dispatch + vectorized pandas UDFs.

The pipeline (SURVEY.md §3.1 Spark restatement)::

    read.table(transcripts)
      → classify kind (JVM-side exprs: rlike/contains — no Python)
      → branch per kind through ONE fused Arrow-batched pandas UDF each
        (boxes: F1 conf filter + A2/A3 clustering + A1/A4 assembly;
         html: DOM block collect + density scoring + X1 clean;
         plain: X1 clean via Python `re` — oracle-exact)
      → unionByName → rollup metrics (JVM exprs) → spans via posexplode

Spans are computed inside the UDF as parallel arrays (no extra shuffle for
the offset window — SURVEY.md §2.5 W4 done turn-locally).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .htmlx import clean_block, extract_html_one
from .layout import extract_boxes_json

RESULT_SCHEMA = StructType(
    [
        StructField("extracted_text", StringType()),
        StructField("n_blocks_kept", IntegerType()),
        StructField("n_blocks_dropped", IntegerType()),
        StructField("table_flag", BooleanType()),
        StructField("span_starts", ArrayType(IntegerType())),
        StructField("span_ends", ArrayType(IntegerType())),
        StructField("span_texts", ArrayType(StringType())),
    ]
)

# Java-regex payload sniffers (JVM-side; semantics mirror pyref.classify_kind)
HTML_SNIFF_JAVA = (
    r"(?i)<\s*(?:!doctype|html|body|div|p|br|h[1-6]|ul|ol|li|table|nav|footer|"
    r"header|span|a|script|style|section|article|main)\b"
)
BOXES_SNIFF_JAVA = r"^\s*\{"


def _spans_cols(text: str) -> tuple[list[int], list[int], list[str]]:
    """W4 — char-offset spans per output line, as parallel arrays."""
    if not text:
        return [], [], []
    starts: list[int] = []
    ends: list[int] = []
    lines = text.split("\n")
    pos = 0
    for line in lines:
        starts.append(pos)
        ends.append(pos + len(line))
        pos += len(line) + 1
    return starts, ends, lines


def _result_frame(rows: list[tuple[str, int, int, bool]]) -> pd.DataFrame:
    data = {
        "extracted_text": [],
        "n_blocks_kept": [],
        "n_blocks_dropped": [],
        "table_flag": [],
        "span_starts": [],
        "span_ends": [],
        "span_texts": [],
    }
    for text, kept, dropped, tflag in rows:
        s, e, t = _spans_cols(text)
        data["extracted_text"].append(text)
        data["n_blocks_kept"].append(kept)
        data["n_blocks_dropped"].append(dropped)
        data["table_flag"].append(tflag)
        data["span_starts"].append(s)
        data["span_ends"].append(e)
        data["span_texts"].append(t)
    return pd.DataFrame(data)


def make_boxes_udf(variant: str = "v2", geometry: str = "easy", conf_threshold: float = 0.3):
    @pandas_udf(RESULT_SCHEMA)
    def extract_boxes_udf(tool: pd.Series) -> pd.DataFrame:
        rows = [
            extract_boxes_json(p, variant, geometry, conf_threshold)
            for p in tool.to_numpy()
        ]
        return _result_frame(rows)

    return extract_boxes_udf


def make_dispatch_udf(variant: str = "v2", geometry: str = "easy",
                      conf_threshold: float = 0.3):
    """ONE fused extractor for all payload kinds.

    A per-kind branch + unionByName costs three shuffle reads and three
    pandas-UDF stages, each deserializing every row then filtering —
    measured ~3x wall at local[32]. Dispatching on the precomputed `kind`
    column inside a single Arrow batch touches each row exactly once.
    """

    @pandas_udf(RESULT_SCHEMA)
    def extract_dispatch_udf(kind: pd.Series, text: pd.Series,
                             tool: pd.Series) -> pd.DataFrame:
        rows = []
        for k, t, o in zip(kind.to_numpy(), text.to_numpy(), tool.to_numpy()):
            if k == "boxes":
                rows.append(extract_boxes_json(o, variant, geometry, conf_threshold))
            elif k == "html":
                rows.append((*extract_html_one(t or ""), False))
            else:
                clean = clean_block(t or "")  # X1, Python `re`
                rows.append((clean, 1 if clean else 0, 0, False))
        return _result_frame(rows)

    return extract_dispatch_udf


@pandas_udf(RESULT_SCHEMA)
def extract_html_udf(text: pd.Series) -> pd.DataFrame:
    return _result_frame([(*extract_html_one(t or ""), False) for t in text.to_numpy()])


@pandas_udf(RESULT_SCHEMA)
def extract_plain_udf(text: pd.Series) -> pd.DataFrame:
    rows = []
    for t in text.to_numpy():
        clean = clean_block(t or "")  # X1, Python `re`
        rows.append((clean, 1 if clean else 0, 0, False))
    return _result_frame(rows)


def kind_col(text: Column = None, tool: Column = None) -> Column:
    """Payload-kind classifier — pure JVM expressions (F5 analog)."""
    text = F.col("text") if text is None else text
    tool = F.col("tool") if tool is None else tool
    return (
        F.when(
            (tool.isNotNull())
            & (tool != "")
            & tool.rlike(BOXES_SNIFF_JAVA)
            & tool.contains('"boxes"'),
            F.lit("boxes"),
        )
        .when(text.isNotNull() & text.rlike(HTML_SNIFF_JAVA), F.lit("html"))
        .otherwise(F.lit("plain"))
    )


def extract_turns(
    df: DataFrame,
    variant: str = "v2",
    geometry: str = "easy",
    conf_threshold: float = 0.3,
    partitions: int | None = None,
) -> DataFrame:
    """Per-turn extraction rollup.

    Output: (conv_id, turn_idx, kind, extracted_text, n_blocks_kept,
    n_blocks_dropped, chars_in, chars_out, span_starts, span_ends, span_texts).

    Turns are independent, so the pre-UDF repartition salts by
    (conv_id, turn_idx) — a 10^6-turn conversation spreads over all tasks
    (north_rule skew requirement); conversation order is restored only at
    write/rollup time.
    """
    base = df.select("conv_id", "turn_idx", "text", "tool").withColumn(
        "kind", kind_col()
    )
    if partitions:
        base = base.repartition(partitions, F.xxhash64("conv_id", "turn_idx"))

    dispatch = make_dispatch_udf(variant, geometry, conf_threshold)
    out = base.withColumn(
        "r", dispatch(F.col("kind"), F.col("text"), F.col("tool")))
    return out.select(
        "conv_id",
        "turn_idx",
        "kind",
        F.col("r.extracted_text").alias("extracted_text"),
        F.col("r.n_blocks_kept").alias("n_blocks_kept"),
        F.col("r.n_blocks_dropped").alias("n_blocks_dropped"),
        F.col("r.table_flag").alias("table_flag"),
        (F.length(F.coalesce(F.col("text"), F.lit(""))) +
         F.length(F.coalesce(F.col("tool"), F.lit("")))).alias("chars_in"),
        F.length(F.col("r.extracted_text")).alias("chars_out"),
        F.col("r.span_starts").alias("span_starts"),
        F.col("r.span_ends").alias("span_ends"),
        F.col("r.span_texts").alias("span_texts"),
    )


def spans_table(extracted: DataFrame) -> DataFrame:
    """Explode the per-turn span arrays into the north_star spans schema:
    (conv_id, turn_idx, span_start, span_end, text)."""
    z = extracted.select(
        "conv_id",
        "turn_idx",
        F.arrays_zip(
            F.col("span_starts").alias("span_start"),
            F.col("span_ends").alias("span_end"),
            F.col("span_texts").alias("text"),
        ).alias("z"),
    )
    return z.select(
        "conv_id",
        "turn_idx",
        F.posexplode("z").alias("span_idx", "s"),
    ).select(
        "conv_id",
        "turn_idx",
        "span_idx",
        F.col("s.span_start").alias("span_start"),
        F.col("s.span_end").alias("span_end"),
        F.col("s.text").alias("text"),
    )
