"""X8 primary-path analog: profile language ID — Spark vs DuckDB vs labels.

The driver corpus is English-only, so the latin-script argmax path is
exercised here with hand-written multilingual fixtures, run through BOTH
dialects (the Spark column expr and the generated DuckDB SQL) to prove
they agree off the easy path.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

FIXTURES = [
    ("short", "hi", "en"),
    ("en", "the cat sat on the mat and it is happy in that house", "en"),
    ("de", "der hund und die katze das ist nicht mit einem haus", "de"),
    ("fr", "le chien et les chats est dans une maison pour que tout va", "fr"),
    ("es", "el perro y los gatos es con las casas para dormir por fin", "es"),
    ("zh", "这是一个很长的中文测试句子，足够二十个字符了吗应该是的", "zh"),
    ("ru", "Это довольно длинное русское предложение для теста", "ru"),
    ("tie-ish", "bla ble bli blo blu qwer asdf zxcv poiu lkjh mnbv", "en"),
]


def test_lang_ngram_labels_and_dialect_agreement(spark):
    import __spark_entry__ as entry
    from ocr_image_to_text_spark.functions.textfn import lang_ngram_col

    pdf = pd.DataFrame({"doc_id": range(len(FIXTURES)),
                        "text": [t for _, t, _ in FIXTURES]})
    want = {i: lab for i, (_, _, lab) in enumerate(FIXTURES)}

    df = spark.createDataFrame(pdf).select(
        "doc_id", lang_ngram_col(F.col("text")).alias("lang_detected"))
    got_spark = {r.doc_id: r.lang_detected for r in df.collect()}
    assert got_spark == want

    con = duckdb.connect()
    con.register("documents", pdf)
    sql = entry.oracle_sql()["doc_lang_ngram"]
    got_duck = dict(con.sql(sql).fetchall())
    assert got_duck == want
