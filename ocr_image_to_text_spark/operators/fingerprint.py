"""Winnowing fingerprint (Schleimer et al., SIGMOD'03) as an Arrow UDF.

Spec identical to the DuckDB oracle twin: md5-hex char-7-gram hashes,
window-4 minima (lexicographic), distinct set → (count, min, max). The
pure-expression variant (functions/textfn.fingerprint_cols) is kept for
reference but the O(n·w) array materialization in codegen is ~30× slower
than this batch UDF, so the UDF is the production path.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType, StructField, StructType

FP_SCHEMA = StructType([
    StructField("n_fp", LongType()),
    StructField("min_fp", StringType()),
    StructField("max_fp", StringType()),
])


def fingerprint_one(text: str, k: int = 7, w: int = 4) -> tuple[int, str, str]:
    n = len(text)
    hi = max(n - k + 1, 1)
    grams = [hashlib.md5(text[i:i + k].encode()).hexdigest() for i in range(hi)]
    hj = max(len(grams) - w + 1, 1)
    fps = {min(grams[j:j + w]) for j in range(hj)}
    return len(fps), min(fps), max(fps)


@pandas_udf(FP_SCHEMA)
def fingerprint_udf(text: pd.Series) -> pd.DataFrame:
    rows = [fingerprint_one(t or "") for t in text.to_numpy()]
    return pd.DataFrame(rows, columns=["n_fp", "min_fp", "max_fp"])
