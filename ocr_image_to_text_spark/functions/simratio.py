"""X16 similarity ratio (src/ocr_benchmark.py:21-25) as an Arrow UDF.

The reference computes difflib.SequenceMatcher ratio between an engine
output and the ground truth to score benchmark runs (consumed by the A12
rollups). Engine analog: the ratio between two layout variants of the same
turn — exactly the per-item accuracy column the reference's benchmark
table carries. Inherently sequential per pair → vectorized pandas UDF;
the oracle is the pyref restatement materialized to golden parquet.
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def sim_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        difflib.SequenceMatcher(None, x or "", y or "").ratio()
        for x, y in zip(a.to_numpy(), b.to_numpy())
    ])
