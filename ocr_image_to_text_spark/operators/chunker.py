"""X3 word-pack chunker as a vectorized pandas UDF.

The greedy word-packing with suffix overlap (ocr_app/utils/text_utils.py:
36-90) is inherently sequential per document, so it runs in an Arrow batch
UDF (Python per doc, never per Spark row via the interpreter loop).

Verified against pyref.split_text_into_chunks two ways:
tests/test_chunker_equiv.py (hypothesis property test of split_chunks_one
plus an end-to-end Spark-UDF run over the t1 extraction), and the driver
oracle (chunks_modern vs golden.ensure_chunks_golden parquet).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_WS = re.compile(r"\s+")
_NL3 = re.compile(r"\n{3,}")
_NON_ASCII = re.compile(r"[^\x00-\x7F]+")
_PARA = re.compile(r"\n\s*\n")


def split_chunks_one(text: str, chunk_size: int = 200, overlap: int = 50) -> list[str]:
    if not text:
        return []
    text = _NON_ASCII.sub("", _NL3.sub("\n\n", _WS.sub(" ", text))).strip()
    out: list[str] = []
    for para in _PARA.split(text):
        if len(para) <= chunk_size:
            out.append(para)
            continue
        cur: list[str] = []
        cur_len = 0
        for word in para.split():
            wl = len(word) + 1
            if cur_len + wl > chunk_size and cur:
                out.append(" ".join(cur))
                keep = min(overlap, len(cur))
                cur = cur[-keep:]
                cur_len = sum(len(w) + 1 for w in cur)
            cur.append(word)
            cur_len += wl
        if cur:
            out.append(" ".join(cur))
    return out


@pandas_udf(ArrayType(StringType()))
def split_chunks_udf(text: pd.Series) -> pd.Series:
    return pd.Series([split_chunks_one(t or "") for t in text.to_numpy()])
