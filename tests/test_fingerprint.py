"""Winnowing fingerprint: the three spec restatements must agree.

fingerprint_spec (pure-Python ints) is the arbiter; the numpy kernel
(_fp_one, production) and the generated DuckDB twin must match it
value-for-value — including the 2^64 Horner wrap and the 63-bit mask,
which are the two places a restatement can silently diverge.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_image_to_text_spark.operators.fingerprint import (
    _fp_one,
    fingerprint_spec,
    fingerprint_sql_duckdb,
)

CASES = [
    "",                                   # empty -> single zero fingerprint
    "a",                                  # n < k: one short gram
    "abcdef",                             # n = k-1
    "abcdefg",                            # n = k: exactly one gram
    "abcdefgh",                           # two grams, still < w windows
    "abcdefghij",                         # n-k+1 == w: one full window
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaaaaaa",               # degenerate: all grams equal
    "ab" * 40,                            # periodic
    "héllo wörld ünicode — çafé ß",       # non-ASCII code points
    "中文文本测试中文文本测试",              # CJK (code points > 2^15)
    "emoji 😀😃😄 astral plane",           # astral (code points > 2^16)
    "x" * 3 + "\x00" + "y" * 10,          # NUL inside text
]


def test_numpy_kernel_equals_spec():
    for t in CASES:
        assert _fp_one(t) == fingerprint_spec(t), repr(t)


def test_duckdb_twin_equals_spec():
    pdf = pd.DataFrame({"doc_id": range(len(CASES)), "text": CASES})
    con = duckdb.connect()
    con.register("documents", pdf)
    got = {r[0]: (r[1], r[2], r[3])
           for r in con.sql(fingerprint_sql_duckdb()).fetchall()}
    for i, t in enumerate(CASES):
        assert got[i] == fingerprint_spec(t), repr(t)


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_fuzz_numpy_equals_spec(t):
    # utf-32 encoding rejects surrogates just like the spec's ord() path
    # never sees them from real parquet strings; skip unpaired surrogates.
    try:
        t.encode("utf-32-le")
    except UnicodeEncodeError:
        return
    assert _fp_one(t) == fingerprint_spec(t)
