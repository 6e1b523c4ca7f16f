"""Winnowing fingerprint (Schleimer et al., SIGMOD'03) as an Arrow UDF.

One SPEC, three restatements that must agree value-for-value:
  * `fingerprint_spec` — pure-Python reference (plain ints, the arbiter);
  * `fingerprint_udf`  — the production numpy kernel (batched, no
    per-character Python calls — the round-2 kernel did one hashlib.md5
    round-trip per character position, the heaviest per-byte cost in the
    suite; VERDICT r2 #4);
  * `fingerprint_sql_duckdb` — the generated DuckDB oracle twin.

Spec (k=7 char-grams, w=4 windows, B=1000003):
  * code points C of the text; n = |C|; hi = max(n-k+1, 1);
    gram_i = C[i:i+k] (all full-k when n >= k; the whole text when n < k;
    empty when n == 0).
  * gram hash = Horner fold  h <- (h*B + c) mod 2^64  over the gram's
    code points, then masked to 63 bits (mod 2^63) so the value is an
    order-preserving signed BIGINT in both engines. The mask commutes
    with the 2^64 wrap (2^64 is a multiple of 2^63), so numpy's native
    uint64 wraparound needs no intermediate masking.
  * window minima over w consecutive gram hashes (single window of all
    grams when there are fewer than w); distinct set -> (count, min, max).

The rolling hash replaces the round-2 md5-hex spec; the DuckDB twin is
generated here from the same constants, so the spec lives in ONE place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

FP_K = 7
FP_W = 4
FP_B = 1000003
_M64 = 1 << 64
_MASK63 = (1 << 63) - 1

FP_SCHEMA = StructType([
    StructField("n_fp", LongType()),
    StructField("min_fp", LongType()),
    StructField("max_fp", LongType()),
])


def fingerprint_spec(text: str, k: int = FP_K, w: int = FP_W,
                     b: int = FP_B) -> tuple[int, int, int]:
    """Pure-Python arbiter — plain-int restatement of the spec."""
    cps = [ord(c) for c in text]
    n = len(cps)
    hi = max(n - k + 1, 1)
    grams = []
    for i in range(hi):
        h = 0
        for c in cps[i:i + k]:
            h = (h * b + c) % _M64
        grams.append(h & _MASK63)
    hj = max(len(grams) - w + 1, 1)
    fps = {min(grams[j:j + w]) for j in range(hj)}
    return len(fps), min(fps), max(fps)


def _fp_one(t: str) -> tuple[int, int, int]:
    """Vectorized kernel: one utf-32 decode + k vector Horner steps per
    doc — no per-character Python-level hashing."""
    c = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = c.size
    b = np.uint64(FP_B)
    if n >= FP_K:
        m = n - FP_K + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(FP_K):
            h = h * b + c[j:j + m]          # uint64 wrap == mod 2^64
    else:
        # n < k (at most 6 chars): plain-int Horner — numpy SCALAR uint64
        # overflow warns (arrays don't), and this path is negligible.
        acc = 0
        for cc in c.tolist():
            acc = (acc * FP_B + cc) % _M64
        h = np.array([acc], dtype=np.uint64)
    h &= np.uint64(_MASK63)
    if h.size >= FP_W:
        wins = np.lib.stride_tricks.sliding_window_view(h, FP_W).min(axis=1)
    else:
        wins = h.min(keepdims=True)
    fps = np.unique(wins)                    # sorted distinct
    return len(fps), int(fps[0]), int(fps[-1])


def _fp_set(t: str) -> list[int]:
    """Full distinct fingerprint set (same kernel, full output) — feeds
    the MOSS-style shared-fingerprint pair query."""
    c = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = c.size
    b = np.uint64(FP_B)
    if n >= FP_K:
        m = n - FP_K + 1
        h = np.zeros(m, dtype=np.uint64)
        for j in range(FP_K):
            h = h * b + c[j:j + m]
    else:
        acc = 0
        for cc in c.tolist():
            acc = (acc * FP_B + cc) % _M64
        h = np.array([acc], dtype=np.uint64)
    h &= np.uint64(_MASK63)
    if h.size >= FP_W:
        wins = np.lib.stride_tricks.sliding_window_view(h, FP_W).min(axis=1)
    else:
        wins = h.min(keepdims=True)
    return [int(v) for v in np.unique(wins)]


@pandas_udf(FP_SCHEMA)
def fingerprint_udf(text: pd.Series) -> pd.DataFrame:
    rows = [_fp_one(t or "") for t in text.to_numpy()]
    return pd.DataFrame(rows, columns=["n_fp", "min_fp", "max_fp"])


@pandas_udf(ArrayType(LongType()))
def fingerprint_set_udf(text: pd.Series) -> pd.Series:
    return pd.Series([_fp_set(t if isinstance(t, str) else "")
                      for t in text.to_numpy()])


def fingerprint_sql_duckdb(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """Generate the DuckDB twin from the same spec constants."""
    # Horner fold, one CASE per gram position so short texts (n < k)
    # reuse the same expression (steps beyond the text keep h unchanged).
    h = "0::HUGEINT"
    for j in range(FP_K):
        h = (f"(CASE WHEN i + {j} <= n THEN "
             f"({h} * {FP_B} + unicode(substr({text_col}, cast(i + {j} as int), 1)))"
             f" % 18446744073709551616::HUGEINT ELSE {h} END)")
    gram = f"cast({h} % 9223372036854775808::HUGEINT as bigint)"
    return f"""
        WITH g AS (SELECT {id_col}, {text_col}, length({text_col}) n FROM {table}),
        hs AS (SELECT {id_col},
                list_transform(generate_series(1, greatest(n - {FP_K - 1}, 1)),
                               i -> {gram}) grams
            FROM g),
        wn AS (SELECT {id_col},
                list_distinct(list_transform(
                    generate_series(1, greatest(len(grams) - {FP_W - 1}, 1)),
                    j -> list_aggregate(list_slice(grams, j, j + {FP_W - 1}), 'min'))) fps
            FROM hs)
        SELECT {id_col}, cast(len(fps) as bigint) n_fp,
               list_aggregate(fps, 'min') min_fp,
               list_aggregate(fps, 'max') max_fp
        FROM wn"""


def fingerprint_pairs_sql_duckdb(df_cap: int = 50, min_shared: int = 25,
                                 table: str = "documents") -> str:
    """DuckDB twin of the MOSS-style shared-fingerprint pair query:
    the same winnowing CTEs, unnested, df-capped, self-joined."""
    base = fingerprint_sql_duckdb(table=table)
    i = base.find("SELECT doc_id, cast(len(fps)")
    ctes = base[:i]
    return ctes + f"""
        , fp AS (SELECT doc_id, unnest(fps) f FROM wn),
        cap AS (SELECT f FROM fp GROUP BY f HAVING count(*) <= {df_cap}),
        fpc AS (SELECT fp.doc_id, fp.f FROM fp JOIN cap USING (f))
        SELECT cast(a.doc_id as bigint) doc_a,
               cast(b.doc_id as bigint) doc_b,
               cast(count(*) as bigint) n_shared_fp
        FROM fpc a JOIN fpc b ON a.f = b.f AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b HAVING count(*) >= {min_shared}"""
