"""Synthesize the sf1 corpus tier (10× sf0.1) for the heavy-family
shuffle-volume scaling exhibit (VERDICT r3 next-#8).

/root/testdata is read-only and ships no sf1, so this generator writes
warehouse/sf1/{documents,embeddings}.parquet with the SAME shape and
statistics as the driver's sf0.1 tables (profiled 2026-08-18):

  documents(doc_id bigint, text varchar, lang varchar, source varchar,
            n_chars bigint) — 31-word vocab, ~297-char mean,
            lang ∝ {en: 2, zh/es/fr/de: 1 each}, 20 sources,
            ~0.16% exact duplicates (8 per 5k).
  embeddings(vec_id bigint, embedding float[64], label int) —
            10 Gaussian cluster centers, unit-scale coords.

Deterministic (seed fixed, no Date.now anywhere); pure
pyarrow — no Spark needed. Usage:  python tools/gen_sf1_corpus.py [n_docs]
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "warehouse", "sf1")

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "en", "zh", "es", "fr", "de"]
DIM, N_LABELS = 64, 10
SEED = 1042


def gen_documents(n_docs: int) -> pa.Table:
    rng = random.Random(f"docs:{SEED}")
    rows = []
    for i in range(n_docs):
        n_words = 8 + int(rng.expovariate(1 / 45.0))
        words = rng.choices(VOCAB, k=min(n_words, 110))
        text = " ".join(words)
        rows.append((i, text, rng.choice(LANGS), f"src{i % 20}", len(text)))
    # exact duplicates at the sf0.1 rate (8 per 5k docs): copy text of an
    # earlier doc into a later one, ids untouched
    for k in range(max(n_docs * 8 // 5000, 1)):
        a = rng.randrange(0, n_docs // 2)
        b = rng.randrange(n_docs // 2, n_docs)
        ra, rb = rows[a], rows[b]
        rows[b] = (rb[0], ra[1], rb[2], rb[3], len(ra[1]))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })


def gen_embeddings(n_vecs: int) -> pa.Table:
    rs = np.random.RandomState(SEED)
    centers = rs.normal(0.0, 1.0, size=(N_LABELS, DIM))
    labels = rs.randint(0, N_LABELS, size=n_vecs)
    vecs = centers[labels] + rs.normal(0.0, 0.35, size=(n_vecs, DIM))
    emb = pa.array(vecs.astype(np.float32).tolist(),
                   pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": emb,
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def gen_events(n_events: int) -> pa.Table:
    """events(event_id bigint, ts timestamp, user_id bigint,
    event_type varchar, value double, props varchar) — same shape and
    statistics as the driver's sf0.1 events (profiled 2026-08-18):
    30-day Jan-2024 window, uniform event types, ~67 events/user
    (users scale with rows so per-user session density is preserved),
    value ~ Exp(mean 50), props = {"k": int}."""
    rng = random.Random(f"events:{SEED}")
    n_users = max(n_events * 1500 // 100_000, 1)
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros
    span_us = 30 * 24 * 3600 * 1_000_000
    types = ["click", "error", "purchase", "signup", "view"]
    ts, uid, et, val, props = [], [], [], [], []
    for _ in range(n_events):
        ts.append(base_us + rng.randrange(span_us))
        uid.append(rng.randrange(n_users))
        et.append(rng.choice(types))
        val.append(round(min(rng.expovariate(1 / 50.0), 560.0), 2))
        props.append('{"k": %d}' % rng.randrange(100))
    return pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_vecs = n_docs * 2000 // 5000  # sf0.1 ratio: 5k docs / 2k vecs
    n_events = n_docs * 100_000 // 5000  # sf0.1 ratio: 5k docs / 100k events
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(gen_documents(n_docs),
                   os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs),
                   os.path.join(OUT, "embeddings.parquet"))
    pq.write_table(gen_events(n_events),
                   os.path.join(OUT, "events.parquet"))
    print(f"wrote {OUT}: documents={n_docs} embeddings={n_vecs} "
          f"events={n_events}")


if __name__ == "__main__":
    main()
