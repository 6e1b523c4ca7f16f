"""SemDeDup prune and ExactSubstr dup-gram stats.

The driver oracle (DuckDB twins at sf0.01) proves corpus-level value
equality; these tests pin the algorithmic semantics on small synthetic
inputs against brute-force pure-Python restatements: the keep-hard
ordering rule, the non-iterative earlier-member removal check, threshold
edge behavior, and exact gram document-frequency accounting.
"""

from __future__ import annotations

import math
import random

from ocr_image_to_text_spark.dedup import dup_gram_stats
from ocr_image_to_text_spark.similarity import semdedup_prune


# ---------------------------------------------------------------- semdedup

def _semdedup_bruteforce(vecs, n_cells, threshold):
    """Pure-Python restatement: same rounded folds and ordering rules."""
    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 9)

    cents = {i: vecs[i] for i in range(n_cells) if i in vecs}
    asn = {}
    for vid, e in vecs.items():
        d, cid = min((l2(e, ce), c) for c, ce in cents.items())
        asn[vid] = (cid, d)
    out = {}
    for vid, e in vecs.items():
        cell, dv = asn[vid]
        nrm = math.sqrt(dot(e, e))
        cand = []
        for pid, pe in vecs.items():
            if pid == vid or asn[pid][0] != cell:
                continue
            dp = asn[pid][1]
            if dp > dv or (dp == dv and pid < vid):
                cos = round(dot(e, pe) / (nrm * math.sqrt(dot(pe, pe))), 9)
                if cos >= threshold:
                    cand.append((-cos, pid))
        if cand:
            nc, p = min(cand)
            out[vid] = (cell, 0, p, math.floor(-nc * 1e9 + 0.5))
        else:
            out[vid] = (cell, 1, None, None)
    return out


def _emb_df(spark, vecs, dim):
    rows = [(vid, [float(x) for x in e]) for vid, e in sorted(vecs.items())]
    return spark.createDataFrame(rows, f"vec_id long, embedding array<float>")


def test_semdedup_matches_bruteforce_random(spark):
    rng = random.Random(7)
    dim = 8
    vecs = {}
    # 3 anchor directions + jittered near-dups so clusters and removals
    # both occur; float32 round-trip via the DataFrame matches the engine.
    anchors = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(3)]
    for vid in range(24):
        a = anchors[vid % 3]
        vecs[vid] = [x + rng.uniform(-0.05, 0.05) for x in a]
    import numpy as np

    vecs = {vid: [float(np.float32(x)) for x in e] for vid, e in vecs.items()}
    want = _semdedup_bruteforce(vecs, n_cells=4, threshold=0.9)
    got = {r.vec_id: (r.cell, r.keep, r.dup_of, r.cos_x1e9)
           for r in semdedup_prune(_emb_df(spark, vecs, dim), n_cells=4,
                                   threshold=0.9, dim=dim).collect()}
    assert got == want


def test_semdedup_keeps_far_from_centroid(spark):
    """Two identical-direction vectors in one cell: the one FARTHER from
    the centroid is kept (paper's keep-hard rule), the nearer removed."""
    dim = 4
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],      # centroid (cell 0)
        1: [0.9, 0.0, 0.0, 0.0],      # near centroid — removed
        2: [3.0, 0.0, 0.0, 0.0],      # far from centroid — kept, ordered first
    }
    got = {r.vec_id: (r.keep, r.dup_of)
           for r in semdedup_prune(_emb_df(spark, vecs, dim), n_cells=1,
                                   threshold=0.99, dim=dim).collect()}
    # order: v2 (d=4.0) → v1 (d≈0.01) → v0 (d=0). v1's only earlier
    # partner is v2; v0 ties cos=1.0 against both, dup_of = min partner.
    assert got == {2: (1, None), 1: (0, 2), 0: (0, 1)}


def test_semdedup_threshold_excludes_orthogonal(spark):
    dim = 4
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    got = semdedup_prune(_emb_df(spark, vecs, dim), n_cells=1,
                         threshold=0.5, dim=dim).collect()
    assert all(r.keep == 1 and r.dup_of is None for r in got)


# ----------------------------------------------------------- dup_gram_stats

def _grams(text, width=3):
    ws = text.strip().split()
    n = max(len(ws) - width + 1, 1)
    return {" ".join(ws[i:i + width]) for i in range(n)}


def _dup_bruteforce(docs, width=3):
    grams = {d: _grams(t, width) for d, t in docs.items()}
    df = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    out = {}
    for d, gs in grams.items():
        dup = sum(1 for g in gs if df[g] > 1)
        out[d] = (len(gs), dup, 1000 * dup // len(gs))
    return out


def test_dup_gram_stats_known_overlap(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox sleeps all day long here",
        3: "completely unrelated text with no shared grams at all",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac_x1000)
           for r in dup_gram_stats(df).collect()}
    assert got == _dup_bruteforce(docs)
    # docs 1 and 2 share exactly the grams of "the quick brown fox"
    assert got[1][1] == 2 and got[2][1] == 2
    assert got[3][1] == 0


def test_dup_gram_stats_short_doc_whole_text_gram(spark):
    """Docs shorter than the gram width collapse to one whole-text gram
    (shingle_array's greatest(...,1) floor) — identical short docs are
    therefore counted as duplicated."""
    docs = {1: "hi there", 2: "hi there", 3: "bye"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in dup_gram_stats(df).collect()}
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 0)}


def test_dup_gram_stats_random_vs_bruteforce(spark):
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = {d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
            for d in range(40)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac_x1000)
           for r in dup_gram_stats(df).collect()}
    assert got == _dup_bruteforce(docs)


# ---------------------------------------------------------------- c4 spans

def _c4_bruteforce(docs):
    """Pure-Python restatement of dedup.c4_span_stats semantics."""
    import re
    from collections import defaultdict

    spans = {}  # (doc_id, idx) -> norm span key
    for doc_id, text in docs:
        sents = re.split(r"(?<=[.!?])\s+", text)
        for i in range(len(sents) - 2):
            norm = re.sub(r"[^a-z0-9]+", " ",
                          " ".join(sents[i:i + 3]).lower()).strip()
            spans[(doc_id, i)] = norm
    by_key = defaultdict(list)
    for occ, k in spans.items():
        by_key[k].append(occ)
    out = {d: [0, 0, 0] for d, _ in docs}  # n_spans, n_dup, n_removed
    for (doc_id, i), k in spans.items():
        occs = by_key[k]
        out[doc_id][0] += 1
        if len(occs) > 1:
            out[doc_id][1] += 1
            if (doc_id, i) != min(occs):
                out[doc_id][2] += 1
    return {d: tuple(v) for d, v in out.items()}


def test_c4_spans_matches_bruteforce(spark, tmp_path):
    """C4 3-sentence-span dedup vs a plain-Python restatement: cross-doc
    duplicate paragraph (lower doc_id keeps), within-doc repetition,
    punctuation-only normalization collisions, and short docs."""
    import ocr_image_to_text_spark.queries as q

    para = "First point here. Second point there. Third point too."
    docs = [
        (0, para + " And a tail sentence."),
        (1, para),                                   # dup of doc 0's span 0
        (2, "Too short. Only two."),                 # no spans
        (3, ("Loop one. Loop two. Loop three. " * 2).strip()),  # in-doc dup
        (4, "FIRST POINT, here! Second point; there? Third POINT too."),
        (5, ""),
    ]
    df = spark.createDataFrame(
        [(d, t, "en", "s", 0) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.n_removed)
           for r in q.dedup_c4_spans(spark, str(tmp_path)).collect()}

    assert got == _c4_bruteforce(docs)
    # the fixture must actually exercise each rule
    assert got[2] == (0, 0, 0) and got[5] == (0, 0, 0)
    assert got[0][1] >= 1 and got[0][2] == 0, "doc 0 keeps the shared span"
    assert got[1][2] >= 1, "doc 1 loses the shared span"
    assert got[3][2] >= 1, "within-doc repetition removes later occurrences"
