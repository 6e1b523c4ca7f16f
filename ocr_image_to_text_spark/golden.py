"""Golden fixture generation: pure-Python oracle → parquet.

The goldens are produced exclusively by :mod:`pyref` (the cited restatement
of the reference semantics — never by the Spark pipeline), so comparing the
Spark output against them is a genuine two-implementation equality check.
The driver's `oracle_sql()` reads these parquet files from DuckDB for the
extraction queries whose semantics (sequential scans, HTML parsing,
Python-`re` cleaning) are not faithfully expressible in ANSI SQL.

Int columns are int32 to byte-match Spark's IntegerType outputs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from . import pyref
from .transcripts import ensure_transcripts, tier_for_sf_dir, warehouse_dir

_I32 = pa.int32()

ROLLUP_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("kind", pa.string()),
    ("extracted_text", pa.string()),
    ("n_blocks_kept", _I32),
    ("n_blocks_dropped", _I32),
    ("chars_in", _I32),
    ("chars_out", _I32),
    ("table_flag", pa.bool_()),
])

SPANS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("span_idx", _I32),
    ("span_start", _I32),
    ("span_end", _I32),
    ("text", pa.string()),
])

BOXES_VARIANT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("extracted_text", pa.string()),
])


OVERLAP_GOLD_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("n_boxes", _I32),
    ("n_overlap_pairs", _I32),
    ("max_iou_x1e6", pa.int64()),
])

LAYOUT_ANALYSIS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("total_elements", _I32),
    ("line_groups", _I32),
    ("n_columns", _I32),
    ("n_titles", _I32),
    ("n_bullets", _I32),
    ("n_numbered", _I32),
])


def golden_path(tier: str, name: str) -> str:
    return os.path.join(warehouse_dir(), "golden", f"{name}_{tier}.parquet")


def _write(path: str, rows: list[dict], schema: pa.Schema) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = {f: [r[f] for r in rows] for f in schema.names}
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pydict(cols, schema=schema), tmp, compression="zstd")
    os.replace(tmp, path)


def ensure_goldens(tier: str) -> dict[str, str]:
    """Generate (once) all golden tables for a tier; returns name → path."""
    paths = {
        "extract": golden_path(tier, "extract"),
        "spans": golden_path(tier, "spans"),
        "boxes_v1": golden_path(tier, "boxes_v1"),
        "boxes_v3": golden_path(tier, "boxes_v3"),
        "boxes_xycut": golden_path(tier, "boxes_xycut"),
        "stitch": golden_path(tier, "stitch"),
        "stitch_v1": golden_path(tier, "stitch_v1"),
        "flat": golden_path(tier, "flat"),
        "layout_analysis": golden_path(tier, "layout_analysis"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    import pyarrow.parquet as _pq

    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "text", "tool"])
    convs: dict[str, list[tuple[int, str]]] = {}
    rollup_rows, span_rows, v1_rows, v3_rows, flat_rows = [], [], [], [], []
    xycut_rows: list[dict] = []
    la_rows: list[dict] = []
    for conv_id, turn_idx, text, tool in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("text").to_pylist(),
        table.column("tool").to_pylist(),
    ):
        r = pyref.extract_turn(text, tool, variant="v2", geometry="easy")
        rollup_rows.append({
            "conv_id": conv_id, "turn_idx": turn_idx, "kind": r["kind"],
            "extracted_text": r["extracted_text"],
            "n_blocks_kept": r["n_blocks_kept"],
            "n_blocks_dropped": r["n_blocks_dropped"],
            "chars_in": r["chars_in"], "chars_out": r["chars_out"],
            "table_flag": r["table_flag"],
        })
        for i, (s, e, t) in enumerate(r["spans"]):
            span_rows.append({"conv_id": conv_id, "turn_idx": turn_idx,
                              "span_idx": i, "span_start": s, "span_end": e, "text": t})
        convs.setdefault(conv_id, []).append((turn_idx, r["extracted_text"]))
        if r["kind"] == "boxes":
            for variant, acc in (("v1", v1_rows), ("v3", v3_rows),
                                 ("xycut", xycut_rows)):
                rv = pyref.extract_turn(text, tool, variant=variant)
                acc.append({"conv_id": conv_id, "turn_idx": turn_idx,
                            "extracted_text": rv["extracted_text"]})
            # A5 flat concat over conf-filtered detections
            import json as _json

            payload = _json.loads(tool)
            boxes = payload.get("boxes") or []
            flat_rows.append({
                "conv_id": conv_id, "turn_idx": turn_idx,
                "flat_text": pyref.flat_concat(pyref.conf_filter(boxes))})
            # precision-layout structure summary (naive twin)
            la = pyref.layout_analysis(boxes, payload.get("h", 0))
            la_rows.append({"conv_id": conv_id, "turn_idx": turn_idx, **la})

    _write(paths["extract"], rollup_rows, ROLLUP_SCHEMA)
    _write(paths["spans"], span_rows, SPANS_SCHEMA)
    _write(paths["boxes_v1"], v1_rows, BOXES_VARIANT_SCHEMA)
    _write(paths["boxes_v3"], v3_rows, BOXES_VARIANT_SCHEMA)
    _write(paths["boxes_xycut"], xycut_rows, BOXES_VARIANT_SCHEMA)
    _write(paths["layout_analysis"], la_rows, LAYOUT_ANALYSIS_SCHEMA)

    _write(paths["flat"], flat_rows, pa.schema([
        ("conv_id", pa.string()), ("turn_idx", _I32), ("flat_text", pa.string())]))

    # X11 conversation stitching goldens (v2: ocr_app/ui/cli.py:163-168;
    # v1: src/core/ocr_engine.py:128)
    stitch_schema = pa.schema([("conv_id", pa.string()), ("stitched", pa.string())])
    stitch_rows = [
        {"conv_id": cid,
         "stitched": pyref.stitch_pages_v2([t for _, t in sorted(turns)])}
        for cid, turns in sorted(convs.items())
    ]
    _write(paths["stitch"], stitch_rows, stitch_schema)
    stitch_v1_rows = [
        {"conv_id": cid,
         "stitched": pyref.stitch_pages_v1([t for _, t in sorted(turns)])}
        for cid, turns in sorted(convs.items())
    ]
    _write(paths["stitch_v1"], stitch_v1_rows, stitch_schema)
    return paths


def ensure_goldens_for_sf_dir(sf_dir: str) -> dict[str, str]:
    return ensure_goldens(tier_for_sf_dir(sf_dir))


CHUNKS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("chunk_idx", _I32),
    ("chunk", pa.string()),
])


def ensure_chunks_golden(sf_dir: str) -> str:
    """X3 golden: pyref.split_text_into_chunks over each non-empty per-turn
    extraction (ocr_app/utils/text_utils.py:36-90 semantics, incl. the
    re-cleaning prelude). Derived from the extract golden so the chunk
    oracle and the rollup oracle share one pyref extraction pass."""
    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "chunks")
    if os.path.exists(path):
        return path
    extract_path = ensure_goldens(tier)["extract"]
    table = _pq.read_table(extract_path,
                           columns=["conv_id", "turn_idx", "extracted_text"])
    rows = []
    for conv_id, turn_idx, text in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("extracted_text").to_pylist(),
    ):
        if not text:
            continue
        for i, chunk in enumerate(pyref.split_text_into_chunks(text)):
            rows.append({"conv_id": conv_id, "turn_idx": turn_idx,
                         "chunk_idx": i, "chunk": chunk})
    _write(path, rows, CHUNKS_SCHEMA)
    return path


def ensure_sim_x16_golden(sf_dir: str) -> str:
    """X16 golden: pyref difflib ratio between the v2 and v1 layout of
    each boxes turn (the engine-vs-engine accuracy analog of
    src/ocr_benchmark.py:44-83's output-vs-ground-truth scoring)."""
    import math

    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "sim_x16")
    if os.path.exists(path):
        return path
    paths = ensure_goldens(tier)
    v2 = _pq.read_table(paths["extract"],
                        columns=["conv_id", "turn_idx", "kind", "extracted_text"])
    v2_map = {}
    for cid, tix, kind, text in zip(v2.column("conv_id").to_pylist(),
                                    v2.column("turn_idx").to_pylist(),
                                    v2.column("kind").to_pylist(),
                                    v2.column("extracted_text").to_pylist()):
        if kind == "boxes":
            v2_map[(cid, tix)] = text
    v1 = _pq.read_table(paths["boxes_v1"],
                        columns=["conv_id", "turn_idx", "extracted_text"])
    rows = []
    for cid, tix, t1 in zip(v1.column("conv_id").to_pylist(),
                            v1.column("turn_idx").to_pylist(),
                            v1.column("extracted_text").to_pylist()):
        r = pyref.similarity_ratio(v2_map[(cid, tix)], t1)
        rows.append({"conv_id": cid, "turn_idx": tix,
                     "ratio_x1e9": int(math.floor(r * 1e9 + 0.5))})
    _write(path, rows, pa.schema([
        ("conv_id", pa.string()), ("turn_idx", _I32),
        ("ratio_x1e9", pa.int64())]))
    return path


def ensure_media_golden(sf_dir: str) -> dict[str, str]:
    """Multimodal goldens: numpy-free mmref decode+features over the
    deterministic media rows (two-implementation check of the real
    BMP/PPM/WAV codecs). Doubles are scaled to ints per the repo's
    oracle column convention."""
    import math

    from . import mmref
    from .multimodal import MEDIA_N_BY_TIER, synthetic_media_rows

    tier = tier_for_sf_dir(sf_dir)
    paths = {"media_image": golden_path(tier, "media_image"),
             "media_audio": golden_path(tier, "media_audio"),
             "media_video": golden_path(tier, "media_video")}
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    rows = synthetic_media_rows(MEDIA_N_BY_TIER.get(tier, 60))
    img_rows, aud_rows, vid_rows = [], [], []
    for mid, kind, payload, (w, h, dur, _codec) in rows:
        if kind == "image":
            f = mmref.image_features_py(bytes(payload))
            img_rows.append({
                "media_id": mid, "width": f["width"], "height": f["height"],
                "mean_r_x1e6": int(math.floor(f["mean_r"] * 1e6 + 0.5)),
                "mean_g_x1e6": int(math.floor(f["mean_g"] * 1e6 + 0.5)),
                "mean_b_x1e6": int(math.floor(f["mean_b"] * 1e6 + 0.5)),
                "phash": f["phash"]})
        elif kind == "audio":
            f = mmref.audio_features_py(bytes(payload))
            aud_rows.append({
                "media_id": mid, "duration_ms": dur,
                "rms_x1e9": int(math.floor(f["rms"] * 1e9 + 0.5)),
                "zero_cross": f["zero_cross"]})
        else:  # video: per-container-frame features via the stdlib AVI twin
            for f in mmref.video_frame_features_py(bytes(payload)):
                vid_rows.append({
                    "media_id": mid, "frame_idx": f["frame_idx"],
                    "ts_ms": f["ts_ms"],
                    "mean_r_x1e6": int(math.floor(f["mean_r"] * 1e6 + 0.5)),
                    "mean_g_x1e6": int(math.floor(f["mean_g"] * 1e6 + 0.5)),
                    "mean_b_x1e6": int(math.floor(f["mean_b"] * 1e6 + 0.5)),
                    "phash": f["phash"]})
    _write(paths["media_image"], img_rows, pa.schema([
        ("media_id", pa.int64()), ("width", _I32), ("height", _I32),
        ("mean_r_x1e6", pa.int64()), ("mean_g_x1e6", pa.int64()),
        ("mean_b_x1e6", pa.int64()), ("phash", pa.int64())]))
    _write(paths["media_audio"], aud_rows, pa.schema([
        ("media_id", pa.int64()), ("duration_ms", _I32),
        ("rms_x1e9", pa.int64()), ("zero_cross", pa.int64())]))
    _write(paths["media_video"], vid_rows, pa.schema([
        ("media_id", pa.int64()), ("frame_idx", _I32), ("ts_ms", _I32),
        ("mean_r_x1e6", pa.int64()), ("mean_g_x1e6", pa.int64()),
        ("mean_b_x1e6", pa.int64()), ("phash", pa.int64())]))
    return paths


RAG_NO_TEXT = "No text available to answer the question."
RAG_NOT_FOUND = "Couldn't find relevant information to answer the question."


def ensure_rag_golden(sf_dir: str, query: str) -> str:
    """End-to-end fallback-RAG golden: the exact _fallback_qa composition
    (ocr_app/rag/rag_processor.py:114-165) — X3 chunks → X5 keyword top-k
    (keyword_search incl. normalization + 0.1 fallback and the
    argsort[-k:][::-1] tie order) → X14 answer over the best chunk,
    confidence = the best chunk's normalized score."""
    import math

    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "rag")
    if os.path.exists(path):
        return path
    t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        chunks = pyref.split_text_into_chunks(text or "")
        if not chunks:
            rows.append({"doc_id": doc_id, "answer": RAG_NO_TEXT,
                         "conf_x1e6": 0})
            continue
        top = pyref.keyword_search(query, chunks, k=5)
        if not top:
            rows.append({"doc_id": doc_id, "answer": RAG_NOT_FOUND,
                         "conf_x1e6": 0})
            continue
        best_chunk, best_score = top[0]
        answer = pyref.extract_answer_from_context(query, best_chunk)
        rows.append({"doc_id": doc_id, "answer": answer,
                     "conf_x1e6": int(math.floor(best_score * 1e6 + 0.5))})
    _write(path, rows, pa.schema([
        ("doc_id", pa.int64()), ("answer", pa.string()),
        ("conf_x1e6", pa.int64())]))
    return path


AVG_CONF_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("avg_conf_x1e9", pa.int64()),
])


ANGLE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", _I32),
    ("theta_mode", _I32),
    ("skew_deg", _I32),
    ("rotation", _I32),
    ("n_lines", _I32),
])


def ensure_overlap_golden(sf_dir: str) -> str:
    """Dilated box-overlap golden: per boxes turn, pair count and max
    dilated IoU (pyref.box_overlap_stats — the naive double loop)."""
    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "overlap")
    if os.path.exists(path):
        return path
    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "text", "tool"])
    rows = []
    for conv_id, turn_idx, text, tool in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("text").to_pylist(),
        table.column("tool").to_pylist(),
    ):
        if pyref.classify_kind(text, tool) != "boxes":
            continue
        r = pyref.box_overlap_stats(tool)
        if r is None:
            continue  # empty payload → no geometry
        n_boxes, n_pairs, max_iou = r
        rows.append({"conv_id": conv_id, "turn_idx": turn_idx,
                     "n_boxes": n_boxes, "n_overlap_pairs": n_pairs,
                     "max_iou_x1e6": max_iou})
    _write(path, rows, OVERLAP_GOLD_SCHEMA)
    return path


def ensure_angle_golden(sf_dir: str) -> str:
    """A14 golden: histogram-mode orientation per boxes turn (pyref)."""
    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "angle")
    if os.path.exists(path):
        return path
    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "text", "tool"])
    rows = []
    for conv_id, turn_idx, text, tool in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("text").to_pylist(),
        table.column("tool").to_pylist(),
    ):
        if pyref.classify_kind(text, tool) != "boxes":
            continue
        r = pyref.angle_mode(tool)
        if r is None:
            continue  # no multi-token line → no orientation evidence
        theta_mode, skew_deg, rotation, n_lines = r
        rows.append({"conv_id": conv_id, "turn_idx": turn_idx,
                     "theta_mode": theta_mode, "skew_deg": skew_deg,
                     "rotation": rotation, "n_lines": n_lines})
    _write(path, rows, ANGLE_SCHEMA)
    return path


def ensure_avg_conf_golden(sf_dir: str) -> str:
    """A9 golden: mean kept-token confidence per boxes turn (pyref)."""
    import json
    import math

    import pyarrow.parquet as _pq

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "avg_conf")
    if os.path.exists(path):
        return path
    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "text", "tool"])
    rows = []
    for conv_id, turn_idx, text, tool in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("text").to_pylist(),
        table.column("tool").to_pylist(),
    ):
        if pyref.classify_kind(text, tool) != "boxes":
            continue
        boxes = (json.loads(tool).get("boxes") or [])
        avg = pyref.avg_confidence(boxes)  # 0.0 when nothing kept (A9)
        rows.append({"conv_id": conv_id, "turn_idx": turn_idx,
                     "avg_conf_x1e9": int(math.floor(avg * 1e9 + 0.5))})
    _write(path, rows, AVG_CONF_SCHEMA)
    return path


LATENCY_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("n_user", pa.int64()),
    ("n_assistant", pa.int64()),
    ("n_pairs", pa.int64()),
    ("mean_latency_ms", pa.int64()),
    ("max_latency_ms", pa.int64()),
])


def ensure_latency_golden(sf_dir: str) -> str:
    """Turn-latency golden: per conversation, assistant-after-user
    response latencies from the transcript `ts` column — a plain-Python
    sequential pass over turn_idx order (the independent restatement of
    the Spark lag-window computation)."""
    import datetime as _dt
    import math

    import pyarrow.parquet as _pq

    _epoch = _dt.datetime(1970, 1, 1)

    def _ms(t):
        # integer epoch-micros floored to ms per OPERAND (mirrors the
        # engine's unix_micros//1000; any whole-ms epoch/tz offset
        # cancels in the subtraction). Normalize tz-aware timestamps to
        # naive UTC so the subtraction against the naive epoch is valid.
        if t.tzinfo is not None:
            t = t.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        td = t - _epoch
        us = (td.days * 86_400_000_000 + td.seconds * 1_000_000
              + td.microseconds)
        return us // 1000

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "latency")
    if os.path.exists(path):
        return path
    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "role", "ts"])
    convs: dict = {}
    for conv_id, turn_idx, role, ts in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("role").to_pylist(),
        table.column("ts").to_pylist(),
    ):
        convs.setdefault(conv_id, []).append((turn_idx, role, ts))
    rows = []
    for conv_id, turns in convs.items():
        turns.sort()
        lats = []
        for (_, pr, pts), (_, r, ts) in zip(turns, turns[1:]):
            if pr == "user" and r == "assistant":
                lats.append(_ms(ts) - _ms(pts))
        rows.append({
            "conv_id": conv_id,
            "n_turns": len(turns),
            "n_user": sum(1 for _, r, _t in turns if r == "user"),
            "n_assistant": sum(1 for _, r, _t in turns if r == "assistant"),
            "n_pairs": len(lats),
            "mean_latency_ms": (math.floor(sum(lats) / len(lats))
                                if lats else 0),
            "max_latency_ms": max(lats) if lats else 0,
        })
    _write(path, rows, LATENCY_SCHEMA)
    return path


LATENCY_PAIRS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("pair_idx", pa.int64()),
    ("lat_ms", pa.int64()),
])


def ensure_latency_pairs_golden(sf_dir: str) -> str:
    """Raw assistant-after-user latency PAIRS (one row per pair, in
    turn order) — the input table for the corpus-level percentile
    oracle: DuckDB's quantile_cont over these rows is the independent
    twin of Spark's exact `percentile` aggregate."""
    import datetime as _dt

    import pyarrow.parquet as _pq

    _epoch = _dt.datetime(1970, 1, 1)

    def _ms(t):
        if t.tzinfo is not None:
            t = t.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        td = t - _epoch
        return (td.days * 86_400_000_000 + td.seconds * 1_000_000
                + td.microseconds) // 1000

    tier = tier_for_sf_dir(sf_dir)
    path = golden_path(tier, "latency_pairs")
    if os.path.exists(path):
        return path
    tpath = ensure_transcripts(tier)
    table = _pq.read_table(tpath, columns=["conv_id", "turn_idx", "role", "ts"])
    convs: dict = {}
    for conv_id, turn_idx, role, ts in zip(
        table.column("conv_id").to_pylist(),
        table.column("turn_idx").to_pylist(),
        table.column("role").to_pylist(),
        table.column("ts").to_pylist(),
    ):
        convs.setdefault(conv_id, []).append((turn_idx, role, ts))
    rows = []
    for conv_id, turns in convs.items():
        turns.sort()
        i = 0
        for (_, pr, pts), (_, r, ts) in zip(turns, turns[1:]):
            if pr == "user" and r == "assistant":
                rows.append({"conv_id": conv_id, "pair_idx": i,
                             "lat_ms": _ms(ts) - _ms(pts)})
                i += 1
    _write(path, rows, LATENCY_PAIRS_SCHEMA)
    return path
