"""Deterministic synthetic `transcripts` table generator (FIXTURES.md).

Schema per BASELINE.json `input_hint`::

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

Payload kinds (FIXTURES.md §2): `boxes` (serialized token-box JSON in
`tool`), `html` (fragment in `text`), `plain` (messy prose in `text`).
Everything is seeded (seed=42 convention); content mirrors the reference's
own test generators (tests/create_test_image.py:38-53,
test_precision_layout.py:54-111) so goldens exercise the same shapes.

Tiers (FIXTURES.md §5) are keyed off the testdata scale factor:
  sf0.001 → t1 smoke (50 convs), sf0.01 → t2 correctness (2,000 convs),
  sf0.1 → bench (20,000 convs + 3 skew convs of 5,000 turns).

Generation is pure Python + pyarrow (no Spark) so the DuckDB oracle and the
Spark pipeline read identical bytes.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH = _dt.datetime(2024, 1, 1)  # tz-naive; stored as timestamp[us]

WORDS = (
    "the quick brown fox jumps over lazy dog spark engine query table scan "
    "filter join merge sort window batch stream data row column value key "
    "order line text block page image layout token confidence cluster span "
    "result output input cache manifest partition shuffle skew salt hash "
    "document chunk entity keyword answer context sentence paragraph"
).split()

NAV_WORDS = "home about contact login signup pricing blog careers help terms privacy".split()

NON_ASCII_SNIPPETS = ["中文片段", "русский текст", "→≈±µ", " nbsp here", "日本語かな"]

ENTITY_SNIPPETS = [
    "meeting on 12/05/2023 at noon",
    "released 2023-11-02 officially",
    "Mar 5, 2021 was the date",
    "email me at a.b@c.de today",
    "call +1 (555) 123-4567 now",
    "call (555) 987-6543 later",
    "see https://example.com/x%20y for details",
    "docs at http://spark.apache.org/docs today",
]


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


# ---------------------------------------------------------------------------
# boxes payloads
# ---------------------------------------------------------------------------


def _box(x: float, y: float, w: float, h: float) -> list:
    return [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]


def _boxes_payload(rng: random.Random) -> str:
    """Random multi-line, multi-column token layout; array order shuffled."""
    h_img = rng.choice([400, 600, 800, 1200])
    boxes = []
    n_lines = rng.randint(1, 8)
    y = 30.0
    for _ in range(n_lines):
        n_tok = rng.randint(1, 6)
        x = 50.0
        for _ in range(n_tok):
            tok = rng.choice(WORDS)
            w = 12.0 * len(tok)
            jitter = rng.uniform(-3.0, 3.0)
            conf = rng.choice([0.05, 0.29, 0.3, 0.31] + [round(rng.uniform(0.4, 0.99), 2)] * 8)
            boxes.append([_box(x, y + jitter, w, 18.0), tok, conf])
            x += w + rng.uniform(10.0, 40.0)
        y += rng.uniform(24.0, 45.0)
    rng.shuffle(boxes)
    return json.dumps({"h": h_img, "w": 800, "boxes": boxes})


def _boxes_fixture(case: str) -> str:
    """The reference's own fixture shapes (FIXTURES.md §2a, citations there)."""
    if case == "simple_text":  # tests/create_test_image.py:38-41
        boxes = [[_box(50, 50, 160, 20), "Hello, World!", 0.95],
                 [_box(50, 80, 220, 20), "This is a test image.", 0.91]]
    elif case == "multiple_lines":  # tests/create_test_image.py:44-47
        boxes = [[_box(30, 30 * (i + 1), 70, 18), f"Line {i+1}", 0.9 - 0.01 * i]
                 for i in range(4)]
    elif case == "special_chars":  # tests/create_test_image.py:50-53
        boxes = [[_box(30, 40, 260, 20), "Special chars: !@#$%^&*()", 0.88],
                 [_box(30, 80, 200, 20), "Numbers: 1234567890", 0.93]]
    elif case == "two_column":  # test_precision_layout.py:54-111
        boxes = [[_box(50, 30, 400, 24), "PRECISION LAYOUT TEST", 0.97],
                 [_box(50, 110, 100, 18), "Features:", 0.95],
                 [_box(420, 140, 120, 18), "Capabilities:", 0.94]]
        for i in range(5):
            boxes.append([_box(60, 135 + 25 * i, 150, 16), f"- feature {i+1}", 0.9])
            boxes.append([_box(430, 165 + 25 * i, 150, 16), f"{i+1}. capability", 0.9])
        boxes.append([_box(50, 400, 300, 16), "Footer note line", 0.85])
    elif case == "lowconf":  # boundary: conf > 0.3 strictly (easyocr_reader.py:19)
        confs = [0.05, 0.29, 0.3, 0.31, 0.9]
        boxes = [[_box(30 + 90 * i, 40, 80, 18), f"tok{i}", c] for i, c in enumerate(confs)]
    elif case == "single":
        boxes = [[_box(10, 10, 50, 14), "only", 0.77]]
    elif case == "empty":
        boxes = []
    elif case == "jitter":  # y-gaps straddling the v2 tolerance (tol=10 @ h=600)
        boxes = [[_box(30, 100.0, 60, 10), "a", 0.9],
                 [_box(100, 109.0, 60, 10), "b", 0.9],   # gap 9  <= tol → same line
                 [_box(170, 120.5, 60, 10), "c", 0.9],   # gap 11.5 > tol → break
                 [_box(30, 131.0, 60, 10), "d", 0.9]]    # gap 10.5 > tol → break
    else:
        raise ValueError(case)
    return json.dumps({"h": 600, "w": 800, "boxes": boxes})


BOX_FIXTURES = ["simple_text", "multiple_lines", "special_chars", "two_column",
                "lowconf", "single", "empty", "jitter"]


# ---------------------------------------------------------------------------
# html payloads
# ---------------------------------------------------------------------------


def _html_payload(rng: random.Random) -> str:
    nav = "".join(f'<a href="/{w}">{w}</a> ' for w in rng.sample(NAV_WORDS, 5))
    paras = "".join(
        f"<p>{_sentence(rng, rng.randint(8, 25))}{' ' + rng.choice(ENTITY_SNIPPETS) if rng.random() < 0.3 else ''}</p>"
        for _ in range(rng.randint(1, 4))
    )
    title = _sentence(rng, 3).upper() if rng.random() < 0.3 else _sentence(rng, 4)
    noise = f"<script>var x = {rng.randint(0, 99)};</script>" if rng.random() < 0.5 else ""
    nonascii = rng.choice(NON_ASCII_SNIPPETS) if rng.random() < 0.25 else ""
    linkfarm = "".join(f'<li><a href="#{i}">{rng.choice(WORDS)} {i}</a></li>' for i in range(4))
    return (
        f'<html><head><title>{title}</title>{noise}</head><body>'
        f"<nav>{nav}</nav>"
        f"<div class='main'><h1>{title}</h1>{paras}<p>{nonascii} tail {_sentence(rng, 5)}</p>"
        f"<ul>{linkfarm}</ul></div>"
        f"<footer>{nav} copyright 2024</footer></body></html>"
    )


def _plain_payload(rng: random.Random) -> str:
    paras = []
    for _ in range(rng.randint(1, 4)):
        lines = [_sentence(rng, rng.randint(4, 12)) + rng.choice(["", "  ", "\t"])
                 for _ in range(rng.randint(1, 4))]
        paras.append("\r\n".join(lines))
    if rng.random() < 0.3:
        paras.append(_sentence(rng, 60))  # >200 chars → exercises the chunker
    if rng.random() < 0.2:
        paras.append(rng.choice(NON_ASCII_SNIPPETS) + " " + _sentence(rng, 6))
    sep = rng.choice(["\n\n", "\n\n\n", "\n \n", "\r\n\r\n\r\n\r\n"])
    return sep.join(paras)


# ---------------------------------------------------------------------------
# table assembly
# ---------------------------------------------------------------------------

TIERS = {
    "t1": dict(n_convs=50, skew_convs=0, skew_len=0),
    "t2": dict(n_convs=2000, skew_convs=2, skew_len=500),
    "bench": dict(n_convs=20000, skew_convs=3, skew_len=5000),
    # scaling-efficiency measurement: 4x bench so per-leg compute dominates
    # the fixed per-action overhead of local mode (north_rule N-vs-4N proxy)
    "scale": dict(n_convs=80000, skew_convs=6, skew_len=5000),
    # 4x scale: compute fully dominates the serial floor (BENCH.md Amdahl
    # decomposition) — used only by the scaling harness
    "scale4": dict(n_convs=320000, skew_convs=12, skew_len=5000),
}

ROLES = ["user", "assistant", "tool"]


def tier_for_sf_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = name.replace("sf", "")
    return {"0.001": "t1", "0.01": "t2", "0.1": "bench"}.get(sf, "t2")


def generate_rows(tier: str):
    """Yield transcript rows deterministically for a tier."""
    spec = TIERS[tier]
    rng = random.Random(f"{SEED}:{tier}")
    conv_no = 0
    # First conversation carries every named fixture case (golden smoke set).
    fixture_rows = []
    for i, case in enumerate(BOX_FIXTURES):
        fixture_rows.append(("boxes_fix", case))
    yield from _emit_conv(f"conv-{conv_no:06d}", fixture_rows, rng, conv_no)
    conv_no += 1
    for _ in range(spec["n_convs"] - 1):
        n_turns = min(2 + int(rng.expovariate(0.35)), 40)
        kinds = [rng.choices(["boxes", "html", "plain"], weights=[4, 3, 3])[0]
                 for _ in range(n_turns)]
        yield from _emit_conv(f"conv-{conv_no:06d}", [(k, None) for k in kinds], rng, conv_no)
        conv_no += 1
    for s in range(spec["skew_convs"]):
        kinds = [("boxes", None)] * spec["skew_len"]
        yield from _emit_conv(f"conv-skew-{s:03d}", kinds, rng, conv_no)
        conv_no += 1


def _emit_conv(conv_id: str, kind_specs, rng: random.Random, conv_no: int):
    base_ts = EPOCH + _dt.timedelta(seconds=conv_no * 3600)
    for turn_idx, (kind, case) in enumerate(kind_specs):
        text, tool = "", ""
        if kind == "boxes":
            tool = _boxes_payload(rng)
            text = ""
        elif kind == "boxes_fix":
            tool = _boxes_fixture(case)
            text = ""
        elif kind == "html":
            text = _html_payload(rng)
        else:
            text = _plain_payload(rng)
        yield {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": ROLES[turn_idx % 3],
            "text": text,
            "tool": tool,
            "ts": base_ts + _dt.timedelta(seconds=turn_idx),
        }


SCHEMA = pa.schema([
    pa.field("conv_id", pa.string()),
    pa.field("turn_idx", pa.int32()),
    pa.field("role", pa.string()),
    pa.field("text", pa.string()),
    pa.field("tool", pa.string()),
    pa.field("ts", pa.timestamp("us")),
])


def warehouse_dir() -> str:
    return os.environ.get("SPARK_GRAFT_WAREHOUSE",
                          os.path.join(os.path.dirname(os.path.dirname(__file__)), "warehouse"))


def transcripts_path(tier: str) -> str:
    return os.path.join(warehouse_dir(), "transcripts", f"{tier}.parquet")


def ensure_transcripts(tier: str) -> str:
    """Write (once) and return the parquet path for a tier. Idempotent."""
    path = transcripts_path(tier)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = list(generate_rows(tier))
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    table = pa.Table.from_pydict(cols, schema=SCHEMA)
    tmp = path + ".tmp"
    # Many small row groups = many Spark input splits. A production Iceberg
    # table arrives as thousands of files; a single-row-group file would
    # serialize the scan + shuffle-write into one task (measured 3× wall
    # cost at local[32]).
    pq.write_table(table, tmp, compression="zstd", row_group_size=4096)
    os.replace(tmp, path)
    return path


def ensure_transcripts_for_sf_dir(sf_dir: str) -> str:
    return ensure_transcripts(tier_for_sf_dir(sf_dir))
