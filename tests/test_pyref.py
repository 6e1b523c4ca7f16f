"""Unit tests pinning the oracle to the reference's documented behavior.

Each test mirrors a reference fixture or a boundary called out in
SURVEY.md §2 / FIXTURES.md; citations inline.
"""

import json

from ocr_image_to_text_spark import pyref
from ocr_image_to_text_spark.transcripts import _boxes_fixture


def test_conf_filter_strict_boundary():
    # ocr_core/easyocr_reader.py:19 — conf > 0.3 strictly; 0.3 itself drops
    boxes = json.loads(_boxes_fixture("lowconf"))["boxes"]
    kept = pyref.conf_filter(boxes)
    assert [b[1] for b in kept] == ["tok3", "tok4"]  # 0.31 and 0.9 survive


def test_simple_text_layout_v1():
    # tests/create_test_image.py:38-41 content; two lines 30px apart > tol 20
    boxes = json.loads(_boxes_fixture("simple_text"))["boxes"]
    assert pyref.format_with_layout_v1(boxes) == "Hello, World!\nThis is a test image."


def test_multiple_lines_all_variants():
    boxes = json.loads(_boxes_fixture("multiple_lines"))["boxes"]
    want = "Line 1\nLine 2\nLine 3\nLine 4"
    assert pyref.format_with_layout_v1(boxes) == want
    assert pyref.format_with_layout_v2(boxes, 600) == want
    assert pyref.format_with_layout_v3(boxes) == want


def test_jitter_pins_v2_tolerance():
    # tol = max(10, 600*0.01) = 10; per-token anchor (src/ocr_module.py:345,362)
    boxes = json.loads(_boxes_fixture("jitter"))["boxes"]
    # centers: 105, 114, 125.5, 136 → gaps 9 (join), 11.5 (break), 10.5 (break)
    assert pyref.format_with_layout_v2(boxes, 600) == "a b\nc\nd"


def test_v3_line_anchor_differs_from_v2():
    # Drifting ladder: successive gaps of 8px chain under v2 (per-token
    # anchor) but break under v3 (line-start anchor) once cumulative > 10.
    def box(y):
        return [[[10, y], [50, y], [50, y + 8], [10, y + 8]], f"t{y}", 0.9]

    boxes = [box(100), box(108), box(116)]
    # v3: anchor 100 → 108 in (|108-100|=8), 116 breaks (|116-100|=16)
    assert pyref.format_with_layout_v3(boxes) == "t100 t108\nt116"


def test_empty_and_single():
    assert pyref.format_with_layout_v1([]) == ""  # ocr_engine.py:546-547
    only = json.loads(_boxes_fixture("single"))["boxes"]
    assert pyref.format_with_layout_v2(only, 600) == "only"


def test_preprocess_text_x1():
    # ocr_app/utils/text_utils.py:12-34 — \s+ collapse happens before the
    # \n{3,} rule (dead), then non-ASCII strip, then strip
    assert pyref.preprocess_text("a\r\n\r\n\r\nb") == "a b"
    assert pyref.preprocess_text("  héllo  wörld  ") == "hllo wrld"
    assert pyref.preprocess_text("") == ""
    # NBSP is \s for Python re → becomes a space (Java \s would not match it)
    assert pyref.preprocess_text("a b") == "a b"


def test_clean_extracted_text_x2():
    # src/utils.py:80-94
    # \t is whitespace → collapses to ' '; \x07 is non-printable → deleted
    assert pyref.clean_extracted_text("a\tb\x07c") == "a bc"


def test_score_v2_components():
    # src/ocr_module.py:448-476
    assert pyref.score_result_v2("") == 0
    s = pyref.score_result_v2("short")  # len 5 <20 → -5; no \n
    assert abs(s - (0.05 + 0.1 + 10 - 5)) < 1e-9  # 1 word, all alnum


def test_best_of_paddle_wins_ties():
    # src/ocr_module.py:429-432
    assert pyref.best_of("same text here okay", "same text here okay") == "same text here okay"
    assert pyref.best_of("", "easy") == "easy"
    assert pyref.best_of("paddle", "") == "paddle"


def test_chunker_x3_overlap():
    # ocr_app/utils/text_utils.py:36-90: word-pack, 50-word suffix overlap
    text = " ".join(f"w{i:03d}" for i in range(100))  # 100*5-1 = 499 chars
    chunks = pyref.split_text_into_chunks(text, chunk_size=100, overlap=5)
    assert all(len(c) <= 100 for c in chunks)
    # consecutive chunks share the 5-word suffix/prefix
    first_words = chunks[0].split()
    second_words = chunks[1].split()
    assert second_words[:5] == first_words[-5:]


def test_chunker_x4_stride():
    # src/utils.py:10-24: windows of 100 words, stride 80
    text = " ".join(str(i) for i in range(250))
    chunks = pyref.get_text_chunks(text)
    assert len(chunks) == 4  # starts at 0, 80, 160, 240
    assert chunks[0].split()[0] == "0" and chunks[1].split()[0] == "80"


def test_entities_x7():
    # FIXTURES.md §2b.4 exact patterns (ocr_app/utils/text_utils.py:208-230)
    text = ("on 12/05/2023 and 2023-11-02 and Mar 5, 2021; mail a.b@c.de; "
            "call +1 (555) 123-4567; see https://x.y/z%20a")
    e = pyref.extract_entities(text)
    assert "12/05/2023" in e["dates"] and "2023-11-02" in e["dates"]
    assert "Mar 5, 2021" in e["dates"]
    assert e["emails"] == ["a.b@c.de"]
    # Bug-faithful: the leading \b cannot sit before '+', so the match
    # starts inside the parens and keeps the stray ')'.
    assert e["phones"] == ["555) 123-4567"]
    # Bug-faithful: '/' is absent from the URL char class, so the path after
    # the host is not captured.
    assert e["urls"] == ["https://x.y"]


def test_language_x8():
    assert pyref.detect_language_fallback("short") == "en"
    assert pyref.detect_language_fallback("这是中文文本这是中文文本这是中文") == "en"  # len<20 guard
    assert pyref.detect_language_fallback("这是中文文本这是中文文本这是中文文本四五六") == "zh"
    assert pyref.detect_language_fallback("это русский текст достаточной длины") == "ru"


def test_markdown_x9_unstripped_prefix():
    # ocr_app/utils/text_utils.py:255-257: '## ' prefixed to the UNstripped line
    text = "  TITLE HERE  \nbody line\nAB\n1234"
    out = pyref.format_markdown(text)
    lines = out.split("\n")
    assert lines[0] == "##   TITLE HERE  "  # needs cased chars + 3<len<50
    assert lines[1] == "body line"
    assert lines[2] == "AB"      # too short
    assert lines[3] == "1234"    # isupper() False without cased chars


def test_html_x10_no_escaping():
    out = pyref.format_html("a <b\n\nc")
    assert out == '<div class="ocr-text">\n<p>a <b</p>\n<br>\n<p>c</p>\n</div>'


def test_stitch_x11_variants():
    pages = ["p1", "p2"]
    assert pyref.stitch_pages_v1(pages) == "--- PAGE 1 ---\np1\n\n--- PAGE 2 ---\np2\n\n"
    assert pyref.stitch_pages_v2(pages) == "--- Page 1 ---\np1\n\n--- Page 2 ---\np2"
    assert pyref.stitch_pages_v3(pages) == "\n--- PAGE 1 ---\np1\n\n--- PAGE 2 ---\np2\n"


def test_qa_x14_who_when():
    ctx = "The report was written by Alice Johnson. It was published Mar 5, 2021."
    assert pyref.extract_answer_from_context("who wrote the report?", ctx) == "Alice Johnson"
    assert pyref.extract_answer_from_context("when was it published?", ctx) == "Mar 5, 2021"


def test_qa_x15_confidence():
    ans, conf = pyref.fallback_answer_extraction(
        "spark engine", "The spark engine runs fast. Nothing else here.")
    assert ans == "The spark engine runs fast."
    assert conf == 1.0


def test_table_heuristic_a13():
    even = [float(10 * i) for i in range(12)]
    assert pyref.detect_table_spacing(even) is False  # std == 0 → excluded
    near_even = [10.0 * i + (0.1 if i % 2 else 0.0) for i in range(12)]
    assert pyref.detect_table_spacing(near_even) is True
    ragged = [0.0, 1, 30, 31, 90, 95, 200, 201, 390, 400, 680, 700]
    assert pyref.detect_table_spacing(ragged) is False


def test_spans_cover_text():
    text = "line one\nline two\n\nlast"
    spans = pyref.spans_of(text)
    for s, e, t in spans:
        assert text[s:e] == t
    assert spans[-1][1] == len(text)
    assert pyref.spans_of("") == []


def test_classify_kind():
    assert pyref.classify_kind("", '{"h":1,"boxes":[]}') == "boxes"
    assert pyref.classify_kind("<div><p>x</p></div>", "") == "html"
    assert pyref.classify_kind("plain words", "") == "plain"
    assert pyref.classify_kind("a < b math", "") == "plain"
