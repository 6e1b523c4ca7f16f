"""Fast HTML scan vs stdlib HTMLParser: equivalence on the fast path.

extract_html_one takes the regex fast path only for a strict well-formed
grammar and bails to the stdlib parser otherwise, so the correctness
claim is: WHENEVER the fast scan accepts an input, its collector state
equals the stdlib parser's. These tests attack exactly that boundary —
generated corpus payloads, self-close/rawdata/attribute edge cases, and
a hypothesis fuzz over tag soup.
"""

from __future__ import annotations

import random

from hypothesis import example, given, settings
from hypothesis import strategies as st

from ocr_image_to_text_spark.operators.htmlx import (
    _Collector,
    _scan_fast,
    extract_html_one,
    extract_html_stdlib,
)
from ocr_image_to_text_spark.transcripts import _html_payload


def _both(s: str):
    """(fast_accepted, fast_result_or_None, stdlib_result)."""
    c = _Collector()
    ok = _scan_fast(s, c)
    fast = None
    if ok:
        from ocr_image_to_text_spark.operators.htmlx import _finish

        fast = _finish(c)
    return ok, fast, extract_html_stdlib(s)


def test_fixture_corpus_takes_fast_path_and_agrees():
    rng = random.Random(99)
    n_fast = 0
    for _ in range(300):
        s = _html_payload(rng)
        ok, fast, ref = _both(s)
        if ok:
            n_fast += 1
            assert fast == ref
    assert n_fast >= 290  # the generated corpus is the fast-path domain


EDGES = [
    "<br/>",
    "<br />",
    "<a href=b/>x</a>",          # CPython: value 'b/', PLAIN start tag
    "<a href='x'/>y</a>",
    "<p CLASS=\"a>b\">quoted gt</p>",
    "<P>UPPER</P>",
    "<div><p>unclosed",
    "<ul><li>a<li>b</ul>",       # implied closes
    "<script>if (a<b) { x(); }</script><p>after</p>",
    "<style>p > a { color: red }</style><p>css</p>",
    "<SCRIPT>x</SCRIPT><p>t</p>",
    "<noscript><p>ns</p></noscript><p>out</p>",  # noscript is NOT rawdata
    "<nav><a href='/'>home</a></nav><p>body text here</p>",
    "<div foo=bar baz>text</div>",
    "</div>stray close",
    "<div   >spaces</div>",
    "<a-b>custom tag</a-b>",
    "text only, no tags at all",
    "",
    # round-2 fuzz counterexamples — quotes OUTSIDE attr-value position.
    # CPython honors quotes only after '='; these must bail (never span '>').
    "<b '>'>",                   # bare quoted run: CPython = tag b + data "'>'"
    '<p a">">x</p>',             # quote glued to attr name
    "<a href=\"x\" 'y'>t</a>",   # quoted run after a real attr
    "</p a='>'>tail",            # end tag with quoted attr: CPython stops at first >
    "<i ='v'>eq first</i>",      # '=' with no attr name
    "<a b=c'd>e</a>",            # quote mid bare value
    # '/'-vs-selfclose family (must classify exactly like CPython)
    "<a href=b />x</a>",         # bare value then SPACE slash: startend
    "<a b/>x",                   # attr name then '/>': startend
    "<a / >x",                   # slash amid trailing ws: CPython plain start — bail
    "<a href=>empty val</a>",
    "<a href= b>spaced eq</a>",
]


def test_edge_cases_agree_when_fast_accepts():
    for s in EDGES:
        ok, fast, ref = _both(s)
        if ok:
            assert fast == ref, f"divergence on {s!r}"


def test_bail_cases_fall_back():
    for s in ["a &amp; b", "<!-- c --><p>x</p>", "<!doctype html><p>x</p>",
              "<?pi?><p>x</p>", "<p>a < b</p>", "<p", "<script>open",
              "<p>end&", "<p>a<3</p>", "</ div>"]:
        c = _Collector()
        assert not _scan_fast(s, c), f"should bail: {s!r}"
        # and the public function still returns the stdlib answer
        assert extract_html_one(s) == extract_html_stdlib(s)


_SOUP = st.lists(
    st.one_of(
        st.sampled_from([
            "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
            "<br/>", "<br />", "<nav>", "</nav>", "<script>", "</script>",
            "<li>", "<span>", "</span>", "word", "two words", " ", "\n",
            "<b", ">", "<P>", "</P>", "<footer>", "</footer>", "<em/>",
            "<a href=b/>", "<i x=1 y='2'>", "text<3", "&x;", "5 > 4",
        ]),
        st.text(alphabet="abc<>/= \"'\n", max_size=12),
    ),
    max_size=40,
).map("".join)


@given(_SOUP)
@example("<b '>'>")          # saved 2026-08-17 fuzz counterexample (round 2)
@example('<p a">">x</p>')
@example("</p a='>'>tail")
@example("<a href=b/>x</a>")
@example("<a b=c'd>e</a>")
@settings(max_examples=1500, deadline=None)
def test_fuzz_fast_equals_stdlib_when_accepted(s):
    ok, fast, ref = _both(s)
    if ok:
        assert fast == ref


def test_public_function_equals_stdlib_always():
    rng = random.Random(7)
    for _ in range(100):
        s = _html_payload(rng)
        assert extract_html_one(s) == extract_html_stdlib(s)
