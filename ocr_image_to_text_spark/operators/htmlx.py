"""HTML main-content extraction — Spark-side implementation.

Implements the engine's deterministic DOM text-density / link-density
boilerplate-strip spec (defined with the oracle in pyref.extract_html_blocks;
tag sets are shared spec constants). This is a from-scratch implementation
structured for batch execution — depth counters maintained incrementally
instead of stack scans — and is verified against the oracle by tests.

Reference analog: the adaptive-threshold / noise-strip image preprocessing
(src/ocr_module.py:78-89) whose transcript-domain analog is tag/script/style
stripping + block scoring (SURVEY.md §2.9); block cleaning is X1
(ocr_app/utils/text_utils.py:12-34).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ..pyref import BLOCK_TAGS, DROP_CONTAINER_TAGS, LINK_DENSITY_MAX, RAW_SKIP_TAGS

_WS = re.compile(r"\s+")
_NL3 = re.compile(r"\n{3,}")
_NON_ASCII = re.compile(r"[^\x00-\x7F]+")


def clean_block(raw: str) -> str:
    """X1 cleaning applied to one block (Python `re` — oracle-identical)."""
    if not raw:
        return ""
    return _NON_ASCII.sub("", _NL3.sub("\n\n", _WS.sub(" ", raw))).strip()


class _Collector(HTMLParser):
    __slots__ = ("_open", "_skip", "_drop", "_a", "_buf", "_chars", "_link",
                 "_in_drop", "blocks")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._open: list[str] = []
        self._skip = 0
        self._drop = 0
        self._a = 0
        self._buf: list[str] = []
        self._chars = 0
        self._link = 0
        self._in_drop = False
        self.blocks: list[tuple[str, int, int, bool]] = []

    def _flush(self) -> None:
        if self._buf:
            self.blocks.append(("".join(self._buf), self._chars, self._link, self._in_drop))
            self._buf = []
        self._chars = 0
        self._link = 0
        self._in_drop = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
        self._open.append(tag)
        if tag in RAW_SKIP_TAGS:
            self._skip += 1
        if tag in DROP_CONTAINER_TAGS:
            self._drop += 1
        if tag == "a":
            self._a += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
        open_ = self._open
        for i in range(len(open_) - 1, -1, -1):
            if open_[i] == tag:
                for t in open_[i:]:  # implicit closes adjust counters too
                    if t in RAW_SKIP_TAGS:
                        self._skip -= 1
                    if t in DROP_CONTAINER_TAGS:
                        self._drop -= 1
                    if t == "a":
                        self._a -= 1
                del open_[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._buf.append(data)
        n = len(data.strip())
        self._chars += n
        if self._a:
            self._link += n
        if self._drop:
            self._in_drop = True


def extract_html_one(html_text: str) -> tuple[str, int, int]:
    """Return (extracted_text, n_blocks_kept, n_blocks_dropped)."""
    c = _Collector()
    try:
        c.feed(html_text)
        c.close()
    except Exception:
        pass
    c._flush()
    kept: list[str] = []
    dropped = 0
    for raw, chars, link, in_drop in c.blocks:
        clean = clean_block(raw)
        if not clean:
            continue
        if in_drop or (chars > 0 and link / chars > LINK_DENSITY_MAX):
            dropped += 1
        else:
            kept.append(clean)
    return "\n".join(kept), len(kept), dropped
