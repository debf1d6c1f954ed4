"""Deterministic HTML → text extraction.

The reference ingests pre-converted Markdown (src/data_loader.py:50-92) and has
no HTML stage; our input table carries raw ``html`` bytes plus a pre-extracted
``text`` column (BASELINE.json input_hint).  When ``text`` is empty we derive
it from ``html`` with this deterministic extractor; the oracle uses the same
function, so the per-url byte-identity invariant holds end to end.

Rules (fixed, order matters):
  1. drop <script>/<style>/<head> elements and HTML comments
  2. <br> and closing block-level tags emit a newline
  3. every other tag is stripped
  4. the five standard XML entities plus &nbsp; and numeric refs are unescaped
"""

from __future__ import annotations

import html as _htmlmod
import re

_DROP = re.compile(r"(?is)<(script|style|head)\b.*?</\1\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
_BLOCK_BREAK = re.compile(
    r"(?i)<(?:br\s*/?|/(?:p|div|li|ul|ol|h[1-6]|tr|table|section|article|blockquote|pre|title))\s*>"
)
_TAG = re.compile(r"<[^>]+>")


def html_to_text(html_bytes: bytes | str) -> str:
    if isinstance(html_bytes, (bytes, bytearray)):
        s = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        s = html_bytes
    s = _DROP.sub(" ", s)
    s = _COMMENT.sub(" ", s)
    s = _BLOCK_BREAK.sub("\n", s)
    s = _TAG.sub(" ", s)
    s = _htmlmod.unescape(s)
    return s
