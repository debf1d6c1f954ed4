"""Deterministic text cleaner — THE byte-identical invariant.

Exact port of the reference cleaning chain ``_preprocess_text``
(reference src/data_loader.py:13-47): lowercase → strip markdown images
keeping alt text → strip markdown links keeping link text → remove the seven
boilerplate/footer regexes → strip markdown formatting chars → collapse all
whitespace to single spaces and strip.  Order matters and is preserved.

``sql_clean_expr`` emits the equivalent DuckDB (RE2) expression chain used by
the correctness oracle; byte-equality between the two is asserted in tests
(both are ASCII-equivalent on this corpus; Python's unicode-aware ``\\s`` and
RE2's ASCII ``\\s`` only diverge on non-ASCII whitespace, which the cleaner's
test fixtures cover via the Python path).
"""

from __future__ import annotations

import re

# Ordered (pattern, replacement) chain.  Compiled once at import; reused by
# every worker process (module import happens once per Ray worker).
_MD_IMAGE = re.compile(r"!\[(.*?)\]\(.*?\)")
_MD_LINK = re.compile(r"\[(.*?)\]\(.*?\)")
# Boilerplate list verbatim from reference src/data_loader.py:31-39.
BOILERPLATE_PATTERNS = [
    r"johanson technology, inc\. reserves the right to make design changes without notice\.",
    r"all sales are subject to johanson technology, inc\. terms and conditions\.",
    r"copyright © \d{4} texas instruments incorporated",
    r"submit document feedback",
    r"important notice and disclaimer",
    r"www\.ti\.com",
    r"www\.johansontechnology\.com",
]
_BOILERPLATE = [re.compile(p, re.IGNORECASE) for p in BOILERPLATE_PATTERNS]
_MD_CHARS = re.compile(r"[`*#_]+")
_WS = re.compile(r"\s+")

# Required literal per boilerplate pattern (post-lowercase): a C substring
# check proves the (more expensive) regex sub would be a no-op — pure
# shortcut, byte-identical output (pytest-asserted against the plain chain).
_BP_LITERALS = [
    "johanson technology, inc. reserves",
    "all sales are subject to",
    "texas instruments incorporated",
    "submit document feedback",
    "important notice and disclaimer",
    "www.ti.com",
    "www.johansontechnology.com",
]
assert len(_BP_LITERALS) == len(BOILERPLATE_PATTERNS)
_BP_CHAIN = list(zip(_BOILERPLATE, _BP_LITERALS))


def clean_text(text: str) -> str:
    """Reference ``_preprocess_text`` (src/data_loader.py:13-47), byte-identical."""
    text = text.lower()
    if "![" in text:
        text = _MD_IMAGE.sub(r"\1", text)
    if "[" in text:
        text = _MD_LINK.sub(r"\1", text)
    for pat, lit in _BP_CHAIN:
        if lit in text:
            text = pat.sub("", text)
    text = _MD_CHARS.sub("", text)
    text = _WS.sub(" ", text).strip()
    return text


def clean_many(texts) -> list[str]:
    """Vectorized-enough batch path: compiled regexes over a column of
    strings, with the same literal shortcuts as ``clean_text``."""
    sub_img, sub_lnk = _MD_IMAGE.sub, _MD_LINK.sub
    sub_md, sub_ws = _MD_CHARS.sub, _WS.sub
    bps = [(p.sub, lit) for p, lit in _BP_CHAIN]
    out = []
    append = out.append
    for t in texts:
        t = t.lower()
        if "![" in t:
            t = sub_img(r"\1", t)
        if "[" in t:
            t = sub_lnk(r"\1", t)
        for sub, lit in bps:
            if lit in t:
                t = sub("", t)
        t = sub_md("", t)
        append(sub_ws(" ", t).strip())
    return out


def sql_clean_expr(col: str) -> str:
    """DuckDB expression computing ``clean_text(col)`` (RE2, ASCII-equivalent)."""
    expr = f"lower({col})"
    expr = f"regexp_replace({expr}, '!\\[(.*?)\\]\\(.*?\\)', '\\1', 'g')"
    expr = f"regexp_replace({expr}, '\\[(.*?)\\]\\(.*?\\)', '\\1', 'g')"
    for p in BOILERPLATE_PATTERNS:
        # DuckDB single-quoted literals do not process backslash escapes, so
        # the Python regex source passes through to RE2 verbatim.
        sql_p = p.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_p}', '', 'gi')"
    expr = f"regexp_replace({expr}, '[`*#_]+', '', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return expr
