"""URL canonicalization — the crawl-side normalizer that precedes per-url
dedup in a real pipeline (the reference keys documents by filename/url
verbatim; at crawl scale the same page arrives as ``http://WWW.Host/p?utm_…``
and ``https://host/p``).

Rules, applied in order (each a single RE2 pass, vectorized over the Arrow
column — identical semantics in the DuckDB mirror, which uses the same RE2
patterns with the 'g' flag):

1. strip the fragment (``#…``)
2. drop tracking params (utm_*, fbclid, gclid) wherever they sit in the
   query string, then a dangling ``?``
3. strip explicit default ports (``:80`` for http, ``:443`` for https)
4. lowercase the scheme+host part (never the path/query)
5. drop a leading ``www.``

The kernel is pure per-row string math — partitioning-invariant by
construction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TRACK = r"(?:utm_[a-z0-9]+|fbclid|gclid)"
# (pattern, replacement) chain; backrefs are RE2 \1-style on both engines.
# Tracking-param rules are left-anchored on the [?&] separator so e.g.
# ``?xgclid=1`` / ``?myfbclid=5`` are NOT mangled (they only contain a
# tracked name as a substring).  Because global regex replace scans the
# ORIGINAL string and never rescans replaced text (identical RE2 semantics
# in pyarrow and DuckDB), consecutive tracked params must each own their own
# separator: rule 2a consumes ``&track=v`` (leading &, so a run of k tracked
# params is k disjoint matches in ONE pass), rule 2b handles a tracked FIRST
# param (anchored at the sole query '?'), rule 2c a tracked param at the end.
_CHAIN = [
    (r"#.*$", ""),                                   # 1 fragment
    (r"&" + _TRACK + r"=[^&#]*", ""),                # 2a tracked non-first params
    (r"^([^?#]*\?)" + _TRACK + r"=[^&#]*&", r"\1"),  # 2b tracked first param
    (r"[?&]" + _TRACK + r"=[^&#]*$", ""),            # 2c tracked param at the end
    (r"\?$", ""),                                    # 2d dangling ?
    (r"^((?i:http)://[^/:]+):80(/|$)", r"\1\2"),     # 3 default ports
    (r"^((?i:https)://[^/:]+):443(/|$)", r"\1\2"),
]
_HEAD = r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/]*)(?P<rest>[^\x00]*)$"
_HEAD_SQL = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)([^\x00]*)$"
_WWW = r"^([a-z.+\-0-9]*://)www\."


def canonicalize_url_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    for pat, rep in _CHAIN:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=rep)
    parts = pc.extract_regex(col, _HEAD)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(head, pattern=_WWW, replacement=r"\1")
    joined = pc.binary_join_element_wise(head, pc.struct_field(parts, "rest"), "")
    # Rows that don't parse as scheme://host keep their post-chain form.
    out = pc.coalesce(joined, col)
    return out.combine_chunks().cast(pa.string()) if isinstance(
        out, pa.ChunkedArray) else out.cast(pa.string())


def sql_canon_expr(col: str) -> str:
    """DuckDB expression mirroring canonicalize_url_column: same RE2 patterns
    with the 'g' flag.  DuckDB string literals are standard-SQL (backslashes
    are literal characters), so patterns embed verbatim."""
    e = col
    for pat, rep in _CHAIN:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    return (
        f"CASE WHEN regexp_matches({e}, '{_HEAD_SQL}') THEN "
        f"regexp_replace(lower(regexp_extract({e}, '{_HEAD_SQL}', 1)), "
        f"'{_WWW}', '\\1') || regexp_extract({e}, '{_HEAD_SQL}', 2) "
        f"ELSE {e} END")
