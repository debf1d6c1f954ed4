"""Web link / anchor-text mining over raw page text.

A web-scale KG pipeline's cheapest entity-alias signal is anchor text: the
strings pages use to link to a target are names for that target (the
reference builds its alias dictionary from ontology labels only —
src/ontology_manager — anchor mining is the web-native extension).  This
module extracts markdown-style links ``[anchor](target)`` (image links
``![alt](src)`` included via their ``[alt](src)`` tail) from the RAW page
text (pre-cleaner — the cleaner strips markdown) and aggregates
(anchor, target, target_host) frequencies.

Scale shape: per-batch compiled-regex extraction emits (anchor, target)
pairs with an in-batch count combiner, then ONE vocabulary-bounded exchange
(`hash_aggregate`) — page text never shuffles.  At 100 TB the anchor/target
vocabulary is corpus-proportional, which is exactly what the bucketed
two-phase aggregate is for; no driver structure anywhere.

DuckDB mirror: ``regexp_extract_all`` per capture group zipped positionally
(RE2 semantics on both sides — the pattern avoids backtracking constructs).
"""

from __future__ import annotations

import re

import pyarrow as pa

LINK_RE = r"\[([^\]]*)\]\(([^()\s]*)\)"
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"

_LINK = re.compile(LINK_RE)
_HOST = re.compile(HOST_RE)


def _host_of(target: str) -> str:
    m = _HOST.match(target)
    # DuckDB regexp_extract returns '' on no match — same contract here.
    return m.group(1) if m else ""


def extract_anchors(ds, text_col: str = "text"):
    """(anchor, target, target_host, n) counts over markdown links."""
    from ontoray.stages.agg import hash_aggregate

    def links(batch: pa.Table) -> pa.Table:
        anchors: list[str] = []
        targets: list[str] = []
        for t in batch.column(text_col).to_pylist():
            if t:
                for m in _LINK.finditer(t):
                    anchors.append(m.group(1))
                    targets.append(m.group(2))
        return pa.table({
            "anchor": pa.array(anchors, pa.string()),
            "target": pa.array(targets, pa.string()),
            "target_host": pa.array([_host_of(t) for t in targets], pa.string()),
            "one": pa.array([1] * len(anchors), pa.int64()),
        })

    return hash_aggregate(
        ds.map_batches(links, batch_format="pyarrow"),
        ["anchor", "target", "target_host"],
        partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"},
        num_buckets=16)


ABS_RE = r"^[a-z][a-z0-9+.-]*://"

_ABS = re.compile(ABS_RE)


def host_edges(pages_ds, url_col: str = "url", text_col: str = "text"):
    """Distinct (src, dst) host pairs from page links — the host-level web
    graph (the Common-Crawl "host webgraph" shape that ranks crawl
    frontiers).  Relative link targets resolve to the page's OWN host
    (simplified RFC 3986: any target without a scheme stays on-host), so
    they become self-links; self-links and hostless rows are dropped.

    Scale shape: per-batch compiled-regex extraction with in-batch
    distinct, then ONE host-vocabulary-bounded exchange — page text never
    shuffles, and the output is bounded by the distinct host-pair
    vocabulary (crawl hosts, not pages)."""
    from ontoray.stages.agg import hash_aggregate

    def links(batch: pa.Table) -> pa.Table:
        pairs: set = set()
        for u, t in zip(batch.column(url_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            sh = _host_of(u or "")
            if not t or not sh:
                continue
            for m in _LINK.finditer(t):
                tgt = m.group(2)
                dh = _host_of(tgt) if _ABS.match(tgt) else sh
                if dh and dh != sh:
                    pairs.add((sh, dh))
        ps = sorted(pairs)
        return pa.table({
            "src": pa.array([p[0] for p in ps], pa.string()),
            "dst": pa.array([p[1] for p in ps], pa.string())})

    return hash_aggregate(
        pages_ds.map_batches(links, batch_format="pyarrow"), ["src", "dst"],
        partial_aggs=[("src", "count")],
        aggs=[("src_count", "sum")], rename={"src_count_sum": "__n"},
        num_buckets=8).select_columns(["src", "dst"])


def sql_host_edges(pages_cte: str) -> str:
    """DuckDB mirror of ``host_edges`` over the derived pages CTE — ends in
    a ``trip(src, dst)`` projection suitable for the pagerank CTE chain."""
    return (
        f"pages AS ({pages_cte}), "
        f"hlinks AS (SELECT regexp_extract(p.url, '{HOST_RE}', 1) AS sh, "
        f"z.tgt AS target "
        f"FROM pages p, unnest(regexp_extract_all(p.text, '{LINK_RE}', 2)) "
        f"AS z(tgt)), "
        f"trip AS (SELECT DISTINCT src, dst FROM ("
        f"SELECT sh AS src, CASE WHEN regexp_matches(target, '{ABS_RE}') "
        f"THEN regexp_extract(target, '{HOST_RE}', 1) ELSE sh END AS dst "
        f"FROM hlinks WHERE sh <> '') WHERE dst <> '' AND dst <> src)")


def sql_web_anchors(pages_cte: str) -> str:
    """DuckDB mirror of ``extract_anchors`` over the derived pages CTE."""
    return (
        f"WITH pages AS ({pages_cte}), "
        f"links AS (SELECT z.pair[1] AS anchor, z.pair[2] AS target "
        f"FROM pages p, unnest(list_zip("
        f"regexp_extract_all(p.text, '{LINK_RE}', 1), "
        f"regexp_extract_all(p.text, '{LINK_RE}', 2))) AS z(pair)) "
        f"SELECT anchor, target, "
        f"regexp_extract(target, '{HOST_RE}', 1) AS target_host, "
        f"count(*) AS n FROM links GROUP BY 1, 2, 3")
