"""Single-process oracle — the executable reference semantics.

Pure Python (lists / dicts / sets, no Ray) mirror of the KG pipeline used as
the P/R comparator and the spec (SURVEY §7.1 step 2).  It shares the per-row
functions (cleaner, chunker, extractors, linker math) with the engine, but
implements the *dataflow* independently — driver-style loops and set
semantics exactly as the reference does (e.g. ``sorted(set(...))`` concept
dedup, src/idea_extractor.py:121) — so any engine/oracle mismatch localizes
to the distributed dedup/shuffle/join logic.
"""

from __future__ import annotations

import pyarrow as pa

from ontoray.aliases import AliasData, build_alias_data, gazetteer_phrases
from ontoray.config import PipelineConfig
from ontoray.linking import EXTEND, MAP_EXACT, MAP_SIMILAR, UNCERTAIN, decide, find_matches, route_task
from ontoray.text.chunk import split_text
from ontoray.text.clean import clean_text
from ontoray.text.extract import extract_mentions, extract_triples
from ontoray.text.html import html_to_text
from ontoray.text.normalize import normalize_concept_name


def oracle_docs(pages: pa.Table, lang: str = "en") -> dict[str, str]:
    """url -> cleaned doc text; first-wins per url by the engine's ordering
    min (warc_ts, cleaned_doc).  The key is METADATA-ONLY (earliest capture
    wins) so the engine's winner pass never reads the content columns; the
    cleaned doc as final tuple element mirrors the engine's min(doc_text)
    tie aggregate for same-timestamp captures."""
    cols = pages.column_names
    rows = pages.to_pylist()
    best: dict[str, tuple] = {}
    for r in rows:
        if r.get("lang") != lang:
            continue
        text = r.get("text") or ""
        if not text and "html" in cols and r.get("html"):
            text = html_to_text(bytes(r["html"]))
        doc = clean_text(text)
        ts = r.get("warc_ts")
        key = (ts, doc)
        cur = best.get(r["url"])
        if cur is None or key < cur:
            best[r["url"]] = key
    return {url: key[1] for url, key in best.items()}


def oracle_chunks(docs: dict[str, str], chunk_size=1000, chunk_overlap=100):
    out = []
    for url, doc in docs.items():
        for i, c in enumerate(split_text(doc, chunk_size, chunk_overlap)):
            out.append((url, i, c))
    return out


def oracle_pipeline(pages: pa.Table, cfg: PipelineConfig | None = None,
                    alias: AliasData | None = None, curate: bool = True) -> dict:
    cfg = cfg or PipelineConfig()
    alias = alias or build_alias_data(cfg.embed_dim)
    gaz = gazetteer_phrases(alias)

    docs = oracle_docs(pages)
    chunks = oracle_chunks(docs, cfg.chunk_size, cfg.chunk_overlap)

    all_mentions: list[str] = []
    mention_rows = []
    triple_rows = []
    for url, cid, text in chunks:
        ms = extract_mentions(text, gaz)
        all_mentions.extend(ms)
        mention_rows.extend((url, cid, m) for m in ms)
        triple_rows.extend((url, cid) + t for t in extract_triples(text))

    # Reference global concept dedup: sorted(set(...)).
    distinct = sorted(set(all_mentions))
    counts: dict[str, int] = {}
    for m in all_mentions:
        counts[m] = counts.get(m, 0) + 1

    # Triple set dedup on normalized key.
    triples_dedup = {}
    for (_u, _c, s, p, o, tag, conf) in triple_rows:
        key = (normalize_concept_name(s), p.lower(), normalize_concept_name(o))
        cur = triples_dedup.get(key)
        if cur is None:
            triples_dedup[key] = [conf, 1]
        else:
            cur[0] = max(cur[0], conf)
            cur[1] += 1

    # Technical props per surface (min-obj tie-break like the engine).
    props: dict[str, dict[str, str]] = {}
    for (_u, _c, s, p, o, tag, _conf) in triple_rows:
        if tag == "pattern":
            d = props.setdefault(s, {})
            if p not in d or o < d[p]:
                d[p] = o

    # Linker over distinct raw surface forms.
    entities = []
    for name in distinct:
        nn = normalize_concept_name(name)
        matches = find_matches(name, alias, name_norm=nn, props=props.get(name),
                               thresholds=cfg.similarity_thresholds,
                               enable_technical=cfg.enable_technical_matching)
        decision, target, conf = decide(name, matches,
                                        thresholds=cfg.similarity_thresholds,
                                        enable_rule_validation=cfg.enable_rule_validation,
                                        validate_threshold=cfg.validate_threshold)
        parent, status = route_task(decision, target, matches)
        entities.append({
            "name": name, "name_norm": nn, "decision": decision, "target": target,
            "confidence": conf, "best_score": matches[0][1] if matches else 0.0,
            "n_mentions": counts[name], "parent_class": parent, "status": status,
        })

    # Graph materialize.
    nodes: dict[str, dict] = {}
    for n in alias.parent:
        nodes[n] = {"name": n, "source": "Baseline"}
    for e in entities:
        if e["decision"] in (EXTEND, UNCERTAIN) and e["name"] not in nodes:
            nodes[e["name"]] = {"name": e["name"], "source": "learned_from_dataset"}

    def _resolved_of(e):
        if e["decision"] in (MAP_EXACT, MAP_SIMILAR) and e["target"]:
            return True, e["target"]
        return False, e["name"]

    resolution: dict[str, str] = {}
    for e in sorted(entities, key=lambda e: (-_resolved_of(e)[0], -e["n_mentions"], _resolved_of(e)[1])):
        nn = e["name_norm"]
        if nn not in resolution:
            resolution[nn] = _resolved_of(e)[1]

    edges: dict[tuple, list] = {}

    def add_edge(src, rel, dst, taxonomic, conf, n):
        key = (src, rel, dst)
        cur = edges.get(key)
        if cur is None:
            edges[key] = [taxonomic, conf, n]
        else:
            cur[0] = cur[0] or taxonomic
            cur[1] = max(cur[1], conf)
            cur[2] += n

    import re as _re
    _san = _re.compile(r"[^a-zA-Z0-9_]")
    for child, parent in alias.parent.items():
        if parent:
            add_edge(child, "SUBCLASS_OF", parent, True, 1.0, 1)
    for e in entities:
        if e["decision"] in (EXTEND, UNCERTAIN) and e["parent_class"]:
            add_edge(e["name"], "SUBCLASS_OF", e["parent_class"], True, e["confidence"], 1)
    for (sn, pn, on), (conf, n) in triples_dedup.items():
        if pn == "subclass_of":
            continue
        src = resolution.get(sn, sn)
        dst = resolution.get(on, on)
        add_edge(src, _san.sub("_", pn).upper(), dst, False, conf, n)

    removed = {"orphans_removed": 0, "low_degree_removed": 0}
    if curate:
        children: dict[str, list[str]] = {}
        for (src, rel, dst) in edges:
            if rel == "SUBCLASS_OF":
                children.setdefault(dst, []).append(src)
        reach = {"ElectronicComponent"}
        frontier = ["ElectronicComponent"]
        for _ in range(cfg.max_hierarchy_depth):
            nxt = [c for p in frontier for c in children.get(p, ()) if c not in reach]
            if not nxt:
                break
            reach.update(nxt)
            frontier = nxt
        learned = {n for n, v in nodes.items() if v["source"] == "learned_from_dataset"}
        orphans = learned - reach
        degree: dict[str, int] = {}
        for (src, rel, dst) in edges:
            if src in orphans or dst in orphans:
                continue
            degree[src] = degree.get(src, 0) + 1
            degree[dst] = degree.get(dst, 0) + 1
        low = {n for n in (learned - orphans) if degree.get(n, 0) <= cfg.degree_threshold}
        removed = {"orphans_removed": len(orphans), "low_degree_removed": len(low)}
        gone = orphans | low
        nodes = {n: v for n, v in nodes.items() if n not in gone}
        edges = {k: v for k, v in edges.items() if k[0] not in gone and k[2] not in gone}

    return {
        "docs": docs,
        "chunks": chunks,
        "mentions": mention_rows,
        "distinct_mentions": distinct,
        "mention_counts": counts,
        "triples": triple_rows,
        "triples_dedup": triples_dedup,
        "entities": entities,
        "nodes": nodes,
        "edges": edges,
        "removed": removed,
    }
