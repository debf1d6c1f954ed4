"""Curation operators: orphan removal + low-degree pruning.

Reference src/curation/graph_cleaner.py:25-77 — (C1) learned nodes with no
SUBCLASS_OF* path to 'ElectronicComponent' are deleted; (C2) learned nodes
with total degree <= 1 are deleted.

The reachability fixpoint runs over the *ontology class graph* (nodes ×
subclass edges), which is orders of magnitude smaller than the corpus — the
deduplicated subclass pairs are collected to the driver for a bounded BFS and
the resulting keep-set is broadcast back into vectorized filters.  At a node
count too large for the driver this becomes the iterative
``edges.semi_join(reachable)`` loop documented in SURVEY C1.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _reachable_names(subclass_pairs: list[tuple[str, str]], root: str,
                     max_depth: int = 12) -> set[str]:
    """Names with a SUBCLASS_OF*0.. path to ``root`` (child -> parent edges)."""
    children: dict[str, list[str]] = {}
    for child, parent in subclass_pairs:
        children.setdefault(parent, []).append(child)
    reach = {root}
    frontier = [root]
    for _ in range(max_depth):
        nxt = []
        for p in frontier:
            for c in children.get(p, ()):
                if c not in reach:
                    reach.add(c)
                    nxt.append(c)
        if not nxt:
            break
        frontier = nxt
    return reach


def curate(nodes_ds, edges_ds, root: str = "ElectronicComponent",
           degree_threshold: int = 1, max_depth: int = 12):
    """Returns (nodes_ds, edges_ds, removed_counts) after C1 + C2."""
    # Subclass pairs and degrees come from the already-deduplicated edge
    # table — small (entity-scale, not corpus-scale).
    edge_rows = edges_ds.select_columns(["src", "rel", "dst"]).take_all()
    sub_pairs = [(r["src"], r["dst"]) for r in edge_rows if r["rel"] == "SUBCLASS_OF"]
    reach = _reachable_names(sub_pairs, root, max_depth)

    node_rows = nodes_ds.select_columns(["name", "source"]).take_all()
    learned = {r["name"] for r in node_rows if r["source"] == "learned_from_dataset"}
    orphans = learned - reach

    # C2: degree over the surviving graph.
    degree: dict[str, int] = {}
    for r in edge_rows:
        if r["src"] in orphans or r["dst"] in orphans:
            continue
        degree[r["src"]] = degree.get(r["src"], 0) + 1
        degree[r["dst"]] = degree.get(r["dst"], 0) + 1
    low_degree = {n for n in (learned - orphans) if degree.get(n, 0) <= degree_threshold}

    removed = orphans | low_degree
    gone = pa.array(sorted(removed)) if removed else pa.array([], pa.string())

    # DETACH DELETE semantics: only rows touching a *deleted* node go; edges
    # to literal endpoints (attribute values that never became nodes) stay.
    def filter_nodes(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch.column("name"), value_set=gone)))

    def filter_edges(batch: pa.Table) -> pa.Table:
        bad = pc.or_(pc.is_in(batch.column("src"), value_set=gone),
                     pc.is_in(batch.column("dst"), value_set=gone))
        return batch.filter(pc.invert(bad))

    out_nodes = nodes_ds.map_batches(filter_nodes, batch_format="pyarrow")
    out_edges = edges_ds.map_batches(filter_edges, batch_format="pyarrow")
    return out_nodes, out_edges, {"orphans_removed": len(orphans),
                                  "low_degree_removed": len(low_degree)}


def graph_stats(nodes_ds, edges_ds, root: str = "Thing", max_depth: int = 12) -> dict:
    """Structural stats (reference schema_org_graph_builder.py:126-141 and
    evaluation/final_ontology_analyzer.py:32-127): counts, density, degree
    stats, relation-type histogram, max SUBCLASS_OF depth to the root."""
    n_nodes = nodes_ds.count()
    edge_rows = edges_ds.select_columns(["src", "rel", "dst"]).take_all()
    n_edges = len(edge_rows)
    density = n_edges / (n_nodes * (n_nodes - 1)) if n_nodes > 1 else 0.0

    rel_hist: dict[str, int] = {}
    degree: dict[str, int] = {}
    parent: dict[str, str] = {}
    for r in edge_rows:
        rel_hist[r["rel"]] = rel_hist.get(r["rel"], 0) + 1
        degree[r["src"]] = degree.get(r["src"], 0) + 1
        degree[r["dst"]] = degree.get(r["dst"], 0) + 1
        if r["rel"] == "SUBCLASS_OF":
            parent.setdefault(r["src"], r["dst"])

    max_d = 0
    for name in parent:
        d, cur = 0, name
        while cur in parent and d <= max_depth:
            cur = parent[cur]
            d += 1
        if cur == root:
            max_d = max(max_d, d)
    degs = sorted(degree.values())
    return {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "density": density,
        "rel_histogram": dict(sorted(rel_hist.items())),
        "max_subclass_depth": max_d,
        "avg_degree": (sum(degs) / len(degs)) if degs else 0.0,
        "max_degree": degs[-1] if degs else 0,
        "n_orphan_nodes": n_nodes - len(degree),
    }
