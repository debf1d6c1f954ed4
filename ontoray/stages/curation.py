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


def reachable_distributed(edges_ds, root: str, max_depth: int = 12) -> set[str]:
    """Iterative semi-join reachability (SURVEY C1 scale path): per round,
    children of the frontier are found by a broadcast-filter over the
    SUBCLASS_OF edges — the edge table never leaves the cluster; only each
    round's (deduplicated) frontier does.  Equivalent to ``_reachable_names``;
    used when the subclass pair list outgrows the driver."""
    sub = edges_ds.filter(expr="rel == 'SUBCLASS_OF'").select_columns(
        ["src", "dst"]).materialize()
    reach: set[str] = {root}
    frontier: set[str] = {root}
    for _ in range(max_depth):
        frontier_arr = pa.array(sorted(frontier))

        def children_of(batch: pa.Table) -> pa.Table:
            hit = batch.filter(pc.is_in(batch.column("dst"), value_set=frontier_arr))
            return hit.select(["src"])

        nxt = {r["src"] for r in sub.map_batches(
            children_of, batch_format="pyarrow").take_all()} - reach
        if not nxt:
            break
        reach |= nxt
        frontier = nxt
    return reach


def _degree_table(edges_ds, exclude: pa.Array):
    """(name, degree) over edges not touching ``exclude`` — distributed
    two-sided count via bucketed hash aggregation."""
    from ontoray.stages.agg import hash_aggregate

    def endpoints(batch: pa.Table) -> pa.Table:
        bad = pc.or_(pc.is_in(batch.column("src"), value_set=exclude),
                     pc.is_in(batch.column("dst"), value_set=exclude))
        b = batch.filter(pc.invert(bad))
        return pa.table({"name": pa.concat_arrays(
            [b.column("src").combine_chunks(), b.column("dst").combine_chunks()])})

    ends = edges_ds.select_columns(["src", "dst"]).map_batches(
        endpoints, batch_format="pyarrow")
    return hash_aggregate(ends, ["name"],
                          partial_aggs=[("name", "count")],
                          aggs=[("name_count", "sum")],
                          rename={"name_count_sum": "degree"})


def curate(nodes_ds, edges_ds, root: str = "ElectronicComponent",
           degree_threshold: int = 1, max_depth: int = 12):
    """Returns (nodes_ds, edges_ds, removed_counts) after C1 + C2.

    The reachability fixpoint collects only the SUBCLASS_OF pairs and the
    learned-node names (ontology-scale); degrees are computed distributed
    (two-sided bucketed count) rather than by shipping the edge table to the
    driver."""
    from ontoray.util import column_lists
    sp = column_lists(edges_ds.filter(expr="rel == 'SUBCLASS_OF'"), ["src", "dst"])
    sub_pairs = list(zip(sp["src"], sp["dst"]))
    reach = _reachable_names(sub_pairs, root, max_depth)

    learned = set(column_lists(
        nodes_ds.filter(expr="source == 'learned_from_dataset'"), ["name"])["name"])
    orphans = learned - reach

    orphan_arr = pa.array(sorted(orphans)) if orphans else pa.array([], pa.string())
    dg = column_lists(_degree_table(edges_ds, orphan_arr), ["name", "degree"])
    degree = dict(zip(dg["name"], dg["degree"]))
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
    from ontoray.util import column_lists

    n_nodes = nodes_ds.count()
    n_edges = edges_ds.count()
    density = n_edges / (n_nodes * (n_nodes - 1)) if n_nodes > 1 else 0.0

    node_names = set(column_lists(nodes_ds, ["name"])["name"])
    parent: dict[str, str] = {}
    if n_edges <= 5_000_000:
        # Summary stats over a driver-sized edge table: one collection, one
        # fold — cheaper than several distributed scans.
        from collections import Counter
        cl = column_lists(edges_ds, ["src", "rel", "dst"])
        rel_hist = dict(Counter(cl["rel"]))
        degree_c: Counter = Counter(cl["src"])
        degree_c.update(cl["dst"])
        # Degree names include literal endpoints (attribute values that never
        # became nodes); orphan counting is over NODES only.
        n_connected = sum(1 for n in degree_c if n in node_names)
        deg_sum = sum(degree_c.values())
        deg_max = max(degree_c.values()) if degree_c else 0
        for s, r, d in zip(cl["src"], cl["rel"], cl["dst"]):
            if r == "SUBCLASS_OF":
                parent.setdefault(s, d)
    else:
        from ray.data.aggregate import Count
        rel_hist = {r["rel"]: r["n"] for r in
                    edges_ds.groupby("rel").aggregate(Count(alias_name="n")).take_all()}
        deg = _degree_table(edges_ds, pa.array([], pa.string())).materialize()
        node_arr = pa.array(sorted(node_names))
        n_connected = deg.map_batches(
            lambda b: b.filter(pc.is_in(b.column("name"), value_set=node_arr)),
            batch_format="pyarrow").count()
        deg_sum = deg.sum("degree") if deg.count() else 0
        deg_max = deg.max("degree") if deg.count() else 0
        sp = column_lists(edges_ds.filter(expr="rel == 'SUBCLASS_OF'"), ["src", "dst"])
        for s, d in zip(sp["src"], sp["dst"]):
            parent.setdefault(s, d)
    max_d = 0
    for name in parent:
        d, cur = 0, name
        while cur in parent and d <= max_depth:
            cur = parent[cur]
            d += 1
        if cur == root:
            max_d = max(max_d, d)

    return {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "density": density,
        "rel_histogram": dict(sorted(rel_hist.items())),
        "max_subclass_depth": max_d,
        "avg_degree": (deg_sum / n_connected) if n_connected else 0.0,
        "max_degree": deg_max,
        "n_orphan_nodes": n_nodes - n_connected,
    }
