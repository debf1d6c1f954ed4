"""Generated-vs-gold structural graph comparison
(reference src/evaluation/graph.py:13-90, networkx-based there; plain set /
counter math here — the graphs are ontology-scale).

Reference metrics per graph: node/edge counts, density (directed:
m / (n·(n-1)), rounded 5), average total degree (rounded 2).  Overlap
metrics (node/edge precision/recall/F1 after lower/strip normalization, the
gold loader's normalization) are added on top — the reference computes them
in its separate evaluation harness."""

from __future__ import annotations

from collections import Counter

from ontoray.text.normalize import normalize_eval


def graph_metrics(nodes: set, edges: set) -> dict:
    n, m = len(nodes), len(edges)
    metrics: dict = {"nodes": n, "edges": m}
    if n > 0:
        metrics["density"] = round(m / (n * (n - 1)), 5) if n > 1 else 0.0
        deg: Counter = Counter()
        for s, t in edges:
            deg[s] += 1
            deg[t] += 1
        metrics["avg_degree"] = round(
            sum(deg.get(x, 0) for x in nodes) / n, 2)
    return metrics


def _normalize_graph(nodes, edges) -> tuple[set, set]:
    nset = {normalize_eval(x) for x in nodes}
    eset = {(normalize_eval(s), normalize_eval(t)) for s, t, *_ in
            (e if isinstance(e, tuple) else tuple(e) for e in edges)}
    # Gold loader semantics: edges only between known nodes.
    eset = {(s, t) for s, t in eset if s in nset and t in nset}
    return nset, eset


def _prf(tp: int, n_got: int, n_want: int) -> dict:
    p = tp / n_got if n_got else 0.0
    r = tp / n_want if n_want else 0.0
    f1 = (2 * p * r / (p + r)) if (p + r) else 0.0
    return {"precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4)}


def compare_graphs(gen_nodes, gen_edges, gold_nodes, gold_edges) -> dict:
    """Structural comparison report: per-graph metrics + node/edge overlap."""
    gold_n, gold_e = _normalize_graph(gold_nodes, gold_edges)
    gen_n, gen_e = _normalize_graph(gen_nodes, gen_edges)
    return {
        "gold_standard": graph_metrics(gold_n, gold_e),
        "generated_ontology": graph_metrics(gen_n, gen_e),
        "node_overlap": _prf(len(gen_n & gold_n), len(gen_n), len(gold_n)),
        "edge_overlap": _prf(len(gen_e & gold_e), len(gen_e), len(gold_e)),
    }


def compare_graph_datasets(nodes_ds, edges_ds, gold_nodes, gold_edges) -> dict:
    """Comparison over materialized node/edge Datasets (ontology-scale
    collects of the name / endpoint columns only)."""
    from ontoray.util import column_lists
    names = column_lists(nodes_ds, ["name"])["name"]
    ecl = column_lists(edges_ds, ["src", "dst"])
    return compare_graphs(set(names), set(zip(ecl["src"], ecl["dst"])),
                          gold_nodes, gold_edges)
