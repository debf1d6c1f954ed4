"""Declarative query-suite functional evaluation.

Reference ``src/evaluation/multi_db_evaluator.py:128-169`` runs a Cypher suite
against each built graph and scores successful / empty / error counts plus
``success_rate`` ((successful+empty)/total*100) and ``resultful_rate``
(successful/total*100).  SURVEY §3.3 maps this to relational checks over the
materialized node/edge tables — here each suite entry is a named callable
over (nodes_ds, edges_ds) returning a row count (or raising), and the summary
reproduces the reference's scoring shape exactly."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _count_rel(edges_ds, rel: str) -> int:
    return edges_ds.filter(expr=f"rel == '{rel}'").count()


def _children_of(edges_ds, parent: str) -> int:
    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.equal(b.column("rel"), "SUBCLASS_OF"),
                                pc.equal(b.column("dst"), parent)))
    return edges_ds.map_batches(f, batch_format="pyarrow").count()


def _top_degree(nodes_ds, edges_ds) -> int:
    from ontoray.stages.curation import _degree_table
    return (_degree_table(edges_ds, pa.array([], pa.string()))
            .sort("degree", descending=True).limit(10).count())


def _learned_with_review(nodes_ds, edges_ds) -> int:
    return nodes_ds.filter(expr="status == 'review'").count()


def default_suite() -> list[tuple[str, callable]]:
    """Functional checks matching the reference's evaluation_queries.json
    intent (counts, hierarchy reachability, degree ranking, review state)."""
    return [
        ("count_nodes", lambda n, e: n.count()),
        ("count_edges", lambda n, e: e.count()),
        ("subclass_edges", lambda n, e: _count_rel(e, "SUBCLASS_OF")),
        ("children_of_root", lambda n, e: _children_of(e, "ElectronicComponent")),
        ("children_of_passive", lambda n, e: _children_of(e, "PassiveComponent")),
        ("top_degree_nodes", _top_degree),
        ("learned_nodes", lambda n, e: n.filter(
            expr="source == 'learned_from_dataset'").count()),
        ("review_queue_nodes", _learned_with_review),
        ("baseline_nodes", lambda n, e: n.filter(expr="source == 'Baseline'").count()),
    ]


def run_query_suite(nodes_ds, edges_ds, suite=None) -> dict:
    """Reference-shaped summary: totals, successful (>0 rows), empty (0),
    errors, success_rate, resultful_rate, plus per-query results."""
    suite = suite if suite is not None else default_suite()
    summary = {"total_queries": len(suite), "successful": 0,
               "empty_result": 0, "errors": 0, "results": {}}
    for name, fn in suite:
        try:
            n = int(fn(nodes_ds, edges_ds) or 0)
            summary["results"][name] = n
            if n > 0:
                summary["successful"] += 1
            else:
                summary["empty_result"] += 1
        except Exception as e:  # noqa: BLE001 — reference counts failures
            summary["results"][name] = f"error: {e}"
            summary["errors"] += 1
    total = summary["total_queries"]
    summary["success_rate"] = ((summary["successful"] + summary["empty_result"])
                               / total * 100) if total else 0.0
    summary["resultful_rate"] = (summary["successful"] / total * 100) if total else 0.0
    return summary
