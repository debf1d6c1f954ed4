"""Graph materialize: deduplicated, sorted node and edge Parquet tables.

Replaces the reference's Neo4j MERGE sink (src/schema_org_graph_builder.py:
34-124) with relational semantics: MERGE-by-name ≡ groupby(name).first with a
deterministic priority (Baseline beats learned, then min status), edge MERGE
≡ groupby(src, rel, dst) rollup, and the dynamic relation-type sanitizer
([^a-zA-Z0-9_] → _, uppercased; src/schema_org_graph_builder.py:84) as a
vectorized column op.  Final tables are globally sorted (A6 sort-materialize).

Endpoint resolution (surface form -> node name) is a hash-partitioned
left-outer ``Dataset.join`` on the raw surface form — scale path for a
vocabulary too large to broadcast; unmatched objects (literals like
'2.4-5.8 ghz') resolve to themselves.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ontoray.aliases import AliasData
from ontoray.linking import EXTEND, MAP_EXACT, MAP_SIMILAR, UNCERTAIN

_SANITIZE = re.compile(r"[^a-zA-Z0-9_]")

NODE_SCHEMA = pa.schema([
    ("name", pa.string()),
    ("source", pa.string()),      # 'Baseline' | 'learned_from_dataset'
    ("status", pa.string()),      # 'new' | 'review' | '' for baseline
    ("parent_class", pa.string()),
    ("n_mentions", pa.int64()),
    ("confidence", pa.float32()),
])


def sanitize_rel(rel: str) -> str:
    """Neo4j relation-type sanitizer, reference schema_org_graph_builder.py:84."""
    return _SANITIZE.sub("_", rel).upper()


def baseline_nodes_table(alias: AliasData) -> pa.Table:
    names = list(alias.parent.keys())
    return pa.table({
        "name": pa.array(names, pa.string()),
        "source": pa.array(["Baseline"] * len(names), pa.string()),
        "status": pa.array([""] * len(names), pa.string()),
        "parent_class": pa.array([alias.parent[n] for n in names], pa.string()),
        "n_mentions": pa.array([0] * len(names), pa.int64()),
        "confidence": pa.array([1.0] * len(names), pa.float32()),
    }).cast(NODE_SCHEMA)


def tasks_to_nodes(batch: pa.Table) -> pa.Table:
    """Entity decisions -> learned node rows (EXTEND & UNCERTAIN become
    CREATE_CLASS tasks, reference src/integrated_schema_pipeline.py:182-216)."""
    mask = pc.is_in(batch.column("decision"),
                    value_set=pa.array([EXTEND, UNCERTAIN]))
    t = batch.filter(mask)
    return pa.table({
        "name": t.column("name"),
        "source": pa.array(["learned_from_dataset"] * t.num_rows, pa.string()),
        "status": t.column("status"),
        "parent_class": t.column("parent_class"),
        "n_mentions": t.column("n_mentions"),
        "confidence": t.column("confidence"),
    }).cast(NODE_SCHEMA)


def _node_first(g: pd.DataFrame) -> pd.DataFrame:
    # MERGE-by-name determinism: Baseline rows win, then higher n_mentions.
    g = g.sort_values(["source", "n_mentions", "name"],
                      ascending=[True, False, True], kind="mergesort")
    return g.head(1)


def build_nodes(entities_ds, alias: AliasData):
    import ray.data as rd
    learned = entities_ds.map_batches(tasks_to_nodes, batch_format="pyarrow")
    base = rd.from_arrow(baseline_nodes_table(alias))
    return (learned.union(base)
            .groupby("name").map_groups(_node_first, batch_format="pandas")
            .sort("name"))


def resolution_table(entities_ds):
    """(surface=name_norm, resolved) mapping: MAP_* decisions resolve to their
    target node, everything else to the raw surface form that becomes a
    learned node.  Keyed and deduplicated on the normalized form so triple
    endpoints (already normalized) join directly; groups pick the mapped
    target first, then the most-mentioned surface (deterministic)."""
    def to_map(batch: pa.Table) -> pa.Table:
        name = batch.column("name")
        target = batch.column("target")
        decision = batch.column("decision")
        mapped = pc.is_in(decision, value_set=pa.array([MAP_EXACT, MAP_SIMILAR]))
        is_mapped = pc.and_(mapped, pc.is_valid(target))
        resolved = pc.if_else(is_mapped, target, name)
        return pa.table({"surface": batch.column("name_norm"), "resolved": resolved,
                         "mapped": is_mapped, "n_mentions": batch.column("n_mentions")})

    def pick(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["mapped", "n_mentions", "resolved"],
                          ascending=[False, False, True], kind="mergesort")
        out = g.head(1)[["surface", "resolved"]]
        # Emit Arrow so downstream sorts/joins never see mixed block types.
        return pa.table({"surface": pa.array(out["surface"].tolist(), pa.string()),
                         "resolved": pa.array(out["resolved"].tolist(), pa.string())})

    return (entities_ds.map_batches(to_map, batch_format="pyarrow")
            .groupby("surface").map_groups(pick, batch_format="pandas"))


def build_edges(entities_ds, triples_dedup_ds, alias: AliasData, num_partitions: int = 16,
                resolve_mode: str = "broadcast"):
    """Edge table: taxonomic task edges + baseline hierarchy + resolved
    non-taxonomic triples, deduplicated on (src, rel, dst) and sorted.

    ``resolve_mode='broadcast'`` ships the (name_norm → node) resolution map
    to every task via ``ray.put`` — correct while the canonical-entity
    vocabulary fits in memory (it is vocabulary-bounded, not corpus-bounded).
    ``resolve_mode='join'`` is the unbounded-scale path: two partitioned hash
    joins (ontoray.stages.joins.hash_join) on the normalized endpoint.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    res = resolution_table(entities_ds)

    # Task + baseline subclass edges.
    def task_edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch.column("decision"), value_set=pa.array([EXTEND, UNCERTAIN])),
            pc.is_valid(batch.column("parent_class")))
        t = batch.filter(mask)
        n = t.num_rows
        return pa.table({
            "src": t.column("name"),
            "rel": pa.array(["SUBCLASS_OF"] * n, pa.string()),
            "dst": t.column("parent_class"),
            "taxonomic": pa.array([True] * n, pa.bool_()),
            "conf": t.column("confidence"),
            "n": pa.array([1] * n, pa.int64()),
        })

    base_pairs = [(c, p) for c, p in alias.parent.items() if p]
    base_edges = rd.from_arrow(pa.table({
        "src": pa.array([c for c, _ in base_pairs], pa.string()),
        "rel": pa.array(["SUBCLASS_OF"] * len(base_pairs), pa.string()),
        "dst": pa.array([p for _, p in base_pairs], pa.string()),
        "taxonomic": pa.array([True] * len(base_pairs), pa.bool_()),
        "conf": pa.array([1.0] * len(base_pairs), pa.float32()),
        "n": pa.array([1] * len(base_pairs), pa.int64()),
    }))

    tedges = entities_ds.map_batches(task_edges, batch_format="pyarrow")

    # Non-taxonomic triples: resolve both endpoints surface -> node name.
    nt = (triples_dedup_ds
          .map_batches(lambda b: b.filter(pc.invert(pc.equal(b.column("pred_norm"), "subclass_of"))),
                       batch_format="pyarrow"))

    if resolve_mode == "join":
        from ontoray.stages.joins import hash_join

        def _rename(to: str):
            def fn(b: pa.Table) -> pa.Table:
                return b.select(["surface", "resolved"]).rename_columns(["surface", to])
            return fn

        nt = hash_join(nt, res.map_batches(_rename("resolved_s"), batch_format="pyarrow"),
                       "subj_norm", "surface", how="left", num_partitions=num_partitions)
        nt = hash_join(nt, res.map_batches(_rename("resolved_o"), batch_format="pyarrow"),
                       "obj_norm", "surface", how="left", num_partitions=num_partitions)

        def finish_nt(batch: pa.Table) -> pa.Table:
            src = pc.coalesce(batch.column("resolved_s"), batch.column("subj_norm"))
            dst = pc.coalesce(batch.column("resolved_o"), batch.column("obj_norm"))
            n = batch.num_rows
            return pa.table({
                "src": src.cast(pa.string()),
                "rel": pa.array([sanitize_rel(r) for r in batch.column("pred_norm").to_pylist()],
                                pa.string()),
                "dst": dst.cast(pa.string()),
                "taxonomic": pa.array([False] * n, pa.bool_()),
                "conf": batch.column("conf").cast(pa.float32()),
                "n": batch.column("n_obs").cast(pa.int64()),
            })

        ntedges = nt.map_batches(finish_nt, batch_format="pyarrow")
    else:
        import ray
        res_map = {r["surface"]: r["resolved"] for r in res.take_all()}
        res_ref = ray.put(res_map)

        def finish_bc(batch: pa.Table) -> pa.Table:
            rmap = ray.get(res_ref)
            subs = batch.column("subj_norm").to_pylist()
            objs = batch.column("obj_norm").to_pylist()
            n = batch.num_rows
            return pa.table({
                "src": pa.array([rmap.get(s, s) for s in subs], pa.string()),
                "rel": pa.array([sanitize_rel(r) for r in batch.column("pred_norm").to_pylist()], pa.string()),
                "dst": pa.array([rmap.get(o, o) for o in objs], pa.string()),
                "taxonomic": pa.array([False] * n, pa.bool_()),
                "conf": batch.column("conf"),
                "n": batch.column("n_obs"),
            })

        ntedges = nt.map_batches(finish_bc, batch_format="pyarrow")

    all_edges = tedges.union(base_edges).union(ntedges)
    deduped = (all_edges.groupby(["src", "rel", "dst"]).aggregate(
        Max("taxonomic", alias_name="taxonomic"),
        Max("conf", alias_name="confidence"),
        Sum("n", alias_name="n_obs"),
    ))
    return deduped.sort(["src", "rel", "dst"])
