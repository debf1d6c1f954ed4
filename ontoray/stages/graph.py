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


# MERGE-by-name first-wins runs as a vectorized min-aggregate over an
# order-encoded key (Baseline beats learned, then higher n_mentions) — a
# per-group Python callback at one-group-per-name granularity is ~100x slower
# at open-vocabulary entity counts.
_INV = 10**12


def _encode_node_rows(batch: pa.Table) -> pa.Table:
    keys = []
    for src, status, parent, n_m, conf in zip(
            batch.column("source").to_pylist(), batch.column("status").to_pylist(),
            batch.column("parent_class").to_pylist(), batch.column("n_mentions").to_pylist(),
            batch.column("confidence").to_pylist()):
        prio = "0" if src == "Baseline" else "1"
        keys.append(f"{prio}{_INV - (n_m or 0):013d}\x1f{src}\x1f{status or ''}"
                    f"\x1f{parent or ''}\x1f{n_m}\x1f{conf!r}")
    return pa.table({"name": batch.column("name"), "k": pa.array(keys, pa.string())})


def _decode_node_rows(batch: pa.Table) -> pa.Table:
    names = batch.column("name").to_pylist()
    cols = {c: [] for c in ("source", "status", "parent_class", "n_mentions", "confidence")}
    for k in batch.column("k").to_pylist():
        _prefix, src, status, parent, n_m, conf = k.split("\x1f")
        cols["source"].append(src)
        cols["status"].append(status)
        cols["parent_class"].append(parent or None)
        cols["n_mentions"].append(int(n_m))
        cols["confidence"].append(float(conf))
    return pa.table({
        "name": pa.array(names, pa.string()),
        "source": pa.array(cols["source"], pa.string()),
        "status": pa.array(cols["status"], pa.string()),
        "parent_class": pa.array(cols["parent_class"], pa.string()),
        "n_mentions": pa.array(cols["n_mentions"], pa.int64()),
        "confidence": pa.array(cols["confidence"], pa.float32()),
    }).cast(NODE_SCHEMA)


def build_nodes(entities_ds, alias: AliasData):
    import ray.data as rd
    from ontoray.stages.agg import hash_aggregate
    learned = entities_ds.map_batches(tasks_to_nodes, batch_format="pyarrow")
    base = rd.from_arrow(baseline_nodes_table(alias))
    encoded = learned.union(base).map_batches(_encode_node_rows, batch_format="pyarrow")
    return (hash_aggregate(encoded, ["name"],
                           partial_aggs=[("k", "min")],
                           aggs=[("k_min", "min")], rename={"k_min_min": "k"})
            .map_batches(_decode_node_rows, batch_format="pyarrow")
            .sort("name"))


def resolution_table(entities_ds):
    """(surface=name_norm, resolved) mapping: MAP_* decisions resolve to their
    target node, everything else to the raw surface form that becomes a
    learned node.  Keyed and deduplicated on the normalized form so triple
    endpoints (already normalized) join directly; groups pick the mapped
    target first, then the most-mentioned surface (deterministic)."""
    def to_key(batch: pa.Table) -> pa.Table:
        # Order-encoded key: mapped targets first, then higher n_mentions,
        # then lexicographic — vectorized min-aggregate replaces a per-group
        # callback (open-vocabulary group counts).
        keys = []
        for name, target, decision, n_m in zip(
                batch.column("name").to_pylist(), batch.column("target").to_pylist(),
                batch.column("decision").to_pylist(), batch.column("n_mentions").to_pylist()):
            mapped = decision in (MAP_EXACT, MAP_SIMILAR) and target
            resolved = target if mapped else name
            prio = "0" if mapped else "1"
            keys.append(f"{prio}{_INV - (n_m or 0):013d}\x1f{resolved}")
        return pa.table({"surface": batch.column("name_norm"),
                         "k": pa.array(keys, pa.string())})

    def decode(batch: pa.Table) -> pa.Table:
        resolved = [k.split("\x1f", 1)[1] for k in batch.column("k").to_pylist()]
        return pa.table({"surface": batch.column("surface"),
                         "resolved": pa.array(resolved, pa.string())})

    from ontoray.stages.agg import hash_aggregate
    return hash_aggregate(
        entities_ds.map_batches(to_key, batch_format="pyarrow"), ["surface"],
        partial_aggs=[("k", "min")],
        aggs=[("k_min", "min")], rename={"k_min_min": "k"},
    ).map_batches(decode, batch_format="pyarrow")


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
        from ontoray.util import column_lists
        cl = column_lists(res, ["surface", "resolved"])
        res_map = dict(zip(cl["surface"], cl["resolved"]))
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

    from ontoray.stages.agg import hash_aggregate

    def _bool_to_int(batch: pa.Table) -> pa.Table:
        return batch.set_column(batch.schema.get_field_index("taxonomic"), "taxonomic",
                                pc.cast(batch.column("taxonomic"), pa.int8()))

    all_edges = tedges.union(base_edges).union(ntedges).map_batches(
        _bool_to_int, batch_format="pyarrow")
    deduped = hash_aggregate(
        all_edges, ["src", "rel", "dst"],
        partial_aggs=[("taxonomic", "max"), ("conf", "max"), ("n", "sum")],
        aggs=[("taxonomic_max", "max"), ("conf_max", "max"), ("n_sum", "sum")],
        rename={"taxonomic_max_max": "taxonomic", "conf_max_max": "confidence",
                "n_sum_sum": "n_obs"})

    def _int_to_bool(batch: pa.Table) -> pa.Table:
        return batch.set_column(batch.schema.get_field_index("taxonomic"), "taxonomic",
                                pc.cast(batch.column("taxonomic"), pa.bool_()))

    return deduped.map_batches(_int_to_bool, batch_format="pyarrow").sort(["src", "rel", "dst"])
