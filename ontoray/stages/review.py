"""C3: human review accept/reject as a DELTA TABLE joined at read.

The reference mutates Neo4j in place when a reviewer accepts or rejects an
uncertain concept (src/ontology_management_backend.py:805-860).  Relational
semantics here (SURVEY §2.8): review decisions append to a tiny
(name, action, seq) delta table — human-rate-bounded, so it broadcasts —
and every rebuild applies the deltas to the immutable entities checkpoint at
read time:

* ``reject`` — the entity row is dropped, so the rebuilt node/edge tables
  exclude the concept (and curation then removes anything stranded by it).
* ``accept`` — the row's status moves ``review`` → ``accepted`` (it remains
  a learned node; acceptance is an audit state, not a semantic change).

Last decision per name wins (max seq).  Nothing corpus-proportional moves:
the delta table is a driver-side Arrow table persisted as one small parquet
file; application is a vectorized broadcast filter inside ``map_batches``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

REVIEW_SCHEMA = pa.schema([
    ("name", pa.string()),
    ("action", pa.string()),     # 'accept' | 'reject'
    ("seq", pa.int64()),         # monotonically increasing decision counter
])


def make_deltas(decisions: list[tuple[str, str]], start_seq: int = 0) -> pa.Table:
    """[(name, action)] -> delta table rows (seq = arrival order)."""
    for _n, a in decisions:
        if a not in ("accept", "reject"):
            raise ValueError(f"unknown review action: {a!r}")
    return pa.table({
        "name": pa.array([n for n, _ in decisions], pa.string()),
        "action": pa.array([a for _, a in decisions], pa.string()),
        "seq": pa.array(range(start_seq, start_seq + len(decisions)), pa.int64()),
    }).cast(REVIEW_SCHEMA)


def save_deltas(deltas: pa.Table, path: str) -> None:
    """Append-style persistence: merge with any existing file and rewrite
    (the table is human-rate-bounded — one small parquet, not a log)."""
    import pyarrow.parquet as pq
    if os.path.exists(path):
        deltas = pa.concat_tables([pq.read_table(path), deltas.cast(REVIEW_SCHEMA)])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(deltas.cast(REVIEW_SCHEMA), path)


def load_deltas(path: str) -> pa.Table:
    import pyarrow.parquet as pq
    if not os.path.exists(path):
        return REVIEW_SCHEMA.empty_table()
    return pq.read_table(path).cast(REVIEW_SCHEMA)


def _last_wins(deltas: pa.Table) -> tuple[pa.Array, pa.Array]:
    """(rejected_names, accepted_names) after max-seq-per-name resolution."""
    if deltas.num_rows == 0:
        empty = pa.array([], pa.string())
        return empty, empty
    idx = (deltas.group_by("name").aggregate([("seq", "max")])
           .rename_columns(["name", "seq"]))
    joined = idx.join(deltas, keys=["name", "seq"], join_type="inner")
    rejected = joined.filter(pc.equal(joined.column("action"), "reject"))
    accepted = joined.filter(pc.equal(joined.column("action"), "accept"))
    return (rejected.column("name").combine_chunks(),
            accepted.column("name").combine_chunks())


def apply_reviews(entities_ds, deltas: pa.Table):
    """entities Dataset × delta table -> reviewed entities Dataset.

    Pure view (map_batches broadcast filter): callers rebuild nodes/edges
    from the result — the checkpointed entities table itself is never
    rewritten, so review application is idempotent and replayable."""
    import ray

    rejected, accepted = _last_wins(deltas)
    if len(rejected) == 0 and len(accepted) == 0:
        return entities_ds
    ref = ray.put((rejected, accepted))

    def fix(batch: pa.Table) -> pa.Table:
        rej, acc = ray.get(ref)
        if len(rej):
            batch = batch.filter(
                pc.invert(pc.is_in(batch.column("name"), value_set=rej)))
        if len(acc) and batch.num_rows:
            mask = pc.and_(pc.is_in(batch.column("name"), value_set=acc),
                           pc.equal(batch.column("status"), "review"))
            i = batch.schema.get_field_index("status")
            batch = batch.set_column(
                i, "status",
                pc.if_else(mask, pa.scalar("accepted", pa.string()),
                           batch.column("status")))
        return batch

    return entities_ds.map_batches(fix, batch_format="pyarrow")


def rebuild_with_reviews(entities_ds, alias, deltas: pa.Table, *,
                         curation_root: str = "ElectronicComponent",
                         degree_threshold: int = 1, max_depth: int = 12,
                         triples_dedup_ds=None, sort_mode: str = "partitioned"):
    """Reviewed entities -> curated (nodes, edges): the C3 round-trip.

    Rejected concepts vanish from the node table AND from every edge that
    touched them (the rebuild re-resolves endpoints against the reviewed
    entity set), then curation prunes anything the rejection stranded."""
    from ontoray.stages.curation import curate
    from ontoray.stages.graph import build_edges, build_nodes

    import ray

    reviewed = apply_reviews(entities_ds, deltas).materialize()
    nodes = build_nodes(reviewed, alias, sort_mode)
    if triples_dedup_ds is not None:
        edges = build_edges(reviewed, triples_dedup_ds, alias,
                            sort_mode=sort_mode)
    else:
        import ray.data as rd
        from ontoray.stages.graph import (_baseline_edges_table,
                                          _task_edges_batch)
        tedges = reviewed.map_batches(_task_edges_batch, batch_format="pyarrow")
        edges = tedges.union(rd.from_arrow(_baseline_edges_table(alias)))

    # DETACH DELETE semantics: a rejected concept's raw surface still occurs
    # in triples, so without this filter its edges would survive with the
    # bare surface form as a LITERAL endpoint — the reviewer said no.
    rejected, _acc = _last_wins(deltas)
    if len(rejected):
        rej_ref = ray.put(rejected)

        def drop_rejected(batch: pa.Table) -> pa.Table:
            rej = ray.get(rej_ref)
            bad = pc.or_(pc.is_in(batch.column("src"), value_set=rej),
                         pc.is_in(batch.column("dst"), value_set=rej))
            return batch.filter(pc.invert(bad))

        edges = edges.map_batches(drop_rejected, batch_format="pyarrow")
    nodes, edges, removed = curate(nodes, edges, curation_root,
                                   degree_threshold, max_depth)
    return nodes, edges, removed
