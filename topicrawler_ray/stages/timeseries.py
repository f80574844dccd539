"""Time-series operators Ray Data lacks natively: tumbling-window
aggregation and the as-of join (prompt "custom operators" bullet).

Both are expressed as compositions of ``map_batches`` + one keyed
shuffle, with the partitioning assumption documented:

* **tumbling_window_agg**: the window id is a pure function of the
  timestamp (``floor(epoch / width)``), so assignment is stateless and
  vectorized; one ``groupby(window, *keys)`` shuffle aggregates.  Sums
  over float columns are micro-quantized to int64 first so the
  distributed reduce is exact and order-independent (same rule as
  ``perp_stats``).
* **asof_join**: for each left row, the latest right row with
  ``right.on <= left.on`` within the same ``by`` key (inclusive -
  DuckDB ``ASOF JOIN`` semantics).  Ray shape: align both sides to a
  common schema with a side tag, ONE ``groupby(by)`` shuffle, then a
  per-group vectorized ``pandas.merge_asof``.  With
  ``time_buckets=W > 1`` the giant-key path engages: rows are range-
  partitioned into W equal time buckets, each ``(by, bucket)`` group
  joins locally, and the latest right row per earlier bucket is
  carried forward per key (one forward-fill over at most W tail rows
  per key), so a single key whose history exceeds a task's memory
  splits across W tasks while staying EXACT - any earlier right row
  other than the carried tail can never be the as-of answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window_agg(
    ds,
    ts_column: str = "ts",
    width_seconds: int = 300,
    keys: tuple = ("event_type",),
    value_column: str = "value",
):
    """-> (window_start ts, *keys, n_events, sum_value_e2) per window."""
    from ray.data.aggregate import Count, Sum

    width_us = width_seconds * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = np.asarray(
            batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64()),
            dtype=np.int64,
        )
        win = (ts // width_us) * width_us
        e2 = np.rint(
            np.asarray(batch.column(value_column), dtype=np.float64) * 100
        ).astype(np.int64)
        return (
            batch.append_column("window_start_us", pa.array(win, pa.int64()))
            .append_column("value_e2", pa.array(e2, pa.int64()))
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start_us", *keys])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_e2", alias_name="sum_value_e2"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        ws = batch.column("window_start_us").cast(pa.timestamp("us"))
        batch = batch.drop_columns(["window_start_us"])
        return batch.add_column(0, "window_start", ws)

    return out.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(
    ds,
    ts_column: str = "ts",
    width_seconds: int = 600,
    hop_seconds: int = 300,
    keys: tuple = ("event_type",),
    value_column: str = "value",
):
    """Hopping (sliding) window aggregate: every event lands in the
    ``width/hop`` overlapping windows that contain it.

    -> (window_start ts, *keys, n_events, sum_value_e2) per window.

    Same exact-reduce discipline as :func:`tumbling_window_agg` (the
    value sum is micro-quantized to int64 per ROW before the shuffle).
    The replication factor is ``width // hop`` (must divide evenly) —
    assignment is a vectorized k-fold shifted copy per batch, then ONE
    groupby; no self-join, no range join.
    """
    from ray.data.aggregate import Count, Sum

    if width_seconds % hop_seconds:
        raise ValueError("width_seconds must be a multiple of hop_seconds")
    reps = width_seconds // hop_seconds
    hop_us = hop_seconds * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = np.asarray(
            batch.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64()),
            dtype=np.int64,
        )
        base = (ts // hop_us) * hop_us
        e2 = np.rint(
            np.asarray(batch.column(value_column), dtype=np.float64) * 100
        ).astype(np.int64)
        parts = []
        for j in range(reps):
            t = pa.table(
                {
                    "window_start_us": pa.array(base - j * hop_us, pa.int64()),
                    **{k: batch.column(k) for k in keys},
                    "value_e2": pa.array(e2, pa.int64()),
                }
            )
            parts.append(t)
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start_us", *keys])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_e2", alias_name="sum_value_e2"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        ws = batch.column("window_start_us").cast(pa.timestamp("us"))
        batch = batch.drop_columns(["window_start_us"])
        return batch.add_column(0, "window_start", ws)

    return out.map_batches(finish, batch_format="pyarrow")


def extract_json_field(
    ds, column: str = "props", field: str = "k", out_column: str | None = None,
    as_int: bool = True,
):
    """Semi-structured extraction: pull one field out of a JSON string
    column, vectorized per batch (stdlib ``json`` per row inside the
    batch fn - no driver involvement; a pyarrow JSON kernel would drop
    in when available).  Missing/invalid JSON -> null."""
    import json as _json

    out_column = out_column or field

    def fn(batch: pa.Table) -> pa.Table:
        vals = []
        for s in batch.column(column).to_pylist():
            try:
                v = _json.loads(s).get(field)
            except Exception:
                v = None
            if as_int and v is not None:
                try:
                    v = int(v)
                except (TypeError, ValueError):
                    v = None
            vals.append(v)
        ty = pa.int64() if as_int else pa.string()
        return batch.append_column(out_column, pa.array(vals, ty))

    return ds.map_batches(fn, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    right_columns: tuple,
    suffix: str = "_asof",
    time_buckets: int | None = None,
):
    """For each left row: columns of the latest right row with
    ``right[on] <= left[on]`` and equal ``by`` (NULLs when none).

    Returns the left schema + ``<col><suffix>`` for each of
    ``right_columns``.  ``time_buckets=W > 1`` enables the giant-key
    path (module docstring): exact range-partitioned as-of with
    per-key tail carry-forward, bounding any task at one key's rows
    within one time bucket instead of its whole history."""

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    types: dict[str, pa.DataType] = {}
    for name, ty in zip(right_schema.names, right_schema.types):
        types[name] = ty
    for name, ty in zip(left_schema.names, left_schema.types):
        types[name] = ty
    left_cols = list(left_schema.names)
    right_keep = list(dict.fromkeys([by, on, *right_columns]))
    all_cols = list(dict.fromkeys(left_cols + right_keep))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = {
                c: (
                    batch.column(c).cast(types[c])
                    if c in batch.schema.names
                    else pa.nulls(n, type=types[c])
                )
                for c in all_cols
            }
            t = pa.table(out)
            return t.append_column("__side", pa.array([side] * n, pa.int8()))

        return fn

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.select_columns(right_keep).map_batches(tag(1), batch_format="pyarrow")
    )

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        lefts = group[group["__side"] == 0].sort_values(on, kind="mergesort")
        rights = group[group["__side"] == 1].sort_values(on, kind="mergesort")
        rights = rights[[on, *right_columns]].copy()
        rights[on + suffix] = rights[on]  # the matched right timestamp
        rights = rights.rename(columns={c: c + suffix for c in right_columns})
        merged = pd.merge_asof(
            lefts[left_cols],
            rights,
            on=on,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged

    if not time_buckets or time_buckets <= 1:
        return tagged.groupby(by).map_groups(join_group, batch_format="pandas")

    # -- giant-key path: range partition + per-key tail carry-forward ------
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    W = int(time_buckets)
    tagged = tagged.materialize()  # reused below; aggregates are small
    bounds = tagged.aggregate(Min(on), Max(on))

    def _as_i64(v):
        # the aggregate returns int, np.datetime64 or pandas.Timestamp
        # depending on the column type; normalize to the COLUMN's unit
        # (same int64 view bucketize() uses)
        if isinstance(v, (int, np.integer)):
            return int(v)
        return pa.scalar(v).cast(types[on]).cast(pa.int64()).as_py()

    lo_i = _as_i64(bounds["min(%s)" % on])
    hi_i = _as_i64(bounds["max(%s)" % on])
    width = max(1, (hi_i - lo_i) // W + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        vals = batch.column(on).cast(pa.int64())
        b = pc.divide(pc.subtract(vals, lo_i), width)
        return batch.append_column("__bucket", pc.cast(b, pa.int32()))

    bucketed = tagged.map_batches(bucketize, batch_format="pyarrow")

    # latest right row per (key, bucket) - one row per pair, bounded
    def bucket_tail(group: pd.DataFrame) -> pd.DataFrame:
        rights = group[group["__side"] == 1]
        if rights.empty:
            return rights
        rights = rights.sort_values(
            [on, *right_columns], kind="mergesort"
        )
        return rights.tail(1)

    tails = bucketed.groupby([by, "__bucket"]).map_groups(
        bucket_tail, batch_format="pandas"
    )

    # forward-fill per key: emit the latest EARLIER tail into each later
    # bucket (at most W rows in, at most W rows out per key)
    def carry_forward(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("__bucket", kind="mergesort")
        out = []
        last = None
        next_b = 0
        for _, row in group.iterrows():
            b = int(row["__bucket"])
            if last is not None:
                for fill in range(next_b, b + 1):
                    if fill > int(last["__bucket"]):
                        r = last.copy()
                        r["__bucket"] = fill
                        out.append(r)
            last = row
            next_b = b + 1
        if last is not None:
            for fill in range(next_b, W):
                r = last.copy()
                r["__bucket"] = fill
                out.append(r)
        if not out:
            return group.iloc[0:0]
        return pd.DataFrame(out)

    carried = tails.groupby(by).map_groups(carry_forward, batch_format="pandas")

    def cast_like(batch: pa.Table) -> pa.Table:
        cols = {
            c: batch.column(c).cast(types[c]) for c in all_cols
        }
        t = pa.table(cols)
        t = t.append_column("__side", batch.column("__side").cast(pa.int8()))
        return t.append_column(
            "__bucket", batch.column("__bucket").cast(pa.int32())
        )

    final = bucketed.union(carried.map_batches(cast_like, batch_format="pyarrow"))

    def join_bucket_group(group: pd.DataFrame) -> pd.DataFrame:
        merged = join_group(group)
        return merged.drop(columns=["__bucket"], errors="ignore")

    return final.groupby([by, "__bucket"]).map_groups(
        join_bucket_group, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# range join (prompt "custom operators" bullet: as-of join, RANGE JOIN)


def range_join_count(
    ds,
    by: str = "user_id",
    on: str = "ts",
    window_seconds: int = 300,
    id_column: str = "event_id",
    time_buckets: int | None = None,
):
    """Self range join: for each row, the count of same-``by`` rows
    whose ``on`` falls in ``[row.on - window, row.on)`` (the strictly-
    earlier half-open window - the row itself and exact-tie rows are
    excluded, matching ``b.on >= a.on - W AND b.on < a.on`` in SQL).

    Returns ``(id_column, n_prior)``.

    Ray shape, default path: ONE ``groupby(by)`` shuffle; inside each
    group the timestamps are sorted once and both window edges are
    vectorized ``np.searchsorted`` probes - O(k log k) per key, no
    pairwise expansion.

    Giant-key path (``time_buckets=W > 1``): rows are range-
    partitioned into W time buckets of width >= the window, and every
    row is ALSO replicated as a context row into the next bucket; a
    window reaching back ``window`` can then only span the group's own
    bucket and the carried context, so each task is bounded by one
    key's rows within two buckets (2x replication, exact result).
    """
    import pyarrow.compute as pc

    win_us = int(window_seconds) * 1_000_000

    def group_counts(ids, ts_us, targets_mask=None):
        order = np.argsort(ts_us, kind="stable")
        st = ts_us[order]
        if targets_mask is None:
            tgt_ids, tgt_ts = ids, ts_us
        else:
            tgt_ids, tgt_ts = ids[targets_mask], ts_us[targets_mask]
        hi = np.searchsorted(st, tgt_ts, side="left")
        lo = np.searchsorted(st, tgt_ts - win_us, side="left")
        return tgt_ids, (hi - lo).astype(np.int64)

    if not time_buckets or time_buckets <= 1:

        def per_key(group: pd.DataFrame) -> pd.DataFrame:
            ids = group[id_column].to_numpy()
            ts_us = (
                group[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            )
            out_ids, n = group_counts(ids, ts_us)
            return pd.DataFrame({id_column: out_ids, "n_prior": n})

        return (
            ds.select_columns([id_column, by, on])
            .groupby(by)
            .map_groups(per_key, batch_format="pandas")
        )

    # -- giant-key path -----------------------------------------------------
    from ray.data.aggregate import Max, Min

    src = ds.select_columns([id_column, by, on]).materialize()
    bounds = src.aggregate(Min(on), Max(on))

    def _i64(v):
        if isinstance(v, (int, np.integer)):
            return int(v)
        return pa.scalar(v).cast(pa.timestamp("us")).cast(pa.int64()).as_py()

    lo_i = _i64(bounds["min(%s)" % on])
    hi_i = _i64(bounds["max(%s)" % on])
    width = max(win_us, (hi_i - lo_i) // int(time_buckets) + 1)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        keys = batch.column(by).to_numpy(zero_copy_only=False)
        ts_us = np.asarray(
            batch.column(on).cast(pa.int64()), dtype=np.int64
        )
        b = (ts_us - lo_i) // width
        return pa.table(
            {
                id_column: pa.array(np.concatenate([ids, ids])),
                by: pa.array(np.concatenate([keys, keys])),
                "__ts": pa.array(np.concatenate([ts_us, ts_us])),
                "__bucket": pa.array(
                    np.concatenate([b, b + 1]).astype(np.int32)
                ),
                "__tgt": pa.array(
                    np.concatenate(
                        [np.ones(len(b), bool), np.zeros(len(b), bool)]
                    )
                ),
            }
        )

    exploded = src.map_batches(explode, batch_format="pyarrow")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_column].to_numpy()
        ts_us = group["__ts"].to_numpy()
        tgt = group["__tgt"].to_numpy()
        if not tgt.any():
            return pd.DataFrame({id_column: [], "n_prior": []}).astype(
                {id_column: np.int64, "n_prior": np.int64}
            )
        out_ids, n = group_counts(ids, ts_us, targets_mask=tgt)
        return pd.DataFrame({id_column: out_ids, "n_prior": n})

    return exploded.groupby([by, "__bucket"]).map_groups(
        per_bucket, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# session windows (gap-and-island sessionization - the prompt's
# "streaming window" custom operator, keyed by user)


def sessionize(
    ds,
    by: str = "user_id",
    on: str = "ts",
    gap_seconds: int = 1800,
    order_column: str = "event_id",
):
    """Group each key's events into sessions: a new session starts
    when the gap to the previous event (by ``on``) exceeds
    ``gap_seconds`` STRICTLY.  Returns one row per session:
    ``(by, session_id, session_start, session_end, n_events)`` with
    1-based ``session_id`` per key in time order (SQL gap-and-island
    ``sum(new_session) OVER (...)`` numbering).

    Ray shape: ONE ``groupby(by)`` shuffle + a vectorized in-group
    diff/cumsum - no window-function engine needed.  Partitioning
    assumption: one key's events fit a task (same contract as the
    as-of join's default path).  The scale escape hatch for a
    pathological key is compositional: bucket by time and link
    boundary events with ``stages.components.connected_components``
    (events within ``gap`` of each other are edges; sessions ARE the
    components, since any cross-boundary pair within the gap implies
    the sorted-consecutive gap is within the gap too).
    """

    gap_us = int(gap_seconds) * 1_000_000

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values([on, order_column], kind="mergesort")
        ts_us = group[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_s = np.ones(len(ts_us), dtype=np.int64)
        if len(ts_us) > 1:
            new_s[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        df = pd.DataFrame(
            {"sid": sid, "ts_us": ts_us, by: group[by].to_numpy()}
        )
        agg = df.groupby("sid", sort=True).agg(
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
            n_events=("ts_us", "size"),
            key=(by, "first"),
        )
        agg = agg.reset_index()
        return pd.DataFrame(
            {
                by: agg["key"],
                "session_id": agg["sid"].astype(np.int64),
                "session_start_us": agg["session_start_us"],
                "session_end_us": agg["session_end_us"],
                "n_events": agg["n_events"].astype(np.int64),
            }
        )

    out = (
        ds.select_columns([by, on, order_column])
        .groupby(by)
        .map_groups(per_key, batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        start = batch.column("session_start_us").cast(pa.timestamp("us"))
        end = batch.column("session_end_us").cast(pa.timestamp("us"))
        return pa.table(
            {
                by: batch.column(by),
                "session_id": batch.column("session_id"),
                "session_start": start,
                "session_end": end,
                "n_events": batch.column("n_events"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def per_key_lag(
    ds,
    by: str = "user_id",
    on: str = "ts",
    tie: str = "event_id",
    lag_columns: tuple = ("ts", "event_type"),
    time_buckets: int | None = None,
):
    """SQL ``LAG(col) OVER (PARTITION BY by ORDER BY on, tie)`` as a
    Dataset operator: each row gains ``lag_<col>`` from the previous
    row of its key (first row per key: -1 for numeric/timestamp
    columns, "" for strings - concrete sentinels keep the output
    hash-comparable, no NaN columns).

    Default path: one ``groupby(by)`` exchange; ordering + shift are
    per-group vectorized pandas (a key's history must fit one task).

    Giant-key path (``time_buckets=W > 1``): rows are range-partitioned
    into W time buckets; each ``(by, bucket)`` group shifts locally and
    the LAST row of each key's latest earlier non-empty bucket is
    carried in as a context row (dropped after the shift), so the first
    row of every bucket still sees its true predecessor.  A bucket
    boundary cannot split equal ``on`` values across buckets (buckets
    are value ranges), so the carried row is exactly the global
    predecessor - the result is EXACT while bounding any task at one
    key's rows within one bucket (+<=1 context row).
    """
    import pandas as pd

    def shift_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([on, tie]).reset_index(drop=True)
        for col in lag_columns:
            s = g[col].shift(1)
            name = "lag_%s" % col
            if pd.api.types.is_datetime64_any_dtype(g[col]):
                vals = (
                    g[col]
                    .astype("datetime64[us]")  # explicit µs, any input unit
                    .astype("int64")
                    .shift(1)
                    .fillna(-1)
                    .astype("int64")
                )
                g[name + "_us"] = vals
            elif pd.api.types.is_numeric_dtype(g[col]):
                g[name] = s.fillna(-1).astype(g[col].dtype)
            else:
                g[name] = s.fillna("")
        return g

    if not time_buckets or time_buckets <= 1:
        return ds.groupby(by).map_groups(shift_group, batch_format="pandas")

    # -- giant-key path ------------------------------------------------------
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    W = int(time_buckets)
    src = ds.materialize()  # bucketed twice below (rows + tails)
    schema = src.schema()
    types = dict(zip(schema.names, schema.types))

    bounds = src.aggregate(Min(on), Max(on))

    def _i64(v):
        if isinstance(v, (int, np.integer)):
            return int(v)
        return pa.scalar(v).cast(types[on]).cast(pa.int64()).as_py()

    lo_i = _i64(bounds["min(%s)" % on])
    hi_i = _i64(bounds["max(%s)" % on])
    width = max(1, (hi_i - lo_i) // W + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        vals = batch.column(on).cast(pa.int64())
        b = pc.cast(pc.divide(pc.subtract(vals, lo_i), width), pa.int32())
        return batch.append_column("__bucket", b).append_column(
            "__carry", pa.array(np.zeros(batch.num_rows, dtype=bool))
        )

    bucketed = src.map_batches(bucketize, batch_format="pyarrow")

    # last row per (key, bucket) - one bounded row per pair
    def bucket_tail(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([on, tie], kind="mergesort").tail(1)

    tails = bucketed.groupby([by, "__bucket"]).map_groups(
        bucket_tail, batch_format="pandas"
    )

    # per key: project each tail into every later bucket up to the next
    # non-empty one (<= W context rows per key)
    def carry_forward(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__bucket", kind="mergesort")
        out = []
        last = None
        for _, row in g.iterrows():
            b = int(row["__bucket"])
            if last is not None:
                for fill in range(int(last["__bucket"]) + 1, b + 1):
                    r = last.copy()
                    r["__bucket"] = fill
                    r["__carry"] = True
                    out.append(r)
            last = row
        if not out:
            return g.iloc[0:0]
        return pd.DataFrame(out)

    carried = tails.groupby(by).map_groups(carry_forward, batch_format="pandas")

    def cast_like(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c).cast(types[c]) for c in schema.names}
        t = pa.table(cols)
        t = t.append_column("__bucket", batch.column("__bucket").cast(pa.int32()))
        return t.append_column("__carry", batch.column("__carry").cast(pa.bool_()))

    final = bucketed.union(carried.map_batches(cast_like, batch_format="pyarrow"))

    def shift_bucket_group(g: pd.DataFrame) -> pd.DataFrame:
        shifted = shift_group(g)
        shifted = shifted[~shifted["__carry"]]
        return shifted.drop(columns=["__bucket", "__carry"])

    return final.groupby([by, "__bucket"]).map_groups(
        shift_bucket_group, batch_format="pandas"
    )


def per_key_cumsum(
    ds,
    by: str = "user_id",
    on: str = "ts",
    tie: str = "event_id",
    value_column: str = "value",
    time_buckets: int | None = None,
):
    """SQL ``SUM(v) OVER (PARTITION BY by ORDER BY on, tie ROWS
    UNBOUNDED PRECEDING)`` + ``ROW_NUMBER() OVER (...)`` as a Dataset
    operator.  The float value is micro-quantized to e2 int64 per ROW
    first (same exact-reduce rule as :func:`tumbling_window_agg`), so
    the running sum is order-independent integer math and the
    distributed result hashes identically to the SQL window oracle.

    Returns ``(tie, by, row_rank, cum_value_e2)`` - ``row_rank`` is the
    1-based position of the row within its key's ``(on, tie)`` order.

    Default path: one ``groupby(by)`` exchange, per-group vectorized
    sort + ``cumsum`` (one key's history per task).

    Giant-key path (``time_buckets=W > 1``): a textbook distributed
    prefix sum.  Rows are range-partitioned into W time buckets;
    each ``(by, bucket)`` group computes its LOCAL cumsum/rank; bucket
    totals (one slim row per ``(by, bucket)``) are prefix-summed per
    key into exclusive offsets; offsets join back on the combined
    ``key*W + bucket`` id and are added.  Any task is bounded by one
    key's rows within one bucket; the offset table is ``keys x W``
    rows.  Exact by construction - integer sums commute.
    """

    def quantize(batch: pa.Table) -> pa.Table:
        e2 = np.rint(
            np.asarray(batch.column(value_column), dtype=np.float64) * 100
        ).astype(np.int64)
        on_us = batch.column(on)
        if pa.types.is_timestamp(on_us.type):
            on_us = on_us.cast(pa.timestamp("us"))
        return pa.table(
            {
                tie: batch.column(tie),
                by: batch.column(by),
                "__on": on_us.cast(pa.int64()),
                "value_e2": pa.array(e2, pa.int64()),
            }
        )

    slim = ds.select_columns([tie, by, on, value_column]).map_batches(
        quantize, batch_format="pyarrow"
    )

    def local_cumsum(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["__on", tie], kind="mergesort").reset_index(drop=True)
        out = pd.DataFrame(
            {
                tie: g[tie],
                by: g[by],
                "row_rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cum_value_e2": g["value_e2"].to_numpy(np.int64).cumsum(),
            }
        )
        if "__kb" in g.columns:
            out["__kb"] = g["__kb"]
        # clean Arrow out: a pandas block would carry the b'pandas'
        # schema key into the downstream offset join's hash shuffle
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    if not time_buckets or time_buckets <= 1:
        return slim.groupby(by).map_groups(local_cumsum, batch_format="pandas")

    # -- giant-key path: distributed prefix sum ------------------------------
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    W = int(time_buckets)
    slim = slim.materialize()  # consumed twice (locals + totals)
    bounds = slim.aggregate(Min("__on"), Max("__on"))
    lo_i, hi_i = int(bounds["min(__on)"]), int(bounds["max(__on)"])
    width = max(1, (hi_i - lo_i) // W + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = pc.divide(pc.subtract(batch.column("__on"), lo_i), width)
        kb = pc.add(pc.multiply(batch.column(by), W + 1), b)
        return batch.append_column("__kb", pc.cast(kb, pa.int64()))

    bucketed = slim.map_batches(bucketize, batch_format="pyarrow")

    locals_ = bucketed.groupby("__kb").map_groups(
        local_cumsum, batch_format="pandas"
    )

    totals = bucketed.groupby("__kb").aggregate(
        Sum("value_e2", alias_name="bucket_sum_e2"),
        Count(alias_name="bucket_n"),
    )

    # exclusive prefix over each key's <=W bucket totals (tiny groups)
    def exclusive_prefix(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("__kb", kind="mergesort").reset_index(drop=True)
        s = g["bucket_sum_e2"].to_numpy(np.int64).cumsum()
        n = g["bucket_n"].to_numpy(np.int64).cumsum()
        return pa.table(
            {
                "__kb": pa.array(g["__kb"].to_numpy(np.int64), pa.int64()),
                "offset_e2": pa.array(np.concatenate(([0], s[:-1])), pa.int64()),
                "offset_n": pa.array(np.concatenate(([0], n[:-1])), pa.int64()),
            }
        )

    def key_of(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__key", pc.divide(batch.column("__kb"), W + 1)
        )

    offsets = (
        totals.map_batches(key_of, batch_format="pyarrow")
        .groupby("__key")
        .map_groups(exclusive_prefix, batch_format="pandas")
    )

    joined = locals_.join(
        offsets,
        join_type="inner",
        num_partitions=max(8, W),
        on=("__kb",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                tie: batch.column(tie),
                by: batch.column(by),
                "row_rank": pc.add(
                    batch.column("row_rank"), batch.column("offset_n")
                ),
                "cum_value_e2": pc.add(
                    batch.column("cum_value_e2"), batch.column("offset_e2")
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def cohort_retention(events_ds, ts_column: str = "ts",
                     user_column: str = "user_id",
                     num_partitions: int | None = None):
    """Classic cohort retention matrix over an event stream: users
    grouped by their first-activity day, counted on each later active
    day as an offset from that first day.

    -> (cohort_day, day_offset, n_users) where days are integer epoch
    days (``floor(epoch_us / 86_400_000_000)`` — exact integers on
    both engine and oracle sides, no timezone/format surface).

    Shape: one per-batch dedup to slim ``(user, day)`` rows + a
    distinct groupby (activity set), ONE ``groupby(user).min`` for the
    cohorts, ONE hash join user->cohort, ONE counting groupby — every
    exchange moves 2-int rows.  Distinct (user, day) rows make the
    final count(*) a count-distinct-users for free.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)
    US_PER_DAY = 86_400_000_000

    def user_days(batch: pa.Table) -> pa.Table:
        d = pc.divide(
            batch.column(ts_column).cast(pa.int64()),
            pa.scalar(US_PER_DAY, pa.int64()),
        )
        t = pa.table(
            {"user_id": batch.column(user_column), "d": d}
        )
        # in-batch combiner: the global distinct groupby still runs,
        # but the exchange shrinks to unique rows per batch first
        return t.group_by(["user_id", "d"]).aggregate([]).select(
            ["user_id", "d"]
        )

    ud = (
        events_ds.map_batches(user_days, batch_format="pyarrow")
        .groupby(["user_id", "d"])
        .count()
        .select_columns(["user_id", "d"])
        .repartition(num_partitions)
    )
    firsts = (
        ud.groupby("user_id")
        .min("d")
        .map_batches(
            lambda b: pa.table(
                {
                    "user_id": b.column("user_id"),
                    "d0": b.column("min(d)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
    )
    joined = ud.join(
        firsts, join_type="inner", num_partitions=num_partitions, on=("user_id",)
    )

    def offsets(batch: pa.Table) -> pa.Table:
        d = batch.column("d").cast(pa.int64())
        d0 = batch.column("d0").cast(pa.int64())
        return pa.table(
            {
                "cohort_day": d0,
                "day_offset": pc.subtract(d, d0),
                "n_users": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    out = (
        joined.map_batches(offsets, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(["cohort_day", "day_offset"])
        .sum("n_users")
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "cohort_day": b.column("cohort_day").cast(pa.int64()),
                "day_offset": b.column("day_offset").cast(pa.int64()),
                "n_users": b.column("sum(n_users)").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def session_paths(
    ds,
    k: int = 20,
    by: str = "user_id",
    on: str = "ts",
    type_column: str = "event_type",
    order_column: str = "event_id",
    gap_seconds: int = 1800,
):
    """Top-k session navigation paths: sessionize each key's events
    with the same strict-gap rule as :func:`sessionize`, render each
    session as its ordered ``event_type`` sequence joined by ``>``,
    count identical paths corpus-wide and keep the ``k`` most frequent
    (count DESC, path ASC) with dense 0-based ranks — the canonical
    clickstream product query, here doubling as the crawl-log
    behaviour fingerprint.

    Ray shape: ONE ``groupby(by)`` shuffle (the sessionize exchange);
    each group already folds its paths to (path, n_part) partials, so
    the second ``groupby(path).sum`` moves at most one row per
    (user, distinct path).  Only the top-k survivors (k rows) reach
    the driver for rank assignment.

    -> (path, n_sessions, rank), exact integers.
    """
    import pandas as pd_
    from ray.data.aggregate import Sum

    gap_us = int(gap_seconds) * 1_000_000

    def per_key(group: pd.DataFrame) -> pa.Table:
        group = group.sort_values([on, order_column], kind="mergesort")
        ts_us = group[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_s = np.ones(len(ts_us), dtype=np.int64)
        if len(ts_us) > 1:
            new_s[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        types = group[type_column].astype(str).to_numpy()
        counts: dict[str, int] = {}
        for s in range(1, sid[-1] + 1):
            path = ">".join(types[sid == s])
            counts[path] = counts.get(path, 0) + 1
        keys = sorted(counts)
        return pa.table(
            {
                "path": pa.array(keys, pa.string()),
                "n_part": pa.array([counts[p] for p in keys], pa.int64()),
            }
        )

    from ..stages.dedup import _default_partitions

    counted = (
        ds.select_columns([by, on, type_column, order_column])
        .groupby(by)
        .map_groups(per_key, batch_format="pandas")
        # few-group aggregate: concatenate away the empty hash
        # partitions (they emit 0-row/0-column blocks that trip the
        # executor's schema-divergence warning downstream)
        .repartition(_default_partitions(None))
        .groupby("path")
        .aggregate(Sum("n_part", alias_name="n_sessions"))
    )
    top = counted.sort(["n_sessions", "path"], descending=[True, False]).limit(k)
    df = top.to_pandas().reset_index(drop=True)
    df["rank"] = np.arange(len(df), dtype=np.int64)
    return df
