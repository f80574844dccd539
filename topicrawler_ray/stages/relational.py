"""General relational building blocks: broadcast dimension join and
grouping-sets rollup - the star-schema analytics surface.

``broadcast_lookup_join`` is the map-side ("replicated") join: when
one side is a dimension table (nations, hosts, configs - small by
contract), shuffling the fact table to meet it is wasted exchange.
The dimension is reduced to sorted key + value arrays ONCE, ``ray.put``
into the object store, and every fact block gathers its columns with a
vectorized ``searchsorted`` - zero shuffle, zero-copy broadcast reads.

``rollup_aggregate`` computes GROUPING SETS ``(a, b), (a), ()`` the
scale-correct way: ONE shuffle at the finest granularity, then the
(small) aggregate table is re-aggregated per coarser set - subtotals
never touch the fact table again.  Float measures must be quantized to
int64 upstream so the re-aggregation is associative/exact (same
micro-quantization discipline as stages/timeseries.py windows).

Reference context: remstef/topicrawler has no relational star joins;
this rounds out the join surface next to bloom_semijoin
(stages/joins.py) and the fetch-sim join (state/pagestore.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _dim_arrays(dim_ds, key: str, value_columns: list[str]):
    """Materialize the (small) dimension to sorted numpy arrays."""
    tabs = [b for b in dim_ds.select_columns([key] + value_columns)
            .iter_batches(batch_format="pyarrow")]
    if not tabs:
        raise ValueError("empty dimension table")
    tab = pa.concat_tables(tabs)
    keys = tab.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    vals = {
        c: tab.column(c).to_numpy(zero_copy_only=False)[order]
        for c in value_columns
    }
    return keys[order], vals


class DimLookup:
    """Actor-pool map-side join stage: appends the dimension's value
    columns; inner semantics (rows without a dimension match are
    dropped) or left semantics with nulls, per ``how``."""

    def __init__(self, dim_ref, fact_key: str, how: str):
        import ray

        self.keys, self.vals = ray.get(dim_ref)
        self.fact_key = fact_key
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        fk = batch.column(self.fact_key).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.keys, fk)
        idx_c = np.minimum(idx, len(self.keys) - 1)
        hit = self.keys[idx_c] == fk
        if self.how == "inner":
            batch = batch.filter(pa.array(hit))
            idx_c = idx_c[hit]
            for c, v in self.vals.items():
                batch = batch.append_column(c, pa.array(v[idx_c]))
            return batch
        for c, v in self.vals.items():
            gathered = pa.array(v[idx_c])
            if not hit.all():
                gathered = pc.if_else(
                    pa.array(hit), gathered, pa.scalar(None, gathered.type)
                )
            batch = batch.append_column(c, gathered)
        return batch


def broadcast_lookup_join(
    fact_ds,
    dim_ds,
    fact_key: str,
    dim_key: str,
    value_columns: list[str],
    how: str = "inner",
    concurrency: int | None = None,
):
    """Join ``fact_ds`` against a small ``dim_ds`` without a shuffle.
    ``dim_key`` must be unique in the dimension."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    keys, vals = _dim_arrays(dim_ds, dim_key, value_columns)
    if len(np.unique(keys)) != len(keys):
        raise ValueError("dimension key %r is not unique" % dim_key)
    dim_ref = ray.put((keys, vals))
    return fact_ds.map_batches(
        DimLookup,
        fn_constructor_kwargs={
            "dim_ref": dim_ref,
            "fact_key": fact_key,
            "how": how,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def pricing_summary(lineitem_ds):
    """TPC-H-Q1-shaped pricing summary: per (l_returnflag, l_linestatus)
    row count plus exact-integer sums of quantity, base price, discounted
    price and tax-charged price.

    Scale shape: every float measure is quantized ONCE per row with the
    repo-wide ``floor(x * 100)`` discipline (identical IEEE arithmetic in
    numpy and DuckDB), then the whole aggregation is associative int64
    algebra — a per-batch ``pyarrow`` group_by combiner collapses each
    block to at most |flags|x|statuses| partial rows, and ONE tiny
    ``groupby`` merges the partials.  The exchange moves O(groups x
    blocks) rows regardless of fact-table size.

    int64 headroom: charge_e6 is base_e2 (< 2^24) x discount factor
    (<= 100) x tax factor (<= 108) < 2^38 per row, so ~2^25 rows per
    GROUP per BATCH would be needed to overflow a partial — far beyond
    any block size; the final merge sums blocks x groups partials and
    stays exact to ~2^62 total, asserted below.
    """

    def fold(batch: pa.Table) -> pa.Table:
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tax = np.floor(
            batch.column("l_tax").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_e4 = base * (100 - disc)
        charge_e6 = disc_e4 * (100 + tax)
        part = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "n_rows": pa.array(np.ones(len(base), np.int64)),
                "sum_qty_e2": pa.array(qty),
                "sum_base_e2": pa.array(base),
                "sum_disc_e4": pa.array(disc_e4),
                "sum_charge_e6": pa.array(charge_e6),
            }
        )
        out = part.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("n_rows", "sum"),
                ("sum_qty_e2", "sum"),
                ("sum_base_e2", "sum"),
                ("sum_disc_e4", "sum"),
                ("sum_charge_e6", "sum"),
            ]
        )
        return out.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "n_rows",
                "sum_qty_e2",
                "sum_base_e2",
                "sum_disc_e4",
                "sum_charge_e6",
            ]
        )

    from ray.data.aggregate import Sum

    partials = lineitem_ds.map_batches(fold, batch_format="pyarrow")
    # few-group aggregate: TPC-H Q1 has |returnflag| x |linestatus| ~ 6
    # groups total, so a cluster-wide exchange would emit mostly empty
    # schema-less blocks (executor schema-divergence warnings); two
    # partitions keep both merge tasks non-empty and the exchange is
    # O(groups x blocks) rows either way
    partials = partials.repartition(2)
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Sum("sum_qty_e2", alias_name="sum_qty_e2"),
        Sum("sum_base_e2", alias_name="sum_base_e2"),
        Sum("sum_disc_e4", alias_name="sum_disc_e4"),
        Sum("sum_charge_e6", alias_name="sum_charge_e6"),
    )

    def guard(batch: pa.Table) -> pa.Table:
        charges = batch.column("sum_charge_e6").to_numpy(zero_copy_only=False)
        assert (np.abs(charges) < (1 << 62)).all(), (
            "sum_charge_e6 nearing int64 overflow: shard the fact table "
            "per date range before the pricing summary"
        )
        return batch

    return merged.map_batches(guard, batch_format="pyarrow")


def rollup_aggregate(ds, group_columns: list[str], sum_column: str,
                     total_label: str = "__all__"):
    """GROUPING SETS rollup of an int64 measure: one fact-table shuffle
    at the finest grain, coarser levels re-aggregated from the (small)
    result.  Returns a Dataset with the full rollup; coarser levels
    carry ``total_label`` in the rolled-up string columns.

    Output columns: ``group_columns + [sum_column, n_rows]``.
    """
    from ray.data.aggregate import Count, Sum

    fine = (
        ds.groupby(group_columns)
        .aggregate(
            Sum(sum_column, alias_name=sum_column),
            Count(alias_name="n_rows"),
        )
    )

    levels = [fine]
    prev = fine
    for depth in range(len(group_columns) - 1, -1, -1):
        keep = group_columns[:depth]
        rolled = group_columns[depth]

        def collapse(batch: pa.Table, rolled=rolled) -> pa.Table:
            i = batch.schema.get_field_index(rolled)
            return batch.set_column(
                i,
                rolled,
                pa.array([total_label] * batch.num_rows, pa.string()),
            )

        coarse_input = prev.map_batches(collapse, batch_format="pyarrow")
        # n_rows is re-aggregated as a SUM of the finer level's counts
        # (a Count here would count groups, not fact rows); grouping by
        # the full column list keeps the collapsed (constant) columns
        # in the output schema
        prev = coarse_input.groupby(list(group_columns)).aggregate(
            Sum(sum_column, alias_name=sum_column),
            Sum("n_rows", alias_name="n_rows"),
        )
        levels.append(prev)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def customer_order_distribution(orders_ds, customer_ds):
    """TPC-H-Q13-shaped customer distribution: how many customers
    placed exactly ``c_count`` orders, INCLUDING the zero-order bucket
    (the classic outer-join-then-histogram shape).

    Ray shape: per-batch pyarrow combiner collapses each orders block
    to distinct (o_custkey, partial n) rows, ONE slim
    ``groupby(o_custkey).sum`` exchange, then a second per-batch
    combiner folds per-customer counts into (c_count, partial
    customers) partials and ONE histogram-sized groupby merges them.
    The zero bucket needs exactly two scalars - total customers (a
    Count aggregate on the pruned customer key column) and customers
    with >= 1 order (the sum of the histogram itself) - so the driver
    only ever sees histogram-sized data, never a fact table.
    """
    from ray.data.aggregate import Sum

    def per_cust(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table(
            {
                "o_custkey": g.column("o_custkey"),
                "n_part": pc.cast(g.column("o_custkey_count"), pa.int64()),
            }
        )

    per_customer = (
        orders_ds.map_batches(per_cust, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n_part", alias_name="c_count"))
    )

    def hist_part(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_count").aggregate([("c_count", "count")])
        return pa.table(
            {
                "c_count": g.column("c_count"),
                "cd_part": pc.cast(g.column("c_count_count"), pa.int64()),
            }
        )

    hist = (
        per_customer.map_batches(hist_part, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("cd_part", alias_name="custdist"))
    )
    hist_tab = pa.concat_tables(
        list(hist.iter_batches(batch_format="pyarrow"))
    )
    n_customers = customer_ds.count()
    n_with_orders = pc.sum(hist_tab.column("custdist")).as_py() or 0
    n_zero = n_customers - n_with_orders
    schema = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])
    parts = [hist_tab.cast(schema)]
    if n_zero > 0:  # the bucket exists only when zero-order customers do
        parts.append(
            pa.table(
                {
                    "c_count": pa.array([0], pa.int64()),
                    "custdist": pa.array([n_zero], pa.int64()),
                }
            )
        )
    return pa.concat_tables(parts).sort_by([("c_count", "ascending")])


def late_shipment_priority_counts(orders_ds, lineitem_ds):
    """TPC-H-Q4-shaped order-priority check: count orders per
    ``o_orderpriority`` where at least one lineitem shipped AFTER the
    order date (EXISTS semijoin with a per-pair date predicate).

    Ray shape: the EXISTS collapses to max(l_shipdate) per order BEFORE
    any join - a per-batch pyarrow combiner then ONE slim
    ``groupby(l_orderkey).max`` over 16-byte rows, so the join moves
    one row per order, not one per lineitem.  Then ONE hash join
    orders ⋈ max-shipdate on the order key (both sides streamed), a
    vectorized date filter, and a histogram-sized priority groupby.
    Timestamps travel as int64 epoch-us (acero-friendly join payload).
    """
    from ray.data.aggregate import Max, Sum

    from .dedup import _default_partitions

    def li_part(batch: pa.Table) -> pa.Table:
        ship = pc.cast(batch.column("l_shipdate"), pa.int64())
        t = pa.table(
            {"l_orderkey": batch.column("l_orderkey"), "ship_us": ship}
        )
        g = t.group_by("l_orderkey").aggregate([("ship_us", "max")])
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "ship_part": g.column("ship_us_max"),
            }
        )

    max_ship = (
        lineitem_ds.map_batches(li_part, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Max("ship_part", alias_name="max_ship_us"))
    )

    def ord_slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "order_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
            }
        )

    joined = orders_ds.map_batches(ord_slim, batch_format="pyarrow").join(
        max_ship,
        join_type="inner",
        num_partitions=_default_partitions(None),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def prio_part(batch: pa.Table) -> pa.Table:
        late = batch.filter(
            pc.greater(batch.column("max_ship_us"), batch.column("order_us"))
        )
        g = late.group_by("o_orderpriority").aggregate(
            [("o_orderpriority", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "n_part": pc.cast(g.column("o_orderpriority_count"), pa.int64()),
            }
        )

    return (
        joined.map_batches(prio_part, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_part", alias_name="n_orders"))
    )


def filtered_revenue(lineitem_ds, lo_us: int, hi_us: int,
                     disc_lo_e2: int, disc_hi_e2: int, qty_lt: int):
    """TPC-H-Q6-shaped forecast-revenue-change: one predicate-heavy
    scan, zero joins, zero shuffles of fact rows.

    Scale shape: every block folds to EXACTLY ONE partial row
    (n_rows, rev_e4) after the vectorized date/discount/quantity mask,
    so the only exchange is O(blocks) 2-int rows into a single merge
    task — the canonical "scan + scalar aggregate" plan.  Revenue uses
    the repo-wide ``floor(x * 100)`` micro-quantization on BOTH the
    price and the discount, so ``rev_e4 = base_e2 * disc_e2`` is exact
    int64 algebra identical to the DuckDB oracle expression (headroom:
    base_e2 < 2^24, disc_e2 <= 10 => < 2^28/row; 60k-row blocks sum to
    < 2^45 per partial, < 2^62 total).

    Reference context: topicrawler has no relational scan-aggregates;
    this extends the TPC-H-shaped surface (Q1/Q3/Q4/Q13 analogs in
    this module) with the pure-filter plan shape.
    """

    def fold(batch: pa.Table) -> pa.Table:
        us = batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = (
            (us >= lo_us)
            & (us < hi_us)
            & (disc >= disc_lo_e2)
            & (disc <= disc_hi_e2)
            & (qty < qty_lt)
        )
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        rev = base * disc[keep]
        return pa.table(
            {
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
                "revenue_e4": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    import ray.data as _rd

    # zero seed row: keeps the single-row contract even if the source
    # dataset is empty (Ray's batcher drops empty blocks)
    seed = _rd.from_items([{"n_rows": 0, "revenue_e4": 0}])
    partials = (
        lineitem_ds.map_batches(fold, batch_format="pyarrow")
        .union(seed)
        .repartition(1)
    )

    def merge(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_rows": pa.array(
                    [int(np.sum(batch.column("n_rows").to_numpy()))], pa.int64()
                ),
                "revenue_e4": pa.array(
                    [int(np.sum(batch.column("revenue_e4").to_numpy()))],
                    pa.int64(),
                ),
            }
        )

    return partials.map_batches(merge, batch_format="pyarrow")


def returned_customer_revenue(lineitem_ds, orders_ds, customer_ds, nation_ds,
                              lo_us: int, hi_us: int, k: int = 20):
    """TPC-H-Q10-shaped returned-item report: top-k customers by exact
    integer revenue lost to returned lineitems in a date window, with
    customer name / account balance / nation name attached.

    Scale shape: the orders side is date-window-bounded BEFORE anything
    else (a window of orders is the small side by contract — at
    unbounded window width this swaps for a hash join, documented),
    then the returned-lineitem scan quantizes revenue per row and folds
    via a broadcast order->customer lookup; ONE groupby(c_custkey)
    moves slim (custkey, rev_e4) partials; customer/nation attributes
    ride broadcast dimension lookups AFTER the aggregate (k' = distinct
    buying customers, never the fact table); per-block partial top-k +
    an O(k x blocks) driver merge finish, same discipline as the Q3
    analog above.
    """
    import pyarrow.compute as _pc

    def orders_slim(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = _pc.and_(_pc.greater_equal(us, lo_us), _pc.less(us, hi_us))
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
            }
        ).filter(keep)

    orders = orders_ds.map_batches(orders_slim, batch_format="pyarrow")

    def line_slim(batch: pa.Table) -> pa.Table:
        keep = _pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch.column("l_orderkey").to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.int64(),
                ),
                "rev_e4": pa.array(base * (100 - disc), pa.int64()),
            }
        )

    line = lineitem_ds.map_batches(line_slim, batch_format="pyarrow")
    joined = broadcast_lookup_join(
        line, orders, "l_orderkey", "o_orderkey", ["o_custkey"], concurrency=2
    )

    def cust_part(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("rev_e4", "sum")])
        return pa.table(
            {
                "c_custkey": pc.cast(g.column("o_custkey"), pa.int64()),
                "rev_part": pc.cast(g.column("rev_e4_sum"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    per_cust = (
        joined.map_batches(cust_part, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev_part", alias_name="revenue_e4"))
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                batch.column("revenue_e4").to_pylist(),
                batch.column("c_custkey").to_pylist(),
            ),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        return pa.table(
            {
                "revenue_e4": pa.array([r[0] for r in rows], pa.int64()),
                "c_custkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    partials = per_cust.map_batches(partial_top, batch_format="pyarrow").take_all()
    best = sorted(partials, key=lambda r: (-r["revenue_e4"], r["c_custkey"]))[:k]

    # attribute fetch for ONLY the k winners: a pruned key-set scan of the
    # customer table returns <= k rows to the driver (no join stage, no
    # second actor pool — the attributes never ride the aggregate exchange)
    win_keys = frozenset(r["c_custkey"] for r in best)

    win_arr = np.sort(np.array(sorted(win_keys), dtype=np.int64))

    def pick(batch: pa.Table, _keys=win_arr) -> pa.Table:
        return _keyset_filter(batch, "c_custkey", _keys)

    attrs = {
        r["c_custkey"]: r
        for r in customer_ds.select_columns(
            ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    }
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in nation_ds.select_columns(["n_nationkey", "n_name"]).take_all()
    }
    return pa.table(
        {
            "rank": pa.array(range(len(best)), pa.int64()),
            "c_custkey": pa.array([r["c_custkey"] for r in best], pa.int64()),
            "c_name": pa.array(
                [attrs[r["c_custkey"]]["c_name"] for r in best], pa.string()
            ),
            "acctbal_e2": pa.array(
                [
                    int(np.floor(attrs[r["c_custkey"]]["c_acctbal"] * 100.0))
                    for r in best
                ],
                pa.int64(),
            ),
            "n_name": pa.array(
                [
                    nations[attrs[r["c_custkey"]]["c_nationkey"]]
                    for r in best
                ],
                pa.string(),
            ),
            "revenue_e4": pa.array([r["revenue_e4"] for r in best], pa.int64()),
        }
    )


def promo_revenue_ratio(lineitem_ds, part_ds, lo_us: int, hi_us: int,
                        promo_type: str):
    """TPC-H-Q14-shaped promotion-effect ratio: share of discounted
    revenue in a ship-date window attributable to parts of one type.

    Scale shape: the part table is the dimension side by contract
    (types/brands catalog) — its (p_partkey -> is_promo) bit rides a
    broadcast lookup into the month-bounded lineitem scan; every block
    folds to ONE (promo_rev_e4, total_rev_e4) partial row, merged in a
    single task; the ratio is evaluated ONCE from the two exact int64
    sums with a fixed float expression quantized to e9 (identical in
    the DuckDB oracle).  No fact-side shuffle at any width.
    """

    def line_slim(batch: pa.Table) -> pa.Table:
        us = batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        keep = (us >= lo_us) & (us < hi_us)
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(
                    batch.column("l_partkey").to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.int64(),
                ),
                "rev_e4": pa.array(base * (100 - disc), pa.int64()),
            }
        )

    line = lineitem_ds.map_batches(line_slim, batch_format="pyarrow")
    joined = broadcast_lookup_join(
        line, part_ds.select_columns(["p_partkey", "p_type"]),
        "l_partkey", "p_partkey", ["p_type"], concurrency=2,
    )

    def fold(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev_e4").to_numpy(zero_copy_only=False)
        promo = pc.equal(batch.column("p_type"), promo_type).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_rev_e4": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_rev_e4": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    import ray.data as _rd

    # zero seed row: Ray's batcher drops empty blocks, so a window
    # matching nothing would otherwise yield ZERO rows instead of the
    # oracle's (0, 0, 0) scalar contract
    seed = _rd.from_items([{"promo_rev_e4": 0, "total_rev_e4": 0}])
    partials = (
        joined.map_batches(fold, batch_format="pyarrow")
        .union(seed)
        .repartition(1)
    )

    def merge(batch: pa.Table) -> pa.Table:
        promo = int(np.sum(batch.column("promo_rev_e4").to_numpy()))
        total = int(np.sum(batch.column("total_rev_e4").to_numpy()))
        # fixed float expression, quantized — evaluated identically in SQL
        pct_e9 = int(np.floor(100.0 * float(promo) / float(total) * 1e9)) \
            if total else 0
        return pa.table(
            {
                "promo_rev_e4": pa.array([promo], pa.int64()),
                "total_rev_e4": pa.array([total], pa.int64()),
                "promo_pct_e9": pa.array([pct_e9], pa.int64()),
            }
        )

    return partials.map_batches(merge, batch_format="pyarrow")


def _year_of_us(us_arr):
    """Vectorized year extraction from int64 epoch-us (dates in the
    TPC-H range are all post-1970, so np datetime64 arithmetic is
    exact)."""
    return (
        np.asarray(us_arr, dtype="datetime64[us]")
        .astype("datetime64[Y]")
        .astype(np.int64)
        + 1970
    )


def _keyset_filter(batch: pa.Table, column: str, keys_sorted: np.ndarray) -> pa.Table:
    """Filter a batch to rows whose ``column`` value is in the sorted
    key array (vectorized np.isin) — the pruned winner-fetch kernel."""
    vals = batch.column(column).to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(np.isin(vals, keys_sorted)))


def _supplier_nation_arrays(supplier_ds):
    """(sorted s_suppkey array, aligned s_nationkey array) for the
    vectorized searchsorted gather in the lineitem scans."""
    rows = supplier_ds.select_columns(["s_suppkey", "s_nationkey"]).take_all()
    keys = np.array([r["s_suppkey"] for r in rows], dtype=np.int64)
    vals = np.array([r["s_nationkey"] for r in rows], dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def _windowed_line_scan(lineitem_ds, lo_us: int, hi_us: int, supp_ref):
    """Shared Q7/Q8 lineitem scan: window mask, floor(x*100) revenue
    quantization, vectorized supplier-nation gather (searchsorted on
    the broadcast sorted arrays), ship-year extraction.
    -> (l_orderkey, supp_nk, rev_e4, year)"""
    import ray

    def li_slim(batch: pa.Table, _ref=supp_ref) -> pa.Table:
        skeys, svals = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        us = batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        keep = (us >= lo_us) & (us < hi_us)
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        idx = np.searchsorted(skeys, supp)
        assert (skeys[np.minimum(idx, len(skeys) - 1)] == supp).all(), (
            "lineitem references a supplier key absent from the catalog"
        )
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch.column("l_orderkey").to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.int64(),
                ),
                "supp_nk": pa.array(svals[idx], pa.int64()),
                "rev_e4": pa.array(base * (100 - disc), pa.int64()),
                "year": pa.array(_year_of_us(us[keep]), pa.int64()),
            }
        )

    return lineitem_ds.map_batches(li_slim, batch_format="pyarrow")


def nation_pair_trade(lineitem_ds, orders_ds, supplier_ds, customer_ds,
                      nation_ds, lo_us: int, hi_us: int,
                      num_partitions: int = 8):
    """TPC-H-Q7-shaped shipping volume between nations: revenue per
    (supplier nation, customer nation, ship year) for cross-nation
    pairs in a two-year window.

    Scale shape: supplier's nation key rides a ``ray.put`` dict into
    the windowed lineitem scan (supplier catalog = dimension by
    contract; task-pool map, no reserved actor pool); the two
    fact-to-fact hops (line -> orders -> customer) are hash-partitioned
    ``Dataset.join``s; the aggregate collapses to int nation-key pairs
    x years BEFORE names attach (nation is 25 rows — names join on the
    driver over the histogram-sized result, never on the fact path).
    """
    import ray
    from ray.data.aggregate import Sum

    supp_ref = ray.put(_supplier_nation_arrays(supplier_ds))
    line = _windowed_line_scan(lineitem_ds, lo_us, hi_us, supp_ref)
    orders = orders_ds.select_columns(["o_orderkey", "o_custkey"])
    j1 = line.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    cust = customer_ds.select_columns(["c_custkey", "c_nationkey"])
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "supp_nk": batch.column("supp_nk"),
                "cust_nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "year": batch.column("year"),
                "rev_e4": batch.column("rev_e4"),
            }
        )
        g = t.group_by(["supp_nk", "cust_nk", "year"]).aggregate(
            [("rev_e4", "sum")]
        )
        return g.rename_columns(["supp_nk", "cust_nk", "year", "rev_part"])

    agg = (
        j2.map_batches(fold, batch_format="pyarrow")
        .groupby(["supp_nk", "cust_nk", "year"])
        .aggregate(Sum("rev_part", alias_name="revenue_e4"))
    )
    rows = [
        r for r in agg.take_all() if r["supp_nk"] != r["cust_nk"]
    ]  # histogram-sized: nations^2 x years
    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation_ds.select_columns(["n_nationkey", "n_name"]).take_all()
    }
    rows.sort(key=lambda r: (r["supp_nk"], r["cust_nk"], r["year"]))
    return pa.table(
        {
            "supp_nation": pa.array(
                [names[r["supp_nk"]] for r in rows], pa.string()
            ),
            "cust_nation": pa.array(
                [names[r["cust_nk"]] for r in rows], pa.string()
            ),
            "year": pa.array([r["year"] for r in rows], pa.int64()),
            "revenue_e4": pa.array([r["revenue_e4"] for r in rows], pa.int64()),
        }
    )


def market_share(lineitem_ds, orders_ds, supplier_ds, customer_ds,
                 nation_ds, region_ds, region_name: str, share_nation: str,
                 lo_us: int, hi_us: int, num_partitions: int = 8):
    """TPC-H-Q8-shaped market share: of all revenue shipped in a
    window to customers in one region, the fraction supplied by one
    nation, per ship year.

    Scale shape: nation/region (25 + 5 rows) resolve driver-side into
    a customer-nation key set and a supplier share-nation key; the
    customer table filters map-side against the broadcast set; two
    hash joins chain line -> orders -> region-customers; each block
    folds to (year, total_part, share_part) and one tiny groupby
    merges.  The e9-quantized share divides the two exact int64 sums
    with one fixed float expression (oracle-identical).
    """
    import ray
    from ray.data.aggregate import Sum

    nrows = nation_ds.select_columns(
        ["n_nationkey", "n_name", "n_regionkey"]
    ).take_all()
    rrows = region_ds.select_columns(["r_regionkey", "r_name"]).take_all()
    region_key = {r["r_name"]: int(r["r_regionkey"]) for r in rrows}[region_name]
    region_nations = frozenset(
        int(r["n_nationkey"]) for r in nrows if int(r["n_regionkey"]) == region_key
    )
    share_nk = {r["n_name"]: int(r["n_nationkey"]) for r in nrows}[share_nation]

    region_nation_arr = np.sort(np.array(sorted(region_nations), dtype=np.int64))

    def cust_slim(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = np.isin(nk, region_nation_arr)
        return pa.table(
            {
                "c_custkey": pa.array(
                    batch.column("c_custkey").to_numpy(zero_copy_only=False)[
                        keep
                    ],
                    pa.int64(),
                )
            }
        )

    cust = customer_ds.map_batches(cust_slim, batch_format="pyarrow")

    supp_ref = ray.put(_supplier_nation_arrays(supplier_ds))
    line = _windowed_line_scan(lineitem_ds, lo_us, hi_us, supp_ref)
    j1 = line.join(
        orders_ds.select_columns(["o_orderkey", "o_custkey"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    j2 = j1.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def fold(batch: pa.Table) -> pa.Table:
        years = batch.column("year").to_numpy(zero_copy_only=False)
        rev = batch.column("rev_e4").to_numpy(zero_copy_only=False)
        share = (
            batch.column("supp_nk").to_numpy(zero_copy_only=False) == share_nk
        )
        o_y, o_t, o_s = [], [], []
        for y in np.unique(years):
            m = years == y
            o_y.append(int(y))
            o_t.append(int(rev[m].sum()))
            o_s.append(int(rev[m & share].sum()))
        return pa.table(
            {
                "year": pa.array(o_y, pa.int64()),
                "total_part": pa.array(o_t, pa.int64()),
                "share_part": pa.array(o_s, pa.int64()),
            }
        )

    agg = (
        j2.map_batches(fold, batch_format="pyarrow")
        .repartition(2)
        .groupby("year")
        .aggregate(
            Sum("total_part", alias_name="total_rev_e4"),
            Sum("share_part", alias_name="share_rev_e4"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        total = batch.column("total_rev_e4").to_numpy(zero_copy_only=False)
        share = batch.column("share_rev_e4").to_numpy(zero_copy_only=False)
        pct = np.zeros(len(total), dtype=np.int64)
        nz = total != 0
        pct[nz] = np.floor(
            share[nz].astype(np.float64) / total[nz].astype(np.float64) * 1e9
        ).astype(np.int64)
        return pa.table(
            {
                "year": batch.column("year"),
                "total_rev_e4": batch.column("total_rev_e4"),
                "share_rev_e4": batch.column("share_rev_e4"),
                "share_e9": pa.array(pct, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def small_quantity_revenue(lineitem_ds, part_ds, brand: str,
                           num_partitions: int = 8):
    """TPC-H-Q17-shaped small-quantity-order revenue: total discounted-
    eligible base price of brand lineitems whose quantity is below 20%
    of the part's average quantity, scaled to a yearly figure.

    Scale shape: the brand's part keys broadcast as a key set into the
    lineitem scan; ONE ``groupby(l_partkey).map_groups`` computes the
    per-part average AND applies the below-one-fifth predicate inside
    the group (cross-multiplied integers, ``qty_e2 * 5 * n <
    sum_qty_e2`` — no division, no second pass, and no stats join:
    Ray's hash join materializes schema-less empty right partitions on
    sparse key sets, and the co-group needs none); each group emits one
    partial row into a single merge task.  ``avg_yearly_e2 =
    floor(sum/7.0)`` is the single fixed float expression,
    oracle-identical.
    """
    import ray

    part_rows = part_ds.select_columns(["p_partkey", "p_brand"]).take_all()
    brand_keys = np.sort(
        np.array(
            [int(r["p_partkey"]) for r in part_rows if r["p_brand"] == brand],
            dtype=np.int64,
        )
    )
    keys_ref = ray.put(brand_keys)

    def li_slim(batch: pa.Table, _ref=keys_ref) -> pa.Table:
        keys = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.isin(pk, keys)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        base = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(pk[keep], pa.int64()),
                "qty_e2": pa.array(qty, pa.int64()),
                "base_e2": pa.array(base, pa.int64()),
            }
        )

    line = lineitem_ds.map_batches(li_slim, batch_format="pyarrow")

    def group_fold(g: pa.Table) -> pa.Table:
        qty = g.column("qty_e2").to_numpy(zero_copy_only=False)
        base = g.column("base_e2").to_numpy(zero_copy_only=False)
        n = len(qty)
        sq = int(qty.sum())
        keep = qty * 5 * n < sq
        return pa.table(
            {
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
                "sum_base_e2": pa.array([int(base[keep].sum())], pa.int64()),
            }
        )

    per_part = line.groupby("l_partkey").map_groups(
        group_fold, batch_format="pyarrow"
    )

    import ray.data as _rd

    seed = _rd.from_items([{"n_rows": 0, "sum_base_e2": 0}])
    partials = per_part.union(seed).repartition(1)

    def merge(batch: pa.Table) -> pa.Table:
        n = int(np.sum(batch.column("n_rows").to_numpy()))
        s = int(np.sum(batch.column("sum_base_e2").to_numpy()))
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "sum_base_e2": pa.array([s], pa.int64()),
                "avg_yearly_e2": pa.array(
                    [int(np.floor(s / 7.0))], pa.int64()
                ),
            }
        )

    return partials.map_batches(merge, batch_format="pyarrow")


def large_volume_orders(lineitem_ds, orders_ds, customer_ds,
                        qty_threshold_e2: int, k: int = 100):
    """TPC-H-Q18-shaped large-volume customers: the top-k orders by
    total quantity at or above a threshold, with order and customer
    attributes attached.

    Scale shape: per-order quantity sums ride one combiner +
    groupby(l_orderkey); the threshold filters order-scale rows; a
    per-block partial top-k + O(k x blocks) driver merge bounds the
    result; order/customer attributes are fetched for ONLY the k
    winners by pruned key-set scans (<= k rows each to the driver) —
    the returned_items discipline.
    """
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    def qty_part(batch: pa.Table) -> pa.Table:
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "qty_e2": pa.array(qty, pa.int64()),
            }
        )
        g = t.group_by("l_orderkey").aggregate([("qty_e2", "sum")])
        return g.rename_columns(["l_orderkey", "q_part"])

    per_order = (
        lineitem_ds.map_batches(qty_part, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q_part", alias_name="sum_qty_e2"))
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        sq = batch.column("sum_qty_e2").to_numpy(zero_copy_only=False)
        keep = sq >= qty_threshold_e2
        rows = sorted(
            zip(
                sq[keep],
                batch.column("l_orderkey").to_numpy(zero_copy_only=False)[
                    keep
                ],
            ),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        return pa.table(
            {
                "sum_qty_e2": pa.array([int(r[0]) for r in rows], pa.int64()),
                "l_orderkey": pa.array([int(r[1]) for r in rows], pa.int64()),
            }
        )

    partials = per_order.map_batches(partial_top, batch_format="pyarrow").take_all()
    best = sorted(partials, key=lambda r: (-r["sum_qty_e2"], r["l_orderkey"]))[:k]
    win = frozenset(r["l_orderkey"] for r in best)

    win_arr = np.sort(np.array(sorted(win), dtype=np.int64))

    def pick_orders(batch: pa.Table, _keys=win_arr) -> pa.Table:
        return _keyset_filter(batch, "o_orderkey", _keys)

    orows = {
        r["o_orderkey"]: r
        for r in orders_ds.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
        )
        .map_batches(pick_orders, batch_format="pyarrow")
        .take_all()
    }
    ckeys = frozenset(int(orows[r["l_orderkey"]]["o_custkey"]) for r in best)

    ckeys_arr = np.sort(np.array(sorted(ckeys), dtype=np.int64))

    def pick_cust(batch: pa.Table, _keys=ckeys_arr) -> pa.Table:
        return _keyset_filter(batch, "c_custkey", _keys)

    crows = {
        r["c_custkey"]: r["c_name"]
        for r in customer_ds.select_columns(["c_custkey", "c_name"])
        .map_batches(pick_cust, batch_format="pyarrow")
        .take_all()
    }

    import datetime as _dt

    def _us(d) -> int:
        if isinstance(d, (int, np.integer)):
            return int(d)
        if isinstance(d, _dt.datetime):
            return int(
                d.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
            )
        # datetime.date (date32 parquet encoding): midnight UTC
        return int(
            _dt.datetime(
                d.year, d.month, d.day, tzinfo=_dt.timezone.utc
            ).timestamp()
            * 1_000_000
        )

    return pa.table(
        {
            "rank": pa.array(range(len(best)), pa.int64()),
            "o_orderkey": pa.array([r["l_orderkey"] for r in best], pa.int64()),
            "c_custkey": pa.array(
                [int(orows[r["l_orderkey"]]["o_custkey"]) for r in best],
                pa.int64(),
            ),
            "c_name": pa.array(
                [
                    crows[int(orows[r["l_orderkey"]]["o_custkey"])]
                    for r in best
                ],
                pa.string(),
            ),
            "o_orderdate_us": pa.array(
                [_us(orows[r["l_orderkey"]]["o_orderdate"]) for r in best],
                pa.int64(),
            ),
            "totalprice_e2": pa.array(
                [
                    int(
                        np.floor(
                            orows[r["l_orderkey"]]["o_totalprice"] * 100.0
                        )
                    )
                    for r in best
                ],
                pa.int64(),
            ),
            "sum_qty_e2": pa.array([r["sum_qty_e2"] for r in best], pa.int64()),
        }
    )
