"""Distributed EXACT quantiles without a global sort: iterative
histogram-refinement selection (the classic distributed selection
algorithm; the mergeable-summary alternative is a KLL/t-digest sketch,
which trades exactness for one pass).

Why not ``Dataset.sort``: selecting a handful of order statistics via
a full sort is an all-to-all shuffle of every row.  Histogram
refinement finds the exact element with a few *narrow* passes:

* pass 0: ``Count/Min/Max`` aggregate -> target rank per quantile
  (``rank = ceil(q * N)``, 1-indexed - DuckDB ``quantile_disc``
  semantics, calibrated empirically).
* each round: ONE ``map_batches`` pass histograms the values falling
  in each still-active bracket (``bins`` buckets per target, counts
  only - a (targets x bins) int64 matrix per batch); partials reduce
  through a tiny ``groupby().sum()`` (<= targets*bins rows cross the
  wire, never values).  The bin containing the target rank becomes
  the new bracket.
* resolution: an integer bracket narrower than ``bins`` resolves
  exactly from its own histogram; any bracket whose population falls
  under ``max_pull`` is pulled (bounded driver materialization) and
  selected locally - the float/generic path.

Rounds needed: O(log_bins(value range)) - e.g. 3 passes cover a
64-bit-range integer column at bins=2^11.  Each pass streams the
single projected column; the projection is materialized once so
refinement rounds re-read object-store blocks, not the source parquet.

Scale notes: nothing driver-side ever exceeds ``targets x bins``
counters plus one ``max_pull`` value pull; skew is irrelevant
(histograms are commutative counters).  This is the engine's "novel
sketch"-slot operator with an exactness guarantee.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def exact_quantiles(
    ds,
    column: str,
    qs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = 128,
    max_pull: int = 65536,
    max_rounds: int = 24,
):
    """Exact ``quantile_disc``-semantics quantiles of ``column``.

    Returns a small ``pyarrow.Table`` ``(q_e2: int64, value)`` with
    one row per requested quantile (``q_e2 = round(q*100)``).
    Supports integer and floating columns; NULLs are ignored (DuckDB
    aggregate semantics).
    """
    from ray.data.aggregate import Count, Max, Min

    # NULLs are excluded vectorized inside each pass (aggregate
    # semantics); the single-column projection is pinned once so the
    # refinement rounds re-scan object-store blocks, not the source
    proj = ds.select_columns([column]).materialize()

    agg = proj.aggregate(Count(column), Max(column), Min(column))
    n = int(agg["count(%s)" % column])
    if n == 0:
        return pa.table({"q_e2": pa.array([], pa.int64()), "value": pa.array([])})
    vmin, vmax = agg["min(%s)" % column], agg["max(%s)" % column]
    is_int = isinstance(vmin, (int, np.integer))

    # target rank per quantile: ceil(q*N) 1-indexed, computed with the
    # same float64 multiply DuckDB uses so boundary rounding matches
    targets = []
    for q in qs:
        rank = int(np.ceil(np.float64(q) * n))
        rank = min(max(rank, 1), n)
        targets.append(
            {
                "q_e2": int(round(q * 100)),
                "rank": rank,  # rank within the current bracket
                "lo": vmin,
                "hi": vmax,
                "value": None,
            }
        )

    def bracket_edges(t):
        """bin edges for a bracket; integer brackets get exact
        per-value bins once narrow enough."""
        lo, hi = t["lo"], t["hi"]
        if is_int:
            span = int(hi) - int(lo) + 1
            width = max(1, -(-span // bins))
            nb = -(-span // width)
            return lo, width, nb
        width = (hi - lo) / bins or 1.0
        return lo, width, bins

    for _ in range(max_rounds):
        active = [t for t in targets if t["value"] is None]
        if not active:
            break
        plans = [(t["lo"], t["hi"], *bracket_edges(t)) for t in active]

        def histogram(batch: pa.Table, plans=tuple(plans)) -> pa.Table:
            col = batch.column(column)
            vals = col.to_numpy(zero_copy_only=False)
            if col.null_count:
                vals = vals[
                    ~pc.is_null(col).to_numpy(zero_copy_only=False)
                ]
            tid_out, bin_out, cnt_out = [], [], []
            for ti, (lo, hi, base, width, nb) in enumerate(plans):
                m = (vals >= lo) & (vals <= hi)
                if not m.any():
                    continue
                if is_int:
                    b = (vals[m].astype(np.int64) - int(base)) // int(width)
                else:
                    b = np.minimum(
                        ((vals[m] - base) / width).astype(np.int64), nb - 1
                    )
                u, c = np.unique(b, return_counts=True)
                tid_out.append(np.full(len(u), ti, np.int64))
                bin_out.append(u.astype(np.int64))
                cnt_out.append(c.astype(np.int64))
            if not tid_out:
                return pa.table(
                    {
                        "tid": pa.array([], pa.int64()),
                        "bin": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "tid": pa.array(np.concatenate(tid_out)),
                    "bin": pa.array(np.concatenate(bin_out)),
                    "cnt": pa.array(np.concatenate(cnt_out)),
                }
            )

        hist = (
            proj.map_batches(histogram, batch_format="pyarrow")
            .groupby(["tid", "bin"])
            .sum("cnt")
            .to_pandas()
        )
        for ti, t in enumerate(active):
            lo, hi, base, width, nb = plans[ti]
            rows = hist[hist["tid"] == ti].sort_values("bin")
            cum = 0
            rank = t["rank"]
            for _, r in rows.iterrows():
                b, c = int(r["bin"]), int(r["sum(cnt)"])
                if cum + c >= rank:
                    t["rank"] = rank - cum
                    if is_int:
                        t["lo"] = int(base) + b * int(width)
                        t["hi"] = min(
                            int(base) + (b + 1) * int(width) - 1, int(hi)
                        )
                        if t["lo"] == t["hi"]:
                            t["value"] = t["lo"]  # single value: resolved
                        elif c <= max_pull:
                            t["value"] = _pull_select(
                                proj, column, t["lo"], t["hi"], t["rank"]
                            )
                    else:
                        t["lo"] = base + b * width
                        t["hi"] = min(base + (b + 1) * width, hi)
                        if c <= max_pull:
                            t["value"] = _pull_select(
                                proj, column, t["lo"], t["hi"], t["rank"]
                            )
                    break
                cum += c
            else:
                raise RuntimeError(
                    "quantile refinement lost the target rank "
                    "(inconsistent counts)"
                )

    unresolved = [t for t in targets if t["value"] is None]
    if unresolved:
        raise RuntimeError(
            f"exact_quantiles did not resolve in {max_rounds} rounds"
        )
    value_type = pa.int64() if is_int else pa.float64()
    return pa.table(
        {
            "q_e2": pa.array([t["q_e2"] for t in targets], pa.int64()),
            "value": pa.array([t["value"] for t in targets], value_type),
        }
    )


def _pull_select(proj, column, lo, hi, rank):
    """Pull the (bounded) bracket population and select the rank-th
    smallest exactly."""
    import pyarrow.compute as pc

    def in_bracket(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        m = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
        return batch.filter(pc.fill_null(m, False))

    vals = []
    for b in proj.map_batches(
        in_bracket, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        vals.append(b.column(column).to_numpy(zero_copy_only=False))
    allv = np.sort(np.concatenate(vals)) if vals else np.array([])
    return allv[rank - 1].item()
