"""Batch-mode politeness batching - the north-star "groupby-host
shuffle" expressed as a Dataset operator.

The iterative wave engine (``pipelines/crawl.py``) schedules one fetch
per host per politeness slot incrementally; this operator is the BATCH
equivalent over a frontier snapshot: one all-to-all shuffle keyed on the
host, then each host group ranks its URLs by the frontier order
``(directive, cost, seq)`` and assigns the fetch ``slot`` (0-based wave
index for that host) plus the earliest allowed fetch time offset
``not_before_ms = slot * min_delay_ms`` (Heritrix DispositionProcessor
minDelay, cxml:30).

Skew: the mega-host is ONE group, so the group task is bounded by that
single host's frontier slice - at 10^10 URLs a pathological host whose
queue exceeds one task's memory is split by seq-range salting (rank
locally per range, then add per-range prefix-sum offsets); the ranges
are ordered by construction ONLY when ordering degenerates to seq, so
the exact (directive, cost, seq) order uses the unsalted group path and
budget-caps pathological hosts upstream (``frontier_head_budget``)
exactly like the wave engine does.
"""

from __future__ import annotations

import pandas as pd

from ..functions.urls import host_of_url


def add_host_column(batch, url_column: str = "url"):
    import pyarrow as pa

    hosts = [host_of_url(u) for u in batch.column(url_column).to_pylist()]
    return batch.append_column("host", pa.array(hosts, pa.string()))


def assign_politeness_slots(
    frontier_ds,
    min_delay_ms: int = 100,
    url_column: str = "url",
):
    """Frontier rows (url, directive, cost, seq) -> + (host, slot,
    not_before_ms).  One ``groupby(host)`` shuffle; vectorized pandas
    rank inside each group."""

    def rank_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["directive", "cost", "seq"], kind="mergesort")
        g = g.assign(slot=range(len(g)))
        g["slot"] = g["slot"].astype("int64")
        g["not_before_ms"] = g["slot"] * int(min_delay_ms)
        return g

    with_host = frontier_ds.map_batches(
        lambda b: add_host_column(b, url_column), batch_format="pyarrow"
    )
    return with_host.groupby("host").map_groups(rank_group, batch_format="pandas")
