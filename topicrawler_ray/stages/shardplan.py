"""Balanced output-shard planning over per-host byte sizes.

A 100 TB crawl export wants its Parquet/WARC output bucketed so that
(a) a host's pages stay co-located (politeness replays, per-host
dedup, host-level stats all read one shard) and (b) shards come out
byte-balanced (no straggler writer, resumable per-shard).  Random
hashing alone balances *counts*, not *bytes* — a handful of mega
hosts (the crawl frontier's power-law head) can put 100x the median
load on one shard.  The standard fix is hybrid: plan the heavy head
exactly with LPT greedy bin-packing (Graham 1969 — 4/3-optimal
makespan), hash the long tail.

Shape at scale: per-host byte totals come from the distributed
``host_rollup`` combiner+groupby; only the **top-H** hosts by bytes
(one slim 2-column sort + limit, H = 4096 default) reach the driver
for the LPT loop — the tail (the overwhelming majority of hosts,
each too small to imbalance anything) is assigned by a deterministic
md5 hash inside ``map_batches`` with the heavy set broadcast via
``ray.put``.  Driver state is O(H + n_shards), never O(hosts).
"""

from __future__ import annotations

import hashlib
import heapq

import pyarrow as pa


def _md5_shard(host: str, n_shards: int) -> int:
    return int(hashlib.md5(host.encode("utf-8")).hexdigest()[:8], 16) % n_shards


def plan_shards(
    pages_ds,
    n_shards: int = 8,
    top_hosts: int = 4096,
    num_partitions: int | None = None,
):
    """-> (host, host_bytes, shard, method) — ``method`` is ``lpt``
    for the exactly-packed heavy head, ``hash`` for the tail."""
    import ray

    from .dedup import _default_partitions
    from .politeness import host_rollup

    num_partitions = _default_partitions(num_partitions)
    rollup = (
        host_rollup(pages_ds, num_partitions)
        .select_columns(["host", "html_bytes"])
        .materialize()
    )

    heavy = rollup.sort(["html_bytes", "host"], descending=[True, False]).limit(
        top_hosts
    )
    # bounded by construction: top_hosts rows of (host, bytes)
    heavy_rows = [(r["host"], int(r["html_bytes"])) for r in heavy.take_all()]

    # LPT: largest first, always into the currently-lightest shard
    # (ties: lowest shard id — the heap orders (load, shard))
    loads = [(0, s) for s in range(n_shards)]
    heapq.heapify(loads)
    plan: dict[str, int] = {}
    for host, nbytes in sorted(heavy_rows, key=lambda r: (-r[1], r[0])):
        load, shard = heapq.heappop(loads)
        plan[host] = shard
        heapq.heappush(loads, (load + nbytes, shard))
    plan_ref = ray.put(plan)

    def assign(batch: pa.Table, _ref=plan_ref) -> pa.Table:
        heavy_plan = ray.get(_ref)
        hosts = batch.column("host").to_pylist()
        shards, methods = [], []
        for h in hosts:
            got = heavy_plan.get(h)
            if got is not None:
                shards.append(got)
                methods.append("lpt")
            else:
                shards.append(_md5_shard(h, n_shards))
                methods.append("hash")
        return pa.table(
            {
                "host": batch.column("host"),
                "host_bytes": batch.column("html_bytes").cast(pa.int64()),
                "shard": pa.array(shards, pa.int64()),
                "method": pa.array(methods, pa.string()),
            }
        )

    return rollup.map_batches(assign, batch_format="pyarrow")
