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
import pyarrow as pa

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


def host_rollup(pages_ds, num_partitions: int | None = None):
    """Per-host page statistics over the raw pages table: (host,
    n_pages, n_robots, html_bytes).

    The domain/host rollup every webtext curation run needs (host
    reputation lists, robots coverage, per-host byte budgets).  Shape:
    per-BATCH partial aggregation (host granularity inside the batch)
    BEFORE one small ``groupby(host).sum`` - the combiner discipline;
    the shuffle moves one row per (batch, host), never per page.
    """
    import pyarrow as pa

    from ..stages.dedup import _default_partitions
    from ..stages.extract import is_robots_url

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {}
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            c = counts.setdefault(host_of_url(url), [0, 0, 0])
            c[0] += 1
            c[1] += 1 if is_robots_url(url) else 0
            c[2] += len(html) if html else 0
        hosts = sorted(counts)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_pages": pa.array([counts[h][0] for h in hosts], pa.int64()),
                "n_robots": pa.array([counts[h][1] for h in hosts], pa.int64()),
                "html_bytes": pa.array([counts[h][2] for h in hosts], pa.int64()),
            }
        )

    out = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .sum(["n_pages", "n_robots", "html_bytes"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": batch.column("sum(n_pages)").cast(pa.int64()),
                "n_robots": batch.column("sum(n_robots)").cast(pa.int64()),
                "html_bytes": batch.column("sum(html_bytes)").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def host_quality_tiers(scored_ds, n_tiers: int = 4,
                       url_column: str = "url", perp_column: str = "perp",
                       num_partitions: int | None = None):
    """Crawl-tier assignment: rank hosts by mean LM perplexity of their
    pages and split them into ``n_tiers`` exact ntile tiers (tier 1 =
    lowest perplexity = highest-priority crawl budget).

    The host-level analog of CCNet's perplexity bucketing, applied the
    way a tiered recrawl scheduler consumes it: per-host quality decides
    how much of the fetch budget a host earns next cycle.

    Shape: quantize perp to int64 per page (associative sums), per-batch
    partial (host, sum, count) combiner, ONE small ``groupby(host)``,
    floor-div mean (exact integer), then :func:`exact_ntile` over the
    host rows - no global sort, no driver materialization of pages.
    Pages with ``perp < 0`` (sentinel rows) are excluded.
    -> (host, n_pages, avg_perp_e6, tier)
    """
    import numpy as np

    from ..stages.ranking import exact_ntile

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_column).to_pylist()
        perp = np.asarray(
            batch.column(perp_column).to_pylist(), dtype=np.float64
        )
        q = np.floor(perp * 1e6).astype(np.int64)
        agg: dict[str, list[int]] = {}
        for u, v in zip(urls, q):
            if v < 0:
                continue
            c = agg.setdefault(host_of_url(u), [0, 0])
            c[0] += 1
            c[1] += int(v)
        hosts = sorted(agg)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_pages": pa.array([agg[h][0] for h in hosts], pa.int64()),
                "sum_perp_e6": pa.array([agg[h][1] for h in hosts], pa.int64()),
            }
        )

    rolled = (
        scored_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .sum(["n_pages", "sum_perp_e6"])
    )

    def mean_q(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("sum(n_pages)"), dtype=np.int64)
        s = np.asarray(batch.column("sum(sum_perp_e6)"), dtype=np.int64)
        # values are non-negative, so floor-div == DuckDB's truncating //
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": pa.array(n, pa.int64()),
                "avg_perp_e6": pa.array(s // np.maximum(n, 1), pa.int64()),
            }
        )

    hosts = rolled.map_batches(mean_q, batch_format="pyarrow").materialize()
    out = exact_ntile(hosts, "avg_perp_e6", "host", n_buckets=n_tiers)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": batch.column("n_pages").cast(pa.int64()),
                "avg_perp_e6": batch.column("avg_perp_e6").cast(pa.int64()),
                "tier": batch.column("bucket").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def host_dup_rate(pages_ds, num_partitions: int | None = None):
    """Per-host duplicate-content rate over fetched pages: (host,
    n_pages, n_unique, dup_pct_e4) - the crawl-quality signal that
    tells a tiered scheduler a host is serving the same body under
    many URLs (session ids, print views, mirrors) and should lose
    budget.

    ONE exchange: per-page (host, content-hash) rows group by BOTH
    keys (count = copies of that body on that host), then a tiny
    ``groupby(host)`` folds sum(copies)=n_pages and row-count=n_unique.
    dup_pct_e4 = (n_pages - n_unique) * 10000 // n_pages, exact
    integer.  Distinctness is by 64-bit content hash (murmur3 low
    half) - a collision would undercount n_unique by 1; at web scale
    use the 128-bit variant if that matters.  Robots files excluded.
    """
    import numpy as np

    from ..stages.dedup import _default_partitions
    from ..stages.extract import decode_page_bytes, extract_one, is_robots_url
    from ..stages.textstats import content_hash64

    num_partitions = _default_partitions(num_partitions)

    def page_hashes(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        o_h, o_c = [], []
        for url, html in zip(urls, htmls):
            if is_robots_url(url):
                continue
            clean, _s, _a = extract_one(decode_page_bytes(url, html))
            o_h.append(host_of_url(url))
            o_c.append(content_hash64(clean))
        return pa.table(
            {
                "host": pa.array(o_h, pa.string()),
                "body_hash": pa.array(o_c, pa.int64()),
            }
        )

    per_body = (
        pages_ds.map_batches(page_hashes, batch_format="pyarrow")
        .groupby(["host", "body_hash"])
        .count()
    )

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("host"),
                "copies": batch.column("count()").cast(pa.int64()),
                "uniq": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )

    rolled = (
        per_body.map_batches(fold, batch_format="pyarrow")
        .groupby("host")
        .sum(["copies", "uniq"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("sum(copies)"), dtype=np.int64)
        u = np.asarray(batch.column("sum(uniq)"), dtype=np.int64)
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": pa.array(n, pa.int64()),
                "n_unique": pa.array(u, pa.int64()),
                "dup_pct_e4": pa.array(
                    (n - u) * np.int64(10000) // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    return rolled.map_batches(finish, batch_format="pyarrow")


def host_link_spam(
    pages_ds,
    spam_links_per_page_e4: int = 39000,
    num_partitions: int | None = None,
):
    """Per-host link-density spam signal (the classic link-farm /
    navigation-shell detector feeding tiered crawl budgets alongside
    :func:`host_dup_rate`): raw outlink count and offsite share per
    host, pure-integer ratios, and a spam flag at
    ``links_per_page_e4 >= spam_links_per_page_e4``.

    Scale shape: the anchors never leave the extraction task - each
    batch folds to per-host partial counts (combiner), then ONE small
    ``groupby(host).sum`` over ~#hosts rows; ratios are integer
    division (associativity-exact, mirrored by the sequential
    oracle)."""
    from .dedup import _default_partitions
    from .extract import decode_page_bytes, is_robots_url
    from ..functions.urls import extract_outlinks, host_of_url

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, list[int]] = {}
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            host = host_of_url(url)
            links = extract_outlinks(decode_page_bytes(url, html), url)
            c = counts.setdefault(host, [0, 0, 0])
            c[0] += 1
            c[1] += len(links)
            c[2] += sum(1 for d in links if host_of_url(d) != host)
        hosts = sorted(counts)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_pages": pa.array([counts[h][0] for h in hosts], pa.int64()),
                "n_links": pa.array([counts[h][1] for h in hosts], pa.int64()),
                "n_offsite": pa.array([counts[h][2] for h in hosts], pa.int64()),
            }
        )

    agg = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(_default_partitions(num_partitions))
        .groupby("host")
        .sum(["n_pages", "n_links", "n_offsite"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_pages = batch.column("sum(n_pages)").to_pylist()
        n_links = batch.column("sum(n_links)").to_pylist()
        n_off = batch.column("sum(n_offsite)").to_pylist()
        lpp = [10**4 * l // p if p else 0 for l, p in zip(n_links, n_pages)]
        osr = [10**4 * o // l if l else 0 for o, l in zip(n_off, n_links)]
        return pa.table(
            {
                "host": batch.column("host"),
                "n_pages": pa.array(n_pages, pa.int64()),
                "n_links": pa.array(n_links, pa.int64()),
                "n_offsite": pa.array(n_off, pa.int64()),
                "links_per_page_e4": pa.array(lpp, pa.int64()),
                "offsite_ratio_e4": pa.array(osr, pa.int64()),
                "spam": pa.array(
                    [x >= spam_links_per_page_e4 for x in lpp], pa.bool_()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
