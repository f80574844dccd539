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

    num_partitions = _default_partitions(num_partitions)

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

    # coalesce the partial blocks to cluster-sized partitions before
    # the aggregate: one range partition per input block would leave
    # partitions holding no host group, which emit schema-less empty
    # bundles (executor warning — the cdx_surt precedent).  At real
    # scale hosts >> partitions and every partition is non-empty.
    out = (
        pages_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(num_partitions)
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


def allocate_crawl_budgets(
    tiers_ds,
    authority_ds,
    total_budget: int = 1_000_000,
    n_tiers: int = 4,
    num_partitions: int | None = None,
):
    """Tiered per-host crawl-budget allocation — the operator that turns
    the two host signals this engine computes (quality tiers from mean
    page perplexity, authority from host-graph PageRank) into the
    integer fetch budget a next crawl cycle hands each host.

    Reference context: lt.ltbot budgets hosts implicitly through the
    Heritrix frontier's per-queue rotation + decisive-value ordering
    (cxml candidates/disposition chains); production tiered crawls
    (and Common Crawl's host-rank-driven seed selection) make the
    budget explicit.  This is the batch form.

    Allocation is EXACT integer largest-remainder (Hamilton) at both
    levels, so the distributed result is bit-identical under any
    partitioning and a sequential dict-loop oracle can certify it:

    1. tier budgets: weight ``2^(n_tiers - tier)`` over the tiers that
       HAVE hosts (tier 1 = best quality = biggest share); quotas
       ``total_budget * w // W`` plus one unit to the largest
       remainders (ties -> lower tier first).
    2. within a tier: host weight = PageRank authority (int64
       micro-units) + 1 — the +1 floor keeps zero-authority hosts
       crawlable; quotas ``tier_budget * w_i // W_t`` plus one unit to
       the largest remainders (ties -> host ASC).

    Shape: the inputs are HOST-level rollups (already reduced by
    orders of magnitude from pages/edges), so one slim
    ``left_outer`` hash join tiers⟕authority, a driver-side 4-row
    tier census, then ONE ``groupby(tier).map_groups`` whose group
    fn is a vectorized numpy lexsort per tier.  At 10^8+ hosts per
    tier the group step would switch to per-shard proportional
    sub-budgets (same remainder algebra, one extra tiny exchange);
    documented, not needed at any tested scale.

    -> (host, tier, authority, budget); sum(budget) == total_budget
    whenever any host exists.
    """
    import numpy as np

    from .dedup import _default_partitions

    nparts = _default_partitions(num_partitions)

    auth = authority_ds.map_batches(
        lambda b: pa.table(
            {"host": b.column("node"), "authority": b.column("rank")}
        ),
        batch_format="pyarrow",
    ).repartition(nparts)
    joined = (
        tiers_ds.select_columns(["host", "tier"])
        .repartition(nparts)  # clear empty 0-column aggregate blocks
        .join(auth, join_type="left_outer", num_partitions=nparts, on=("host",))
        .map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("host"),
                    "tier": b.column("tier").cast(pa.int64()),
                    "authority": b.column("authority")
                    .cast(pa.int64())
                    .fill_null(0),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # consumed twice: tier census + allocation
    )

    # tier census: <= n_tiers rows on the driver — O(1) state.
    present = sorted(
        r["tier"] for r in joined.groupby("tier").count().take_all()
    )
    if not present:
        return joined.map_batches(
            lambda b: b.append_column("budget", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    weights = {t: 1 << (n_tiers - t) for t in present}
    w_sum = sum(weights.values())
    base = {t: total_budget * w // w_sum for t, w in weights.items()}
    leftover = total_budget - sum(base.values())
    for t in sorted(
        present, key=lambda t: (-(total_budget * weights[t] % w_sum), t)
    )[:leftover]:
        base[t] += 1
    tier_budget = base  # exact: sum == total_budget

    def alloc(g: pd.DataFrame) -> pd.DataFrame:
        tb = tier_budget[int(g["tier"].iloc[0])]
        w = g["authority"].to_numpy(dtype=np.int64) + 1
        w_t = int(w.sum())
        assert tb <= 2**62 // max(int(w.max()), 1), "budget*weight overflow"
        quota = tb * w  # int64-safe under the assert
        budget = quota // w_t
        rem = quota % w_t
        left = tb - int(budget.sum())
        # largest remainder, ties -> host ASC (lexsort: last key primary)
        order = np.lexsort(
            (g["host"].to_numpy(dtype=object), -rem)
        )
        budget[order[:left]] += 1
        out = pd.DataFrame(
            {
                "host": g["host"].to_numpy(dtype=object),
                "tier": g["tier"].to_numpy(dtype=np.int64),
                "authority": g["authority"].to_numpy(dtype=np.int64),
                "budget": budget,
            }
        )
        return out

    # clamp partitions to the group count: sort-range partitions beyond
    # the distinct tiers emit schema-less empty bundles (ray-2.49 quirk)
    grouped = (
        joined.repartition(min(nparts, len(present)))
        .groupby("tier")
        .map_groups(alloc)
    )
    return grouped.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def politeness_audit(log_ds, num_partitions: int | None = None):
    """Per-host politeness-compliance audit over a crawl decision log —
    the invariant proof a tiered scheduler owes its operator: every
    host was fetched at most once per wave (Heritrix's one-connection-
    per-queue rule, cxml disposition chain) and the wave gaps between
    consecutive fetches of a host are reported so robots Crawl-delay
    hosts can be spot-checked.

    Shape: the audit is naturally host-partitioned — ONE
    ``groupby(host)`` shuffle of slim (host, wave, fetch_seq) rows,
    then a vectorized per-group sort + diff.  Output is host-level.
    Pure-SQL window oracle (lag OVER PARTITION BY host).

    -> (host, n_fetches, n_waves, min_wave_gap, max_wave_gap,
        one_per_wave)
    """
    import numpy as np

    from .dedup import _default_partitions

    nparts = _default_partitions(num_partitions)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("fetch_seq")
        waves = g["wave"].to_numpy(dtype=np.int64)
        gaps = np.diff(waves)
        return pd.DataFrame(
            {
                "host": [g["host"].iloc[0]],
                "n_fetches": np.array([len(waves)], dtype=np.int64),
                "n_waves": np.array(
                    [len(np.unique(waves))], dtype=np.int64
                ),
                "min_wave_gap": np.array(
                    [int(gaps.min()) if len(gaps) else 0], dtype=np.int64
                ),
                "max_wave_gap": np.array(
                    [int(gaps.max()) if len(gaps) else 0], dtype=np.int64
                ),
                "one_per_wave": [len(np.unique(waves)) == len(waves)],
            }
        )

    out = (
        log_ds.select_columns(["host", "wave", "fetch_seq"])
        .repartition(nparts)
        .groupby("host")
        .map_groups(audit)
    )
    return out.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def select_seed_hosts(
    harmonic_ds,
    dup_ds,
    spam_ds,
    k: int = 5,
    max_dup_pct_e4: int = 5000,
    num_partitions: int | None = None,
):
    """Next-cycle seed-host selection, the Common-Crawl recipe: rank
    hosts by harmonic centrality (their published host-rank signal),
    drop link-spam hosts and hosts serving mostly duplicate bodies,
    take the top ``k``.

    Inputs are the three HOST-level signals this engine certifies
    separately: :func:`~topicrawler_ray.stages.graph.harmonic_centrality`
    (node, reach, harmonic_e6), :func:`host_dup_rate` (host,
    dup_pct_e4), :func:`host_link_spam` (host, spam).  Hosts known
    only from links (never fetched) keep dup=0 / spam=False — they
    are prime seed candidates, exactly how CC seeds from rank alone.

    Shape: two slim ``left_outer`` hash joins of host-level tables, a
    vectorized gate, ONE distributed sort of the surviving host rows
    (O(hosts), orders below page scale), ``limit(k)`` streamed — the
    driver holds exactly ``k`` rows to stamp ranks.
    -> (rank 1..k, host, harmonic_e6)
    """
    import ray

    from .dedup import _default_partitions

    nparts = _default_partitions(num_partitions)

    base = harmonic_ds.map_batches(
        lambda b: pa.table(
            {"host": b.column("node"), "harmonic_e6": b.column("harmonic_e6")}
        ),
        batch_format="pyarrow",
    ).repartition(nparts)
    dup = dup_ds.select_columns(["host", "dup_pct_e4"]).repartition(nparts)
    spam = spam_ds.select_columns(["host", "spam"]).repartition(nparts)
    joined = base.join(
        dup, join_type="left_outer", num_partitions=nparts, on=("host",)
    ).join(spam, join_type="left_outer", num_partitions=nparts, on=("host",))

    def gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dup_pct = batch.column("dup_pct_e4").cast(pa.int64()).fill_null(0)
        is_spam = batch.column("spam").fill_null(False)
        keep = pc.and_(
            pc.invert(is_spam), pc.less(dup_pct, max_dup_pct_e4)
        )
        return pa.table(
            {
                "host": batch.column("host"),
                "harmonic_e6": batch.column("harmonic_e6").cast(pa.int64()),
            }
        ).filter(keep)

    top = (
        joined.map_batches(gate, batch_format="pyarrow")
        .sort(["harmonic_e6", "host"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(1, len(top) + 1), pa.int64()),
                "host": pa.array([r["host"] for r in top], pa.string()),
                "harmonic_e6": pa.array(
                    [r["harmonic_e6"] for r in top], pa.int64()
                ),
            }
        )
    )


def robots_rules(pages_ds):
    """Per-host robots.txt policy table: the crawl scheduler's
    politeness inputs surfaced as data — Disallow prefix count (and the
    sorted prefixes themselves), Crawl-delay in milliseconds (-1 when
    absent) and the resulting politeness period in 100ms wave slots
    (``crawl_delay_period``, the clamp the wave engine actually applies,
    cxml:30-31).

    Stateless map over the (pruned url+html) pages stream — one row per
    robots.txt page; hosts serve one robots file each, so no groupby.

    -> (host, n_disallow, disallow_prefixes, crawl_delay_ms, period_waves).
    """
    from ..state.frontier import crawl_delay_period, parse_robots

    def parse(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        hosts, nd, prefixes, delays, periods = [], [], [], [], []
        for url, html in zip(urls, htmls):
            if not url.endswith("/robots.txt"):
                continue
            rules, delay = parse_robots(
                (html or b"").decode("utf-8", "replace")
            )
            hosts.append(host_of_url(url))
            nd.append(len(rules))
            prefixes.append(",".join(sorted(rules)))
            delays.append(int(round(delay * 1000)) if delay is not None else -1)
            periods.append(crawl_delay_period(delay))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_disallow": pa.array(nd, pa.int64()),
                "disallow_prefixes": pa.array(prefixes, pa.string()),
                "crawl_delay_ms": pa.array(delays, pa.int64()),
                "period_waves": pa.array(periods, pa.int64()),
            }
        )

    return pages_ds.map_batches(parse, batch_format="pyarrow")


def robots_blocked(pages_ds, num_partitions: int | None = None):
    """Per-target-host robots audit: of all outlink CANDIDATES pointing
    at a host, how many does that host's robots.txt forbid - the
    shouldProcess gate of the crawl loop (stages/crawlworker.py)
    surfaced as a certified table (reference analog: the Disallow check
    in lt.ltbot's fetch decision).

    Scale shape: anchors never leave the extraction task - each batch
    folds its outlinks to distinct (dst_host, dst_path, n) partials
    (combiner), ONE hash join against the tiny per-host rules stream
    on the TARGET host (rules ride as one comma-joined string payload,
    no list column through acero), a vectorized ``pc.starts_with`` per
    distinct ruleset, then per-batch integer partials and ONE
    ``groupby(host).sum`` over ~#hosts rows.  No broadcast of the
    rules table: at 10^8-host scale it only ever streams through the
    join."""
    import pyarrow.compute as pc

    from .dedup import _default_partitions
    from .extract import decode_page_bytes, is_robots_url
    from ..functions.urls import extract_outlinks, host_of_url, path_of_url
    from ..state.frontier import parse_robots

    def link_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            for dst in extract_outlinks(decode_page_bytes(url, html), url):
                key = (host_of_url(dst), path_of_url(dst))
                counts[key] = counts.get(key, 0) + 1
        keys = sorted(counts)
        return pa.table(
            {
                "dst_host": pa.array([k[0] for k in keys], pa.string()),
                "dst_path": pa.array([k[1] for k in keys], pa.string()),
                "n_part": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    def rules_partial(batch: pa.Table) -> pa.Table:
        hosts, prefixes = [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if not is_robots_url(url):
                continue
            rules, _delay = parse_robots((html or b"").decode("utf-8", "replace"))
            if rules:  # hosts with no Disallow need no join row
                hosts.append(host_of_url(url))
                prefixes.append(",".join(sorted(rules)))
        return pa.table(
            {
                "rule_host": pa.array(hosts, pa.string()),
                "prefixes": pa.array(prefixes, pa.string()),
            }
        )

    n = _default_partitions(num_partitions)
    # repartition before the join: combiner batches that saw only
    # robots (or only content) pages emit 0-row blocks that break
    # acero's join key resolution (snapshot_diff precedent).  When the
    # rules stream has fewer rows than partitions (fixture scale) the
    # repartition's own empty output partitions trip the executor's
    # cosmetic schema-divergence warning - harmless (Ray skips schema
    # dedup), and gone at real scale where rules >> partitions.
    links = pages_ds.map_batches(link_partial, batch_format="pyarrow").repartition(n)
    rules = pages_ds.map_batches(rules_partial, batch_format="pyarrow").repartition(n)
    joined = links.join(
        rules,
        join_type="left_outer",
        num_partitions=n,
        on=("dst_host",),
        right_on=("rule_host",),
    )

    def check(batch: pa.Table) -> pa.Table:
        paths = batch.column("dst_path")
        pref = batch.column("prefixes")
        if isinstance(pref, pa.ChunkedArray):
            pref = pref.combine_chunks()
        blocked = pa.array([False] * batch.num_rows, pa.bool_())
        for ruleset in set(pref.to_pylist()):
            if not ruleset:
                continue
            in_set = pc.fill_null(pc.equal(pref, ruleset), False)
            hit = pa.array([False] * batch.num_rows, pa.bool_())
            for prefix in ruleset.split(","):
                hit = pc.or_(hit, pc.starts_with(paths, prefix))
            blocked = pc.or_(blocked, pc.and_(in_set, hit))
        t = pa.table(
            {
                "host": batch.column("dst_host"),
                "n_part": batch.column("n_part"),
                "b_part": pc.if_else(
                    blocked, batch.column("n_part"), pa.scalar(0, pa.int64())
                ),
            }
        )
        g = t.group_by("host").aggregate([("n_part", "sum"), ("b_part", "sum")])
        return pa.table(
            {
                "host": g.column("host"),
                "n_part": g.column("n_part_sum"),
                "b_part": g.column("b_part_sum"),
            }
        )

    agg = (
        joined.map_batches(check, batch_format="pyarrow")
        .repartition(_default_partitions(num_partitions))
        .groupby("host")
        .sum(["n_part", "b_part"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_part)").to_pylist()
        b = batch.column("sum(b_part)").to_pylist()
        return pa.table(
            {
                "host": batch.column("host"),
                "n_links": pa.array(n, pa.int64()),
                "n_blocked": pa.array(b, pa.int64()),
                "blocked_ratio_e4": pa.array(
                    [10**4 * bb // nn if nn else 0 for bb, nn in zip(b, n)],
                    pa.int64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def host_gain_curve(log_ds):
    """Crawl gain curve: per wave, how many NEW hosts were discovered
    (first fetch) and the running total — the diminishing-returns
    signal a tiered crawl budgeter reads to decide when a crawl cycle
    has saturated its frontier (Heritrix's coverage reports analog).

    Scale shape: ONE ``groupby(host).min(wave)`` of slim (host, wave)
    rows collapses the log to one row per host; a per-block combiner
    then folds those to (wave, new_hosts) partials and a second tiny
    groupby merges them — the driver finally materializes only the
    histogram-sized per-wave table (O(waves) rows, bounded by crawl
    rounds, never by fetch volume) to attach the running cumulative
    sum in wave order.

    -> (wave, new_hosts, cum_hosts)
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Min, Sum

    first = (
        log_ds.select_columns(["host", "wave"])
        .groupby("host")
        .aggregate(Min("wave", alias_name="w0"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.group_by("w0").aggregate([("w0", "count")])
        return pa.table(
            {
                "wave": pc.cast(g.column("w0"), pa.int64()),
                "new_part": pc.cast(g.column("w0_count"), pa.int64()),
            }
        )

    per_wave = (
        first.map_batches(fold, batch_format="pyarrow")
        .groupby("wave")
        .aggregate(Sum("new_part", alias_name="new_hosts"))
    )
    rows = per_wave.take_all()  # histogram-sized: one row per wave
    rows.sort(key=lambda r: r["wave"])
    waves = np.array([r["wave"] for r in rows], dtype=np.int64)
    new = np.array([r["new_hosts"] for r in rows], dtype=np.int64)
    return pa.table(
        {
            "wave": pa.array(waves, pa.int64()),
            "new_hosts": pa.array(new, pa.int64()),
            "cum_hosts": pa.array(np.cumsum(new), pa.int64()),
        }
    )
