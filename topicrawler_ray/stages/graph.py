"""Link-graph operators: edge extraction from fetched pages and an
iterative distributed PageRank.

PageRank is the canonical crawl-frontier / quality prior for webtext
pipelines (the reference's priority queue orders by LM perplexity;
production crawlers combine that with link-based authority).  The
implementation is Ray-Data-first and exact:

* **All-integer arithmetic.**  Ranks are int64 micro-units of a fixed
  total mass ``scale``; every update is integer multiply/floor-divide,
  so the distributed result is bit-identical under any block order /
  partitioning — the same discipline as the repo's quantized float
  reduces (never hash-compare a float Sum).  A sequential oracle
  replicates it exactly with dict loops.
* **Join-free update.**  Each iteration needs ``in_sum[dst]`` for
  every node INCLUDING nodes with no in-edges.  Instead of a
  left-outer join back onto the node universe (an extra shuffle, and
  ray-2.49's empty-aggregate-block quirk kills acero joins), the rank
  table itself is unioned in as zero-contribution seed rows that carry
  the node's out-degree: ``groupby(dst).sum(contrib, od)`` then yields
  the complete node set, the new in-sums AND the out-degree in ONE
  exchange.  Per iteration: one ``edges ⋈ ranks`` hash join (join
  mode) + one groupby — the minimum any distributed PageRank pays.
* **Scale note.**  Ranks (O(nodes)) are materialized per iteration;
  edges (O(links), the big table) stream through the join.  Ray
  Data's hash join re-shuffles both sides each call; on a real
  cluster the edge table should be pre-bucketed by ``hash(src)`` so
  the recurring exchange is rank-sized, not edge-sized.
  ``mode="broadcast"`` is the explicit small-node-table fast path:
  ranks are collected once per iteration into a plain dict shipped
  via ``ray.put`` (the scored_pages LM-broadcast pattern) and the
  join disappears — valid while nodes fit in worker memory (~1e8
  nodes); both modes produce identical bits.  Dangling mass is a tiny
  driver-side int sum broadcast into the next update — O(1) driver
  state.

Reference context: lt.ltbot orders its Heritrix frontier by decisive
value (cxml candidates chain); PageRank (Page et al. 1999, public) is
the classic alternative ordering this engine adds.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_partitions


def page_edges(pages_ds, num_partitions: int | None = None):
    """(src, dst) distinct canonical link edges from fetched pages.

    Robots files (detected by URL, like the crawl's content-type
    router) emit no edges; link targets keep dead / robots-blocked
    URLs — they are real graph nodes (dangling mass).  Dedup is
    per-batch local first, then one global ``groupby`` — the
    combiner-before-shuffle discipline.
    """
    num_partitions = _default_partitions(num_partitions)

    def extract(batch: pa.Table) -> pa.Table:
        from ..functions.urls import extract_outlinks
        from ..stages.extract import decode_page_bytes, is_robots_url

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        seen: set[tuple[str, str]] = set()
        for url, html in zip(urls, htmls):
            if is_robots_url(url) or not html:
                continue
            html_s = decode_page_bytes(url, html)
            for dst in extract_outlinks(html_s, url):
                seen.add((url, dst))
        if not seen:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        src, dst = zip(*sorted(seen))
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = pages_ds.map_batches(extract, batch_format="pyarrow")
    # global (src, dst) dedup: one hash shuffle; count column dropped.
    # The repartition concatenates away the aggregate's 0-column empty
    # blocks (ray-2.49 quirk) before any downstream join.
    return (
        edges.groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .repartition(num_partitions)
    )


def host_edges(pages_ds, num_partitions: int | None = None):
    """Distinct OFFSITE host-level link edges ``(src, dst)`` from
    fetched pages (self-loops dropped).

    The host graph is the standard authority substrate for tiered
    crawl-budget allocation (Common Crawl publishes exactly this as
    its "host-level webgraph"): collapsing 10^10 URL edges to ~10^8
    host pairs shrinks the iteration substrate by orders of magnitude
    while keeping the signal ``politeness.host_tiers`` needs.  Shape:
    per-batch set-dedup of host pairs inside the extraction task (the
    combiner discipline — a page's 3 outlinks usually hit the same
    few hosts, so the fold is large), then ONE global
    ``groupby(src, dst)`` dedup exchange of slim host-pair rows.
    """
    num_partitions = _default_partitions(num_partitions)

    def extract(batch: pa.Table) -> pa.Table:
        from ..functions.urls import extract_outlinks, host_of_url
        from ..stages.extract import decode_page_bytes, is_robots_url

        seen: set[tuple[str, str]] = set()
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            src_host = host_of_url(url)
            for dst in extract_outlinks(decode_page_bytes(url, html), url):
                dst_host = host_of_url(dst)
                if dst_host != src_host:
                    seen.add((src_host, dst_host))
        if not seen:
            return pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )
        src, dst = zip(*sorted(seen))
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return (
        pages_ds.map_batches(extract, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .repartition(num_partitions)
    )


def _int64(col):
    return pc.cast(col, pa.int64())


def pagerank(
    edges,
    *,
    iterations: int = 5,
    alpha_num: int = 85,
    alpha_den: int = 100,
    scale: int = 10**12,
    num_partitions: int | None = None,
    mode: str = "join",
):
    """Iterative PageRank over an (src, dst) edge Dataset.

    Returns a Dataset of ``(node: str, rank: int64)`` where ranks are
    micro-units of ``scale`` total mass (``rank / scale`` is the usual
    probability).  Exact integer semantics, identical for both modes
    and for the sequential oracle:

    - ``n``    = |distinct nodes| (sources ∪ targets)
    - ``init`` = ``scale // n``; ``base = ((alpha_den - alpha_num) *
      init) // alpha_den``
    - per edge ``contrib = rank[src] // outdeg[src]``
    - dangling ``share = (Σ rank[outdeg == 0]) // n``
    - update   ``rank' = base + (alpha_num * (in_sum + share)) //
      alpha_den``

    ``mode="join"`` (default) is the cluster path: edges stream through
    a hash join against the materialized rank table each iteration.
    ``mode="broadcast"`` collects ranks to a dict in ``ray.put`` and
    maps over edges — no join shuffle; small-node-table path only.
    """
    import ray

    num_partitions = _default_partitions(num_partitions)

    # the edge table is consumed once per iteration (plus the degree
    # pass): materialize it ONCE so the upstream chain (e.g. html link
    # extraction) never re-executes — the edge list is the canonical
    # compact artifact every graph system persists before iterating
    edges = edges.materialize()

    # --- node universe + out-degrees in ONE aggregate (no join): every
    # src contributes od=1 per distinct out-edge, every dst od=0.
    def deg_rows(batch: pa.Table) -> pa.Table:
        ns = batch.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "node": batch.column("src"),
                        "od": pa.array([1] * ns, pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "node": batch.column("dst"),
                        "od": pa.array([0] * ns, pa.int64()),
                    }
                ),
            ]
        )

    deg = (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .groupby("node")
        .sum("od")
        .rename_columns({"sum(od)": "outdeg"})
        .repartition(num_partitions)
        .materialize()
    )
    n = deg.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "rank": pa.array([], pa.int64())}
            )
        )
    init = scale // n
    base = ((alpha_den - alpha_num) * init) // alpha_den

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "outdeg": _int64(batch.column("outdeg")),
                "rank": pa.array([init] * batch.num_rows, pa.int64()),
            }
        )

    ranks = deg.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        # dangling mass: tiny scalar int64 reduce (order-free)
        dangling = ranks.filter(expr="outdeg == 0").sum("rank", ignore_nulls=True) or 0
        share = dangling // n

        if mode == "broadcast":
            table: dict[str, tuple[int, int]] = {}
            for b in ranks.iter_batches(batch_format="pyarrow"):
                table.update(
                    zip(
                        b.column("node").to_pylist(),
                        zip(
                            b.column("rank").to_pylist(),
                            b.column("outdeg").to_pylist(),
                        ),
                    )
                )
            ref = ray.put(table)

            def contrib_bcast(batch: pa.Table, _ref=ref) -> pa.Table:
                tab = ray.get(_ref)
                out = [tab[s][0] // tab[s][1] for s in batch.column("src").to_pylist()]
                return pa.table(
                    {
                        "dst": batch.column("dst"),
                        "contrib": pa.array(out, pa.int64()),
                        "od": pa.array([0] * batch.num_rows, pa.int64()),
                    }
                )

            contribs = edges.map_batches(contrib_bcast, batch_format="pyarrow")
        else:
            joined = edges.join(
                ranks,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            )

            def contrib_join(batch: pa.Table) -> pa.Table:
                # int64 / int64 in arrow is truncated division == floor
                # for the non-negative ranks here
                c = pc.divide(
                    _int64(batch.column("rank")), _int64(batch.column("outdeg"))
                )
                return pa.table(
                    {
                        "dst": batch.column("dst"),
                        "contrib": c,
                        "od": pa.array([0] * batch.num_rows, pa.int64()),
                    }
                )

            contribs = joined.map_batches(contrib_join, batch_format="pyarrow")

        # zero-contribution seed rows carry every node + its outdeg
        # through the SAME aggregate: the groupby output is the complete
        # node table — no left-outer join back onto the universe.
        def seeds(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "dst": batch.column("node"),
                    "contrib": pa.array([0] * batch.num_rows, pa.int64()),
                    "od": _int64(batch.column("outdeg")),
                }
            )

        agg = (
            contribs.union(ranks.map_batches(seeds, batch_format="pyarrow"))
            .groupby("dst")
            .sum(["contrib", "od"])
        )

        def update(batch: pa.Table, _share=share) -> pa.Table:
            total = pc.add(
                _int64(batch.column("sum(contrib)")), pa.scalar(_share, pa.int64())
            )
            rank = pc.add(
                pa.scalar(base, pa.int64()),
                pc.divide(
                    pc.multiply(pa.scalar(alpha_num, pa.int64()), total),
                    pa.scalar(alpha_den, pa.int64()),
                ),
            )
            return pa.table(
                {
                    "node": batch.column("dst"),
                    "outdeg": _int64(batch.column("sum(od)")),
                    "rank": rank,
                }
            )

        ranks = (
            agg.map_batches(update, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    return ranks.select_columns(["node", "rank"])


def anchor_text_agg(pages_ds, max_texts: int = 20, num_partitions: int | None = None):
    """Inbound anchor-text aggregation per link target: (dst,
    n_anchors, n_texts, texts).

    Anchor text is the classic external relevance signal for a crawl
    target (what OTHER pages call it) — the batch analog of Heritrix's
    via information, and a standard webtext ranking feature.  One
    ``groupby(dst)`` exchange of (dst, text) anchor rows; per group:
    ``n_anchors`` counts every inbound anchor, ``n_texts`` counts
    distinct non-empty texts, ``texts`` joins the lexicographically
    first ``max_texts`` distinct non-empty texts with "|" — the
    deterministic skew guard for mega-popular targets (a homepage with
    10^7 inbound links still emits one bounded row; the cap drops text
    VARIETY, never counts).
    """
    import pandas as pd

    from .dedup import _default_partitions

    def anchors(batch: pa.Table) -> pa.Table:
        from ..functions.urls import extract_anchors
        from ..stages.extract import decode_page_bytes, is_robots_url

        dsts, texts = [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            for dst, text in extract_anchors(decode_page_bytes(url, html), url):
                dsts.append(dst)
                texts.append(text)
        return pa.table(
            {"dst": pa.array(dsts, pa.string()), "text": pa.array(texts, pa.string())}
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        distinct = sorted({t for t in g["text"] if t})
        return pd.DataFrame(
            {
                "dst": [g["dst"].iloc[0]],
                "n_anchors": [len(g)],
                "n_texts": [len(distinct)],
                "texts": ["|".join(distinct[:max_texts])],
            }
        )

    return (
        pages_ds.map_batches(anchors, batch_format="pyarrow")
        .groupby("dst")
        .map_groups(agg, batch_format="pandas")
    )


def hits(
    edges,
    *,
    iterations: int = 5,
    scale: int = 10**6,
    num_partitions: int | None = None,
):
    """HITS hubs & authorities (Kleinberg 1999) over an (src, dst)
    edge Dataset, with L1 (sum-to-``scale``) normalization so every
    update stays in exact int64 arithmetic — the same bit-stable
    discipline as :func:`pagerank` (a sequential dict-loop oracle
    reproduces it exactly).

    Per iteration (two exchanges, the HITS minimum):

    1. authority: ``edges ⟕ state`` on ``src`` → per-edge ``hub(src)``
       contributions → ``groupby(dst).sum``; the state table is unioned
       in as zero-contribution seed rows CARRYING the hub values, so
       the aggregate output is the complete node set with both the new
       raw authority and the hub carried along — no join back onto the
       universe (pagerank's seed-row trick, doubled up).
    2. hub: symmetric on ``dst`` with authority carried.

    Each raw vector is L1-normalized to ``scale`` total mass
    (``v * scale // total``, ``multiply_checked`` so an int64 overflow
    raises instead of wrapping; ``scale=1e6`` supports corpora with
    Σ-degree-weighted mass up to ~1e12).  Returns (node, hub, auth).
    """
    import ray

    num_partitions = _default_partitions(num_partitions)

    # see pagerank: one materialization, consumed 2x per iteration
    edges = edges.materialize()

    nodes = (
        edges.map_batches(
            lambda b: pa.concat_tables(
                [
                    pa.table({"node": b.column("src")}),
                    pa.table({"node": b.column("dst")}),
                ]
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .count()
        .select_columns(["node"])
        .repartition(num_partitions)
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "hub": pa.array([], pa.int64()),
                    "auth": pa.array([], pa.int64()),
                }
            )
        )
    init = scale // n

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "hub": pa.array([init] * batch.num_rows, pa.int64()),
                "auth": pa.array([0] * batch.num_rows, pa.int64()),
            }
        )

    state = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def _half_step(state, src_key: str, dst_key: str, value_col: str, carry_col: str):
        """One HITS half-step: sum ``value_col`` over edges grouped by
        ``dst_key``'s endpoint, carrying ``carry_col`` through."""
        joined = edges.join(
            state,
            join_type="inner",
            num_partitions=num_partitions,
            on=(src_key,),
            right_on=("node",),
        )

        def contrib(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column(dst_key),
                    "c": _int64(batch.column(value_col)),
                    "carry": pa.array([0] * batch.num_rows, pa.int64()),
                }
            )

        def seeds(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node"),
                    "c": pa.array([0] * batch.num_rows, pa.int64()),
                    "carry": _int64(batch.column(carry_col)),
                }
            )

        agg = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .union(state.map_batches(seeds, batch_format="pyarrow"))
            .groupby("node")
            .sum(["c", "carry"])
            .repartition(num_partitions)
            .materialize()
        )
        total = agg.sum("sum(c)", ignore_nulls=True) or 0

        def normalize(batch: pa.Table, _total=total) -> pa.Table:
            raw = _int64(batch.column("sum(c)"))
            if _total > 0:
                val = pc.divide(
                    pc.multiply_checked(raw, pa.scalar(scale, pa.int64())),
                    pa.scalar(_total, pa.int64()),
                )
            else:
                val = raw
            return pa.table(
                {
                    "node": batch.column("node"),
                    "new": val,
                    "carry": _int64(batch.column("sum(carry)")),
                }
            )

        return agg.map_batches(normalize, batch_format="pyarrow")

    for _ in range(iterations):
        # authority from hubs (carry hub), then hubs from authorities
        a = _half_step(state, "src", "dst", "hub", "hub")
        state = a.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "hub": b.column("carry"),
                    "auth": b.column("new"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        h = _half_step(state, "dst", "src", "auth", "auth")
        state = h.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "hub": b.column("new"),
                    "auth": b.column("carry"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return state.select_columns(["node", "hub", "auth"])


def bfs_depths(edges, seeds: list[str], num_partitions: int | None = None,
               max_iters: int = 64):
    """Multi-source BFS depth of every reachable node from ``seeds``
    over a (src, dst) edge Dataset - the crawl-frontier depth profile
    (how many hops from the seed list each URL sits; the static analog
    of Heritrix hop counts / the reference's via-chain depth).

    Delta (level-synchronous) BFS, all-Dataset: round ``k`` JOINs the
    edge list against ONLY the level-``k`` frontier (nodes that settled
    at depth ``k`` - under the min-fold every node settles at its final
    depth the first time it is proposed, so deeper proposals from
    earlier levels are impossible and frontier-only joining is exact).
    Proposals fold into the depth table with ONE ``groupby(node).min``
    - min over int64 is associative, so any execution order yields the
    same table.  The per-round exchange is O(edges out of the frontier),
    not O(all settled nodes); the loop exits when a frontier is empty
    (diameter+1 rounds).  Unreachable nodes are dropped.
    -> (node, depth), seeds at 0.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min

    num_partitions = _default_partitions(num_partitions)
    inf = 1 << 40
    seed_ref = ray.put(set(seeds))

    def node_rows(batch: pa.Table) -> pa.Table:
        vals = (
            batch.column("src").to_pylist() + batch.column("dst").to_pylist()
        )
        return pa.table({"node": pa.array(sorted(set(vals)), pa.string())})

    universe = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .union(ray.data.from_arrow(
            pa.table({"node": pa.array(sorted(set(seeds)), pa.string())})
        ))
        .groupby("node")
        .count()
    )

    def init_depth(batch: pa.Table) -> pa.Table:
        sset = ray.get(seed_ref)
        nodes = batch.column("node").to_pylist()
        d = [0 if u in sset else int(inf) for u in nodes]
        return pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "depth": pa.array(d, pa.int64()),
            }
        )

    depths = universe.map_batches(
        init_depth, batch_format="pyarrow"
    ).repartition(num_partitions).materialize()

    for level in range(max_iters):
        # repartition: filter emits empty blocks that break the acero
        # join key resolution (see the dedup verify path)
        frontier = (
            depths.filter(expr="depth == %d" % level)
            .repartition(num_partitions)
            .materialize()
        )
        if frontier.count() == 0:
            break
        joined = edges.join(
            frontier,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )

        def propose(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("dst"),
                    "depth": pc.add(_int64(batch.column("depth")), 1),
                }
            )

        depths = (
            joined.map_batches(propose, batch_format="pyarrow")
            .union(depths)
            .groupby("node")
            .aggregate(Min("depth", alias_name="depth"))
            .repartition(num_partitions)
            .materialize()
        )

    return depths.filter(expr="depth < %d" % int(inf))


def personalized_pagerank(
    edges,
    seeds: list[str],
    *,
    iterations: int = 5,
    alpha_num: int = 85,
    alpha_den: int = 100,
    scale: int = 10**12,
    num_partitions: int | None = None,
):
    """Personalized PageRank with the teleport set pinned to ``seeds``
    - the focused-crawl relevance propagation (how much seed-rooted
    authority flows to each URL; Haveliwala-style topic-sensitive
    PageRank over the fixture link graph).

    Exact integer semantics, mirrored by the sequential oracle:

    - ``m``     = |seed nodes present in the graph universe ∪ seeds|
    - ``init``  = ``scale // m`` on seeds, 0 elsewhere
    - ``base``  = ``((alpha_den - alpha_num) * init) // alpha_den``
      paid ONLY to seeds; dangling mass teleports to seeds:
      ``share = (Σ rank[outdeg == 0]) // m``
    - update ``rank'(v) = base·1[v∈S] + (alpha_num * (in_sum(v) +
      share·1[v∈S])) // alpha_den``

    Same exchange shape as :func:`pagerank` join mode: one
    degree-universe aggregate, then per iteration one edges⋈ranks hash
    join plus one ``groupby(dst)`` whose zero-contribution node rows
    carry the universe (and the seed flag) through the SAME aggregate.
    """
    import ray

    num_partitions = _default_partitions(num_partitions)
    edges = edges.materialize()

    def deg_rows(batch: pa.Table) -> pa.Table:
        ns = batch.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "node": batch.column("src"),
                        "od": pa.array([1] * ns, pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "node": batch.column("dst"),
                        "od": pa.array([0] * ns, pa.int64()),
                    }
                ),
            ]
        )

    deg = (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(sorted(set(seeds)), pa.string()),
                        "od": pa.array([0] * len(set(seeds)), pa.int64()),
                    }
                )
            )
        )
        .groupby("node")
        .sum("od")
        .rename_columns({"sum(od)": "outdeg"})
        .repartition(num_partitions)
        .materialize()
    )
    if deg.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.string()), "rank": pa.array([], pa.int64())}
            )
        )
    seed_set = set(seeds)
    m = len(seed_set)
    init = scale // m
    base = ((alpha_den - alpha_num) * init) // alpha_den
    seed_ref = ray.put(seed_set)

    def start(batch: pa.Table) -> pa.Table:
        sset = ray.get(seed_ref)
        nodes = batch.column("node").to_pylist()
        s = [1 if u in sset else 0 for u in nodes]
        return pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "outdeg": _int64(batch.column("outdeg")),
                "s": pa.array(s, pa.int64()),
                "rank": pa.array(
                    [init * f for f in s], pa.int64()
                ),
            }
        )

    ranks = deg.map_batches(start, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        dangling = ranks.filter(expr="outdeg == 0").sum("rank", ignore_nulls=True) or 0
        share = dangling // m

        joined = edges.join(
            ranks,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )

        def contrib_join(batch: pa.Table) -> pa.Table:
            c = pc.divide(
                _int64(batch.column("rank")), _int64(batch.column("outdeg"))
            )
            return pa.table(
                {
                    "dst": batch.column("dst"),
                    "contrib": c,
                    "od": pa.array([0] * batch.num_rows, pa.int64()),
                    "s": pa.array([0] * batch.num_rows, pa.int64()),
                }
            )

        contribs = joined.map_batches(contrib_join, batch_format="pyarrow")

        def node_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "dst": batch.column("node"),
                    "contrib": pa.array([0] * batch.num_rows, pa.int64()),
                    "od": _int64(batch.column("outdeg")),
                    "s": _int64(batch.column("s")),
                }
            )

        agg = (
            contribs.union(ranks.map_batches(node_rows, batch_format="pyarrow"))
            .groupby("dst")
            .sum(["contrib", "od", "s"])
        )

        def update(batch: pa.Table, _share=share) -> pa.Table:
            s = _int64(batch.column("sum(s)"))
            total = pc.add(
                _int64(batch.column("sum(contrib)")),
                pc.multiply(pa.scalar(_share, pa.int64()), s),
            )
            rank = pc.add(
                pc.multiply(pa.scalar(base, pa.int64()), s),
                pc.divide(
                    pc.multiply(pa.scalar(alpha_num, pa.int64()), total),
                    pa.scalar(alpha_den, pa.int64()),
                ),
            )
            return pa.table(
                {
                    "node": batch.column("dst"),
                    "outdeg": _int64(batch.column("sum(od)")),
                    "s": s,
                    "rank": rank,
                }
            )

        ranks = (
            agg.map_batches(update, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    return ranks.select_columns(["node", "rank"])


def hll_estimate_batch(regs):
    """Published HLL estimator over a (rows x m) int register matrix,
    batch-vectorized; strict left-to-right register accumulation and
    fixed expression order — kept in LOCKSTEP with the sequential
    scalar oracle (oracles.py::_b_host_harmonic.estimate); the
    estimator-parity pytest compares this very function."""
    import numpy as np

    m = regs.shape[1]
    den = np.zeros(len(regs), dtype=np.float64)
    for j in range(m):
        den += np.exp2(-regs[:, j].astype(np.float64))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / den
    v = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (v > 0)
    if small.any():
        e = np.where(small, m * np.log(m / np.maximum(v, 1)), e)
    return np.floor(e).astype(np.int64)


def harmonic_centrality(
    edges,
    *,
    p: int = 4,
    max_iters: int = 8,
    num_partitions: int | None = None,
):
    """HyperBall harmonic centrality over an (src, dst) edge Dataset
    (Boldi & Vigna 2013, the published algorithm behind Common Crawl's
    host-rank releases).

    Harmonic centrality of ``v`` = sum over reachable ``u != v`` of
    ``1 / d(u, v)`` (incoming distance).  Exact all-pairs BFS is
    quadratic; HyperBall keeps ONE ``m = 2**p``-register HyperLogLog
    counter per node holding ~|ball(v, t)| and grows every ball one
    hop per round, because HLL counters merge by element-wise MAX —
    associative, commutative, idempotent, so the distributed merge is
    bit-identical under ANY block order / partitioning.

    Exactness discipline (the repo's integer-reduce rule):

    * registers are int64 columns ``r00..r{m-1}``, merged by the
      built-in vectorized ``groupby(node).max(...)`` — no float ever
      crosses an exchange;
    * the ball-size estimate is FLOORED to int64 per round via the
      published estimator in a fixed left-to-right accumulation
      (kept in lockstep with the sequential oracle, like
      ``stages/sketches.py``);
    * the harmonic sum accumulates ``max(0, est_t - est_{t-1}) *
      (L // t)`` in int64 with ``L = lcm(1..max_iters)`` — exact
      rational arithmetic, no float-order hazard (estimates are
      monotonized like HyperBall's systolic variant);
    * hashing is ``pd.util.hash_array`` (SipHash, fixed key), the
      same primitive the HLL aggregate uses.

    Per round: one ``edges ⋈ state`` hash join + one ``groupby.max``
    — the pagerank exchange shape; state is O(nodes · m), edges
    stream.  Rounds stop early when the global register sum (a tiny
    scalar reduce) stops growing, i.e. every ball is complete.
    -> (node: str, reach: int64, harmonic_e6: int64)
    """
    import math

    import numpy as np
    import pandas as pd
    import ray

    num_partitions = _default_partitions(num_partitions)
    m = 1 << p
    rcols = ["r%02d" % j for j in range(m)]
    lcm = math.lcm(*range(1, max_iters + 1))
    est_batch = hll_estimate_batch

    edges = edges.materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks().cast(pa.string()),
                        batch.column("dst").combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
        .repartition(num_partitions)
    )

    def init_state(batch: pa.Table) -> pa.Table:
        from .sketches import _hash64, _ranks

        names = batch.column("node").to_numpy(zero_copy_only=False)
        regs = np.zeros((len(names), m), dtype=np.int64)
        if len(names):
            idx, rank = _ranks(_hash64(names.astype(object)), p)
            regs[np.arange(len(names)), idx] = rank.astype(np.int64)
        cols = {"node": batch.column("node")}
        for j, rc in enumerate(rcols):
            cols[rc] = pa.array(regs[:, j], pa.int64())
        cols["est"] = pa.array(est_batch(regs), pa.int64())
        cols["hacc"] = pa.array(np.zeros(len(names), dtype=np.int64), pa.int64())
        return pa.table(cols)

    state = nodes.map_batches(init_state, batch_format="pyarrow").materialize()
    if state.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "reach": pa.array([], pa.int64()),
                    "harmonic_e6": pa.array([], pa.int64()),
                }
            )
        )

    def reg_total(ds) -> int:
        sums = ds.sum(rcols, ignore_nulls=True)
        return sum(int(sums["sum(%s)" % rc]) for rc in rcols)

    prev_total = reg_total(state)

    for t in range(1, max_iters + 1):
        joined = edges.join(
            state.select_columns(["node"] + rcols),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )

        def contrib(batch: pa.Table) -> pa.Table:
            neg = pa.array([-1] * batch.num_rows, pa.int64())
            cols = {"node": batch.column("dst")}
            for rc in rcols:
                cols[rc] = _int64(batch.column(rc))
            cols["est"] = neg
            cols["hacc"] = neg
            return pa.table(cols)

        merged = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .union(state)
            .groupby("node")
            .max(rcols + ["est", "hacc"])
        )

        def update(batch: pa.Table, _t=t) -> pa.Table:
            regs = np.stack(
                [
                    batch.column("max(%s)" % rc).to_numpy(zero_copy_only=False)
                    for rc in rcols
                ],
                axis=1,
            ).astype(np.int64)
            est_prev = batch.column("max(est)").to_numpy(zero_copy_only=False)
            hacc = batch.column("max(hacc)").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            est_new = est_batch(regs)
            delta = np.maximum(0, est_new - est_prev.astype(np.int64))
            hacc = hacc + delta * (lcm // _t)
            cols = {"node": batch.column("node")}
            for j, rc in enumerate(rcols):
                cols[rc] = pa.array(regs[:, j], pa.int64())
            cols["est"] = pa.array(est_new, pa.int64())
            cols["hacc"] = pa.array(hacc, pa.int64())
            return pa.table(cols)

        state = (
            merged.map_batches(update, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )
        total = reg_total(state)
        if total == prev_total:
            break  # every ball is complete — later rounds are no-ops
        prev_total = total

    def finish(batch: pa.Table) -> pa.Table:
        hacc = batch.column("hacc").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("node"),
                "reach": _int64(batch.column("est")),
                "harmonic_e6": pa.array(
                    hacc.astype(object) * 10**6 // lcm, pa.int64()
                ),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")


def degrees(edges, num_partitions: int | None = None):
    """Per-node in/out-degree over a distinct (src, dst) edge Dataset —
    the degree-distribution signal (power-law tail, mega-host fan-in)
    crawl operations read before budgeting.  ONE aggregate: every edge
    emits (src, od=1, id=0) and (dst, od=0, id=1) rows; a single
    ``groupby(node).sum`` yields the complete node table (the pagerank
    seed-row discipline — no join).
    -> (node, outdeg, indeg)
    """
    num_partitions = _default_partitions(num_partitions)

    def deg_rows(batch: pa.Table) -> pa.Table:
        ns = batch.num_rows
        one = pa.array([1] * ns, pa.int64())
        zero = pa.array([0] * ns, pa.int64())
        return pa.concat_tables(
            [
                pa.table(
                    {"node": batch.column("src"), "od": one, "id": zero}
                ),
                pa.table(
                    {"node": batch.column("dst"), "od": zero, "id": one}
                ),
            ]
        )

    return (
        edges.map_batches(deg_rows, batch_format="pyarrow")
        .groupby("node")
        .sum(["od", "id"])
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "outdeg": b.column("sum(od)").cast(pa.int64()),
                    "indeg": b.column("sum(id)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
    )


def undirected_host_edges(edges, num_partitions: int | None = None):
    """Canonical undirected edge set: (a, b) with a < b, distinct.

    Folds the directed offsite host graph (``host_edges``) so that
    ``a -> b`` and ``b -> a`` collapse to one row — the substrate
    triangle counting and clustering coefficients are defined over.
    """
    num_partitions = _default_partitions(num_partitions)

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        src, dst = batch.column("src"), batch.column("dst")
        lt = pc.less(src, dst)
        a = pc.if_else(lt, src, dst)
        b = pc.if_else(lt, dst, src)
        return pa.table({"a": a, "b": b})

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .repartition(num_partitions)
    )


def host_triangles(edges, num_partitions: int | None = None):
    """Per-host triangle count + clustering coefficient over the
    undirected offsite host graph.

    The local clustering coefficient is the classic webgraph
    community/link-farm signal (a host whose neighbours all
    interlink is a mesh, not an organic hub).  Distributed shape is
    the standard node-ordered triangle enumeration (Suri & Vassilvitskii
    2011 "Counting Triangles and the Curse of the Last Reducer"):
    canonical edges ``a < b`` make every triangle ``a < b < c`` count
    exactly once — wedges come from ONE self-join on the middle node,
    closure from ONE join back onto the edge set, so the exchanges
    move edge/wedge rows only, never adjacency lists, and the
    node-ordering bounds wedge fan-out by the *smaller*-id endpoint's
    degree.  Per-host totals then ride the pagerank seed-row
    discipline: triangles emit 3 unit rows, edges emit 2 degree seed
    rows, ONE ``groupby.sum`` builds the complete node table with no
    outer join.

    -> (host, degree, triangles, wedges, cc_e6) where
    ``wedges = degree*(degree-1)/2`` and
    ``cc_e6 = floor(1e6 * triangles / wedges)`` (0 when degree < 2).
    """
    num_partitions = _default_partitions(num_partitions)
    und = undirected_host_edges(edges, num_partitions).materialize()

    mid = und.map_batches(
        lambda b: b.rename_columns(["b", "c"]), batch_format="pyarrow"
    )
    # wedge (a, b, c): a < b from the left edge, b < c from the right
    wedges = und.join(
        mid,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
    )
    closing = und.map_batches(
        lambda b: b.rename_columns(["ca", "cc"]), batch_format="pyarrow"
    )
    tris = wedges.join(
        closing,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a", "c"),
        right_on=("ca", "cc"),
    )

    def tri_rows(batch: pa.Table) -> pa.Table:
        zero = pa.array([0] * batch.num_rows, pa.int64())
        one = pa.array([1] * batch.num_rows, pa.int64())
        return pa.concat_tables(
            [
                pa.table({"host": batch.column(k), "tri": one, "deg": zero})
                for k in ("a", "b", "c")
            ]
        )

    def deg_rows(batch: pa.Table) -> pa.Table:
        zero = pa.array([0] * batch.num_rows, pa.int64())
        one = pa.array([1] * batch.num_rows, pa.int64())
        return pa.concat_tables(
            [
                pa.table({"host": batch.column(k), "tri": zero, "deg": one})
                for k in ("a", "b")
            ]
        )

    folded = (
        tris.map_batches(tri_rows, batch_format="pyarrow")
        .union(und.map_batches(deg_rows, batch_format="pyarrow"))
        .groupby("host")
        .sum(["tri", "deg"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tri = batch.column("sum(tri)").cast(pa.int64())
        deg = batch.column("sum(deg)").cast(pa.int64())
        two = pa.scalar(2, pa.int64())
        wedge = pc.divide(
            pc.multiply(deg, pc.subtract(deg, pa.scalar(1, pa.int64()))), two
        )
        safe_w = pc.if_else(
            pc.greater(wedge, pa.scalar(0, pa.int64())),
            wedge,
            pa.scalar(1, pa.int64()),
        )
        cc = pc.if_else(
            pc.greater(wedge, pa.scalar(0, pa.int64())),
            pc.divide(pc.multiply(tri, pa.scalar(10**6, pa.int64())), safe_w),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "host": batch.column("host"),
                "degree": deg,
                "triangles": tri,
                "wedges": wedge,
                "cc_e6": cc,
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def host_reciprocity(edges, num_partitions: int | None = None):
    """Per-host link reciprocity over the directed offsite host graph.

    Reciprocity (the fraction of a host's out-links whose target links
    back) separates organic mutual communities from one-way link dumps
    — a classic webgraph spam feature alongside the clustering
    coefficient.  Shape: fold both directions of each unordered pair
    into ONE ``groupby(a, b)`` bit-OR exchange (direction bits 1 and
    2), then emit per-endpoint seed rows (n_out, n_recip) and build
    the host table with ONE ``groupby(host).sum`` — no join anywhere.

    -> (host, n_out, n_recip, recip_e6) with
    ``recip_e6 = floor(1e6 * n_recip / n_out)`` (0 when n_out = 0,
    which only happens for hosts that never appear as a source).
    """
    num_partitions = _default_partitions(num_partitions)

    def pair_bits(batch: pa.Table) -> pa.Table:
        src, dst = batch.column("src"), batch.column("dst")
        lt = pc.less(src, dst)
        a = pc.if_else(lt, src, dst)
        b = pc.if_else(lt, dst, src)
        bit = pc.if_else(
            lt, pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64())
        )
        return pa.table({"a": a, "b": b, "bit": bit})

    pairs = (
        edges.map_batches(pair_bits, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("bit")
    )

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        bits = batch.column("sum(bit)").cast(pa.int64())
        fwd = pc.cast(
            pc.equal(pc.bit_wise_and(bits, pa.scalar(1, pa.int64())),
                     pa.scalar(1, pa.int64())),
            pa.int64(),
        )
        rev = pc.cast(
            pc.equal(pc.bit_wise_and(bits, pa.scalar(2, pa.int64())),
                     pa.scalar(2, pa.int64())),
            pa.int64(),
        )
        both = pc.multiply(fwd, rev)
        return pa.concat_tables(
            [
                pa.table(
                    {"host": batch.column("a"), "n_out": fwd, "n_recip": both}
                ),
                pa.table(
                    {"host": batch.column("b"), "n_out": rev, "n_recip": both}
                ),
            ]
        )

    folded = (
        pairs.map_batches(endpoint_rows, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby("host")
        .sum(["n_out", "n_recip"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n_out = batch.column("sum(n_out)").cast(pa.int64())
        n_recip = batch.column("sum(n_recip)").cast(pa.int64())
        one = pa.scalar(1, pa.int64())
        safe = pc.if_else(pc.greater(n_out, pa.scalar(0, pa.int64())), n_out, one)
        recip = pc.if_else(
            pc.greater(n_out, pa.scalar(0, pa.int64())),
            pc.divide(pc.multiply(n_recip, pa.scalar(10**6, pa.int64())), safe),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "host": batch.column("host"),
                "n_out": n_out,
                "n_recip": n_recip,
                "recip_e6": recip,
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def host_kcore(edges, k: int, num_partitions: int | None = None,
               max_iters: int = 64):
    """k-core decomposition (fixed k) over the undirected offsite host
    graph: iteratively peel hosts with degree < k until fixpoint;
    return the surviving hosts with their within-core degree.

    The k-core is the standard "dense seed community" extractor for
    webgraphs (Seidman 1983; Batagelj & Zaversnik 2003 for the peel) —
    crawl seeding wants hosts embedded in a dense mutual neighbourhood,
    not pendant leaves.  Distributed shape per round: ONE seed-row
    degree aggregate over the surviving edge set, broadcast of the
    (shrinking) drop set via ``ray.put``, edge filter inside
    ``map_batches`` — the edge set only ever shrinks, and the loop
    exchanges degree rows, never adjacency lists.  The broadcast is of
    *dropped-this-round* hosts only (the usual peel frontier, small
    after round 1); a 10^8-host graph would swap it for a semijoin.

    -> (host, core_degree), empty when the graph has no k-core.
    """
    import ray

    num_partitions = _default_partitions(num_partitions)
    und = undirected_host_edges(edges, num_partitions).materialize()

    def deg_rows(batch: pa.Table) -> pa.Table:
        one = pa.array([1] * batch.num_rows, pa.int64())
        return pa.concat_tables(
            [
                pa.table({"host": batch.column("a"), "deg": one}),
                pa.table({"host": batch.column("b"), "deg": one}),
            ]
        )

    for _ in range(max_iters):
        degs = (
            und.map_batches(deg_rows, batch_format="pyarrow")
            .repartition(num_partitions)
            .groupby("host")
            .sum("deg")
        )
        # the peel frontier: hosts failing the bar THIS round — small
        # by construction after the first round (bounded by the number
        # of rows whose degree just dropped below k)
        def below_bar(batch: pa.Table) -> pa.Table:
            d = batch.column("sum(deg)").cast(pa.int64())
            return batch.filter(pc.less(d, pa.scalar(k, pa.int64()))).select(
                ["host"]
            )

        drop = [
            r["host"]
            for r in degs.map_batches(
                below_bar, batch_format="pyarrow"
            ).take_all()
        ]
        if not drop:
            def finish(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "host": batch.column("host"),
                        "core_degree": batch.column("sum(deg)").cast(pa.int64()),
                    }
                )

            return degs.map_batches(finish, batch_format="pyarrow")
        drop_ref = ray.put(set(drop))

        def keep(batch: pa.Table, _ref=drop_ref) -> pa.Table:
            dropped = ray.get(_ref)
            mask = [
                a not in dropped and b not in dropped
                for a, b in zip(
                    batch.column("a").to_pylist(), batch.column("b").to_pylist()
                )
            ]
            return batch.filter(pa.array(mask))

        und = und.map_batches(keep, batch_format="pyarrow").materialize()
        if und.count() == 0:
            import ray.data as rd

            return rd.from_arrow(
                pa.table(
                    {
                        "host": pa.array([], pa.string()),
                        "core_degree": pa.array([], pa.int64()),
                    }
                )
            )
    raise RuntimeError("k-core peel did not converge in %d rounds" % max_iters)


def host_assortativity(edges, num_partitions: int | None = None):
    """Degree assortativity (Newman 2002) of the undirected offsite
    host graph — ONE number separating hub-and-spoke webs (r < 0,
    organic) from degree-homophilous meshes (r > 0, link farms wire
    similar-degree peers together).

    Distributed shape: distinct undirected edges -> endpoint seed rows
    -> ONE ``groupby(host).sum`` degree table -> the (small) degree
    table is BROADCAST back onto the edge set (relational.DimLookup:
    ``ray.put`` once, vectorized searchsorted per block — at open-web
    scale where the host-degree table outgrows a worker heap, swap the
    two lookups for hash joins on a/b) -> per-batch integer partial
    sums -> one driver-side O(1) finish.  All moments are exact Python
    ints; the correlation is quantized ``floor(num * 1e9 / den)``.

    -> one row (n_edges, sum_jk, sum_j_plus_k, sum_j2_plus_k2, r_e9).
    """
    import numpy as np
    import pandas as pd

    from .relational import broadcast_lookup_join

    num_partitions = _default_partitions(num_partitions)
    und = undirected_host_edges(edges, num_partitions).materialize()

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        one = pa.array([1] * batch.num_rows, pa.int64())
        return pa.concat_tables(
            [
                pa.table({"host": batch.column("a"), "deg": one}),
                pa.table({"host": batch.column("b"), "deg": one}),
            ]
        )

    degs = (
        und.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("host")
        .sum("deg")
    )
    deg_a = degs.map_batches(
        lambda b: b.rename_columns(["host", "deg_a"]), batch_format="pyarrow"
    )
    deg_b = degs.map_batches(
        lambda b: b.rename_columns(["host", "deg_b"]), batch_format="pyarrow"
    )
    # two CHAINED lookup pools: cap each well below cpus//2 so the pair
    # of pools + upstream tasks can't starve each other (the r4
    # near-full-width actor-pool deadlock)
    withdeg = broadcast_lookup_join(
        und, deg_a, "a", "host", ["deg_a"], concurrency=2
    )
    withdeg = broadcast_lookup_join(
        withdeg, deg_b, "b", "host", ["deg_b"], concurrency=2
    )

    def fold(batch: pa.Table) -> pa.Table:
        ja = batch.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        jb = batch.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_edges": pa.array([len(ja)], pa.int64()),
                "sum_jk": pa.array([int((ja * jb).sum())], pa.int64()),
                "sum_j_plus_k": pa.array([int((ja + jb).sum())], pa.int64()),
                "sum_j2_plus_k2": pa.array(
                    [int((ja * ja + jb * jb).sum())], pa.int64()
                ),
            }
        )

    parts = withdeg.map_batches(fold, batch_format="pyarrow")
    m = parts.sum(["n_edges", "sum_jk", "sum_j_plus_k", "sum_j2_plus_k2"])
    n_edges = int(m["sum(n_edges)"])
    s1 = int(m["sum(sum_jk)"])
    s2 = int(m["sum(sum_j_plus_k)"])
    s3 = int(m["sum(sum_j2_plus_k2)"])
    num = 4 * n_edges * s1 - s2 * s2
    den = 2 * n_edges * s3 - s2 * s2
    r_e9 = (num * 10**9) // den if den != 0 else 0
    return pd.DataFrame(
        [
            {
                "n_edges": n_edges,
                "sum_jk": s1,
                "sum_j_plus_k": s2,
                "sum_j2_plus_k2": s3,
                "r_e9": r_e9,
            }
        ]
    )


def host_clustering(edges, num_partitions: int | None = None):
    """Global clustering coefficient (transitivity) of the undirected
    offsite host graph: ``3 * triangles / wedges`` — the corpus-level
    mesh-density gauge next to the per-host table from
    :func:`host_triangles` (whose per-host triangle column already
    counts each triangle once per corner, so its plain sum IS
    ``3 * T``).  One extra single-row aggregate over that certified
    kernel; exact integers, ``gcc_e6 = floor(1e6 * sum_tri / sum_wedges)``.

    -> one row (n_hosts, sum_closed, sum_wedges, gcc_e6).
    """
    import pandas as pd

    # materialize: the per-host table is |hosts| rows and feeds TWO
    # consumers (sum + count) — without this the triangle DAG runs twice
    per_host = host_triangles(edges, num_partitions).materialize()
    m = per_host.sum(["triangles", "wedges"])
    cnt = per_host.count()
    closed = int(m["sum(triangles)"])
    wedges = int(m["sum(wedges)"])
    return pd.DataFrame(
        [
            {
                "n_hosts": int(cnt),
                "sum_closed": closed,
                "sum_wedges": wedges,
                "gcc_e6": (closed * 10**6) // wedges if wedges else 0,
            }
        ]
    )


def host_mirror_pairs(edges, num_partitions: int | None = None,
                      max_fan: int | None = None):
    """Mirror/alias-host detection: out-neighbour-set Jaccard for every
    unordered host pair sharing at least one outlink target.

    Shape: distinct directed edges -> ``groupby(dst)`` co-source pair
    emission (each shared target contributes its within-group pairs;
    the node-ordered a < b convention counts each pair once per shared
    target) -> ONE ``groupby(a, b).sum`` common-neighbour table ->
    broadcast out-degree lookups -> vectorized Jaccard.  The pair
    fan-out is quadratic in a target's IN-degree, so ``max_fan`` caps
    it: groups wider than the cap are dropped WITH a loud per-group
    marker row (host '~overflow~') rather than silently — the
    common-neighbour pruning convention for mega-targets (everyone
    links to google.com; sharing it is no mirror evidence).

    -> (a, b, n_common, outdeg_a, outdeg_b, jaccard_e6).
    """
    from .relational import broadcast_lookup_join

    num_partitions = _default_partitions(num_partitions)
    distinct = (
        edges.groupby(["src", "dst"]).count().select_columns(["src", "dst"])
    ).materialize()

    outdeg = (
        distinct.map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("src"),
                    "deg": pa.array([1] * b.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("host")
        .sum("deg")
    )

    def pairs_of_group(group: pa.Table) -> pa.Table:
        srcs = sorted(group.column("src").to_pylist())
        if max_fan is not None and len(srcs) > max_fan:
            return pa.table(
                {
                    "a": pa.array(["~overflow~"], pa.string()),
                    "b": pa.array([group.column("dst")[0].as_py()], pa.string()),
                    "n": pa.array([len(srcs)], pa.int64()),
                }
            )
        aa, bb = [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                aa.append(srcs[i])
                bb.append(srcs[j])
        return pa.table(
            {
                "a": pa.array(aa, pa.string()),
                "b": pa.array(bb, pa.string()),
                "n": pa.array([1] * len(aa), pa.int64()),
            }
        )

    common = (
        distinct.groupby("dst")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .repartition(num_partitions)
        .groupby(["a", "b"])
        .sum("n")
    )

    def drop_overflow(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("a"), "~overflow~")
        return batch.filter(keep).rename_columns(["a", "b", "n_common"])

    # materialize the pair table so the Sort/Repartition/Aggregate
    # exchanges finish BEFORE the lookup pools launch: fusing them into
    # one plan deadlocks a narrow cluster (the pools pre-launch 4
    # actors which hold every CPU while the sort's boundary-sampling
    # tasks wait for one).  The candidate-pair table is far smaller
    # than the edge set (only hosts sharing >= 1 target, capped by
    # max_fan), so this is a cheap, spillable pinch point.
    common = common.map_batches(
        drop_overflow, batch_format="pyarrow"
    ).materialize()
    deg_a = outdeg.map_batches(
        lambda b: b.rename_columns(["host", "outdeg_a"]), batch_format="pyarrow"
    )
    deg_b = outdeg.map_batches(
        lambda b: b.rename_columns(["host", "outdeg_b"]), batch_format="pyarrow"
    )
    # chained pools: capped (see host_assortativity)
    withdeg = broadcast_lookup_join(
        common, deg_a, "a", "host", ["outdeg_a"], concurrency=2
    )
    withdeg = broadcast_lookup_join(
        withdeg, deg_b, "b", "host", ["outdeg_b"], concurrency=2
    )

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_common").cast(pa.int64())
        da = batch.column("outdeg_a").cast(pa.int64())
        db = batch.column("outdeg_b").cast(pa.int64())
        union = pc.subtract(pc.add(da, db), nc)
        jac = pc.divide(pc.multiply(nc, pa.scalar(10**6, pa.int64())), union)
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_common": nc,
                "outdeg_a": da,
                "outdeg_b": db,
                "jaccard_e6": jac,
            }
        )

    return withdeg.map_batches(finish, batch_format="pyarrow")


def anchor_title_match(pages_ds, num_partitions: int | None = None):
    """Anchor-text vs target-title agreement — the classic link-quality
    signal (does the web describe a page the way the page describes
    itself?): for every crawled link target, how many inbound anchors
    exist and how many of their texts appear verbatim
    (case-insensitive) in the target's ``<title>``.

    Ray shape: two slim streams off the SAME pruned pages read -
    (dst, anchor_text) rows from the anchor extractor and (url, title)
    rows from the vectorized title scan - ONE hash-partitioned inner
    join on the target URL (anchors pointing outside the crawl drop
    here), then per-batch (dst, n, n_match) partials fold into ONE
    ``groupby(dst).sum`` of 3-int rows.  The corpus never re-shuffles;
    the substring test runs on joined anchor rows only (sparse).

    -> (dst, n_anchors, n_match), exact integers.
    """
    from ray.data.aggregate import Sum

    from .dedup import _default_partitions
    from .extract import titles_batch

    num_partitions = _default_partitions(num_partitions)

    def anchors(batch: pa.Table) -> pa.Table:
        from ..functions.urls import extract_anchors
        from ..stages.extract import decode_page_bytes, is_robots_url

        dsts, texts = [], []
        for url, html in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            for dst, text in extract_anchors(decode_page_bytes(url, html), url):
                dsts.append(dst)
                texts.append(text)
        return pa.table(
            {
                "dst": pa.array(dsts, pa.string()),
                "atext": pa.array(texts, pa.string()),
            }
        )

    anchors_ds = pages_ds.map_batches(anchors, batch_format="pyarrow")
    titles_ds = pages_ds.map_batches(titles_batch, batch_format="pyarrow")
    joined = anchors_ds.join(
        titles_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("url",),
    )

    def partials(batch: pa.Table) -> pa.Table:
        from collections import defaultdict

        n: dict[str, int] = defaultdict(int)
        m: dict[str, int] = defaultdict(int)
        for dst, atext, title in zip(
            batch.column("dst").to_pylist(),
            batch.column("atext").to_pylist(),
            batch.column("title").to_pylist(),
        ):
            n[dst] += 1
            if atext and atext.lower() in (title or "").lower():
                m[dst] += 1
        keys = sorted(n)
        return pa.table(
            {
                "dst": pa.array(keys, pa.string()),
                "n_part": pa.array([n[k] for k in keys], pa.int64()),
                "m_part": pa.array([m[k] for k in keys], pa.int64()),
            }
        )

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(
            Sum("n_part", alias_name="n_anchors"),
            Sum("m_part", alias_name="n_match"),
        )
    )


def link_lang_matrix(pages_ds, num_partitions: int | None = None):
    """Cross-language link matrix: for every (source-page language,
    target-page language) pair, the number of outlinks whose target is
    a crawled page - the inter-language connectivity fingerprint that
    drives multilingual seed selection (does the es crawl reach the fr
    web, or is each language an island?).

    Scale shape: anchors fold to distinct (dst_url, src_lang, n)
    partials inside the extraction task (combiner), ONE hash join with
    the slim non-robots (url, lang) stream on the TARGET url (inner -
    only crawled targets have a known language), then (src, dst)
    partials and ONE langs^2-sized groupby.  The pages table is read
    twice but shuffled never; the join moves one row per distinct
    (target, src-lang) pair, not one per anchor."""
    import pyarrow.compute as pc

    from .dedup import _default_partitions
    from .extract import decode_page_bytes, is_robots_url
    from ..functions.urls import extract_outlinks

    def link_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for url, html, lang in zip(
            batch.column("url").to_pylist(),
            batch.column("html").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            if is_robots_url(url) or not html:
                continue
            for dst in extract_outlinks(decode_page_bytes(url, html), url):
                key = (dst, lang)
                counts[key] = counts.get(key, 0) + 1
        keys = sorted(counts)
        return pa.table(
            {
                "dst_url": pa.array([k[0] for k in keys], pa.string()),
                "src_lang": pa.array([k[1] for k in keys], pa.string()),
                "n_part": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    def target_slim(batch: pa.Table) -> pa.Table:
        robots = pc.ends_with(batch.column("url"), "/robots.txt")
        kept = batch.filter(pc.invert(robots))
        return pa.table(
            {
                "url": kept.column("url"),
                "dst_lang": kept.column("lang"),
            }
        )

    n = _default_partitions(num_partitions)
    links = pages_ds.map_batches(link_partial, batch_format="pyarrow").repartition(n)
    targets = pages_ds.map_batches(target_slim, batch_format="pyarrow").repartition(n)
    joined = links.join(
        targets,
        join_type="inner",
        num_partitions=n,
        on=("dst_url",),
        right_on=("url",),
    )

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src_lang": batch.column("src_lang"),
                "dst_lang": batch.column("dst_lang"),
                "n_part": batch.column("n_part"),
            }
        )
        g = t.group_by(["src_lang", "dst_lang"]).aggregate([("n_part", "sum")])
        return pa.table(
            {
                "src_lang": g.column("src_lang"),
                "dst_lang": g.column("dst_lang"),
                "n_part": g.column("n_part_sum"),
            }
        )

    agg = (
        joined.map_batches(fold, batch_format="pyarrow")
        .repartition(n)
        .groupby(["src_lang", "dst_lang"])
        .sum("n_part")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_lang": batch.column("src_lang"),
                "dst_lang": batch.column("dst_lang"),
                "n_links": batch.column("sum(n_part)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def label_propagation_communities(edges, rounds: int = 4):
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007), made exactly deterministic: every node
    starts labelled with itself; each round EVERY node simultaneously
    adopts the most frequent label among its (undirected) neighbours,
    ties broken toward the lexicographically smallest label; nodes
    with no neighbours keep their label; exactly ``rounds`` rounds run
    (no data-dependent stopping — determinism over convergence).

    Scale shape per round: edge rows and current-label rows union-tag
    into ONE ``groupby(src)`` co-group that emits (dst,
    neighbour_label) votes (no ``Dataset.join``: Ray's hash join
    materializes schema-less empty right partitions whenever distinct
    keys < partitions — a 10-host graph trips it); ONE
    ``groupby(node)`` co-group computes each node's majority (group
    size = degree — the mega-host group is bounded by its in-degree);
    ONE union-tag groupby merges new labels over nodes that received
    none.  No broadcast, no driver materialization.

    ``edges``: string columns ``src``/``dst`` (directed; both
    orientations are derived).  Nodes = src ∪ dst (isolated hosts are
    not represented in an edge list).  -> (host, community).
    """
    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        d = batch.column("dst")
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [s.combine_chunks(), d.combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [d.combine_chunks(), s.combine_chunks()]
                ),
            }
        )

    directed = edges.map_batches(both, batch_format="pyarrow").materialize()

    def self_label(batch: pa.Table) -> pa.Table:
        nodes = pc.unique(
            pa.concat_arrays(
                [
                    batch.column("src").combine_chunks(),
                    batch.column("dst").combine_chunks(),
                ]
            )
        )
        return pa.table({"node": nodes, "label": nodes})

    labels = (
        edges.map_batches(self_label, batch_format="pyarrow")
        .groupby("node")
        .map_groups(
            lambda g: g.slice(0, 1),
            batch_format="pyarrow",
        )
    )

    def majority(g: pa.Table) -> pa.Table:
        node = g.column("node")[0].as_py()
        votes = g.column("label").to_pylist()
        counts: dict[str, int] = {}
        for v in votes:
            counts[v] = counts.get(v, 0) + 1
        best = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[0][0]
        return pa.table(
            {
                "node": pa.array([node], pa.string()),
                "label": pa.array([best], pa.string()),
                "pri": pa.array([1], pa.int8()),
            }
        )

    def keep_highest(g: pa.Table) -> pa.Table:
        pri = g.column("pri").to_numpy(zero_copy_only=False)
        i = int(pri.argmax())
        return pa.table(
            {
                "node": pa.array([g.column("node")[i].as_py()], pa.string()),
                "label": pa.array([g.column("label")[i].as_py()], pa.string()),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "label": pa.array([""] * n, pa.string()),
                "is_label": pa.array([False] * n, pa.bool_()),
            }
        )

    def label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "src": batch.column("node"),
                "dst": pa.array([""] * n, pa.string()),
                "label": batch.column("label"),
                "is_label": pa.array([True] * n, pa.bool_()),
            }
        )

    def emit_votes(g: pa.Table) -> pa.Table:
        is_l = g.column("is_label").to_numpy(zero_copy_only=False)
        li = is_l.nonzero()[0]
        if len(li) == 0:  # a dst-only host with no outgoing rows here
            return pa.table(
                {"node": pa.array([], pa.string()),
                 "label": pa.array([], pa.string())}
            )
        lab = g.column("label")[int(li[0])].as_py()
        dsts = g.filter(pa.array(~is_l)).column("dst")
        return pa.table(
            {"node": dsts, "label": pa.array([lab] * len(dsts), pa.string())}
        )

    tagged_edges = directed.map_batches(edge_rows, batch_format="pyarrow")

    for _ in range(rounds):
        labels = labels.materialize()
        votes = (
            tagged_edges.union(
                labels.map_batches(label_rows, batch_format="pyarrow")
            )
            .groupby("src")
            .map_groups(emit_votes, batch_format="pyarrow")
        )
        new = votes.groupby("node").map_groups(majority, batch_format="pyarrow")
        old = labels.map_batches(
            lambda b: b.append_column("pri", pa.array([0] * len(b), pa.int8())),
            batch_format="pyarrow",
        )
        labels = (
            old.union(new)
            .groupby("node")
            .map_groups(keep_highest, batch_format="pyarrow")
        )

    return labels.map_batches(
        lambda b: b.rename_columns(["host", "community"]),
        batch_format="pyarrow",
    )
