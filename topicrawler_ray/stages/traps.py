"""Crawl-trap detection: per-host URL-structure signals.

Large crawls drown in *traps* — hosts whose URL space is effectively
infinite (calendar archives, session-id query strings, self-linking
path loops).  Heritrix ships pathological-path and query-explosion
rules for exactly this (the reference inherits them through its
Heritrix deployment, `lt.ltbot`'s crawler-beans politeness/scope
config); a Ray-native engine needs the same signal as a *batch*
operator over the frontier/seen URL table so the tier scheduler can
demote trap hosts before they eat the politeness budget.

Shape at scale: the per-batch partial folds URL rows to per-(batch,
host) signal rows (the combiner discipline — one row per host per
batch, never per URL), the distinct-query-value signal dedups slim
``(host, qval)`` rows through its own groupby and re-enters the
numeric stream as zero-padded seed rows (the pagerank seed-row
discipline), so ONE mixed Sum/Max ``groupby(host)`` builds the
complete host table — no join.  At 10^10 URLs the exact distinct
column would be swapped for an HLL register fold
(stages/sketches.py); the thresholds stay the same.
"""

from __future__ import annotations

import re

import pyarrow as pa

_CAL_RE = re.compile(r"/(19|20)[0-9]{2}(/|$)")


def _split_parts(url: str) -> tuple[str, str, str | None]:
    """(host, path-before-query, query-or-None) with the same
    minimal parsing as :func:`functions.urls.host_of_url`."""
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    host = (rest[:slash] if slash >= 0 else rest).lower()
    path = rest[slash:] if slash >= 0 else "/"
    q = None
    qm = path.find("?")
    if qm >= 0:
        path, q = path[:qm], path[qm + 1 :]
    return host, path, q


def _has_adjacent_repeat(segs: list[str]) -> bool:
    return any(a == b for a, b in zip(segs, segs[1:]))


_SIG_FIELDS = ("n_urls", "n_cal", "n_rep", "n_query", "n_qvals", "max_depth")


def _sig_table(hosts, cols) -> pa.Table:
    data = {"host": pa.array(hosts, pa.string())}
    for name, vals in zip(_SIG_FIELDS, cols):
        data[name] = pa.array(vals, pa.int64())
    return pa.table(data)


def host_trap_signals(urls_ds, num_partitions: int | None = None):
    """Per-host trap signals over a ``(url)`` Dataset.

    Output row per host: ``n_urls``, ``n_cal`` (URLs with a
    ``/YYYY/``-style year segment), ``n_rep`` (URLs with an adjacent
    repeated path segment), ``n_query`` (URLs carrying a query
    string), ``n_qvals`` (distinct query strings), ``max_depth``
    (path segment count), plus integer-threshold flags:

    - ``cal_trap``:  2 * n_cal  >= n_urls   (calendar archive)
    - ``rep_trap``:  2 * n_rep  >= n_urls   (path-loop)
    - ``sess_trap``: 2 * n_query >= n_urls AND 10 * n_qvals >= 9 * n_query
      (query strings on most URLs, nearly all distinct — session ids)
    - ``is_trap``: any of the above.
    """
    from ray.data.aggregate import Max, Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        sig: dict[str, list[int]] = {}
        for url in batch.column("url").to_pylist():
            host, path, q = _split_parts(url)
            segs = path[1:].split("/") if len(path) > 1 else []
            c = sig.setdefault(host, [0, 0, 0, 0, 0])
            c[0] += 1
            c[1] += 1 if _CAL_RE.search(path) else 0
            c[2] += 1 if _has_adjacent_repeat(segs) else 0
            c[3] += 1 if q is not None else 0
            c[4] = max(c[4], len(segs))
        hosts = sorted(sig)
        zeros = [0] * len(hosts)
        return _sig_table(
            hosts,
            (
                [sig[h][0] for h in hosts],
                [sig[h][1] for h in hosts],
                [sig[h][2] for h in hosts],
                [sig[h][3] for h in hosts],
                zeros,  # n_qvals rides the qval-dedup seed rows
                [sig[h][4] for h in hosts],
            ),
        )

    def partial_quals(batch: pa.Table) -> pa.Table:
        qrows: set[tuple[str, str]] = set()
        for url in batch.column("url").to_pylist():
            host, _path, q = _split_parts(url)
            if q is not None:
                qrows.add((host, q))
        if qrows:
            hq, qv = zip(*sorted(qrows))
        else:
            hq, qv = (), ()
        return pa.table(
            {
                "host": pa.array(list(hq), pa.string()),
                "qval": pa.array(list(qv), pa.string()),
            }
        )

    def qval_seed_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        zeros = [0] * n
        return _sig_table(
            batch.column("host").to_pylist(),
            (zeros, zeros, zeros, zeros, [1] * n, zeros),
        )

    qseeds = (
        urls_ds.map_batches(partial_quals, batch_format="pyarrow")
        .groupby(["host", "qval"])
        .count()
        .map_batches(qval_seed_rows, batch_format="pyarrow")
    )

    from .dedup import _default_partitions

    # coalesce to cluster-sized partitions before the few-group
    # aggregate: range partitions holding no host group emit
    # schema-less empty bundles (executor warning — cdx precedent)
    folded = (
        urls_ds.map_batches(partial_counts, batch_format="pyarrow")
        .union(qseeds)
        .repartition(_default_partitions(num_partitions))
        .groupby("host")
        .aggregate(
            Sum("n_urls"),
            Sum("n_cal"),
            Sum("n_rep"),
            Sum("n_query"),
            Sum("n_qvals"),
            Max("max_depth"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_urls = batch.column("sum(n_urls)").cast(pa.int64())
        n_cal = batch.column("sum(n_cal)").cast(pa.int64())
        n_rep = batch.column("sum(n_rep)").cast(pa.int64())
        n_query = batch.column("sum(n_query)").cast(pa.int64())
        n_qvals = batch.column("sum(n_qvals)").cast(pa.int64())
        max_depth = batch.column("max(max_depth)").cast(pa.int64())
        two = pa.scalar(2, pa.int64())
        cal_trap = pc.greater_equal(pc.multiply(n_cal, two), n_urls)
        rep_trap = pc.greater_equal(pc.multiply(n_rep, two), n_urls)
        sess_trap = pc.and_(
            pc.greater_equal(pc.multiply(n_query, two), n_urls),
            pc.greater_equal(
                pc.multiply(n_qvals, pa.scalar(10, pa.int64())),
                pc.multiply(n_query, pa.scalar(9, pa.int64())),
            ),
        )
        is_trap = pc.or_(pc.or_(cal_trap, rep_trap), sess_trap)
        return pa.table(
            {
                "host": batch.column("host"),
                "n_urls": n_urls,
                "n_cal": n_cal,
                "n_rep": n_rep,
                "n_query": n_query,
                "n_qvals": n_qvals,
                "max_depth": max_depth,
                "cal_trap": cal_trap,
                "rep_trap": rep_trap,
                "sess_trap": sess_trap,
                "is_trap": is_trap,
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")
