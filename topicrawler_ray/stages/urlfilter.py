"""URL filtering — crawl-scope rules as a vectorized Arrow stage.

The reference scopes its crawl with Heritrix DecideRules
(``lt.ltbot/jobs/profile-ltbot-default-seedlist/profile-crawler-beans-ltbot.cxml``:
``TooManyHopsDecideRule`` / ``MatchesListRegexDecideRule`` analogs); a
training-data pipeline applies the same idea at corpus scale: drop
blocklisted hosts, well-known non-content paths and query-string URLs
before fetching/processing.  All predicates run as pyarrow.compute RE2
kernels over the url column — zero-copy, no Python loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"

# default blocklist used by the fixture query: decimal host numbers
# divisible by 5 (host0, host5, host10, ...)
DEFAULT_HOST_BLOCK = r"^host[0-9]*[05]\.example$"


def extract_host(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized scheme-authority extraction (null for non-URLs)."""
    m = pc.extract_regex(urls, _HOST_RE.replace("([^/?#]+)", "(?P<host>[^/?#]+)"))
    return pc.struct_field(m, "host")


def url_filter_batch(
    batch: pa.Table,
    column: str = "url",
    host_block: str | None = DEFAULT_HOST_BLOCK,
    drop_robots: bool = True,
    drop_query: bool = True,
) -> pa.Table:
    """Filter rows by URL rules; appends the extracted ``host`` column.

    Rows whose URL has no parseable host are dropped (conservative:
    un-scopeable URLs never reach the fetcher).
    """
    urls = batch.column(column)
    host = extract_host(urls)
    keep = pc.is_valid(host)
    if host_block:
        keep = pc.and_kleene(
            keep, pc.invert(pc.match_substring_regex(host, host_block))
        )
    if drop_robots:
        keep = pc.and_kleene(keep, pc.invert(pc.ends_with(urls, pattern="/robots.txt")))
    if drop_query:
        keep = pc.and_kleene(keep, pc.invert(pc.match_substring(urls, pattern="?")))
    out = batch.append_column("host", host)
    return out.filter(pc.fill_null(keep, False))


def url_filter(ds, **kwargs):
    """Dataset-level wrapper: streaming ``map_batches`` filter."""
    return ds.map_batches(
        lambda b: url_filter_batch(b, **kwargs), batch_format="pyarrow"
    )


def url_templates(ds, url_column: str = "url", trap_threshold: int = 50):
    """Crawl-trap detection by URL-template explosion: collapse every
    digit run in the URL path to ``N`` and count URLs per
    (host, template).  A template carrying hundreds of URLs on one
    host is the classic calendar/pagination/session-id trap (Heritrix
    ships a hand-tuned TooManyPathSegments/pathological-path DecideRule
    family for the same failure).

    One slim (host, template) shuffle after a stateless vectorized
    parse - counts, never URLs, cross the exchange.  Returns
    ``(host, template, n_urls, is_trap)``.
    """
    import re

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    host_re = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")
    path_re = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)")
    digits = re.compile(r"[0-9]+")

    def parse(batch: pa.Table) -> pa.Table:
        hosts, templates = [], []
        for u in batch.column(url_column).to_pylist():
            m = host_re.match(u or "")
            hosts.append(m.group(1) if m else "")
            p = path_re.match(u or "")
            templates.append(digits.sub("N", p.group(1) if p else ""))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "template": pa.array(templates, pa.string()),
            }
        )

    counted = (
        ds.select_columns([url_column])
        .map_batches(parse, batch_format="pyarrow")
        .groupby(["host", "template"])
        .aggregate(Count(alias_name="n_urls"))
    )

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_trap",
            pc.greater_equal(batch.column("n_urls"), trap_threshold),
        )

    return counted.map_batches(flag, batch_format="pyarrow")
