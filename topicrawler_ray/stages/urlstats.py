"""URL-structure analytics for the crawl scheduler: path-depth
histograms and a tracking-parameter audit.

Both operators feed the URL canonicalizer (functions/urls.py): the
depth histogram bounds per-host path explosion (deep calendar/facet
trees get budget-capped before the frontier floods — the Heritrix
``max-path-depth`` analog), and the parameter audit decides which query
keys the canonicalizer should strip — a key whose value cardinality
tracks the URL count is a session/tracking parameter, not content
addressing (the ``sid``/``utm_*`` class).

Scale shape: everything is vectorized pyarrow list kernels inside
``map_batches`` (split_pattern -> list_element / list_parent_indices /
list_flatten — no Python loop over rows), a per-batch ``group_by``
combiner collapses each block before the exchange, and the global
merges are slim integer-row groupbys.  The (host, key, value) distinct
exchange in the audit is proportional to the distinct-value count — the
exact-count shape; at open-web scale swap the final distinct for the
HLL sketch in stages/sketches.py (documented, not silently sampled).

Reference context: remstef/topicrawler canonicalizes URLs in
UrlUtil (lt.ltbot/src/main/java/de/tudarmstadt/lt/ltbot/util) but has
no corpus-level parameter audit; this is the batch analog a tiered
recrawl needs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _host_and_path_parts(urls: pa.ChunkedArray | pa.Array):
    """Vectorized (host, path-part list, query-string) from
    ``http://host/...`` URLs: one '?' split + one '/' split.  A ``?``
    sentinel is appended first so every split has >= 2 elements and
    ``list_element`` never sees a ragged list (it raises on OOB);
    URLs without a query yield ``qs == ''``."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    empty = pa.array([""] * len(urls), pa.string())
    padded = pc.binary_join_element_wise(urls, empty, "?")
    q = pc.split_pattern(padded, "?")
    path_full = pc.list_element(q, 0)
    qs = pc.list_element(q, 1)
    parts = pc.split_pattern(path_full, "/")
    host = pc.utf8_lower(pc.list_element(parts, 2))
    return host, parts, qs


def url_depth_histogram(urls_ds):
    """Per-(host, path-depth) URL counts.  Depth counts path segments
    after the authority (``/cal/2011/5/17`` -> 4, ``/item?sid=1`` -> 1).

    One stateless vectorized map + per-batch combiner, ONE slim
    integer groupby merge.
    """

    def fold(batch: pa.Table) -> pa.Table:
        host, parts, _qs = _host_and_path_parts(batch.column("url"))
        depth = pc.cast(
            pc.subtract(pc.list_value_length(parts), 3), pa.int64()
        )
        part = pa.table(
            {
                "host": host,
                "depth": depth,
                "n_urls": pa.array([1] * batch.num_rows, pa.int64()),
            }
        )
        out = part.group_by(["host", "depth"]).aggregate([("n_urls", "sum")])
        return out.rename_columns(["host", "depth", "n_urls"])

    from ray.data.aggregate import Sum

    from .dedup import _default_partitions

    partials = urls_ds.map_batches(fold, batch_format="pyarrow")
    partials = partials.repartition(_default_partitions(None))
    return partials.groupby(["host", "depth"]).aggregate(
        Sum("n_urls", alias_name="n_urls")
    )


def url_param_audit(urls_ds):
    """Per-(host, query-parameter-key) audit: URL occurrences, distinct
    value count, and the canonicalizer strip flag ``is_tracking``
    (``2 * n_distinct_vals >= n_urls`` — value cardinality tracking the
    URL count means the key doesn't address content).

    Two slim exchanges: (host, key, value) counting groupby (the exact
    distinct-value shape; swap for the HLL sketch at open-web scale),
    then a (host, key) merge of integer rows.
    """

    def explode(batch: pa.Table) -> pa.Table:
        host, _parts, qs = _host_and_path_parts(batch.column("url"))
        keep = pc.not_equal(qs, "")
        host = pc.filter(host, keep)
        qs = pc.filter(qs, keep)
        kvs = pc.split_pattern(qs, "&")
        parent = pc.list_parent_indices(kvs)
        flat = pc.list_flatten(kvs)
        empty = pa.array([""] * len(flat), pa.string())
        kv = pc.split_pattern(
            pc.binary_join_element_wise(flat, empty, "="), "="
        )
        part = pa.table(
            {
                "host": pc.take(host, parent),
                "key": pc.list_element(kv, 0),
                "val": pc.list_element(kv, 1),
                "n": pa.array([1] * len(flat), pa.int64()),
            }
        )
        out = part.group_by(["host", "key", "val"]).aggregate([("n", "sum")])
        return out.rename_columns(["host", "key", "val", "n"])

    from ray.data.aggregate import Count, Sum

    from .dedup import _default_partitions

    partials = urls_ds.map_batches(explode, batch_format="pyarrow")
    per_val = (
        partials.repartition(_default_partitions(None))
        .groupby(["host", "key", "val"])
        .aggregate(Sum("n", alias_name="n"))
    )
    per_key = per_val.groupby(["host", "key"]).aggregate(
        Sum("n", alias_name="n_urls"),
        Count(alias_name="n_distinct_vals"),
    )

    def flag(batch: pa.Table) -> pa.Table:
        track = pc.greater_equal(
            pc.multiply(batch.column("n_distinct_vals"), pa.scalar(2)),
            batch.column("n_urls"),
        )
        return batch.append_column("is_tracking", track)

    return per_key.map_batches(flag, batch_format="pyarrow")
