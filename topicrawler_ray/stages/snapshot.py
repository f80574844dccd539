"""Crawl-snapshot diffing: compare two crawl snapshots of the same web
by content digest and classify every URL as new / gone / changed / same.

The standard recrawl-scheduling primitive (Common-Crawl publishes these
deltas between monthly snapshots; Heritrix feeds them back into revisit
politeness): given snapshot A (the previous crawl) and snapshot B (the
current one), each keyed by canonical URL with a content digest, emit
one row per URL in either snapshot with its transition status.  The
reference engine has no snapshot operator (it crawls forward only);
this extends the crawl-analytics surface alongside
``politeness.host_dup_rate`` / ``host_tiers``.

Scale design (two ~100 TB snapshots):

* digests are computed upstream (per-row C ``hashlib`` inside a plain
  ``map_batches`` - linear, embarrassingly parallel, no exchange) so
  the join only ever moves slim ``(url, digest)`` rows, never page
  bodies.
* the diff itself is ONE hash-partitioned ``full_outer``
  ``Dataset.join`` on ``url`` - the only all-to-all exchange, sized by
  ``num_partitions``.  URLs are unique per snapshot side, so there is
  no key skew to salt.
* status classification is a vectorized pyarrow pass over the joined
  blocks (no per-row Python).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def md5_hex(text: str) -> str:
    """Lowercase hex MD5 of the UTF-8 bytes - matches DuckDB ``md5()``
    so the SQL oracle can recompute digests independently."""
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def add_digest(ds, text_column: str = "text", out: str = "digest"):
    """Append a content-digest column (slim projection: keeps only
    ``url`` + digest so the downstream join never ships bodies)."""

    def fn(batch: pa.Table) -> pa.Table:
        digests = [md5_hex(t) for t in batch.column(text_column).to_pylist()]
        return pa.table(
            {
                "url": batch.column("url"),
                out: pa.array(digests, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _classify(batch: pa.Table) -> pa.Table:
    a = batch.column("digest_a")
    b = batch.column("digest_b")
    new = pc.is_null(a)
    gone = pc.is_null(b)
    same = pc.equal(a, b)  # null where either side is null
    status = pc.if_else(
        new,
        pa.scalar("new", pa.string()),
        pc.if_else(
            gone,
            pa.scalar("gone", pa.string()),
            pc.if_else(
                pc.fill_null(same, False),
                pa.scalar("same", pa.string()),
                pa.scalar("changed", pa.string()),
            ),
        ),
    )
    return pa.table(
        {
            "url": batch.column("url"),
            "status": status,
            "digest_a": a,
            "digest_b": b,
        }
    )


def _string_grams(text: str, n: int = 3) -> set[str]:
    """Distinct word n-grams as STRINGS (single-space split, matching
    the SQL oracle's ``string_split(text, ' ')`` exactly - no hashing,
    so engine and oracle compare literally identical sets)."""
    words = (text or "").split(" ")
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _drift_classify(batch: pa.Table) -> pa.Table:
    import math

    urls, o_j, o_c = [], [], []
    for url, ta, tb in zip(
        batch.column("url").to_pylist(),
        batch.column("text_a").to_pylist(),
        batch.column("text_b").to_pylist(),
    ):
        ga, gb = _string_grams(ta), _string_grams(tb)
        inter = len(ga & gb)
        union = len(ga) + len(gb) - inter
        j_e4 = int(math.floor((inter / float(union)) * 1e4)) if union else 0
        urls.append(url)
        o_j.append(j_e4)
        o_c.append("minor" if j_e4 >= 5000 else "major")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "jaccard_e4": pa.array(o_j, pa.int64()),
            "change_class": pa.array(o_c, pa.string()),
        }
    )


def snapshot_drift(a_ds, b_ds, num_partitions: int | None = None):
    """Content-drift magnitude for URLs present in both snapshots:
    word-3-gram Jaccard between the old and new text, classified
    minor (>= 0.5) / major.  The recrawl-policy refinement on top of
    :func:`snapshot_diff`'s boolean 'changed' - template/boilerplate
    edits score minor, rewrites score major.

    ``a_ds`` carries (url, text_a), ``b_ds`` (url, text_b) - feed it
    the CHANGED subset only (both sides pre-filtered), so unlike the
    digest diff this join does move text, but only for the changed
    slice.  One hash-partitioned inner join, then a streaming
    per-row set-similarity pass (C-level set ops on short gram
    lists)."""
    from .dedup import _default_partitions

    n = _default_partitions(num_partitions)
    a_ds = a_ds.repartition(n)
    b_ds = b_ds.repartition(n)
    joined = a_ds.join(b_ds, "inner", num_partitions=n, on=("url",))
    return joined.map_batches(_drift_classify, batch_format="pyarrow")


_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def revisit_schedule(diff_ds):
    """Per-host recrawl scheduling from a snapshot diff (Cho &
    Garcia-Molina "Effective Page Refresh Policies"): hosts whose
    content churns get short revisit intervals, static hosts long ones.

    ``change_rate_e6 = floor(1e6 * changed / (changed + same))`` over
    the URLs present in BOTH snapshots; tiers: >= 0.5 -> 'fast',
    >= 0.1 -> 'medium', else 'slow'.

    Scale shape: one vectorized pass emits per-batch indicator counts
    (the combiner), then ONE small ``groupby(host).sum`` - identical
    to the ``politeness.host_rollup`` discipline; the final
    rate/tier arithmetic is vectorized Arrow over host rows."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.extract_regex(
            pc.cast(batch.column("url"), pa.string()), _HOST_RE
        )
        host = pc.fill_null(pc.struct_field(host, "host"), "")
        status = batch.column("status")
        cols = {"host": host, "n_urls": pa.array([1] * len(batch), pa.int64())}
        for s in ("changed", "same", "gone", "new"):
            cols["n_" + s] = pc.cast(pc.equal(status, s), pa.int64())
        return pa.table(cols)

    agg = (
        diff_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .sum(["n_urls", "n_changed", "n_same", "n_gone", "n_new"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        changed = batch.column("sum(n_changed)")
        same = batch.column("sum(n_same)")
        denom = pc.add(changed, same)
        rate = pc.if_else(
            pc.equal(denom, 0),
            pa.scalar(0, pa.int64()),
            pc.cast(
                pc.floor(
                    pc.divide(
                        pc.multiply(pc.cast(changed, pa.float64()), 1e6),
                        pc.cast(pc.max_element_wise(denom, 1), pa.float64()),
                    )
                ),
                pa.int64(),
            ),
        )
        tier = pc.if_else(
            pc.greater_equal(rate, 500000),
            pa.scalar("fast", pa.string()),
            pc.if_else(
                pc.greater_equal(rate, 100000),
                pa.scalar("medium", pa.string()),
                pa.scalar("slow", pa.string()),
            ),
        )
        return pa.table(
            {
                "host": batch.column("host"),
                "n_urls": batch.column("sum(n_urls)"),
                "n_changed": changed,
                "n_same": same,
                "n_gone": batch.column("sum(n_gone)"),
                "n_new": batch.column("sum(n_new)"),
                "change_rate_e6": rate,
                "revisit_tier": tier,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def snapshot_diff(a_ds, b_ds, num_partitions: int | None = None):
    """Diff two ``(url, digest_a)`` / ``(url, digest_b)`` snapshot
    datasets.  Returns one row per URL in either snapshot with
    ``status`` in {new, gone, changed, same}.

    ``repartition`` before the join concatenates away the 0-column
    empty blocks that upstream filters emit (acero join poison - see
    the dedup/cooc precedent)."""
    from .dedup import _default_partitions

    n = _default_partitions(num_partitions)
    a_ds = a_ds.repartition(n)
    b_ds = b_ds.repartition(n)
    joined = a_ds.join(b_ds, "full_outer", num_partitions=n, on=("url",))
    return joined.map_batches(_classify, batch_format="pyarrow")
