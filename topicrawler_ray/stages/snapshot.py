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
