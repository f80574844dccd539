"""Fetch-simulation page store: url-hash-sharded point lookups (J3).

The reference fetches over HTTP; this engine simulates fetches by
looking frontier URLs up in the Common-Crawl-style pages parquet.  Each
shard actor owns the url-hash partition ``url_hash64(url) % P == rank``
and lazily loads ONLY its partition into an in-memory url -> row dict
(one filtered parquet scan per shard, columns pruned to what fetch
needs).

Scale path (documented): at 10^10 URLs the pages table is written
hash-partitioned by ``url_bucket = url_hash64(url) % B`` (B >> P); a
shard then memory-maps only its buckets and keeps an LRU of decoded row
groups instead of a full dict.  The actor interface is identical.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from ..functions.hashing import url_hash64
from ..sources.pages import NUM_URL_BUCKETS


def shard_of_url(url: str, world: int) -> int:
    """Bucket-first shard mapping: a url's store shard is its parquet
    bucket modulo the pool size, so shards open only their own files."""
    return (url_hash64(url) % NUM_URL_BUCKETS) % world


class PageStoreState:
    def __init__(self, pages_path: str, rank: int, world: int):
        self._path = pages_path
        self._rank = rank
        self._world = world
        self._index: dict[str, tuple[bytes, int, str]] | None = None

    def _own_files(self) -> list[str]:
        if os.path.isdir(self._path):
            # bucketed layout: open ONLY this shard's bucket files
            # (partition pruning - nothing else is read from storage)
            return [
                os.path.join(self._path, "bucket=%02d.parquet" % b)
                for b in range(NUM_URL_BUCKETS)
                if b % self._world == self._rank
                and os.path.exists(
                    os.path.join(self._path, "bucket=%02d.parquet" % b)
                )
            ]
        return [self._path]  # single-file fallback: filter rows below

    def _load(self) -> None:
        if self._index is not None:
            return
        idx: dict[str, tuple[bytes, int, str]] = {}
        single_file = not os.path.isdir(self._path)
        for f in self._own_files():
            t = pq.read_table(f, columns=["url", "warc_ts", "html", "lang"])
            urls = t.column("url").to_pylist()
            ts = t.column("warc_ts").cast("int64").to_pylist()
            htmls = t.column("html").to_pylist()
            langs = t.column("lang").to_pylist()
            for u, s, h, l in zip(urls, ts, htmls, langs):
                if single_file and shard_of_url(u, self._world) != self._rank:
                    continue
                idx[u] = (h, s, l)
        self._index = idx

    def fetch(self, urls: list[str]) -> dict[str, tuple[bytes, int, str]]:
        """url -> (html, warc_ts_us, lang) for urls present (404s absent)."""
        self._load()
        idx = self._index
        return {u: idx[u] for u in urls if u in idx}


def fetch_join(frontier_ds, sf_dir: str, num_partitions: int = 8):
    """Batch-mode fetch simulation (J3 dataset-join expression): inner
    hash join of a frontier URL Dataset against the pages table - the
    partition-pruned two-sided join the actor-based point lookups
    replace in the iterative loop.  Returns (url, warc_ts, lang,
    html_size); missing urls (404s) simply don't join."""
    import pyarrow as pa
    import ray.data

    from ..sources.pages import pages_path

    pages = ray.data.read_parquet(
        pages_path(sf_dir), columns=["url", "warc_ts", "html", "lang"]
    )

    def size_cols(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "html_size": pc.binary_length(batch.column("html")),
            }
        )

    pages = pages.map_batches(size_cols, batch_format="pyarrow")
    return frontier_ds.join(
        pages,
        join_type="inner",
        num_partitions=num_partitions,
        on=("url",),
    )


def make_page_store_actors(pages_parquet: str, world: int):
    import ray

    @ray.remote(num_cpus=0.25)
    class PageStore:
        def __init__(self, path: str, rank: int, world: int):
            self.state = PageStoreState(path, rank, world)

        def fetch(self, urls):
            return self.state.fetch(urls)

        def warm(self):
            self.state._load()
            return len(self.state._index)

    return [PageStore.remote(pages_parquet, r, world) for r in range(world)]
