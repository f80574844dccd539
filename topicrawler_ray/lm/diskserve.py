"""Disk-backed LM serving from the sharded n-gram index artifact.

The reference serves its language models from a Lucene index on disk -
the index IS the model (``lt.lm/.../lucenebased/CountingStringLM.java:58-159``
reads per-ngram docs on demand through Lucene's caches).  The round-2
engine still collected every count/index row into driver RAM to build a
scorer (``kn_stats_from_index`` / ``counts_from_dataset``); at a
100-TB-crawl model size that bridge is impossible.  This module is the
Ray-native equivalent of the Lucene path:

* **Artifact** (written DISTRIBUTED, the driver only folds a tiny
  count-of-counts manifest)::

      <dir>/__sum_ngrams__        global N/S stats (reference text format)
      <dir>/meta.json             {"order": n, "num_buckets": B}
      <dir>/bucket=NNNN.parquet   index rows (ngram, n, num, nf_s, np_s,
                                  nfp_s), hash-partitioned by
                                  murmur3(ngram) % B, sorted by ngram

* **Readers** :class:`DiskCounts` / :class:`DiskKNStats` satisfy the
  same accessor protocol as the in-memory tables
  (:class:`~.backoff.NgramCounts` / :class:`~.kneserney.KNStats`), so
  ``StupidBackoffLM`` and ``KneserNeyLM`` score through them UNCHANGED.
  Buckets are decoded into hash maps on demand through a bounded LRU -
  actor RSS is ``O(max_cached_buckets x bucket_rows)``, never
  ``O(model)``, exactly the Lucene cache discipline.

Scorer actors receive only the artifact *path* (tiny broadcast); each
actor opens its own readers in ``__init__`` and pages buckets in as the
score stream touches them.  The per-ngram score memoization in the LM
classes keeps repeated lookups off the disk path entirely.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import url_hash64

_BUCKET_FMT = "bucket=%04d.parquet"


def _bucket_of(ngram: str, num_buckets: int) -> int:
    return url_hash64("lm:" + ngram) % num_buckets


# --------------------------------------------------------------------------
# writer (distributed)


def write_lm_artifact(index_ds, order: int, out_dir: str,
                      num_buckets: int = 64, max_c: int = 6) -> str:
    """Partition an :func:`~.build.ngram_index` (or plain
    :func:`~.build.count_ngrams`) Dataset into the bucketed disk
    artifact.  One pass: every bucket file is written inside its own
    ``map_groups`` task (distributed, resumable per bucket); the task
    returns only a count-of-counts PARTIAL, which the driver folds into
    the ``__sum_ngrams__`` stats - the only thing that ever reaches
    driver memory is ``O(order x max_c x num_buckets)`` rows."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    has_stats = "nf_n1" in index_ds.schema().names

    def assign_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            _bucket_of(g, num_buckets)
            for g in batch.column("ngram").to_pylist()
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        cols = {
            "ngram": group.column("ngram"),
            "n": group.column("n").cast(pa.int8()),
            "num": group.column("num").cast(pa.int64()),
        }
        if has_stats:
            for prefix in ("nf", "np", "nfp"):
                s = None
                for i in (1, 2, 3):
                    col = group.column("%s_n%d" % (prefix, i)).cast(pa.int64())
                    s = col if s is None else pc.add(s, col)
                cols["%s_s" % prefix] = s
        tbl = pa.table(cols).sort_by("ngram")
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp, row_group_size=1 << 16)
        os.replace(tmp, os.path.join(out_dir, _BUCKET_FMT % b))
        # count-of-counts partial for this bucket (A6 semantics)
        cb = pc.min_element_wise(cols["num"], max_c - 1)
        part = pa.table({"n": cols["n"].cast(pa.int64()), "cb": cb,
                         "num": cols["num"]})
        agg = part.group_by(["n", "cb"]).aggregate(
            [("num", "count"), ("num", "sum")]
        )
        return pa.table(
            {
                "n": agg.column("n"),
                "cb": agg.column("cb"),
                "cnt": agg.column("num_count"),
                "sum_num": agg.column("num_sum"),
            }
        )

    partials = (
        index_ds.map_batches(assign_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()
    )
    N = [[0] * max_c for _ in range(order + 1)]
    S = [0] * (order + 1)
    for r in partials:
        n = int(r["n"])
        N[n][int(r["cb"])] += int(r["cnt"])
        N[n][0] += int(r["cnt"])  # bucket 0 = occurred at least once
        S[n] += int(r["sum_num"])
    stats = {"N": N, "S": S, "max_n": order, "max_c": max_c}
    from .build import write_sum_ngrams

    write_sum_ngrams(stats, os.path.join(out_dir, "__sum_ngrams__"))
    meta = {"order": order, "num_buckets": num_buckets,
            "has_stats": has_stats}
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    return out_dir


# --------------------------------------------------------------------------
# readers (per-actor, bounded memory)


class DiskLMIndex:
    """Point reads over the bucketed artifact through a bounded LRU of
    decoded buckets (the CountingStringLM cache discipline)."""

    def __init__(self, path: str, max_cached_buckets: int = 64):
        self._path = path
        self._max = max_cached_buckets
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        from .build import read_sum_ngrams

        self.stats = read_sum_ngrams(os.path.join(path, "__sum_ngrams__"))
        self._init_cache()

    def _init_cache(self):
        from collections import OrderedDict

        self._cache: "OrderedDict[int, dict]" = OrderedDict()
        self.n_bucket_loads = 0  # test/telemetry: disk decodes

    def _bucket(self, b: int) -> dict:
        got = self._cache.get(b)
        if got is not None:
            self._cache.move_to_end(b)
            return got
        f = os.path.join(self._path, _BUCKET_FMT % b)
        rows: dict[str, tuple] = {}
        if os.path.exists(f):
            t = pq.read_table(f)
            names = t.schema.names
            cols = [t.column(c).to_pylist() for c in names]
            gi = names.index("ngram")
            ni = names.index("num")
            if "nf_s" in names:
                fi, pi, mi = (names.index(c) for c in ("nf_s", "np_s", "nfp_s"))
                for j in range(t.num_rows):
                    rows[cols[gi][j]] = (
                        cols[ni][j], cols[fi][j], cols[pi][j], cols[mi][j]
                    )
            else:
                for j in range(t.num_rows):
                    rows[cols[gi][j]] = (cols[ni][j], 0, 0, 0)
        self._cache[b] = rows
        self.n_bucket_loads += 1
        while len(self._cache) > self._max:
            self._cache.popitem(last=False)
        return rows

    def row(self, ngram_str: str) -> tuple | None:
        """(num, nf_s, np_s, nfp_s) or None when unindexed."""
        return self._bucket(
            _bucket_of(ngram_str, self.meta["num_buckets"])
        ).get(ngram_str)

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_cache", None)
        state.pop("n_bucket_loads", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._init_cache()


class DiskCounts:
    """``NgramCounts`` accessor protocol over the disk index - plugs
    straight into :class:`~.backoff.StupidBackoffLM`."""

    def __init__(self, index: DiskLMIndex):
        self._idx = index
        self.order = index.meta["order"]

    def count(self, ngram) -> int:
        k = len(ngram)
        if k < 1 or k > self.order:
            return 0
        row = self._idx.row(" ".join(ngram))
        return int(row[0]) if row else 0

    def num_distinct(self, k: int) -> int:
        return int(self._idx.stats["N"][k][0])


class DiskKNStats:
    """``KNStats`` accessor protocol over the disk index - plugs
    straight into :class:`~.kneserney.KneserNeyLM`.  The ``nf/np/nfp``
    attributes are column selectors consumed by ``_stat`` (the in-memory
    class passes dict attributes through the same seam)."""

    nf, np, nfp = 1, 2, 3  # row tuple positions

    def __init__(self, index: DiskLMIndex, max_c: int = 6):
        self._idx = index
        self.order = index.meta["order"]
        st = index.stats
        self.N = st["N"]
        self.sum_ngrams = list(st["S"])
        self.num_ngrams = [row[0] for row in st["N"]]

    def count(self, ngram: tuple) -> int:
        k = len(ngram)
        if k < 1 or k > self.order:
            return 0
        row = self._idx.row(" ".join(ngram))
        return int(row[0]) if row else 0

    def _stat(self, which: int, ngram: tuple) -> float:
        row = self._idx.row(" ".join(ngram))
        return float(row[which]) if row else 0.0


def load_disk_lm(path: str, scorer: str = "kneser_ney",
                 max_cached_buckets: int = 64, discount: float | None = None):
    """Open a disk LM artifact as a scorer; RSS stays bounded by the
    bucket LRU.  The object is picklable (path + config only; caches
    re-open empty per actor) - broadcast the PATH, not the model."""
    idx = DiskLMIndex(path, max_cached_buckets)
    if scorer == "stupid_backoff":
        from .backoff import StupidBackoffLM

        kw = {"discount": discount} if discount is not None else {}
        return StupidBackoffLM(DiskCounts(idx), **kw)
    if scorer == "kneser_ney":
        from .kneserney import KneserNeyLM

        kw = {"discount": discount} if discount is not None else {}
        return KneserNeyLM(DiskKNStats(idx), **kw)
    raise ValueError("unknown scorer %r" % scorer)
