"""Persistent content-hash registry for INCREMENTAL dedup across runs.

A 100-TB corpus is never curated in one shot: new crawl shards arrive
and must be deduplicated against everything already accepted WITHOUT
re-reading the old corpus.  The registry is the disk-backed URL-seen
idea (reference: persistent cuckoo URL-seen, `state/seen.py`;
BerkeleyDB in remstef/topicrawler's Heritrix stack) applied to content
hashes:

    <dir>/manifest.json                 {"num_shards": S, "generations": [...]}
    <dir>/gen-<name>/shard=NNNN.parquet sorted uint64 content hashes,
                                        hash % S == NNNN

* **register** is a distributed write: one slim (hash, shard) shuffle,
  each shard file written inside its own ``map_groups`` task (sorted,
  deduplicated) - resumable per shard, append-only per generation,
  atomic via directory rename.  The driver only appends a manifest
  entry.
* **probe** is an actor-pool ``map_batches`` stage: each actor lazily
  loads (gen, shard) hash arrays through a bounded LRU and answers
  membership with vectorized ``searchsorted`` - actor RSS is
  O(cached shards), never O(registry).  New batches only touch the
  shards their hashes map to, so a small update probes a small
  fraction of a huge registry.

Hashes are pandas ``hash_array`` (SipHash64, fixed key) of the raw
column value; a cross-run false positive needs a 64-bit collision
(~n_old * n_new / 2**64 - negligible, and conservative: it can only
drop a new doc, never admit a duplicate).

**Deployment requirement: ``registry_dir`` must be a filesystem shared
by the driver and every worker node** (NFS/Lustre/FUSE-mounted object
store) - register writes shard files from worker tasks and probe reads
them from actor processes.  Because a missing shard file would
otherwise be indistinguishable from an empty one (silently admitting
duplicates), the manifest records each generation's shard list and
both register and probe validate that every listed file is visible,
raising instead of silently returning seen=False.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_SHARD_FMT = "shard=%04d.parquet"


def content_hashes(values: list) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values, dtype=object))


def _manifest_path(d: str) -> str:
    return os.path.join(d, "manifest.json")


def read_manifest(registry_dir: str) -> dict:
    p = _manifest_path(registry_dir)
    if not os.path.exists(p):
        return {"num_shards": 0, "generations": []}
    with open(p) as f:
        return json.load(f)


def validate_manifest(registry_dir: str, man: dict | None = None) -> dict:
    """Raise if any shard file listed in the manifest is missing on
    THIS node - the shared-filesystem guard (a missing shard would
    otherwise read as empty and silently admit duplicates)."""
    if man is None:
        man = read_manifest(registry_dir)
    missing = []
    for gen in man["generations"]:
        for shard in gen.get("shards", ()):
            p = os.path.join(
                registry_dir, "gen-%s" % gen["name"], _SHARD_FMT % shard
            )
            if not os.path.exists(p):
                missing.append(p)
    if missing:
        raise RuntimeError(
            "dedup registry at %r is missing %d shard file(s) listed in "
            "its manifest (first: %r). The registry directory must live "
            "on a filesystem shared by the driver and ALL worker nodes; "
            "a node-local path only captures shards written on that node."
            % (registry_dir, len(missing), missing[0])
        )
    return man


def register_hashes(
    ds,
    column: str,
    registry_dir: str,
    generation: str,
    num_shards: int = 64,
):
    """Add ``ds[column]``'s content hashes to the registry as one new
    generation.  Distributed: per-shard files are each written by
    their own task; the driver only rewrites the manifest."""
    os.makedirs(registry_dir, exist_ok=True)
    man = read_manifest(registry_dir)
    if man["generations"] and man["num_shards"] != num_shards:
        raise ValueError(
            "registry has num_shards=%d; cannot register with %d"
            % (man["num_shards"], num_shards)
        )
    gen_dir = os.path.join(registry_dir, "gen-%s" % generation)
    if os.path.exists(gen_dir):
        raise ValueError("generation %r already registered" % generation)

    def to_hash_rows(batch: pa.Table) -> pa.Table:
        h = np.unique(content_hashes(batch.column(column).to_pylist()))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "shard": pa.array(
                    (h % np.uint64(num_shards)).astype(np.int64), pa.int64()
                ),
            }
        )

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["shard"].iloc[0])
        h = np.unique(group["h"].to_numpy(dtype=np.uint64))
        os.makedirs(gen_tmp, exist_ok=True)
        pq.write_table(
            pa.table({"h": pa.array(h, pa.uint64())}),
            os.path.join(gen_tmp, _SHARD_FMT % shard),
        )
        return pd.DataFrame({"shard": [shard], "n": [len(h)]})

    gen_tmp = tempfile.mkdtemp(
        prefix=".gen-%s-" % generation, dir=registry_dir
    )
    stats = (
        ds.select_columns([column])
        .map_batches(to_hash_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .take_all()
    )
    os.rename(gen_tmp, gen_dir)
    man["num_shards"] = num_shards
    man["generations"].append(
        {
            "name": generation,
            "n_hashes": int(sum(s["n"] for s in stats)),
            "shards": sorted(int(s["shard"]) for s in stats),
        }
    )
    validate_manifest(registry_dir, man)
    with open(_manifest_path(registry_dir), "w") as f:
        json.dump(man, f)
    return man


class RegistryProbe:
    """Actor-pool stage: appends ``seen_before`` (bool) - whether the
    row's content hash exists in ANY registered generation.  Shard
    arrays load lazily through a bounded LRU."""

    def __init__(self, registry_dir: str, column: str, max_cached: int = 128):
        from collections import OrderedDict

        self.registry_dir = registry_dir
        self.column = column
        # validate on EVERY probe actor: each worker node must see every
        # manifest-listed shard file (shared-filesystem guard)
        self.man = validate_manifest(registry_dir)
        # per-generation shard sets; None = legacy manifest without the
        # "shards" list (falls back to missing==empty)
        self._gen_shards = {
            g["name"]: (set(g["shards"]) if "shards" in g else None)
            for g in self.man["generations"]
        }
        self.cache: "OrderedDict[tuple[str, int], np.ndarray]" = OrderedDict()
        self.max_cached = max_cached

    def _shard(self, gen: str, shard: int) -> np.ndarray:
        key = (gen, shard)
        got = self.cache.get(key)
        if got is not None:
            self.cache.move_to_end(key)
            return got
        listed = self._gen_shards.get(gen)
        p = os.path.join(self.registry_dir, "gen-%s" % gen, _SHARD_FMT % shard)
        if os.path.exists(p):
            arr = pq.read_table(p).column("h").to_numpy(zero_copy_only=False)
        elif listed is not None and shard in listed:
            raise RuntimeError(
                "registry shard %r listed in the manifest is not visible "
                "on this node - registry_dir must be on a shared "
                "filesystem" % p
            )
        else:
            arr = np.empty(0, dtype=np.uint64)
        self.cache[key] = arr
        if len(self.cache) > self.max_cached:
            self.cache.popitem(last=False)
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = content_hashes(batch.column(self.column).to_pylist())
        seen = np.zeros(len(h), dtype=bool)
        ns = self.man["num_shards"]
        if ns:
            shards = (h % np.uint64(ns)).astype(np.int64)
            for shard in np.unique(shards):
                m = shards == shard
                hs = h[m]
                for gen in self.man["generations"]:
                    arr = self._shard(gen["name"], int(shard))
                    if not len(arr):
                        continue
                    idx = np.searchsorted(arr, hs)
                    idx[idx >= len(arr)] = 0
                    seen[m] |= arr[idx] == hs
        return batch.append_column("seen_before", pa.array(seen))


def filter_unseen(ds, column: str, registry_dir: str,
                  concurrency: int | None = None):
    """Drop rows whose content hash is already registered."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    probed = ds.map_batches(
        RegistryProbe,
        fn_constructor_kwargs={"registry_dir": registry_dir, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return probed.filter(expr="seen_before == False").drop_columns(
        ["seen_before"]
    )


# --------------------------------------------------------------------------
# precomputed-hash variants: incremental NEAR-dup via MinHash band keys

_BAND_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def band_key(band_id, band_hash) -> np.ndarray:
    """Fold (band_id, band_hash) rows into one uint64 registry key
    (band_hash xor a band-id-dependent odd constant - bijective per
    band, deterministic everywhere)."""
    bid = np.asarray(band_id, dtype=np.uint64)
    bh = np.asarray(band_hash, dtype=np.int64).view(np.uint64)
    return bh ^ ((bid + np.uint64(1)) * _BAND_GAMMA)


def register_hash_column(
    ds,
    hash_column: str,
    registry_dir: str,
    generation: str,
    num_shards: int = 64,
):
    """Like :func:`register_hashes` but the column already holds uint64
    keys (e.g. MinHash band keys) - no re-hashing."""
    os.makedirs(registry_dir, exist_ok=True)
    man = read_manifest(registry_dir)
    if man["generations"] and man["num_shards"] != num_shards:
        raise ValueError(
            "registry has num_shards=%d; cannot register with %d"
            % (man["num_shards"], num_shards)
        )
    gen_dir = os.path.join(registry_dir, "gen-%s" % generation)
    if os.path.exists(gen_dir):
        raise ValueError("generation %r already registered" % generation)

    def to_hash_rows(batch: pa.Table) -> pa.Table:
        h = np.unique(
            batch.column(hash_column).to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "shard": pa.array(
                    (h % np.uint64(num_shards)).astype(np.int64), pa.int64()
                ),
            }
        )

    gen_tmp = tempfile.mkdtemp(prefix=".gen-%s-" % generation, dir=registry_dir)

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        shard = int(group["shard"].iloc[0])
        h = np.unique(group["h"].to_numpy(dtype=np.uint64))
        pq.write_table(
            pa.table({"h": pa.array(h, pa.uint64())}),
            os.path.join(gen_tmp, _SHARD_FMT % shard),
        )
        return pd.DataFrame({"shard": [shard], "n": [len(h)]})

    stats = (
        ds.select_columns([hash_column])
        .map_batches(to_hash_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .take_all()
    )
    os.rename(gen_tmp, gen_dir)
    man["num_shards"] = num_shards
    man["generations"].append(
        {
            "name": generation,
            "n_hashes": int(sum(s["n"] for s in stats)),
            "shards": sorted(int(s["shard"]) for s in stats),
        }
    )
    validate_manifest(registry_dir, man)
    with open(_manifest_path(registry_dir), "w") as f:
        json.dump(man, f)
    return man


class HashColumnProbe(RegistryProbe):
    """RegistryProbe over a column that already holds uint64 keys."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        h = (
            batch.column(self.column)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        seen = np.zeros(len(h), dtype=bool)
        ns = self.man["num_shards"]
        if ns:
            shards = (h % np.uint64(ns)).astype(np.int64)
            for shard in np.unique(shards):
                m = shards == shard
                hs = h[m]
                for gen in self.man["generations"]:
                    arr = self._shard(gen["name"], int(shard))
                    if not len(arr):
                        continue
                    idx = np.searchsorted(arr, hs)
                    idx[idx >= len(arr)] = 0
                    seen[m] |= arr[idx] == hs
        return batch.append_column("seen_before", pa.array(seen))


def register_minhash_bands(
    ds,
    registry_dir: str,
    generation: str,
    column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    num_shards: int = 64,
):
    """Register a corpus's MinHash band keys (the LSH bucket ids) so a
    LATER run can find near-duplicates against it without re-reading
    this corpus."""
    from ..stages.dedup import minhash_bands_batch

    def to_keys(batch: pa.Table) -> pa.Table:
        b = minhash_bands_batch(batch, column, id_column, num_perm, bands)
        keys = band_key(
            b.column("band_id").to_numpy(zero_copy_only=False),
            b.column("band_hash").to_numpy(zero_copy_only=False),
        )
        return pa.table({"band_key": pa.array(keys, pa.uint64())})

    keyed = ds.select_columns([id_column, column]).map_batches(
        to_keys, batch_format="pyarrow"
    )
    return register_hash_column(
        keyed, "band_key", registry_dir, generation, num_shards
    )


def flag_near_dups(
    ds,
    registry_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    concurrency: int | None = None,
):
    """Per-doc LSH candidate flag against the registry: ``is_candidate``
    iff ANY of the doc's band keys is registered.  The standard
    use: drop/route candidates to an exact-verify pass that point-reads
    only the candidate docs from the old corpus."""
    import ray
    from ray.data.aggregate import Max

    from ..stages.dedup import minhash_bands_batch

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))

    def to_keys(batch: pa.Table) -> pa.Table:
        b = minhash_bands_batch(batch, column, id_column, num_perm, bands)
        keys = band_key(
            b.column("band_id").to_numpy(zero_copy_only=False),
            b.column("band_hash").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                id_column: b.column(id_column),
                "band_key": pa.array(keys, pa.uint64()),
            }
        )

    keyed = ds.select_columns([id_column, column]).map_batches(
        to_keys, batch_format="pyarrow"
    )
    probed = keyed.map_batches(
        HashColumnProbe,
        fn_constructor_kwargs={
            "registry_dir": registry_dir,
            "column": "band_key",
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: batch.column(id_column),
                "hit": batch.column("seen_before").cast(pa.int64()),
            }
        )

    flags = (
        probed.map_batches(to_int, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(Max("hit", alias_name="hit"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_column: batch.column(id_column),
                "is_candidate": pc.equal(
                    batch.column("hit").cast(pa.int64()), 1
                ),
            }
        )

    return flags.map_batches(finish, batch_format="pyarrow")


def compact_registry(registry_dir: str, compacted_name: str = "compacted"):
    """Merge every generation's shard files into ONE generation -
    bounds probe cost (generations x shards file opens) after many
    incremental runs.  Distributed: one Ray task per shard merges that
    shard's per-generation sorted arrays (np.union1d); the driver only
    rewrites the manifest.  Atomic via directory rename; the old
    generation dirs are removed only after the new manifest is
    durable."""
    import ray

    man = read_manifest(registry_dir)
    if not man["generations"]:
        return man
    gens = [g["name"] for g in man["generations"]]
    gen_tmp = tempfile.mkdtemp(
        prefix=".gen-%s-" % compacted_name, dir=registry_dir
    )

    validate_manifest(registry_dir, man)

    @ray.remote
    def merge_shard(shard: int) -> int:
        parts = []
        for g in gens:
            p = os.path.join(registry_dir, "gen-%s" % g, _SHARD_FMT % shard)
            if os.path.exists(p):
                parts.append(
                    pq.read_table(p).column("h").to_numpy(zero_copy_only=False)
                )
        if not parts:
            return 0
        merged = np.unique(np.concatenate(parts))
        pq.write_table(
            pa.table({"h": pa.array(merged, pa.uint64())}),
            os.path.join(gen_tmp, _SHARD_FMT % shard),
        )
        return len(merged)

    counts = ray.get(
        [merge_shard.remote(s) for s in range(man["num_shards"])]
    )
    gen_dir = os.path.join(registry_dir, "gen-%s" % compacted_name)
    os.rename(gen_tmp, gen_dir)
    man["generations"] = [
        {
            "name": compacted_name,
            "n_hashes": int(sum(counts)),
            "shards": sorted(s for s, n in enumerate(counts) if n > 0),
        }
    ]
    validate_manifest(registry_dir, man)
    with open(_manifest_path(registry_dir), "w") as f:
        json.dump(man, f)
    for g in gens:
        import shutil

        shutil.rmtree(os.path.join(registry_dir, "gen-%s" % g),
                      ignore_errors=True)
    return man


def register_ngram_hashes(
    ds,
    registry_dir: str,
    generation: str,
    column: str = "text",
    n: int = 3,
    num_shards: int = 64,
):
    """Register a corpus's word n-gram hashes - the novelty-scoring
    side of the registry (cf. stages/decontam.py, which broadcasts a
    small benchmark; here the REFERENCE side is the big one, so it
    lives sharded on disk instead)."""

    def to_keys(batch: pa.Table) -> pa.Table:
        acc: list[np.ndarray] = []
        for t in batch.column(column).to_pylist():
            words = (t or "").split(" ")
            grams = [
                " ".join(words[i : i + n])
                for i in range(max(0, len(words) - n + 1))
            ]
            if grams:
                acc.append(
                    pd.util.hash_array(np.asarray(grams, dtype=object))
                )
        h = (
            np.unique(np.concatenate(acc))
            if acc
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"gram_key": pa.array(h, pa.uint64())})

    keyed = ds.select_columns([column]).map_batches(
        to_keys, batch_format="pyarrow"
    )
    return register_hash_column(
        keyed, "gram_key", registry_dir, generation, num_shards
    )


def ngram_novelty(
    ds,
    registry_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    n: int = 3,
    concurrency: int | None = None,
):
    """Per-doc novelty vs the registry: the fraction of the doc's
    DISTINCT word n-grams not yet registered, as int64 ppm
    (``novelty_e6 = floor((1 - seen/total) * 1e6)``; docs shorter than
    ``n`` words score 1e6).  One explode pass + LRU shard probes + one
    slim groupby - the streaming "how much of this shard is new
    content" curation signal."""
    import ray
    from ray.data.aggregate import Sum

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))

    def to_keys(batch: pa.Table) -> pa.Table:
        o_id, o_k = [], []
        for did, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(column).to_pylist(),
        ):
            words = (t or "").split(" ")
            grams = [
                " ".join(words[i : i + n])
                for i in range(max(0, len(words) - n + 1))
            ]
            if grams:
                h = np.unique(
                    pd.util.hash_array(np.asarray(grams, dtype=object))
                )
            else:
                h = np.asarray([0], dtype=np.uint64)  # sentinel, len<n doc
            o_id.extend([did] * len(h))
            o_k.extend(h.tolist())
        return pa.table(
            {
                id_column: pa.array(o_id, pa.int64()),
                "gram_key": pa.array(o_k, pa.uint64()),
            }
        )

    keyed = ds.select_columns([id_column, column]).map_batches(
        to_keys, batch_format="pyarrow"
    )
    probed = keyed.map_batches(
        HashColumnProbe,
        fn_constructor_kwargs={
            "registry_dir": registry_dir,
            "column": "gram_key",
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def to_counts(batch: pa.Table) -> pa.Table:
        seen = batch.column("seen_before").cast(pa.int64())
        ones = pa.array(np.ones(batch.num_rows, dtype=np.int64), pa.int64())
        # the len<n sentinel counts as one never-registered gram (key 0
        # is never registered: registered keys are real hashes with
        # ~2^-64 collision odds) -> novelty 1e6, as documented
        return pa.table(
            {
                id_column: batch.column(id_column),
                "n_seen": seen,
                "n_total": ones,
            }
        )

    agg = (
        probed.map_batches(to_counts, batch_format="pyarrow")
        .groupby(id_column)
        .aggregate(
            Sum("n_seen", alias_name="n_seen"),
            Sum("n_total", alias_name="n_total"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        seen = batch.column("n_seen").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        tot = batch.column("n_total").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nov = np.floor((1.0 - seen / tot) * 1e6).astype(np.int64)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "novelty_e6": pa.array(nov, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
