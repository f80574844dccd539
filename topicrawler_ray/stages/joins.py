"""Bloom-filter semi-join: filter a huge table by key membership in a
smaller table WITHOUT shuffling the huge side.

The classic distributed-join optimization (runtime filter / sideways
information passing): when ``big ⋉ small`` would force an all-to-all
exchange of the big side, first reduce the small side's join keys to a
Bloom filter bitmap, broadcast it (``ray.put`` once, zero-copy read in
every probe task), and stream the big side through a vectorized
membership probe.  Bloom false positives are then removed by an EXACT
verification pass, so the operator's output is exactly the semi-join.

Scale design (100 TB big side, up-to-GB small side):

* the bitmap is built distributed: each small-side block reduces to a
  local ``m``-bit bitmap (packed ``uint64[m/64]``); only those fixed-
  size bitmaps travel to the driver, which ORs them.  Driver cost is
  ``num_blocks × m/8`` bytes, independent of row count.
* the probe is one Arrow ``map_batches`` pass over the big side: key
  hashes via ``pandas.util.hash_array`` (SipHash, fixed key), ``k``
  double-hashed probe positions per key, all numpy - no Python loop,
  no shuffle, no big-side materialization.
* exact verification of the (few) Bloom survivors:
  - ``verify="broadcast"`` (default): the small side's distinct key
    hash set is also broadcast (sorted uint64 array, searchsorted
    probe).  Right for the by-contract-small side; exact.
  - ``verify="join"``: a hash-partitioned ``Dataset.join`` of the
    survivors against the small side's distinct keys - the scale path
    when even the exact key array is too big to broadcast.  The join
    only sees the post-Bloom survivors, i.e. ~``|matches| + m·fp``
    rows instead of the whole big side.
  - ``verify="none"``: keep the Bloom's false positives (a superset) -
    for pipelines that tolerate overcounting, e.g. pre-filters in
    front of another exact stage.

Reference context: the reference engine (remstef/topicrawler) has no
runtime-filter join; this extends the engine's join surface alongside
the fetch-sim join (state/pagestore.py) and Dataset.join dedup paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _hash_keys(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit key hashes (SipHash via pandas, fixed key -
    stable across processes and batch shapes)."""
    np_arr = arr.to_numpy(zero_copy_only=False)
    if np_arr.dtype == object:
        return pd.util.hash_array(np_arr)
    return pd.util.hash_array(np.ascontiguousarray(np_arr))


def _second_hash(h1: np.ndarray) -> np.ndarray:
    """splitmix64-style remix of the first hash; forced odd so the
    double-hash probe sequence walks all ``m`` slots."""
    z = (h1 + _SPLITMIX_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z | np.uint64(1)


def _bloom_positions(h: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(len(h), k) matrix of probe bit positions via double hashing
    (Kirsch-Mitzenmacher: g_i = h1 + i*h2 mod m is as good as k
    independent hashes)."""
    h2 = _second_hash(h)
    i = np.arange(num_hashes, dtype=np.uint64)
    return (h[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)


def _set_bits(bitmap: np.ndarray, positions: np.ndarray) -> None:
    words = (positions >> np.uint64(6)).ravel()
    bits = np.uint64(1) << (positions & np.uint64(63)).ravel()
    np.bitwise_or.at(bitmap, words, bits)


def _test_bits(bitmap: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Row-wise AND over the k probe bits -> bool membership vector."""
    words = positions >> np.uint64(6)
    bits = np.uint64(1) << (positions & np.uint64(63))
    return ((bitmap[words] & bits) != 0).all(axis=1)


def build_key_bloom(
    ds,
    key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 7,
) -> np.ndarray:
    """Distributed Bloom-filter build over ``ds[key]``: each block
    reduces to a local packed bitmap; the driver ORs the fixed-size
    bitmaps.  Returns the ``uint64[num_bits/64]`` bitmap."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")

    def block_bitmap(batch: pa.Table) -> pa.Table:
        local = np.zeros(num_bits // 64, dtype=np.uint64)
        h = _hash_keys(batch.column(key))
        _set_bits(local, _bloom_positions(h, num_bits, num_hashes))
        return pa.table({"bitmap": pa.array([local.tobytes()], pa.large_binary())})

    bitmap = np.zeros(num_bits // 64, dtype=np.uint64)
    for b in (
        ds.select_columns([key])
        .map_batches(block_bitmap, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for buf in b.column("bitmap").to_pylist():
            bitmap |= np.frombuffer(buf, dtype=np.uint64)
    return bitmap


def distinct_key_hashes(ds, key: str) -> np.ndarray:
    """Sorted distinct key hashes of ``ds[key]`` - the exact-verify
    broadcast side.  Per-block dedup first; only slim hash columns
    reach the driver."""

    def block_hashes(batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_keys(batch.column(key)))
        return pa.table({"h": pa.array(h, pa.uint64())})

    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in ds.select_columns([key])
        .map_batches(block_hashes, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class BloomProbe:
    """Actor-pool probe stage: keeps only big-side rows whose ``key``
    hash passes the broadcast Bloom bitmap (and, when given, the exact
    hash set).  Object-store refs are fetched zero-copy ONCE per actor
    in ``__init__``."""

    def __init__(
        self,
        bitmap_ref,
        key: str,
        num_bits: int,
        num_hashes: int,
        exact_ref=None,
    ):
        import ray

        self.bitmap = ray.get(bitmap_ref)
        self.exact = ray.get(exact_ref) if exact_ref is not None else None
        self.key = key
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _hash_keys(batch.column(self.key))
        keep = _test_bits(
            self.bitmap, _bloom_positions(h, self.num_bits, self.num_hashes)
        )
        if self.exact is not None and keep.any():
            idx = np.searchsorted(self.exact, h[keep])
            idx[idx >= len(self.exact)] = 0
            ok = (
                (self.exact[idx] == h[keep])
                if len(self.exact)
                else np.zeros(int(keep.sum()), dtype=bool)
            )
            sub = keep.nonzero()[0]
            keep = np.zeros(len(h), dtype=bool)
            keep[sub[ok]] = True
        return batch.filter(pa.array(keep))


def bloom_semijoin(
    big_ds,
    small_ds,
    key: str,
    right_key: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 7,
    verify: str = "broadcast",
    concurrency: int | None = None,
    num_partitions: int | None = None,
):
    """``big_ds ⋉ small_ds`` on ``key`` (= ``right_key`` on the small
    side).  Exact for ``verify in ("broadcast", "join")``; a Bloom
    superset for ``verify="none"``.

    64-bit hash-collision caveat (broadcast verify): membership is
    decided on SipHash64 of the key, so a collision between a big-side
    non-member and a small-side member admits a spurious row with
    probability ~``n_big * n_small / 2**64`` - negligible, and the
    ``verify="join"`` path compares true key values for the cases
    where it is not.
    """
    import ray

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)
    if right_key is None:
        right_key = key
    if concurrency is None:
        # leave CPU headroom for the upstream read/repartition tasks -
        # an actor pool that reserves every CPU deadlocks the streaming
        # executor on small clusters
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    bitmap = build_key_bloom(small_ds, right_key, num_bits, num_hashes)
    bitmap_ref = ray.put(bitmap)
    exact_ref = None
    if verify == "broadcast":
        exact_ref = ray.put(distinct_key_hashes(small_ds, right_key))
    elif verify not in ("join", "none"):
        raise ValueError("verify must be broadcast|join|none")

    survivors = big_ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs={
            "bitmap_ref": bitmap_ref,
            "key": key,
            "num_bits": num_bits,
            "num_hashes": num_hashes,
            "exact_ref": exact_ref,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if verify != "join":
        return survivors

    from ray.data.aggregate import Count

    keys = (
        small_ds.select_columns([right_key])
        .groupby(right_key)
        .aggregate(Count(alias_name="__cnt__"))
        .select_columns([right_key])
        .repartition(num_partitions)
    )
    joined = survivors.join(
        keys,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(right_key,),
        right_suffix="_r",
    )
    drop = right_key + "_r" if right_key == key else right_key
    cols = [c for c in joined.schema().names if c != drop]
    return joined.select_columns(cols)


def bloom_antijoin(
    big_ds,
    small_ds,
    key: str,
    right_key: str | None = None,
    concurrency: int | None = None,
):
    """``big_ds ▷ small_ds`` (anti-join): keep big-side rows whose key
    does NOT appear in the small side.  A Bloom bitmap alone cannot
    answer this exactly (its false positives would DROP valid rows), so
    the probe goes straight to the broadcast exact hash set
    (searchsorted, same shape as the semi-join's verify side) - still
    zero shuffle of the big side.  Exact up to 64-bit hash collisions
    (negligible; conservative direction: a collision drops a row, never
    admits a duplicate)."""
    import ray

    if right_key is None:
        right_key = key
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    exact_ref = ray.put(distinct_key_hashes(small_ds, right_key))

    class AntiProbe:
        def __init__(self, exact_ref, key):
            self.exact = ray.get(exact_ref)
            self.key = key

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or not len(self.exact):
                return batch
            h = _hash_keys(batch.column(self.key))
            idx = np.searchsorted(self.exact, h)
            idx[idx >= len(self.exact)] = 0
            member = self.exact[idx] == h
            return batch.filter(pa.array(~member))

    return big_ds.map_batches(
        AntiProbe,
        fn_constructor_kwargs={"exact_ref": exact_ref, "key": key},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
