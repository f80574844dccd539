"""Deterministic sampling operators for training-data curation.

A 100-TB corpus pipeline samples constantly (data mixes, eval holdouts,
ablation subsets).  Random sampling is irreproducible and unverifiable;
these operators key every decision on a HASH of a stable id, so

* the sample is a pure function of (id, seed, fraction) - rerunning a
  failed partition reproduces the same rows (resumable output),
* membership is decidable ROW-LOCALLY inside ``map_batches`` - no
  shuffle, no coordination, perfectly linear at any scale,
* an oracle (DuckDB ``md5``) can recompute the exact member set.

The decision function: ``md5("<seed>:<id>")`` interpreted as a hex
string; a row is kept when the first 8 hex chars (32 bits, uniform)
fall below ``fraction``.  Granularity 1/2^32.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_SCALE = 1 << 32


def _bucket32(seed: str, key: str) -> int:
    """First 32 bits of md5("<seed>:<key>") - the sampling coordinate."""
    return int(
        hashlib.md5(("%s:%s" % (seed, key)).encode("utf-8")).hexdigest()[:8],
        16,
    )


def hash_sample(ds, id_column: str, fraction: float, seed: str = "0"):
    """Keep each row iff its id's hash coordinate < fraction (stateless
    row-local filter; deterministic, resumable, oracle-recomputable)."""
    threshold = int(fraction * _SCALE)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        mask = pa.array(
            [_bucket32(seed, str(i)) < threshold for i in ids], pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def shuffle_shards(ds, id_column: str, num_shards: int, seed: str = "0"):
    """Deterministic global shuffle into ordered shards - the
    training-data writer's layout step.

    Each row gets ``shuffle_key = hash32(seed, id)``; rows land in
    ``shard = key % num_shards`` and are ranked inside their shard by
    ``(key, id)``.  The concatenation shard 0..S-1 in rank order IS a
    uniform seeded permutation of the corpus, yet:

    * assignment is row-local (one ``map_batches``), the only exchange
      is ONE hash-keyed ``groupby(shard)`` shuffle,
    * layout is a pure function of (ids, seed) - a failed shard can be
      rewritten alone (resumable output), and an oracle (DuckDB md5 +
      window rank) recomputes it exactly,
    * at 100 TB pick ``num_shards`` so one shard (~corpus/S) fits a
      task's heap, e.g. S = 1e5 for ~GB shards; shard files then map
      1:1 to output parquet parts.
    """

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        keys = [_bucket32(seed, str(i)) for i in ids]
        batch = batch.append_column("shuffle_key", pa.array(keys, pa.int64()))
        return batch.append_column(
            "shard", pa.array([k % num_shards for k in keys], pa.int32())
        )

    def rank_group(df):
        df = df.sort_values(["shuffle_key", id_column]).reset_index(drop=True)
        df["shard_pos"] = pa.array(range(len(df)), pa.int64()).to_pandas()
        return df

    ds = ds.map_batches(assign, batch_format="pyarrow")
    return ds.groupby("shard").map_groups(rank_group)


def stratified_sample(ds, id_column: str, strata_column: str,
                      fractions: dict, default_fraction: float = 0.0,
                      seed: str = "0"):
    """Per-stratum hash sampling (training-mix construction): stratum s
    keeps ``fractions.get(s, default_fraction)`` of its rows.  Still a
    stateless row-local filter - the strata map is broadcast inside the
    closure (small side, never shuffled)."""
    thresholds = {
        s: int(f * _SCALE) for s, f in fractions.items()
    }
    default_threshold = int(default_fraction * _SCALE)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        strata = batch.column(strata_column).to_pylist()
        mask = pa.array(
            [
                _bucket32(seed, str(i))
                < thresholds.get(s, default_threshold)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
