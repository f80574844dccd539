"""Content-defined chunking (CDC) dedup: gear rolling-hash chunk
boundaries + global chunk-level first-occurrence dedup.

Fixed-size segment dedup (stages/dedup.py:segment_dedup) misses
duplicated passages that shift by a few bytes (boilerplate injected at
different offsets re-aligns every downstream segment).  CDC cuts where
the CONTENT says so - at positions where a rolling hash of the last 64
bytes hits a mask - so identical passages chunk identically no matter
where they sit in the document (the rsync/LBFS/FastCDC principle;
Muthitacharoen et al., SOSP 2001).

Vectorization: the gear hash ``h_i = (h_{i-1} << 1) + gear[b_i]``
telescopes to ``h_i = sum_{k<64} gear[b_{i-k}] << k (mod 2^64)`` -
terms shifted ≥64 vanish - so per document it is 64 shifted
vectorized adds, O(n) memory, no per-byte Python loop.  Only the
(few) mask-hit candidates are walked sequentially to enforce
min/max chunk bounds.  The gear table derives from pandas
``hash_array`` over 0..255 - deterministic everywhere.

Dedup exchange: one slim ``(chunk_hash, owner)`` shuffle -
``groupby(chunk_hash).min(owner)`` with the owner packed as
``doc_id * 2^20 + chunk_idx`` (int64), then a hash-partitioned join
back - the same winner-join shape as exact_dedup_by_hash; no driver
state, no text re-shipped.

Reference context: remstef/topicrawler deduplicates at sentence level
(O4, pipelines/perpeval.py); CDC extends dedup to byte-shift-robust
passage level for training-data curation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_GEAR = pd.util.hash_array(np.arange(256, dtype=np.int64))  # uint64[256]
_IDX_BITS = 20  # chunk_idx packs into the low 20 bits of the owner key


def gear_hashes(data: bytes) -> np.ndarray:
    """Rolling gear hash at every byte position (64-byte window),
    vectorized as 64 shifted adds (uint64 wrap-around is the mod)."""
    b = np.frombuffer(data, dtype=np.uint8)
    h = np.zeros(len(b), dtype=np.uint64)
    g = _GEAR[b]
    for k in range(min(64, len(b))):
        if k == 0:
            h += g
        else:
            h[k:] += g[: len(b) - k] << np.uint64(k)
    return h


def cdc_boundaries(
    data: bytes, mask: int, min_size: int, max_size: int
) -> list[int]:
    """Chunk end offsets (exclusive).  A cut happens at the first
    position ≥ min_size past the previous cut where ``h & mask == 0``,
    or at max_size regardless."""
    n = len(data)
    if n == 0:
        return []
    h = gear_hashes(data)
    hits = np.nonzero((h & np.uint64(mask)) == 0)[0]
    cuts: list[int] = []
    prev = 0
    hi = 0
    while prev < n:
        lo_pos = prev + min_size - 1
        hard = prev + max_size
        cut = min(hard, n)
        while hi < len(hits) and hits[hi] < lo_pos:
            hi += 1
        if hi < len(hits) and hits[hi] < min(hard, n) - 1:
            cut = int(hits[hi]) + 1
        cuts.append(min(cut, n))
        prev = cuts[-1]
    return cuts


def chunk_doc(text: str, mask: int = 0x3F, min_size: int = 16,
              max_size: int = 256) -> list[bytes]:
    """Split a document's UTF-8 bytes into content-defined chunks."""
    data = (text or "").encode("utf-8")
    out = []
    prev = 0
    for cut in cdc_boundaries(data, mask, min_size, max_size):
        out.append(data[prev:cut])
        prev = cut
    return out


def _chunk_rows(batch: pa.Table, column: str, id_column: str,
                mask: int, min_size: int, max_size: int) -> pa.Table:
    ids, idxs, lens, keys = [], [], [], []
    for doc_id, text in zip(
        batch.column(id_column).to_pylist(), batch.column(column).to_pylist()
    ):
        chunks = chunk_doc(text, mask, min_size, max_size)
        for i, c in enumerate(chunks):
            ids.append(doc_id)
            idxs.append(i)
            lens.append(len(c))
            keys.append(c)
    h = (
        pd.util.hash_array(np.asarray(keys, dtype=object)).astype(np.int64)
        if keys
        else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_len": pa.array(lens, pa.int64()),
            "chunk_hash": pa.array(h, pa.int64()),
        }
    )


def pack_owner(doc_id, chunk_idx):
    """Packed winner key ``doc_id << _IDX_BITS | chunk_idx``.  MIN over
    this key selects the (doc_id, chunk_idx)-lexicographic first
    occurrence; a collision or int64 wrap would silently crown the
    wrong winner, so both fields are bounds-checked explicitly
    (chunk_idx < 2^20 means docs up to ~16 MiB at min_size=16;
    doc_id < 2^43)."""
    import pyarrow.compute as pc

    if len(doc_id):
        max_idx = pc.max(chunk_idx).as_py()
        max_did = pc.max(doc_id).as_py()
        min_did = pc.min(doc_id).as_py()
        if max_idx is not None and max_idx >= (1 << _IDX_BITS):
            raise OverflowError(
                "cdc_dedup: chunk_idx %d >= 2^%d - a document yielded too "
                "many chunks for the packed owner key; raise "
                "min_size/max_size or _IDX_BITS" % (max_idx, _IDX_BITS)
            )
        if max_did is not None and (
            max_did >= (1 << (63 - _IDX_BITS)) or min_did < 0
        ):
            raise OverflowError(
                "cdc_dedup: doc_id out of [0, 2^%d) - the packed owner "
                "key would overflow int64" % (63 - _IDX_BITS)
            )
    return pc.add(
        pc.multiply(doc_id, np.int64(1 << _IDX_BITS)), chunk_idx
    )


def cdc_dedup(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    mask: int = 0x3F,
    min_size: int = 16,
    max_size: int = 256,
    num_partitions: int | None = None,
):
    """Chunk every document, mark each chunk ``keep`` iff it is the
    global first occurrence of its content (order: doc_id, chunk_idx).
    Returns ``(doc_id, chunk_idx, chunk_len, keep)``."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)

    chunks = ds.select_columns([id_column, column]).map_batches(
        lambda b: _chunk_rows(b, column, id_column, mask, min_size, max_size),
        batch_format="pyarrow",
    )

    def pack(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "owner", pack_owner(batch.column("doc_id"),
                                batch.column("chunk_idx"))
        )

    packed = chunks.map_batches(pack, batch_format="pyarrow")
    winners = (
        packed.groupby("chunk_hash")
        .aggregate(Min("owner", alias_name="win_owner"))
        .repartition(num_partitions)
    )
    joined = packed.join(
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("chunk_hash",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("owner"), batch.column("win_owner"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "chunk_idx": batch.column("chunk_idx"),
                "chunk_len": batch.column("chunk_len"),
                "keep": keep,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
