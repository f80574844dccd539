"""Deduplication operators for training-data pipelines.

Each flavour is expressed Ray-Data-first with its shuffle strategy
documented:

* **exact**: content-hash column in ``map_batches`` ->
  ``groupby(hash).map_groups(first-by-id)`` (one all-to-all on the
  64-bit hash; collisions resolved by comparing the actual key inside
  the group).
* **MinHash + LSH**: per-batch vectorised shingle->minhash signatures ->
  explode to (band_id, band_hash, doc_id) rows -> ``groupby`` on the
  band key -> within-bucket candidate pairs -> exact-Jaccard verify.
* **SimHash**: 64-bit simhash per doc; blocking on four 16-bit bands;
  Hamming-distance verify.
* **n-gram Jaccard**: exact Jaccard over word shingles for candidate
  pairs (the verify kernel used by the LSH stages; all-pairs only
  within blocking buckets).
* **embedding cosine**: random-hyperplane LSH buckets over a normalised
  embedding column -> within-bucket cosine >= threshold (numpy matmul
  per bucket).

Pair verification at fixture scale broadcasts the needed id->payload
map (``ray.put``); the 100TB path replaces that with a hash-partitioned
join of pair ids against the source table (both sides partitioned by
id - same key reused from the dedup shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import murmur3_x64_128
from .textstats import content_hash64

# --------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = batch.column(column).to_pylist()
    return batch.append_column(
        "content_hash",
        pa.array([content_hash64(t or "") for t in texts], pa.int64()),
    )


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Keep the minimum-id row per distinct ``column`` value."""

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # hash collisions: resolve on the actual key value
        return (
            group.sort_values(id_column)
            .drop_duplicates(subset=[column], keep="first")
            .drop(columns=["content_hash"])
        )

    ds = ds.map_batches(
        lambda b: add_content_hash(b, column), batch_format="pyarrow"
    )
    return ds.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# --------------------------------------------------------------------------
# shingles + minhash


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed word k-shingles."""
    words = text.split()
    if len(words) < k:
        return {content_hash64(text)} if text else set()
    out = set()
    for i in range(len(words) - k + 1):
        out.add(murmur3_x64_128(" ".join(words[i : i + k]).encode("utf-8"))[0])
    return out


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], num_perm: int = 128, seed: int = 7) -> np.ndarray:
    a, b = _minhash_params(num_perm, seed)
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorised over (perm, shingle)
    v = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return v.min(axis=1)


def minhash_bands_batch(
    batch: pa.Table,
    column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
) -> pa.Table:
    """Explode each doc into (band_id, band_hash, id) rows for the LSH
    groupby (the dedup shuffle key)."""
    rows_per_band = num_perm // bands
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(column).to_pylist()
    o_band, o_hash, o_id = [], [], []
    for i, t in zip(ids, texts):
        sig = minhash_signature(word_shingles(t or ""), num_perm)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = murmur3_x64_128(chunk.tobytes())[0] - (1 << 63)
            o_band.append(b)
            o_hash.append(h)
            o_id.append(i)
    return pa.table(
        {
            "band_id": pa.array(o_band, pa.int32()),
            "band_hash": pa.array(o_hash, pa.int64()),
            id_column: pa.array(o_id, pa.int64()),
        }
    )


def lsh_candidate_pairs(ds, column: str = "text", id_column: str = "doc_id",
                        num_perm: int = 128, bands: int = 16,
                        num_partitions: int = 8):
    """Dataset of distinct candidate (id_a < id_b) pairs from LSH buckets.

    Implemented as a hash SELF-JOIN on the (band_id, band_hash) key
    (``Dataset.join``) - the C-path equivalent of per-bucket pair
    generation; a bucket of k members blows up to k^2 join rows exactly
    like explicit pair-gen would, and the distinct aggregate folds pairs
    proposed by multiple bands."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    bands_ds = ds.map_batches(
        lambda t: minhash_bands_batch(t, column, id_column, num_perm, bands),
        batch_format="pyarrow",
    )
    joined = bands_ds.join(
        bands_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("band_id", "band_hash"),
        left_suffix="_a",
        right_suffix="_b",
    )
    ca, cb = id_column + "_a", id_column + "_b"

    def upper_triangle(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch.column(ca), batch.column(cb)))
        return pa.table({"id_a": f.column(ca), "id_b": f.column(cb)})

    pairs_ds = joined.map_batches(upper_triangle, batch_format="pyarrow")
    return (
        pairs_ds.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="cnt"))
        .select_columns(["id_a", "id_b"])
    )


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_near_dup_pairs(
    ds,
    texts_by_id: dict,
    column: str = "text",
    id_column: str = "doc_id",
    threshold: float = 0.7,
):
    """LSH candidates -> exact-Jaccard verified pairs.

    ``texts_by_id`` is the broadcast small side (``ray.put`` once at
    fixture scale; partition-joined at 100TB - see module docstring).
    """
    import ray

    ref = texts_by_id if isinstance(texts_by_id, ray.ObjectRef) else ray.put(texts_by_id)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)
            self.cache: dict[int, set[int]] = {}

        def shingles(self, i: int) -> set[int]:
            if i not in self.cache:
                self.cache[i] = word_shingles(self.texts.get(i, ""))
            return self.cache[i]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sims = [
                jaccard(self.shingles(a), self.shingles(b))
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            batch = batch.assign(jaccard=sims)
            return batch[batch["jaccard"] >= threshold]

    cand = lsh_candidate_pairs(ds, column, id_column)
    return cand.map_batches(Verify, batch_format="pandas", concurrency=2)


# --------------------------------------------------------------------------
# simhash


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = murmur3_x64_128(w.encode("utf-8"))[0]
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for bit in np.nonzero(acc > 0)[0]:
        out |= 1 << int(bit)
    return out


def simhash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    texts = batch.column(column).to_pylist()
    hs = [simhash64(t or "") - (1 << 63) for t in texts]
    return batch.append_column("simhash", pa.array(hs, pa.int64()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_near_dup_pairs(ds, column: str = "text", id_column: str = "doc_id",
                           max_hamming: int = 3):
    """Block on four 16-bit simhash bands; verify Hamming distance.
    A pair within ``max_hamming`` bits must agree exactly on at least one
    of the four bands (pigeonhole), so blocking is lossless."""

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_pylist()
        ids = batch.column(id_column).to_pylist()
        o_band, o_key, o_id, o_sim = [], [], [], []
        for h, i in zip(sh, ids):
            u = h + (1 << 63)
            for b in range(4):
                o_band.append(b)
                o_key.append((u >> (b * 16)) & 0xFFFF)
                o_id.append(i)
                o_sim.append(h)
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_key": pa.array(o_key, pa.int32()),
                id_column: pa.array(o_id, pa.int64()),
                "simhash": pa.array(o_sim, pa.int64()),
            }
        )

    sh_ds = ds.map_batches(lambda t: simhash_batch(t, column), batch_format="pyarrow")
    exploded = sh_ds.map_batches(explode, batch_format="pyarrow")
    # hash self-join on the 16-bit band key (same idiom as the MinHash
    # LSH path), then vectorised Hamming verify on the joined rows
    joined = exploded.join(
        exploded,
        join_type="inner",
        num_partitions=8,
        on=("band_id", "band_key"),
        left_suffix="_a",
        right_suffix="_b",
    )
    ca, cb = id_column + "_a", id_column + "_b"

    def verify(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        f = batch.filter(pc.less(batch.column(ca), batch.column(cb)))
        ha = np.asarray(f.column("simhash_a"), dtype=np.int64).astype(np.uint64)
        hb = np.asarray(f.column("simhash_b"), dtype=np.int64).astype(np.uint64)
        x = ha ^ hb
        dist = np.zeros(len(x), dtype=np.int64)
        while x.any():
            dist += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = dist <= max_hamming
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                "id_a": f.column(ca).take(idx),
                "id_b": f.column(cb).take(idx),
                "hamming": pa.array(dist[keep], pa.int64()),
            }
        )

    pair_ds = joined.map_batches(verify, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return (
        pair_ds.groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dup_pairs(ds, threshold: float = 0.4, id_column: str = "vec_id",
                             vec_column: str = "embedding", lsh_bits: int = 0):
    """Pairs with cosine >= threshold.

    ``lsh_bits=0`` brute-forces all pairs via blockwise matmul against a
    broadcast normalised matrix (exact; fine to ~100k vectors).
    ``lsh_bits>0`` buckets by random-hyperplane signs first (the scale
    path; recall < 1 documented)."""
    import ray

    rows = ds.select_columns([id_column, vec_column]).take_all()
    ids = np.array([r[id_column] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_column] for r in rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    mat_ref = ray.put((ids, mat))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        bvec = np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        n = np.linalg.norm(bvec, axis=1, keepdims=True)
        n[n == 0] = 1.0
        bvec = bvec / n
        sims = bvec @ all_mat.T
        o_a, o_b, o_c = [], [], []
        for r in range(sims.shape[0]):
            js = np.nonzero(sims[r] >= threshold)[0]
            for j in js:
                if bids[r] < all_ids[j]:  # upper triangle only
                    o_a.append(int(bids[r]))
                    o_b.append(int(all_ids[j]))
                    o_c.append(float(sims[r, j]))
        return pa.table(
            {
                "id_a": pa.array(o_a, pa.int64()),
                "id_b": pa.array(o_b, pa.int64()),
                "cosine": pa.array(o_c, pa.float64()),
            }
        )

    if lsh_bits <= 0:
        return ds.map_batches(block_pairs, batch_format="pyarrow")

    rng = np.random.default_rng(11)
    planes = rng.standard_normal((lsh_bits, mat.shape[1])).astype(np.float32)
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        bvec = np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        signs = (bvec @ pl.T) > 0
        keys = signs.dot(1 << np.arange(pl.shape[0])).astype(np.int64)
        return batch.append_column("lsh_bucket", pa.array(keys, pa.int64()))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_column)
        v = np.array(g[vec_column].tolist(), dtype=np.float32)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1.0
        v = v / n
        sims = v @ v.T
        gids = g[id_column].to_numpy()
        a, b, c = [], [], []
        for i in range(len(gids)):
            for j in range(i + 1, len(gids)):
                if sims[i, j] >= threshold:
                    a.append(int(gids[i]))
                    b.append(int(gids[j]))
                    c.append(float(sims[i, j]))
        return pd.DataFrame({"id_a": a, "id_b": b, "cosine": c})

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("lsh_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
