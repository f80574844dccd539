"""Benchmark decontamination: flag corpus documents that share word
n-grams with a (small) benchmark/eval set.

The standard LLM-training hygiene step (GPT-3 appendix C / PaLM /
Llama style): any training document containing an n-gram that also
occurs in an evaluation benchmark is contaminated and must be dropped
or scrubbed before training.

Scale design (100 TB corpus, MB-scale benchmark):

* the benchmark side is SMALL by contract (eval sets are a few MB of
  text).  Its distinct n-grams are reduced to a sorted ``uint64``
  hash array ONCE, ``ray.put`` into the object store, and every
  probe actor reads it zero-copy in ``__init__`` - never re-shipped
  per batch and never a shuffle join.
* the corpus side streams: one Arrow ``map_batches`` pass computes
  each document's distinct n-gram hashes and counts membership with
  a vectorised ``np.isin`` against the broadcast array.  No
  all-to-all exchange; cost is one read of the corpus.
* hashes are pandas ``hash_array`` (SipHash, fixed key - deterministic
  across processes).  A 64-bit collision mislabelling a clean doc is
  ~n_bench * n_doc / 2**64 - negligible, and conservative (false
  positives only drop extra docs, never leak contamination).

Reference context: the reference engine has no decontamination
operator; this extends the corpus-curation surface (SURVEY.md "beyond
the reference" items) alongside dedup/quality/langid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def word_ngrams(text: str, n: int) -> list[str]:
    """Whitespace-split word n-grams (matches the SQL-oracle split:
    ``string_split(text, ' ')`` - consecutive spaces yield empty
    tokens on both sides, so the two stay in lockstep)."""
    words = (text or "").split(" ")
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _hash_grams(grams: list[str]) -> np.ndarray:
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(grams, dtype=object))


def benchmark_ngram_hashes(bench_ds, n: int = 3, column: str = "text") -> np.ndarray:
    """Distinct n-gram hashes of the benchmark set, as a sorted uint64
    array.  The per-batch reduction runs distributed; only the (small,
    deduplicated) hash columns come back to the driver."""

    def to_hashes(batch: pa.Table) -> pa.Table:
        acc: set[int] = set()
        for t in batch.column(column).to_pylist():
            acc.update(_hash_grams(word_ngrams(t, n)).tolist())
        return pa.table({"h": pa.array(sorted(acc), pa.uint64())})

    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in bench_ds.select_columns([column])
        .map_batches(to_hashes, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class Decontaminator:
    """Actor-pool ``map_batches`` stage: appends ``n_contaminated``
    (distinct doc n-grams present in the benchmark) and
    ``contaminated``.  ``bench_ref`` is a ``ray.ObjectRef`` to the
    sorted hash array (``ray.put`` once on the driver)."""

    def __init__(self, bench_ref, n: int = 3, column: str = "text"):
        import ray

        self._bench = ray.get(bench_ref)
        self._n = n
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        for t in batch.column(self._column).to_pylist():
            grams = np.unique(_hash_grams(word_ngrams(t, self._n)))
            if grams.size and self._bench.size:
                counts.append(int(np.isin(grams, self._bench, assume_unique=True).sum()))
            else:
                counts.append(0)
        return batch.append_column(
            "n_contaminated", pa.array(counts, pa.int64())
        ).append_column(
            "contaminated", pa.array([c > 0 for c in counts], pa.bool_())
        )


class Scrubber:
    """Actor-pool scrub stage (PaLM-style): instead of dropping a
    contaminated document wholesale, remove every word covered by a
    benchmark-overlapping n-gram window and keep the rest.  Appends
    ``clean_text`` / ``n_tokens`` / ``n_removed``."""

    def __init__(self, bench_ref, n: int = 3, column: str = "text"):
        import ray

        self._bench = ray.get(bench_ref)
        self._n = n
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        clean, n_tok, n_rm = [], [], []
        for t in batch.column(self._column).to_pylist():
            words = (t or "").split(" ")
            grams = word_ngrams(t or "", self._n)
            mask = np.zeros(len(words), dtype=bool)
            if grams and self._bench.size:
                hits = np.isin(_hash_grams(grams), self._bench)
                idx = np.flatnonzero(hits)
                for k in range(self._n):
                    mask[idx + k] = True
            clean.append(" ".join(w for w, m in zip(words, mask) if not m))
            n_tok.append(len(words))
            n_rm.append(int(mask.sum()))
        return (
            batch.append_column("clean_text", pa.array(clean, pa.string()))
            .append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("n_removed", pa.array(n_rm, pa.int64()))
        )


def decontaminate_scrub(
    corpus_ds,
    bench_ds,
    n: int = 3,
    column: str = "text",
    concurrency: int = 4,
):
    """Scrubbing decontamination: same broadcast bench n-gram hash set
    as :func:`decontaminate`, but contaminated WINDOWS are excised from
    the text instead of flagging the whole document.  Same scale shape:
    one streaming corpus pass, no shuffle."""
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(bench_ds, n=n, column=column))
    return corpus_ds.map_batches(
        Scrubber,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def build_bench_lsh(
    bench_ds,
    num_perm: int = 128,
    bands: int = 16,
    column: str = "text",
    id_column: str = "doc_id",
):
    """MinHash-LSH index of the (small) benchmark side: per-band bucket
    map ``(band, band_hash) -> [bench ids]`` plus each bench doc's
    shingle set for the exact-Jaccard verify.  The bench side is small
    by contract (eval sets are a few MB), so the index is built in one
    driver pass and ``ray.put`` ONCE - never re-shipped per batch."""
    from ..functions.hashing import murmur3_x64_128
    from .dedup import batch_word_shingles, minhash_signature

    rows_per_band = num_perm // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    shingles: dict[int, set[int]] = {}
    for batch in bench_ds.select_columns([id_column, column]).iter_batches(
        batch_format="pyarrow"
    ):
        ids = batch.column(id_column).to_pylist()
        arrs = batch_word_shingles(batch.column(column).to_pylist())
        for i, sh in zip(ids, arrs):
            shingles[i] = set(sh.tolist())
            sig = minhash_signature(sh, num_perm)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = murmur3_x64_128(chunk.tobytes())[0] - (1 << 63)
                buckets.setdefault((b, h), []).append(i)
    return buckets, shingles


class FuzzyDecontaminator:
    """Actor-pool probe stage: per corpus doc, MinHash-sign, look up the
    broadcast bench band buckets, exact-Jaccard-verify the candidates,
    and append (n_matches, best_bench, jaccard_e4, contaminated)."""

    def __init__(self, index_ref, threshold: float, num_perm: int, bands: int,
                 column: str = "text"):
        import ray

        self._buckets, self._shingles = ray.get(index_ref)
        self._threshold = threshold
        self._num_perm = num_perm
        self._bands = bands
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        from ..functions.hashing import murmur3_x64_128
        from .dedup import batch_word_shingles, jaccard, minhash_signature

        rows_per_band = self._num_perm // self._bands
        arrs = batch_word_shingles(batch.column(self._column).to_pylist())
        n_matches, best, best_j = [], [], []
        for sh in arrs:
            sig = minhash_signature(sh, self._num_perm)
            cand: set[int] = set()
            for b in range(self._bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = murmur3_x64_128(chunk.tobytes())[0] - (1 << 63)
                cand.update(self._buckets.get((b, h), ()))
            doc_set = set(sh.tolist())
            hits = []
            for bench_id in cand:
                j = jaccard(doc_set, self._shingles[bench_id])
                if j >= self._threshold:
                    hits.append((j, bench_id))
            n_matches.append(len(hits))
            if hits:
                # best = max jaccard, ties -> min bench id
                j, bid = max(hits, key=lambda t: (t[0], -t[1]))
                best.append(bid)
                best_j.append(int(math.floor(j * 10000)))
            else:
                best.append(-1)
                best_j.append(0)
        return (
            batch.append_column("n_matches", pa.array(n_matches, pa.int64()))
            .append_column("best_bench", pa.array(best, pa.int64()))
            .append_column("jaccard_e4", pa.array(best_j, pa.int64()))
            .append_column(
                "contaminated", pa.array([n > 0 for n in n_matches], pa.bool_())
            )
        )


def decontaminate_fuzzy(
    corpus_ds,
    bench_ds,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 16,
    column: str = "text",
    id_column: str = "doc_id",
    concurrency: int = 4,
):
    """Fuzzy benchmark decontamination (near-dup, not exact n-gram): a
    corpus doc is contaminated when its word-shingle Jaccard with ANY
    bench doc reaches ``threshold`` AND the pair shares a MinHash LSH
    band (the same band scheme as ``dedup.minhash_near_dup_pairs``).

    This is the Llama/GPT-4-style fuzzy decontamination step that
    catches paraphrased or truncated benchmark leakage the exact
    n-gram rule (:func:`decontaminate`) misses.  Scale shape: bench
    index broadcast once (``ray.put``), corpus streams through an
    actor pool - no shuffle, cost is one read of the corpus."""
    import ray

    index_ref = ray.put(
        build_bench_lsh(
            bench_ds, num_perm=num_perm, bands=bands, column=column,
            id_column=id_column,
        )
    )
    return corpus_ds.map_batches(
        FuzzyDecontaminator,
        fn_constructor_kwargs={
            "index_ref": index_ref,
            "threshold": threshold,
            "num_perm": num_perm,
            "bands": bands,
            "column": column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate(
    corpus_ds,
    bench_ds,
    n: int = 3,
    column: str = "text",
    concurrency: int = 4,
):
    """Full operator: build the benchmark hash set, broadcast it, and
    stream the corpus through a probe actor pool."""
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(bench_ds, n=n, column=column))
    return corpus_ds.map_batches(
        Decontaminator,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def split_overlap_stats(ds, n: int = 3, column: str = "text",
                        id_column: str = "doc_id",
                        num_partitions: int = 8):
    """Split-half n-gram overlap: how many of each ODD document's
    distinct word n-grams also occur anywhere in the EVEN half — the
    train/validation contamination gauge when BOTH sides are
    corpus-sized (the broadcast-bench shape of :func:`decontaminate`
    does not apply: neither side is small by contract).

    Scale shape: per-document DISTINCT grams are computed locally in
    the emit fold (no shuffle); odd (doc_id, gram, flag=0) rows and
    block-deduped even (gram, flag=1) rows union into ONE
    ``groupby(gram).map_groups`` that emits each odd doc once per gram
    the even half also holds — the union-tag co-group shape (no
    ``Dataset.join``: Ray's hash join builds schema-less empty right
    partitions, which trips Acero's key validation on sparse keys);
    a slim groupby(doc_id) count plus a join-free union+sum merge with
    the per-doc gram-count base finish.  Nothing is broadcast, nothing
    is materialized on the driver.

    -> (doc_id, n_grams, n_overlap)
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        o_id, o_g, parity = [], [], []
        for did, t in zip(ids, texts):
            grams = set(word_ngrams(t or "", n))
            o_id.extend([did] * len(grams))
            o_g.extend(grams)
            parity.extend([did % 2] * len(grams))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "gram": pa.array(o_g, pa.string()),
                "par": pa.array(parity, pa.int8()),
            }
        )

    grams = ds.map_batches(emit, batch_format="pyarrow").materialize()

    odd = grams.map_batches(
        lambda b: b.filter(pc.equal(b.column("par"), 1)).drop_columns(["par"]),
        batch_format="pyarrow",
    )
    def odd_tagged(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gram": batch.column("gram"),
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "flag": pa.array([0] * len(batch), pa.int8()),
            }
        )

    def even_tagged(batch: pa.Table) -> pa.Table:
        g = pc.unique(
            batch.filter(pc.equal(batch.column("par"), 0)).column("gram")
        )
        return pa.table(
            {
                "gram": g,
                "doc_id": pa.array([-1] * len(g), pa.int64()),
                "flag": pa.array([1] * len(g), pa.int8()),
            }
        )

    tagged = odd.map_batches(odd_tagged, batch_format="pyarrow").union(
        grams.map_batches(even_tagged, batch_format="pyarrow")
    )

    def cogroup(g: pa.Table) -> pa.Table:
        flags = g.column("flag")
        if pc.max(flags).as_py() != 1:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        docs = g.filter(pc.equal(flags, 0)).column("doc_id")
        # odd side is already distinct per (doc, gram) by construction
        return pa.table({"doc_id": pc.cast(docs, pa.int64())})

    hits = (
        tagged.groupby("gram")
        .map_groups(cogroup, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_overlap"))
    )

    base = odd.map_batches(
        lambda b: b.group_by("doc_id")
        .aggregate([("doc_id", "count")])
        .rename_columns(["doc_id", "n_part"]),
        batch_format="pyarrow",
    )

    # join-free merge: (doc_id, n_grams, 0) partials from the base and
    # (doc_id, 0, n_overlap) rows from the hits union into ONE slim
    # groupby.sum — zero-overlap docs keep n_overlap = 0 with no outer
    # join and no rename stage
    def base_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_grams": pc.cast(batch.column("n_part"), pa.int64()),
                "n_overlap": pa.array([0] * n, pa.int64()),
            }
        )

    def hit_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_grams": pa.array([0] * n, pa.int64()),
                "n_overlap": pc.cast(batch.column("n_overlap"), pa.int64()),
            }
        )

    merged = base.map_batches(base_rows, batch_format="pyarrow").union(
        hits.map_batches(hit_rows, batch_format="pyarrow")
    )
    return merged.groupby("doc_id").aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("n_overlap", alias_name="n_overlap"),
    )
