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
