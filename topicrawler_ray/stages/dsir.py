"""DSIR-style importance selection: pick the corpus documents whose
hashed-n-gram distribution looks most like a (small) target set.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
fit bag-of-hashed-ngram unigram models over a feature space of ``D``
hash buckets for the target set and the raw corpus, then score each
raw document by the log importance ratio

    log w(x) = sum_{tokens f in x} [log p_target(b(f)) - log p_raw(b(f))]

and keep the top-weighted documents.  This implementation is fully
deterministic (no Gumbel noise): the per-bucket log-ratio is quantized
ONCE to int64 fixed-point (1e-6 steps) on the driver, so every per-doc
score is an associative integer sum - the distributed result is
bit-identical regardless of block boundaries, and certifiable against
a sequential oracle.

Scale design (100 TB corpus, MB-GB target):

* bucket-count marginals for both sides are computed as per-block
  ``D``-length int64 vectors (one ``np.add.at`` per block); only those
  fixed-size vectors reach the driver, which sums them - two streaming
  passes, no shuffle, driver memory O(D).
* the quantized log-ratio vector (D int64, e.g. 64 KiB at D=8192) is
  ``ray.put`` once; the scoring pass is one vectorized ``map_batches``
  (hash all tokens, gather ratios, ``np.add.reduceat`` per-doc segment
  sums).
* top-``n`` selection is per-block partial top-n + a driver merge of
  ``n × num_blocks`` slim (id, score) rows - same pattern as the ANN
  top-k stages (stages/similarity.py).

Reference context: remstef/topicrawler selects crawl targets by LM
perplexity (lt.lm scoring); DSIR is the modern hashed-feature
counterpart for training-data curation - complementary surface, same
broadcast-model + streaming-score shape as stages/score.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT = 1_000_000  # fixed-point steps per log unit


def _token_buckets(texts: list[str], dim: int) -> tuple[np.ndarray, np.ndarray]:
    """All (unigram + bigram) feature hashes of a batch, bucketed mod
    ``dim``, plus the per-doc segment offsets.  Hashing is pandas
    SipHash - deterministic across processes."""
    feats: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        words = (t or "").split(" ")
        feats.extend(words)
        feats.extend(
            words[j] + " " + words[j + 1] for j in range(len(words) - 1)
        )
        offsets[i + 1] = len(feats)
    if not feats:
        return np.empty(0, dtype=np.int64), offsets
    h = pd.util.hash_array(np.asarray(feats, dtype=object))
    return (h % np.uint64(dim)).astype(np.int64), offsets


def bucket_marginals(ds, column: str, dim: int) -> np.ndarray:
    """Streaming corpus-wide hashed-feature counts: per-block D-length
    vectors, summed on the driver (integer, associative - exact)."""

    def block_counts(batch: pa.Table) -> pa.Table:
        buckets, _ = _token_buckets(batch.column(column).to_pylist(), dim)
        vec = np.zeros(dim, dtype=np.int64)
        np.add.at(vec, buckets, 1)
        return pa.table({"counts": pa.array([vec.tobytes()], pa.large_binary())})

    total = np.zeros(dim, dtype=np.int64)
    for b in (
        ds.select_columns([column])
        .map_batches(block_counts, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for buf in b.column("counts").to_pylist():
            total += np.frombuffer(buf, dtype=np.int64)
    return total


def log_ratio_q(target_counts: np.ndarray, raw_counts: np.ndarray) -> np.ndarray:
    """Quantized per-bucket importance log-ratio with add-one smoothing
    (computed once on the driver; downstream math is pure int64)."""
    dim = len(target_counts)
    lt = np.log(target_counts + 1.0) - np.log(float(target_counts.sum() + dim))
    lr = np.log(raw_counts + 1.0) - np.log(float(raw_counts.sum() + dim))
    return np.floor((lt - lr) * QUANT).astype(np.int64)


class DsirScorer:
    """Actor-pool scoring stage: appends ``dsir_score_q`` (int64
    fixed-point log importance weight).  The ratio vector is fetched
    zero-copy once per actor."""

    def __init__(self, ratio_ref, column: str, dim: int):
        import ray

        self.ratio = ray.get(ratio_ref)
        self.column = column
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        buckets, offsets = _token_buckets(texts, self.dim)
        contrib = self.ratio[buckets] if len(buckets) else np.empty(0, np.int64)
        scores = np.zeros(len(texts), dtype=np.int64)
        nonempty = offsets[:-1] < offsets[1:]
        if contrib.size:
            seg = np.add.reduceat(contrib, offsets[:-1][nonempty])
            scores[nonempty] = seg
        return batch.append_column("dsir_score_q", pa.array(scores, pa.int64()))


def dsir_select(
    corpus_ds,
    target_ds,
    n: int,
    column: str = "text",
    id_column: str = "doc_id",
    dim: int = 8192,
    concurrency: int | None = None,
):
    """Top-``n`` corpus docs by DSIR importance weight (ties broken by
    ``id_column`` ascending).  Returns a pyarrow Table
    ``(id_column, dsir_score_q)`` sorted by (-score, id)."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))

    ratio = log_ratio_q(
        bucket_marginals(target_ds, column, dim),
        bucket_marginals(corpus_ds, column, dim),
    )
    ratio_ref = ray.put(ratio)

    scored = corpus_ds.select_columns([id_column, column]).map_batches(
        DsirScorer,
        fn_constructor_kwargs={
            "ratio_ref": ratio_ref,
            "column": column,
            "dim": dim,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def partial_topn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        sc = batch.column("dsir_score_q").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:n]
        return pa.table(
            {
                id_column: pa.array(ids[order]),
                "dsir_score_q": pa.array(sc[order], pa.int64()),
            }
        )

    parts = [
        b
        for b in scored.map_batches(partial_topn, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return pa.table(
            {id_column: pa.array([], pa.int64()),
             "dsir_score_q": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(parts)
    ids = merged.column(id_column).to_numpy(zero_copy_only=False)
    sc = merged.column("dsir_score_q").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:n]
    return pa.table(
        {
            id_column: pa.array(ids[order]),
            "dsir_score_q": pa.array(sc[order], pa.int64()),
        }
    )


def corpus_divergence(ds_a, ds_b, column: str = "text", dim: int = 8192):
    """Corpus-level distribution drift: KL(A||B), KL(B||A) and
    Jensen-Shannon divergence between two corpora's hashed
    unigram+bigram distributions (add-one smoothed over ``dim``
    buckets).

    Reuses :func:`bucket_marginals` - two streaming integer count
    passes, no shuffle, driver math is one fixed-order float pass over
    the D-length vectors (quantized 1e-9, so the distributed result is
    hash-checkable against a sequential derivation).  The standard
    "did the new crawl shift?" monitoring signal between incremental
    corpus generations.
    """
    ca = bucket_marginals(ds_a, column, dim).astype(np.float64)
    cb = bucket_marginals(ds_b, column, dim).astype(np.float64)
    pa_ = (ca + 1.0) / (ca.sum() + dim)
    pb = (cb + 1.0) / (cb.sum() + dim)
    kl_ab = float(np.sum(pa_ * (np.log(pa_) - np.log(pb))))
    kl_ba = float(np.sum(pb * (np.log(pb) - np.log(pa_))))
    m = 0.5 * (pa_ + pb)
    js = float(
        0.5 * np.sum(pa_ * (np.log(pa_) - np.log(m)))
        + 0.5 * np.sum(pb * (np.log(pb) - np.log(m)))
    )
    import pyarrow as _pa

    return _pa.table(
        {
            "kl_ab_e9": _pa.array([int(np.floor(kl_ab * 1e9))], _pa.int64()),
            "kl_ba_e9": _pa.array([int(np.floor(kl_ba * 1e9))], _pa.int64()),
            "js_e9": _pa.array([int(np.floor(js * 1e9))], _pa.int64()),
        }
    )
