"""Distributed multinomial Naive Bayes over hashed token features:
train with two streaming count passes, classify with a broadcast
model - the fastText-style "cheap quality/language classifier" slot
in a training-data curation pipeline.

Train (one pass): each block reduces its (label, hashed-token-bucket)
counts to one ``D``-length int64 vector PER LABEL seen in the block
(labels are few by contract - languages, quality tiers, sources); the
driver sums the fixed-size vectors per label.  No shuffle; driver
memory is ``|labels| × D`` int64.

Model: per-label quantized log-priors and per-bucket log-likelihoods
(add-one smoothing), all floored to int64 fixed-point (1e-6) ONCE on
the driver, so classification is an associative integer sum + argmax -
bit-identical across any block layout, certifiable against a
sequential oracle (topicrawler_ray/oracles.py re-derives it with plain
loops).

Classify (one pass): broadcast the ``|labels| × D`` int64 matrix via
``ray.put``; per batch, hash tokens, gather each label's bucket
scores, segment-sum per doc (``np.add.reduceat``), argmax with
first-label-wins (= lexicographically smallest label, labels sorted)
tie break.

Reference context: the reference scores pages with an n-gram LM
(lt.lm); Naive Bayes over hashed features is the discriminative
counterpart for corpus curation (complements stages/textstats.py
langid and stages/dsir.py importance weights).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT = 1_000_000


def _hash_tokens(texts: list[str], dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token hash buckets for a batch + per-doc offsets."""
    toks: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks.extend((t or "").split(" "))
        offsets[i + 1] = len(toks)
    if not toks:
        return np.empty(0, dtype=np.int64), offsets
    h = pd.util.hash_array(np.asarray(toks, dtype=object))
    return (h % np.uint64(dim)).astype(np.int64), offsets


def train_naive_bayes(
    ds, text_column: str, label_column: str, dim: int = 4096
) -> dict:
    """One streaming pass -> model dict with sorted ``labels``,
    ``log_prior_q`` (int64[L]) and ``log_like_q`` (int64[L, D])."""

    def block_counts(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_column).to_numpy(zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        uniq, ginv = np.unique(labels, return_inverse=True)
        buckets, offsets = _hash_tokens(texts, dim)
        mat = np.zeros((len(uniq), dim), dtype=np.int64)
        ndocs = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ndocs, ginv, 1)
        if len(buckets):
            doc_of_tok = np.repeat(np.arange(len(texts)), np.diff(offsets))
            np.add.at(mat, (ginv[doc_of_tok], buckets), 1)
        return pa.table(
            {
                "label": pa.array(list(uniq)),
                "n_docs": pa.array(ndocs, pa.int64()),
                "counts": pa.array(
                    [mat[i].tobytes() for i in range(len(uniq))],
                    pa.large_binary(),
                ),
            }
        )

    counts: dict[str, np.ndarray] = {}
    n_docs: dict[str, int] = {}
    for b in (
        ds.select_columns([text_column, label_column])
        .map_batches(block_counts, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for lbl, nd, buf in zip(
            b.column("label").to_pylist(),
            b.column("n_docs").to_pylist(),
            b.column("counts").to_pylist(),
        ):
            vec = np.frombuffer(buf, dtype=np.int64)
            if lbl in counts:
                counts[lbl] = counts[lbl] + vec
                n_docs[lbl] += nd
            else:
                counts[lbl] = vec.copy()
                n_docs[lbl] = nd

    labels = sorted(counts)
    total_docs = float(sum(n_docs.values()))
    log_prior_q = np.array(
        [int(np.floor(np.log(n_docs[l] / total_docs) * QUANT)) for l in labels],
        dtype=np.int64,
    )
    log_like_q = np.zeros((len(labels), dim), dtype=np.int64)
    for i, l in enumerate(labels):
        c = counts[l]
        ll = np.log(c + 1.0) - np.log(float(c.sum() + dim))
        log_like_q[i] = np.floor(ll * QUANT).astype(np.int64)
    return {
        "labels": labels,
        "log_prior_q": log_prior_q,
        "log_like_q": log_like_q,
        "dim": dim,
    }


class NaiveBayesClassifier:
    """Actor-pool apply stage: appends ``pred_label`` and
    ``nb_score_q`` (winning label's int64 score)."""

    def __init__(self, model_ref, text_column: str):
        import ray

        model = ray.get(model_ref)
        self.labels = model["labels"]
        self.log_prior_q = model["log_prior_q"]
        self.log_like_q = model["log_like_q"]
        self.dim = model["dim"]
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        buckets, offsets = _hash_tokens(texts, self.dim)
        L = len(self.labels)
        scores = np.tile(self.log_prior_q, (len(texts), 1))  # (n, L)
        if len(buckets):
            contrib = self.log_like_q[:, buckets]  # (L, n_tokens)
            nonempty = offsets[:-1] < offsets[1:]
            starts = offsets[:-1][nonempty]
            seg = np.add.reduceat(contrib, starts, axis=1)  # (L, n_nonempty)
            scores[nonempty] += seg.T
        best = np.argmax(scores, axis=1)  # first (lexicographic) wins ties
        return batch.append_column(
            "pred_label",
            pa.array([self.labels[i] for i in best], pa.string()),
        ).append_column(
            "nb_score_q",
            pa.array(scores[np.arange(len(texts)), best], pa.int64()),
        )


def naive_bayes_classify(
    ds,
    model: dict,
    text_column: str = "text",
    concurrency: int | None = None,
):
    """Apply a trained model to ``ds`` (broadcast once, stream)."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    model_ref = ray.put(model)
    return ds.map_batches(
        NaiveBayesClassifier,
        fn_constructor_kwargs={"model_ref": model_ref, "text_column": text_column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
