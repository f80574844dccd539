"""Held-out smoothing-weight tuning for the Jelinek-Mercer LM family.

The classic LM-eval harness loop (Chen & Goodman 1999 par.5 protocol
shape): train on one half of the corpus, score the other half under a
grid of interpolation weights, pick the weight minimizing held-out
perplexity.  The reference exposes the JM family scorer-side only
(``lt.lm`` smoothing registry); this adds the missing tuning harness as
a batch operator.

Scale shape: the even/train half runs the A1 combiner + ONE groupby
count job (corpus tokens never shuffle); the pruned count model is the
driver-side artifact (same contract as ``counts_from_dataset``), shipped
ONCE via ``ray.put``; the odd/held-out half streams through ONE actor
pool whose actors build all |grid| JM scorers from the shared counts in
``__init__`` and fold each batch to |grid| partial rows — the exchange
moves O(|grid| x blocks) 3-int rows, never documents.  The final table
is |grid| rows on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def ws_windows(text: str, order: int) -> list[list[str]]:
    """Whitespace-token n-gram windows for the tuning eval: full-width
    windows when the doc has >= order tokens, else the single short
    window (so every non-None doc contributes).  Shared scalar helper
    between the distributed stage and the sequential oracle."""
    tokens = (text or "").split(" ")
    if len(tokens) < order:
        return [tokens]
    return [tokens[i : i + order] for i in range(len(tokens) - order + 1)]


def heldout_perplexity_e6(lm, text: str, order: int) -> int:
    """floor(1e6 x ModelPerplexity-style perp) of one held-out doc."""
    from .perplexity import calculate_perplexity

    perp = calculate_perplexity(lm, ws_windows(text, order), skip_oov=False)
    return int(math.floor(perp * 1e6))


class JMGridScorer:
    """Actor: all grid scorers built once from the broadcast counts."""

    def __init__(self, counts_ref, order: int, lam_e1s: tuple[int, ...],
                 column: str):
        import ray

        from .jm import JelinekMercerLM

        counts = ray.get(counts_ref)
        self._order = order
        self._column = column
        self._lms = [
            (lam_e1, JelinekMercerLM(counts, lam_e1 / 10.0))
            for lam_e1 in lam_e1s
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._column).to_pylist()
        lam_col, sum_col, n_col = [], [], []
        for lam_e1, lm in self._lms:
            s = 0
            for t in texts:
                s += heldout_perplexity_e6(lm, t, self._order)
            lam_col.append(lam_e1)
            sum_col.append(s)
            n_col.append(len(texts))
        return pa.table(
            {
                "lam_e1": pa.array(lam_col, pa.int64()),
                "sum_perp_e6": pa.array(sum_col, pa.int64()),
                "n_docs": pa.array(n_col, pa.int64()),
            }
        )


def tune_jm(ds, order: int = 3, lam_e1s: tuple[int, ...] = tuple(range(1, 10)),
            id_column: str = "doc_id", column: str = "text",
            concurrency: int = 2):
    """-> (lam_e1, sum_perp_e6, n_docs, is_best) — one row per grid
    point; ``is_best`` marks the minimal held-out total (ties to the
    smaller lambda)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .build import count_word_ngrams_ws, counts_from_dataset

    def even_half(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        return batch.filter(pc.equal(pc.bit_wise_and(ids, 1), 0))

    def odd_half(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        return batch.filter(pc.equal(pc.bit_wise_and(ids, 1), 1))

    train = ds.map_batches(even_half, batch_format="pyarrow")
    counts = counts_from_dataset(
        count_word_ngrams_ws(train, order=order, column=column), order
    )
    ref = ray.put(counts)

    heldout = ds.map_batches(odd_half, batch_format="pyarrow")
    partials = heldout.map_batches(
        JMGridScorer,
        fn_constructor_kwargs={
            "counts_ref": ref,
            "order": order,
            "lam_e1s": tuple(lam_e1s),
            "column": column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    rows = (
        partials.groupby("lam_e1")
        .aggregate(
            Sum("sum_perp_e6", alias_name="sum_perp_e6"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .take_all()  # |grid| rows
    )
    rows.sort(key=lambda r: r["lam_e1"])
    best = min(rows, key=lambda r: (r["sum_perp_e6"], r["lam_e1"]))["lam_e1"]
    return pa.table(
        {
            "lam_e1": pa.array([r["lam_e1"] for r in rows], pa.int64()),
            "sum_perp_e6": pa.array(
                [r["sum_perp_e6"] for r in rows], pa.int64()
            ),
            "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
            "is_best": pa.array([r["lam_e1"] == best for r in rows]),
        }
    )
