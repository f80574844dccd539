"""Word co-occurrence counting — the distributional-semantics staple
(the reference's LT-lab ecosystem builds JoBimText-style distributional
thesauri from exactly these counts; public: Biemann & Riedl 2013).

Shape: per-batch Counter over in-window ordered pairs (the combiner —
the exchange carries one row per (batch, pair), never per token) ->
ONE ``groupby(w1, w2).sum``.  Skew note: stop-word pairs dominate at
corpus scale; ``min_count`` filters AFTER the global sum (cheap), and
callers building thesauri should drop top-df terms first (see
``ranking.word_df``).
"""

from __future__ import annotations

import pyarrow as pa


def word_cooc(
    ds,
    window: int = 2,
    text_column: str = "text",
    min_count: int = 1,
):
    """-> (w1, w2, n): corpus-wide counts of ordered word pairs within
    ``window`` tokens (w2 follows w1 at distance 1..window)."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter[tuple[str, str]] = Counter()
        for text in batch.column(text_column).to_pylist():
            words = (text or "").split(" ")
            n = len(words)
            for i in range(n):
                for d in range(1, window + 1):
                    if i + d < n:
                        c[(words[i], words[i + d])] += 1
        pairs = sorted(c)
        return pa.table(
            {
                "w1": pa.array([p[0] for p in pairs], pa.string()),
                "w2": pa.array([p[1] for p in pairs], pa.string()),
                "n": pa.array([c[p] for p in pairs], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    if min_count > 1:
        out = out.filter(expr="n >= %d" % min_count)

    def as_int64(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    return out.map_batches(as_int64, batch_format="pyarrow")


def cooc_significance(pairs_ds, num_partitions: int | None = None):
    """Collocation significance over a ``(w1, w2, n)`` pair table:
    pointwise mutual information and Dunning's (1993) log-likelihood
    ratio, both int64 fixed-point (1e-6 steps) so the distributed
    result hash-matches a sequential derivation.

    Exchange shape: the pair table (already tiny next to the corpus)
    is re-aggregated twice for the w1/w2 marginals, then joined back
    on each word - three slim shuffles, never the corpus.  N (total
    pair mass) is a driver scalar.

    -> (w1, w2, n, pmi_e6, llr_e6)
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)

    # the pair table is consumed four times (N, two marginals, the
    # join probe); materialize once so the upstream corpus pass does
    # not re-execute per consumer.  Pair tables are min_count-filtered
    # and orders of magnitude smaller than the corpus by construction.
    # repartition also concatenates away the 0-row/0-column blocks a
    # groupby emits for empty hash partitions, which break acero key
    # resolution in the downstream join (ray 2.49 quirk, see dedup.py)
    pairs_ds = pairs_ds.repartition(num_partitions).materialize()
    n_total = int(pairs_ds.sum("n"))

    m1 = (
        pairs_ds.groupby("w1")
        .aggregate(Sum("n", alias_name="n1"))
        .repartition(num_partitions)
    )
    m2 = (
        pairs_ds.groupby("w2")
        .aggregate(Sum("n", alias_name="n2"))
        .repartition(num_partitions)
    )
    j1 = pairs_ds.join(
        m1, join_type="inner", num_partitions=num_partitions, on=("w1",)
    )
    # a join emits 0-row/0-COLUMN blocks for empty hash partitions;
    # fed straight into the next join, acero cannot resolve the key
    # field on those blocks - concatenate them away first
    j = j1.repartition(num_partitions).join(
        m2, join_type="inner", num_partitions=num_partitions, on=("w2",)
    )

    def significance(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        n1 = batch.column("n1").to_numpy(zero_copy_only=False).astype(np.float64)
        n2 = batch.column("n2").to_numpy(zero_copy_only=False).astype(np.float64)
        N = float(n_total)
        pmi = np.log(n) + np.log(N) - np.log(n1) - np.log(n2)

        def xlogx(k):
            k = np.asarray(k, dtype=np.float64)
            out = np.zeros_like(k)
            nz = k > 0
            out[nz] = k[nz] * np.log(k[nz])
            return out

        k11, k12, k21 = n, n1 - n, n2 - n
        k22 = N - n1 - n2 + n
        llr = 2.0 * (
            xlogx(k11) + xlogx(k12) + xlogx(k21) + xlogx(k22) + xlogx(N)
            - xlogx(k11 + k12) - xlogx(k21 + k22)
            - xlogx(k11 + k21) - xlogx(k12 + k22)
        )
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n": batch.column("n").cast(pa.int64()),
                "pmi_e6": pa.array(
                    np.floor(pmi * 1e6).astype(np.int64), pa.int64()
                ),
                "llr_e6": pa.array(
                    np.floor(llr * 1e6).astype(np.int64), pa.int64()
                ),
            }
        )

    return j.map_batches(significance, batch_format="pyarrow")
