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
