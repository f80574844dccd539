"""Group-wise ranking operators: per-group top-k and document keyword
extraction over a corpus-wide document-frequency table.

Shapes chosen for 100-TB inputs:

* **topk_per_group**: a per-BATCH partial top-k (each batch reduces to
  at most k rows per group it touches) runs BEFORE the one
  ``groupby(group)`` shuffle, so the exchange moves O(k x groups x
  blocks-touching-group) rows, never the raw table - the same
  combiner-then-small-groupby discipline as the n-gram counts.
  Deterministic ties: (score DESC, tie_column ASC).
* **word_df**: per-doc DISTINCT words -> per-batch partial counts ->
  one ``groupby(word)`` sum.  df is the canonical stop-term signal.
* **doc_top_terms**: per-doc term frequencies joined (hash join on the
  word key) against the df table; terms with ``df > max_df_docs`` are
  dropped (stop terms), the rest ranked (tf DESC, term ASC), top-k per
  doc.  All-integer scoring - exact under any execution order.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa


def topk_per_group(ds, group_column: str, score_column: str,
                   tie_column: str, k: int,
                   num_partitions: int | None = None):
    """Top-k rows per group by (score DESC, tie ASC)."""
    import pandas as pd

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            [group_column, score_column, tie_column],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return pa.Table.from_pandas(
            df.groupby(group_column, sort=False).head(k),
            preserve_index=False,
        )

    def final(group: "pd.DataFrame") -> "pd.DataFrame":
        group = group.sort_values(
            [score_column, tie_column], ascending=[False, True],
            kind="mergesort",
        )
        out = group.head(k).copy()
        out["rank"] = range(len(out))
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(final, batch_format="pandas")
    )


def word_df(ds, id_column: str = "doc_id", column: str = "text"):
    """word -> document frequency (#docs containing the word): per-doc
    distinct words, per-batch partial counts (combiner), one
    ``groupby(word)`` sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for text in batch.column(column).to_pylist():
            if not text:
                continue
            c.update(set(text.split(" ")))
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "df_part": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    return (
        ds.select_columns([id_column, column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df_part", alias_name="df"))
    )


def doc_top_terms(ds, k: int = 3, max_df_docs: int | None = None,
                  id_column: str = "doc_id", column: str = "text",
                  num_partitions: int | None = None):
    """Per-document keyword extraction: top-k terms by (tf DESC, term
    ASC) after dropping corpus-wide stop terms (``df > max_df_docs``;
    default = half the corpus).  Returns (doc_id, term, tf, df, rank).

    Ray shape: per-doc tf rows (exploded) hash-JOIN the df table on the
    word key (the df side is the aggregate output - much smaller than
    the corpus, and never driver-materialized), then a per-doc group
    ranks its surviving terms."""
    import pandas as pd

    from .dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)
    if max_df_docs is None:
        max_df_docs = max(1, ds.count() // 2)

    def explode_tf(batch: pa.Table) -> pa.Table:
        o_id, o_term, o_tf = [], [], []
        for i, text in zip(
            batch.column(id_column).to_pylist(),
            batch.column(column).to_pylist(),
        ):
            for w, c in Counter((text or "").split(" ")).items():
                if not w:
                    continue
                o_id.append(i)
                o_term.append(w)
                o_tf.append(c)
        return pa.table(
            {
                id_column: pa.array(o_id, pa.int64()),
                "term": pa.array(o_term, pa.string()),
                "tf": pa.array(o_tf, pa.int64()),
            }
        )

    tf = ds.select_columns([id_column, column]).map_batches(
        explode_tf, batch_format="pyarrow"
    )
    df_tab = (
        word_df(ds, id_column, column)
        .filter(expr="df <= %d" % max_df_docs)
        .repartition(num_partitions)  # empty-block guard before the join
    )
    joined = tf.join(
        df_tab,
        join_type="inner",
        num_partitions=num_partitions,
        on=("term",),
        right_on=("word",),
    )

    def rank_group(group: "pd.DataFrame") -> "pd.DataFrame":
        group = group.sort_values(
            ["tf", "term"], ascending=[False, True], kind="mergesort"
        )
        out = group.head(k).copy()
        out["rank"] = range(len(out))
        return out

    return (
        joined.groupby(id_column)
        .map_groups(rank_group, batch_format="pandas")
        .select_columns([id_column, "term", "tf", "df", "rank"])
    )
