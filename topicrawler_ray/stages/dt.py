"""Distributional thesaurus (JoBimText-shaped) over co-occurrence
counts — the reference lab's flagship text-analytics pipeline (Biemann
& Riedl 2013, "Text: now in 2D!", public), re-expressed Ray-Data-first:

1. :func:`lmi_features` — score every (word, feature) co-occurrence
   with Lexicographer's Mutual Information ``LMI = n * (ln(n*N) -
   ln(r*c))`` (n = pair count, r/c = word/feature marginals, N = total
   mass) and keep each word's top-k features.  Marginals are two
   aggregates over the slim count table; N is a driver scalar; the
   scoring joins are count-table-sized, never corpus-sized.  The LMI
   float is computed with ONE fixed numpy expression per row and
   immediately micro-quantized (``floor(lmi * 1e6)``) so ranking and
   the sequential oracle are bit-stable (the repo's same-float-path
   rule).
2. :func:`dt_similarity` — word-word similarity = number of SHARED
   top-k features (pure integers): self-join the pruned feature table
   on the feature key, count pairs, keep each word's top-k neighbours.
   The feature table is already k-bounded per word, so the self-join
   blowup is capped at df(feature)² per feature; ``max_feature_df``
   drops promiscuous features (logged), the same d² guard as the
   n-gram Jaccard join.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_partitions

logger = logging.getLogger(__name__)


def lmi_features(
    cooc,
    k: int = 10,
    num_partitions: int | None = None,
):
    """(w1, w2, n) co-occurrence Dataset -> (word, feature, n, lmi_e6,
    rank): each word's top-k features by (LMI desc, feature asc)."""
    from .ranking import topk_per_group

    num_partitions = _default_partitions(num_partitions)

    # the count table is consumed FOUR times (row marginals, column
    # marginals, total, scoring join): materialize it once — it is the
    # compact artifact of the pipeline (O(observed pairs), far smaller
    # than the corpus; JoBimText persists exactly this table)
    cooc = cooc.materialize()

    # map_batches renames (not Dataset.rename_columns): robust to
    # pandas-format blocks from any upstream map_groups
    r = (
        cooc.groupby("w1")
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(["w1", "r"]), batch_format="pyarrow"
        )
        .repartition(num_partitions)
    )
    c = (
        cooc.groupby("w2")
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(["w2", "c"]), batch_format="pyarrow"
        )
        .repartition(num_partitions)
    )
    total = cooc.sum("n", ignore_nulls=True) or 0

    joined = (
        cooc.join(r, join_type="inner", num_partitions=num_partitions, on=("w1",))
        # a join emits 0-column blocks for empty hash partitions, which
        # crash the NEXT acero join (ray-2.49 quirk): repartition between
        .repartition(num_partitions)
        .join(c, join_type="inner", num_partitions=num_partitions, on=("w2",))
    )

    def score(batch: pa.Table, _n_total=total) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.float64)
        rr = np.asarray(batch.column("r"), dtype=np.float64)
        cc = np.asarray(batch.column("c"), dtype=np.float64)
        # ONE fixed expression — the sequential oracle uses the same
        lmi = n * (np.log(n * float(_n_total)) - np.log(rr * cc))
        e6 = np.floor(lmi * 1e6).astype(np.int64)
        return pa.table(
            {
                "word": batch.column("w1"),
                "feature": batch.column("w2"),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "lmi_e6": pa.array(e6, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return topk_per_group(
        scored, group_column="word", score_column="lmi_e6",
        tie_column="feature", k=k, num_partitions=num_partitions,
    )


def dt_similarity(
    features,
    k: int = 10,
    max_feature_df: int | None = 1000,
    num_partitions: int | None = None,
):
    """Pruned (word, feature) Dataset -> (word, neighbor, n_shared,
    rank): top-k neighbours per word by shared-feature count (DESC,
    neighbor ASC).  Pure integer end to end."""
    from .ranking import topk_per_group

    num_partitions = _default_partitions(num_partitions)
    # materialize the k-bounded feature table (O(vocab x k) rows — tiny
    # by construction): it is consumed by the df guard AND both join
    # sides, and lazy re-execution would otherwise re-run the whole
    # upstream LMI chain once per consumer.  The repartition also
    # concatenates away empty map_groups blocks before the acero joins
    # (ray-2.49 quirk).
    slim = (
        features.select_columns(["word", "feature"])
        .repartition(num_partitions)
        .materialize()
    )

    if max_feature_df is not None:
        def rename_df(batch: pa.Table) -> pa.Table:
            # NOT Dataset.rename_columns: upstream map_groups leaves
            # PANDAS blocks and ray-2.49's rename Project calls
            # .rename_columns on the raw block (AttributeError on a
            # DataFrame); map_batches(pyarrow) converts + renames
            return batch.rename_columns(["feature", "df"])

        df_counts = (
            slim.groupby("feature")
            .count()
            .map_batches(rename_df, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()  # consumed by the dropped-count AND the keep join
        )
        n_dropped = df_counts.filter(expr="df > %d" % max_feature_df).count()
        if n_dropped:
            logger.info(
                "dt_similarity: dropping %d promiscuous features with "
                "df > %d (affects shared counts only)",
                n_dropped,
                max_feature_df,
            )
        keep = (
            df_counts.filter(expr="df <= %d" % max_feature_df)
            .select_columns(["feature"])
            .repartition(num_partitions)
        )
        slim = slim.join(
            keep, join_type="inner", num_partitions=num_partitions,
            on=("feature",),
        )

    joined = slim.join(
        slim,
        join_type="inner",
        num_partitions=num_partitions,
        on=("feature",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def pairs(batch: pa.Table) -> pa.Table:
        f = batch.filter(
            pc.not_equal(batch.column("word_a"), batch.column("word_b"))
        )
        return pa.table(
            {"word": f.column("word_a"), "neighbor": f.column("word_b")}
        )

    def as_int64(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "word": batch.column("word"),
                "neighbor": batch.column("neighbor"),
                "n_shared": batch.column("count()").cast(pa.int64()),
            }
        )

    shared = (
        joined.map_batches(pairs, batch_format="pyarrow")
        .groupby(["word", "neighbor"])
        .count()
        .map_batches(as_int64, batch_format="pyarrow")
        .repartition(num_partitions)
    )
    return topk_per_group(
        shared, group_column="word", score_column="n_shared",
        tie_column="neighbor", k=k, num_partitions=num_partitions,
    )
