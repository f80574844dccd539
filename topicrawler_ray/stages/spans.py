"""Duplicate-span detection: find word n-gram windows that occur more
than once in the corpus and measure, per document, how much of its
text is covered by such duplicated spans.

This is the hashed-window analog of exact-substring training-data
dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better"): their suffix-array ExactSubstr marks any substring of
>= N tokens that appears more than once anywhere in the corpus
(including twice within one document).  Here the unit is a sliding
word n-gram window; a window whose corpus-wide occurrence count is
``>= min_count`` (default 2) is a duplicate span, and a document is
dropped (``keep = false``) when duplicated spans cover more than
``max_dup_pct`` percent of its tokens.

Scale design (100 TB corpus):

* one ``map_batches`` pass explodes each document into
  ``(doc_id, pos, gram_hash)`` occurrence rows - O(total tokens) rows,
  the same footprint the published MapReduce/Spark implementations of
  this operator carry.  Gram strings never leave the batch: only the
  64-bit SipHash (``pandas.util.hash_array``, fixed key,
  process-independent) is exchanged.
* duplicate grams are ``groupby(gram_hash).count() >= min_count`` -
  one exchange; a stop-gram in 10^6 documents is ONE counter row here
  (counting, unlike pair-building, has no quadratic skew mode).
* occurrences join back against the duplicate-gram keys (hash join on
  ``gram_hash``), then per-document coverage is a ``groupby(doc_id)``
  whose group size is bounded by a single document's token count.
* outputs are integer-exact (counts and an integer-percent keep rule),
  so results hash-match the SQL oracle regardless of block order.

A 64-bit hash collision can only *merge* two distinct grams, which
over-counts duplication (conservative: may drop an extra doc, never
keeps a duplicated one); expected collisions ~ (#grams)^2 / 2^64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _default_partitions


def gram_pos_hashes(text: str, n: int) -> np.ndarray:
    """int64 hash per n-gram window position of ``text``.

    Tokenization is ``split(' ')`` (consecutive spaces yield empty
    tokens), matching DuckDB ``string_split(text, ' ')`` so the SQL
    oracle stays in lockstep (same convention as ``decontam``).
    """
    words = (text or "").split(" ")
    if len(words) < n:
        return np.empty(0, dtype=np.int64)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return pd.util.hash_array(np.asarray(grams, dtype=object)).view(np.int64)


def dup_span_stats(
    ds,
    n: int = 12,
    id_column: str = "doc_id",
    column: str = "text",
    min_count: int = 2,
    max_dup_pct: int = 20,
    num_partitions: int | None = None,
):
    """Per-document duplicate-span statistics.

    Returns a Dataset with one row per input document:
    ``(id_column, n_tokens, n_spans, n_dup_spans, covered_tokens,
    keep)`` where ``covered_tokens`` is the number of token positions
    lying under at least one duplicated window and
    ``keep = covered_tokens * 100 <= n_tokens * max_dup_pct``.
    """
    nparts = num_partitions or _default_partitions(None)
    src = ds.select_columns([id_column, column])

    def to_base(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        texts = batch.column(column).to_pylist()
        n_tokens = [len((t or "").split(" ")) for t in texts]
        n_spans = [max(0, nt - n + 1) for nt in n_tokens]
        return pa.table(
            {
                id_column: ids,
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
            }
        )

    base = src.map_batches(to_base, batch_format="pyarrow")

    def to_occurrences(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        out_id: list[int] = []
        out_pos: list[np.ndarray] = []
        out_gh: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            gh = gram_pos_hashes(t, n)
            if len(gh) == 0:
                continue
            out_id.extend([i] * len(gh))
            out_pos.append(np.arange(len(gh), dtype=np.int64))
            out_gh.append(gh)
        if not out_gh:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "gh": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_column: pa.array(out_id, pa.int64()),
                "pos": pa.array(np.concatenate(out_pos)),
                "gh": pa.array(np.concatenate(out_gh)),
            }
        )

    import ray.data

    # sentinel occurrence (doc -1, a gram hash no real gram is expected
    # to take): keeps `occ`, `dup` and their join non-empty by
    # construction — Ray 2.49 joins/aggregates die on a fully-empty
    # typed side (see ray-data quirks note).  Doc -1 never matches the
    # base left-outer joins, so it cannot surface in the output.  A
    # real gram colliding with the sentinel hash would over-count that
    # gram by one — the same ~2^-64 error class the gram hashing
    # itself already accepts.
    sentinel_gh = -(2**62) + 3641
    sentinel_occ = ray.data.from_items(
        [{id_column: -1, "pos": 0, "gh": sentinel_gh}]
    )

    # materialize: occ feeds both the gram-count aggregate and the
    # dup join (lazy re-execution would tokenize the corpus twice)
    occ = (
        src.map_batches(to_occurrences, batch_format="pyarrow")
        .union(sentinel_occ)
        .materialize()
    )

    counts = occ.groupby("gh").count()

    def dup_only(batch: pa.Table) -> pa.Table:
        cnt = batch.column("count()")
        mask = pc.greater_equal(cnt, min_count)
        return batch.filter(mask).select(["gh"])

    dup = (
        counts.map_batches(dup_only, batch_format="pyarrow")
        # the sentinel keeps `dup` (a join side) non-empty even when
        # the corpus has no duplicated grams; the repartition clears
        # the aggregate's 0-column empty blocks (ray-2.49 quirk)
        .union(ray.data.from_items([{"gh": sentinel_gh}]))
        .repartition(nparts)
    )

    # materialize: occ_dup feeds both the span-count and the coverage
    # branches - without this the gh join itself runs twice
    occ_dup = occ.join(
        dup, join_type="inner", num_partitions=nparts, on=("gh",)
    ).materialize()

    import ray.data

    # sentinel rows (id -1, never a real doc id) keep the right sides
    # of the left-outer joins non-empty and typed when the corpus has
    # NO duplicated spans at all (ray-2.49 empty-join quirk; ids are
    # non-negative).  Everything below stays Arrow-native: per-doc
    # reductions are hash aggregates, never pandas map_groups, so no
    # block-type mixing and no single-doc group ever leaves the
    # vectorized path.
    nd_sentinel = ray.data.from_items([{id_column: -1, "n_dup_spans": 0}])
    cov_sentinel = ray.data.from_items(
        [{id_column: -1, "covered_tokens": 0}]
    )

    nd = (
        occ_dup.groupby(id_column)
        .count()
        .map_batches(
            lambda b: b.rename_columns([id_column, "n_dup_spans"]),
            batch_format="pyarrow",
        )
        .union(nd_sentinel)
        .repartition(nparts)
    )

    def explode_covered(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        offs = np.arange(n, dtype=np.int64)
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, n)),
                "p": pa.array((pos[:, None] + offs[None, :]).ravel()),
            }
        )

    cov = (
        occ_dup.select_columns([id_column, "pos"])
        .map_batches(explode_covered, batch_format="pyarrow")
        .groupby([id_column, "p"])
        .count()  # distinct covered positions
        .select_columns([id_column, "p"])
        .repartition(nparts)  # clear 0-column empty aggregate blocks
        .groupby(id_column)
        .count()
        .map_batches(
            lambda b: b.rename_columns([id_column, "covered_tokens"]),
            batch_format="pyarrow",
        )
        .union(cov_sentinel)
        .repartition(nparts)
    )

    out = base.join(
        nd,
        join_type="left_outer",
        num_partitions=nparts,
        on=(id_column,),
    ).join(
        cov,
        join_type="left_outer",
        num_partitions=nparts,
        on=(id_column,),
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_dup_spans"] = (
            df["n_dup_spans"].fillna(0).astype(np.int64)
            if "n_dup_spans" in df
            else np.int64(0)
        )
        df["covered_tokens"] = (
            df["covered_tokens"].fillna(0).astype(np.int64)
            if "covered_tokens" in df
            else np.int64(0)
        )
        df["keep"] = df["covered_tokens"] * 100 <= df["n_tokens"] * max_dup_pct
        return pa.Table.from_pandas(
            df[
                [
                    id_column,
                    "n_tokens",
                    "n_spans",
                    "n_dup_spans",
                    "covered_tokens",
                    "keep",
                ]
            ],
            preserve_index=False,
        ).replace_schema_metadata(None)  # pandas metadata defeats Ray's schema dedup

    return out.map_batches(finish, batch_format="pyarrow")
