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


def exact_ntile(ds, value_column: str, tie_column: str, n_buckets: int = 3,
                coarse_shift: int = 8):
    """Exact ``ntile(n)`` over ``(value ASC, tie ASC)`` without a global
    sort - CCNet-style perplexity bucketing (head/middle/tail) at
    corpus scale.

    ``value_column`` must be integer (quantize floats first - see the
    float-reduce rule) and ``tie_column`` unique, so the total order is
    strict and every execution order yields the same buckets.

    Three passes, none materializing the dataset:

    1. histogram: per-batch partial counts on ``value >> coarse_shift``
       -> one small ``groupby`` -> driver merges (size = distinct
       coarse bins, controlled by ``coarse_shift``);
    2. boundary refinement: only rows inside the <= n-1 coarse bins
       that contain a bucket boundary are pulled and sorted - exact
       boundary ``(value, tie)`` tuples at driver cost O(rows in
       boundary bins);
    3. assign: boundaries broadcast; each batch compares
       lexicographically against the <= n-1 tuples (vectorized, one
       pass per boundary).

    DuckDB-equivalent semantics: ``ntile(n) OVER (ORDER BY value,
    tie)`` - the first ``N % n`` buckets are one row larger.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    shift = np.int64(coarse_shift)

    def partial_hist(batch: pa.Table) -> pa.Table:
        v = batch.column(value_column).to_numpy(zero_copy_only=False)
        bins, cnts = np.unique(np.asarray(v, dtype=np.int64) >> shift,
                               return_counts=True)
        return pa.table(
            {"coarse": pa.array(bins, pa.int64()),
             "cnt": pa.array(cnts, pa.int64())}
        )

    hist_rows = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("coarse")
        .sum("cnt")
        .take_all()
    )
    hist = sorted((r["coarse"], r["sum(cnt)"]) for r in hist_rows)
    total = sum(c for _, c in hist)
    if total == 0:
        return ds.map_batches(
            lambda t: t.append_column("bucket", pa.array([], pa.int64())),
            batch_format="pyarrow",
        )

    base, rem = divmod(total, n_buckets)
    cuts = []  # 1-indexed rank of the LAST row of buckets 1..n-1
    run = 0
    for j in range(1, n_buckets):
        run += base + (1 if j <= rem else 0)
        cuts.append(run)

    # locate the coarse bin holding each cut rank
    cum = 0
    bin_of_cut = {}
    it = iter(hist)
    b, c = next(it)
    for cut in cuts:
        while cum + c < cut:
            cum += c
            b, c = next(it)
        bin_of_cut[cut] = (b, cum)  # (bin id, ranks before this bin)

    need_bins = sorted({b for b, _ in bin_of_cut.values()})
    need_ref = ray.put(np.array(need_bins, dtype=np.int64))

    def boundary_rows(batch: pa.Table) -> pa.Table:
        nb = ray.get(need_ref)
        v = np.asarray(
            batch.column(value_column).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        mask = np.isin(v >> shift, nb)
        return batch.filter(pa.array(mask)).select([value_column, tie_column])

    picked = ds.map_batches(boundary_rows, batch_format="pyarrow").take_all()
    by_bin: dict[int, list] = {}
    for r in picked:
        by_bin.setdefault(int(r[value_column]) >> int(shift), []).append(
            (r[value_column], r[tie_column])
        )
    for rows in by_bin.values():
        rows.sort()
    boundaries = []
    for cut in cuts:
        b, before = bin_of_cut[cut]
        boundaries.append(by_bin[b][cut - before - 1])
    bound_ref = ray.put(boundaries)

    def assign(batch: pa.Table) -> pa.Table:
        bounds = ray.get(bound_ref)
        v = np.asarray(
            batch.column(value_column).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        t = np.asarray(batch.column(tie_column).to_pylist(), dtype=object)
        bucket = np.ones(len(v), dtype=np.int64)
        for bv, bt in bounds:
            above = (v > bv) | ((v == bv) & (t > bt))
            bucket += above.astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def topk_per_group(ds, group_column: str, score_column: str,
                   tie_column: str, k: int,
                   num_partitions: int | None = None):
    """Top-k rows per group by (score DESC, tie ASC)."""
    import numpy as np
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
        ).replace_schema_metadata(None)  # pandas metadata defeats Ray's schema dedup

    def final(group: "pd.DataFrame") -> pa.Table:
        group = group.sort_values(
            [score_column, tie_column], ascending=[False, True],
            kind="mergesort",
        )
        out = group.head(k).copy()
        out["rank"] = np.arange(len(out), dtype=np.int64)
        # return clean Arrow (not the frame): pandas blocks would carry
        # the b'pandas' schema key into every downstream join/shuffle
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_column)
        .map_groups(final, batch_format="pandas")
    )


def word_df(ds, id_column: str = "doc_id", column: str = "text"):
    """word -> document frequency (#docs containing the word): per-doc
    distinct words, per-batch partial counts (combiner), one
    ``groupby(word)`` sum.

    Vectorized partial (round 4): one Arrow ``split_pattern`` per batch
    (same semantics as ``text.split(" ")`` - empty tokens from runs of
    spaces included, empty/null texts skipped), dictionary-encode the
    flat words, distinct (doc, code) via ``np.unique`` on a packed
    int64 key, ``bincount`` per code - no per-row Python loop, no
    object Counters."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            # all-None block: Ray types the column null, which no utf8
            # kernel accepts
            texts = texts.cast(pa.string())
        nonempty = pc.and_kleene(
            texts.is_valid(), pc.greater(pc.utf8_length(texts), 0)
        )
        texts = texts.filter(nonempty)
        n = len(texts)
        if n == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "df_part": pa.array([], pa.int64()),
                }
            )
        words = pc.split_pattern(texts, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        n_dict = len(enc.dictionary)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        uniq = np.unique(doc_of * np.int64(n_dict) + codes)
        df_part = np.bincount(uniq % n_dict, minlength=n_dict)
        return pa.table(
            {
                "word": enc.dictionary,
                "df_part": pa.array(df_part, pa.int64()),
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
        # vectorized (round 4): one Arrow split per batch, dictionary
        # codes, (doc, code) tf via np.unique(return_counts) on a
        # packed int64 key - replaces the per-doc Counter loop
        import numpy as np
        import pyarrow.compute as pc

        ids = np.asarray(batch.column(id_column), dtype=np.int64)
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            texts = texts.cast(pa.string())
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern(texts, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        keep = pc.greater(pc.utf8_length(flat), 0)
        keep_np = np.asarray(
            keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        )
        flat = flat.filter(keep)
        doc_of = doc_of[keep_np]
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        n_dict = max(1, len(enc.dictionary))
        uniq, tfs = np.unique(
            doc_of * np.int64(n_dict) + codes, return_counts=True
        )
        return pa.table(
            {
                id_column: pa.array(ids[uniq // n_dict], pa.int64()),
                "term": enc.dictionary.take(
                    pa.array(uniq % n_dict, pa.int64())
                ),
                "tf": pa.array(tfs.astype(np.int64), pa.int64()),
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


def vocab_growth(ds, bucket_size: int = 50, id_column: str = "doc_id",
                 column: str = "text"):
    """Heaps-law vocabulary growth curve: how many NEW distinct words
    each ``bucket_size``-doc slice of the corpus (in ``id_column``
    order) contributes, plus the running vocabulary size - the standard
    corpus-composition diagnostic for webtext ingestion (is the crawl
    still finding new language, or re-reading boilerplate?).

    Ray shape: per-batch (word -> min doc id) combiner (vectorized:
    one Arrow split + dictionary codes + lexsort-first-per-code), ONE
    ``groupby(word).min`` exchange of slim (word, id) rows, then the
    first-occurrence ids bucket into ``id // bucket_size`` with a
    per-batch partial count and a tiny ``groupby(bucket)`` - the
    cumulative sum runs on the O(#buckets) driver rows only.
    -> (bucket, new_words, cum_vocab), bucket ascending.

    Token semantics match ``text.split(" ")`` (empty tokens from runs
    of spaces count as a word; empty/null texts contribute nothing) so
    the DuckDB ``string_split`` oracle is exact.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def partial_firsts(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_column), dtype=np.int64)
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if pa.types.is_null(texts.type):
            texts = texts.cast(pa.string())
        nonempty = pc.and_kleene(
            texts.is_valid(), pc.greater(pc.utf8_length(texts), 0)
        )
        ne = np.asarray(
            nonempty.combine_chunks()
            if isinstance(nonempty, pa.ChunkedArray) else nonempty
        )
        texts = texts.filter(nonempty)
        ids = ids[ne]
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "first_doc": pa.array([], pa.int64()),
                }
            )
        words = pc.split_pattern(texts, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        doc_of = np.repeat(ids, counts)
        order = np.lexsort((doc_of, codes))
        codes_o, doc_o = codes[order], doc_of[order]
        first = np.ones(len(codes_o), dtype=bool)
        first[1:] = codes_o[1:] != codes_o[:-1]
        return pa.table(
            {
                "word": enc.dictionary.take(
                    pa.array(codes_o[first], pa.int64())
                ),
                "first_doc": pa.array(doc_o[first], pa.int64()),
            }
        )

    firsts = (
        ds.select_columns([id_column, column])
        .map_batches(partial_firsts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Min("first_doc", alias_name="first_doc"))
    )

    def to_bucket(batch: pa.Table) -> pa.Table:
        fd = np.asarray(batch.column("first_doc"), dtype=np.int64)
        return pa.table(
            {"bucket": pa.array(fd // np.int64(bucket_size), pa.int64())}
        )

    per_bucket = (
        firsts.map_batches(to_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="new_words"))
        .take_all()  # O(#buckets) rows - corpus_docs / bucket_size
    )
    per_bucket.sort(key=lambda r: r["bucket"])
    buckets = [int(r["bucket"]) for r in per_bucket]
    new_words = [int(r["new_words"]) for r in per_bucket]
    cum = np.cumsum(new_words, dtype=np.int64)
    return pa.table(
        {
            "bucket": pa.array(buckets, pa.int64()),
            "new_words": pa.array(new_words, pa.int64()),
            "cum_vocab": pa.array(cum, pa.int64()),
        }
    )


def _word_freqs(ds, group_column: str, column: str):
    """Exact corpus (group, word) frequency table: per-batch partial
    counts (vectorized: one Arrow split per batch, dictionary codes
    for both keys packed into one int64, ``np.bincount``), ONE
    ``groupby([group, word]).sum`` exchange of slim partial rows.
    Token semantics match ``text.split(" ")`` exactly (empty tokens
    from runs of spaces count; empty/null texts contribute nothing) so
    DuckDB ``string_split`` oracles are bit-exact.  Shared by
    ``zipf_head`` and ``hapax_stats``."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column(group_column)
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        if pa.types.is_null(texts.type):
            texts = texts.cast(pa.string())
        nonempty = pc.and_kleene(
            texts.is_valid(), pc.greater(pc.utf8_length(texts), 0)
        )
        mask = np.asarray(
            nonempty.combine_chunks()
            if isinstance(nonempty, pa.ChunkedArray) else nonempty
        )
        empty = pa.table(
            {
                group_column: pa.array([], pa.string()),
                "word": pa.array([], pa.string()),
                "tf_part": pa.array([], pa.int64()),
            }
        )
        if not mask.any():
            return empty
        texts = texts.filter(nonempty)
        langs = langs.filter(nonempty)
        words = pc.split_pattern(texts, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = pc.list_flatten(words)
        wenc = pc.dictionary_encode(flat)
        lenc = pc.dictionary_encode(langs)
        if isinstance(wenc, pa.ChunkedArray):
            wenc = wenc.combine_chunks()
        if isinstance(lenc, pa.ChunkedArray):
            lenc = lenc.combine_chunks()
        wcodes = np.asarray(wenc.indices, dtype=np.int64)
        lcodes = np.repeat(
            np.asarray(lenc.indices, dtype=np.int64), counts
        )
        n_w = len(wenc.dictionary)
        packed = lcodes * np.int64(n_w) + wcodes
        tf = np.bincount(packed, minlength=len(lenc.dictionary) * n_w)
        nz = np.flatnonzero(tf)
        if len(nz) == 0:
            return empty
        return pa.table(
            {
                group_column: lenc.dictionary.take(
                    pa.array(nz // n_w, pa.int64())
                ),
                "word": wenc.dictionary.take(pa.array(nz % n_w, pa.int64())),
                "tf_part": pa.array(tf[nz], pa.int64()),
            }
        )

    return (
        ds.select_columns([group_column, column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "word"])
        .aggregate(Sum("tf_part", alias_name="freq"))
    )


def zipf_head(ds, k: int = 40, group_column: str = "lang",
              column: str = "text"):
    """Zipf rank-frequency head per language: the ``k`` most frequent
    whitespace tokens of each ``group_column`` value with their exact
    corpus frequencies and dense 0-based ranks (freq DESC, word ASC) -
    the standard corpus-composition fingerprint (is the crawl's token
    mass distributed like natural language, or spiked by boilerplate?).

    Ray shape: the shared ``_word_freqs`` combiner+groupby produces the
    exact (lang, word, freq) table, then ``topk_per_group`` ranks only
    the per-block survivors (<= k rows per lang per block reach the
    final per-lang sort).  The corpus itself never sorts or shuffles.
    """
    freqs = _word_freqs(ds, group_column, column)
    return topk_per_group(freqs, group_column, "freq", "word", k)


def hapax_stats(ds, group_column: str = "lang", column: str = "text"):
    """Per-language vocabulary-richness summary: distinct words, hapax
    legomena (corpus frequency exactly 1) and total tokens - the
    classic corpus-health gauge (a crawl dominated by boilerplate has
    a collapsing hapax ratio; machine-generated spam spikes it).

    Ray shape: reuses the ``zipf_head`` per-batch (lang, word) partial
    combiner, ONE slim ``groupby([lang, word]).sum`` exchange, then a
    second per-batch combiner folds word rows into per-lang
    (distinct, hapax, tokens) integer partials and ONE lang-sized
    groupby merges them.  Token semantics are exactly
    ``text.split(" ")`` so the DuckDB ``string_split`` oracle is
    bit-exact.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    freqs = _word_freqs(ds, group_column, column)

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                group_column: batch.column(group_column),
                "d_part": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64), pa.int64()
                ),
                "h_part": pc.cast(
                    pc.equal(batch.column("freq"), pa.scalar(1)), pa.int64()
                ),
                "t_part": batch.column("freq"),
            }
        )
        g = t.group_by(group_column).aggregate(
            [("d_part", "sum"), ("h_part", "sum"), ("t_part", "sum")]
        )
        return pa.table(
            {
                group_column: g.column(group_column),
                "d_part": g.column("d_part_sum"),
                "h_part": g.column("h_part_sum"),
                "t_part": g.column("t_part_sum"),
            }
        )

    return (
        freqs.map_batches(fold, batch_format="pyarrow")
        .groupby(group_column)
        .aggregate(
            Sum("d_part", alias_name="n_distinct"),
            Sum("h_part", alias_name="n_hapax"),
            Sum("t_part", alias_name="n_tokens"),
        )
    )


def char_trigram_head(ds, k: int = 20, group_column: str = "lang",
                      column: str = "text"):
    """Top-``k`` character trigrams per language with exact corpus
    frequencies and 0-based ranks (freq DESC, trigram ASC) - the
    character-level fingerprint langid models are built from (the
    distributed analog of the packed-trigram tables in
    stages/classify.py, surfaced as a certified table).

    Ray shape: per-batch vectorized trigram extraction - every text of
    the batch is joined into ONE codepoint array (utf-32 view, NUL
    separators), the three shifted views are packed into a single
    int64 key (3 x 21 bits; every Unicode scalar < 2^21), and
    ``np.unique`` folds the batch to (lang, trigram, partial) rows -
    only the batch's distinct trigrams are ever materialized as
    strings.  Then ONE slim ``groupby([lang, trigram]).sum`` exchange
    and ``topk_per_group``; the corpus never sorts or shuffles.

    Trigrams are codepoint-windowed exactly like DuckDB
    ``substr(text, i, 3)`` so the pure-SQL oracle is bit-exact; texts
    containing NUL (would collide with the separator) take a per-text
    slow path with identical semantics.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column(group_column).to_pylist()
        texts = batch.column(column).to_pylist()
        counts: dict[tuple[str, int], int] = {}
        by_lang: dict[str, list[str]] = {}
        for lang, text in zip(langs, texts):
            if text and len(text) >= 3:
                by_lang.setdefault(lang, []).append(text)
        out_lang: list[str] = []
        out_tri: list[str] = []
        out_tf: list[int] = []
        for lang, group in by_lang.items():
            slow = [t for t in group if "\x00" in t]
            fast = [t for t in group if "\x00" not in t]
            keys_parts = []
            cnts_parts = []
            if fast:
                joined = "\x00".join(fast)
                arr = np.frombuffer(
                    joined.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                a, b, c = arr[:-2], arr[1:-1], arr[2:]
                valid = (a != 0) & (b != 0) & (c != 0)
                packed = (a << 42) | (b << 21) | c
                keys, cnts = np.unique(packed[valid], return_counts=True)
                keys_parts.append(keys)
                cnts_parts.append(cnts)
            if slow:
                tally: dict[int, int] = {}
                for t in slow:
                    for i in range(len(t) - 2):
                        key = (
                            (ord(t[i]) << 42)
                            | (ord(t[i + 1]) << 21)
                            | ord(t[i + 2])
                        )
                        tally[key] = tally.get(key, 0) + 1
                keys_parts.append(np.fromiter(tally.keys(), dtype=np.int64))
                cnts_parts.append(np.fromiter(tally.values(), dtype=np.int64))
            keys = np.concatenate(keys_parts)
            cnts = np.concatenate(cnts_parts)
            if len(keys_parts) > 1:
                keys, inv = np.unique(keys, return_inverse=True)
                cnts = np.bincount(inv, weights=cnts).astype(np.int64)
            for key, n in zip(keys.tolist(), cnts.tolist()):
                out_lang.append(lang)
                out_tri.append(
                    chr(key >> 42) + chr((key >> 21) & 0x1FFFFF)
                    + chr(key & 0x1FFFFF)
                )
                out_tf.append(int(n))
        return pa.table(
            {
                group_column: pa.array(out_lang, pa.string()),
                "trigram": pa.array(out_tri, pa.string()),
                "tf_part": pa.array(out_tf, pa.int64()),
            }
        )

    freqs = (
        ds.select_columns([group_column, column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "trigram"])
        .aggregate(Sum("tf_part", alias_name="freq"))
    )
    return topk_per_group(freqs, group_column, "freq", "trigram", k)
