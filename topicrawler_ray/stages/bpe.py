"""Byte-pair-encoding vocabulary training and tokenization, the
Sennrich et al. (2016) word-frequency formulation, Ray-Data-first.

The insight that makes BPE trainable at 100 TB: the merge loop never
needs the corpus - only the WORD-TYPE frequency table (Zipf: ~10^6-10^8
types regardless of corpus size).  So:

* **count** (distributed, one shuffle of slim rows): per-block word
  Counters -> ``groupby(word).sum``.  Types below ``min_count`` are
  dropped on the distributed side before anything reaches the driver
  (the dropped tail is the long Zipf tail - the driver never sees it),
  and the survivor count is bounded by construction.
* **merge loop** (driver, corpus-size-independent): classic pair-count
  table over the word types weighted by frequency; each round merges
  the (count-max, lexicographically-smallest) pair - a deterministic
  total order, so training is bit-reproducible.
* **apply** (distributed, streaming): the merge ranks are broadcast
  once (``ray.put``); each actor tokenizes per word with the standard
  greedy lowest-rank-merge-first algorithm and an actor-level per-word
  memo (Zipf again: the cache hit rate IS the token/type ratio, so the
  per-word Python loop runs once per TYPE per actor, not once per
  token).

Determinism contract for the oracle: word splitting is whitespace;
pair selection order is (max total count, then lexicographic pair);
apply is rank-greedy with leftmost-first on rank ties.  The sequential
oracle (topicrawler_ray/oracles.py) re-derives all three with plain
dict loops and must agree exactly.

Reference context: the reference tokenizes with fixed rule sets
(lt.lm string providers); learned subword vocabularies are the
training-data-pipeline extension (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

END = "</w>"  # end-of-word sentinel symbol


def word_frequencies(ds, column: str, min_count: int = 1):
    """Distributed word-type frequency table ``(word, cnt)``; types
    with cnt < min_count are filtered BEFORE collection."""
    from ray.data.aggregate import Sum

    def block_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(column).to_pylist():
            c.update((t or "").split(" "))
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "cnt": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    freq = (
        ds.select_columns([column])
        .map_batches(block_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    if min_count > 1:
        freq = freq.filter(expr="cnt >= %d" % min_count)
    return freq


def learn_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Sequential merge loop over the word-TYPE table (corpus-size
    independent).  Deterministic: ties broken by lexicographic pair."""
    splits = {w: tuple(w) + (END,) for w in word_freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, sym in splits.items():
            f = word_freqs[w]
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, sym in list(splits.items()):
            if a not in sym:
                continue
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            splits[w] = tuple(out)
    return merges


def train_bpe(ds, column: str = "text", num_merges: int = 200,
              min_count: int = 1) -> list[tuple[str, str]]:
    """Distributed count -> driver merge loop.  Returns the ordered
    merge list (rank = position)."""
    freqs = {
        r["word"]: r["cnt"]
        for b in word_frequencies(ds, column, min_count).iter_batches(
            batch_format="pandas"
        )
        for r in b.to_dict("records")
    }
    return learn_bpe(freqs, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy BPE: repeatedly apply the lowest-rank merge present
    (leftmost-first within a rank)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


class BpeTokenizer:
    """Actor-pool apply stage: appends ``n_bpe_tokens`` and
    ``bpe_head`` (first ``head`` tokens joined by '|').  Merge ranks
    are fetched once per actor; per-word encodings are memoized."""

    def __init__(self, merges_ref, column: str, head: int = 30):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.column = column
        self.head = head
        self.memo: dict[str, tuple[str, ...]] = {}

    def _word(self, w: str) -> tuple[str, ...]:
        got = self.memo.get(w)
        if got is None:
            got = self.memo[w] = _encode_word(w, self.ranks)
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_out = np.zeros(batch.num_rows, dtype=np.int64)
        heads = []
        for i, t in enumerate(batch.column(self.column).to_pylist()):
            toks: list[str] = []
            for w in (t or "").split(" "):
                toks.extend(self._word(w))
            n_out[i] = len(toks)
            heads.append("|".join(toks[: self.head]))
        return batch.append_column(
            "n_bpe_tokens", pa.array(n_out, pa.int64())
        ).append_column("bpe_head", pa.array(heads, pa.string()))


def bpe_tokenize(ds, merges, column: str = "text", head: int = 30,
                 concurrency: int | None = None):
    """Broadcast the merge table, stream the corpus through it."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    merges_ref = ray.put(list(merges))
    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs={
            "merges_ref": merges_ref,
            "column": column,
            "head": head,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _FertilityFold:
    """Actor-pool fold: per-language BPE fertility partials.

    Fertility (subword tokens per word) and compression (bytes per
    token) are the standard per-language tokenizer health metrics for
    a multilingual training corpus — a language whose fertility
    explodes under a shared BPE vocabulary is being under-served by
    the merge table.  Merge ranks load once per actor; per-word
    encodings are memoized across batches (same discipline as
    :class:`BpeTokenizer`)."""

    def __init__(self, merges_ref, column: str, lang_column: str):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.column = column
        self.lang_column = lang_column
        self.memo: dict[str, int] = {}

    def _ntok(self, w: str) -> int:
        got = self.memo.get(w)
        if got is None:
            got = self.memo[w] = len(_encode_word(w, self.ranks))
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        fold: dict[str, list[int]] = {}
        for lang, t in zip(
            batch.column(self.lang_column).to_pylist(),
            batch.column(self.column).to_pylist(),
        ):
            words = (t or "").split(" ")
            c = fold.setdefault(lang, [0, 0, 0, 0])
            c[0] += 1
            c[1] += len(words)
            c[2] += sum(self._ntok(w) for w in words)
            c[3] += len((t or "").encode("utf-8"))
        langs = sorted(fold)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array([fold[l][0] for l in langs], pa.int64()),
                "n_words": pa.array([fold[l][1] for l in langs], pa.int64()),
                "n_tokens": pa.array([fold[l][2] for l in langs], pa.int64()),
                "n_bytes": pa.array([fold[l][3] for l in langs], pa.int64()),
            }
        )


def bpe_fertility(ds, merges, column: str = "text", lang_column: str = "lang",
                  concurrency: int | None = None):
    """Per-language BPE fertility rollup.

    -> (lang, n_docs, n_words, n_tokens, n_bytes, tokens_per_100w,
    bytes_per_token_e2) — the ratios are exact floor-integer
    ``100*n_tokens/n_words`` and ``100*n_bytes/n_tokens``.

    Shape: broadcast merge table (``ray.put`` once), actor-pool fold
    to per-(batch, lang) partials, ONE ``groupby(lang).sum`` of slim
    integer rows — the combiner discipline; the shuffle is languages
    x batches rows regardless of corpus size.
    """
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    merges_ref = ray.put(list(merges))
    partials = ds.map_batches(
        _FertilityFold,
        fn_constructor_kwargs={
            "merges_ref": merges_ref,
            "column": column,
            "lang_column": lang_column,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # few-group aggregate over many partial blocks: coalesce first so
    # range partitions holding no language don't emit schema-less
    # empty bundles (the cdx_surt precedent — executor warning)
    folded = (
        partials.repartition(2)
        .groupby("lang")
        .sum(["n_docs", "n_words", "n_tokens", "n_bytes"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nd = batch.column("sum(n_docs)").cast(pa.int64())
        nw = batch.column("sum(n_words)").cast(pa.int64())
        nt = batch.column("sum(n_tokens)").cast(pa.int64())
        nb = batch.column("sum(n_bytes)").cast(pa.int64())
        hundred = pa.scalar(100, pa.int64())
        one = pa.scalar(1, pa.int64())
        safe_w = pc.if_else(pc.greater(nw, pa.scalar(0, pa.int64())), nw, one)
        safe_t = pc.if_else(pc.greater(nt, pa.scalar(0, pa.int64())), nt, one)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": nd,
                "n_words": nw,
                "n_tokens": nt,
                "n_bytes": nb,
                "tokens_per_100w": pc.divide(pc.multiply(nt, hundred), safe_w),
                "bytes_per_token_e2": pc.divide(pc.multiply(nb, hundred), safe_t),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")
