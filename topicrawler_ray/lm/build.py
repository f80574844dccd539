"""Distributed n-gram counting (A1-A6) as a Ray Data job.

Re-expresses the reference's shell/Hadoop count pipeline
(``lt.lm/.../app/GenerateNgramIndex.java:226-311`` driving
``mr_ngram_count.py`` / ``mr_ngram_vocab.py`` / ``mr_ngram_nfollow.py`` /
``mr_ngram_nprecede.py`` / ``mr_ngram_nfollowerprecede.py``) Ray-Data-first:

* A1  counts: ``flat_map`` n-grams with PER-BATCH partial aggregation
  (combiner) -> ``groupby('ngram').sum`` -> mincount filter,
* A2  vocabulary: distinct words of the counted n-grams,
* A3-A5 continuation stats keyed on history / suffix / middle, derived
  from the PRUNED counts exactly like the shell pipeline (prune first,
  then derive - SURVEY.md "hard parts"),
* A6  count-of-counts N[n][1..5+] and sums S[n] (the ``__sum_ngrams__``
  stats file) - a tiny global aggregate.

The one shuffle key is the n-gram string; the combiner keeps it small.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..functions import ngrams as ngram_mod
from ..functions.sentences import split_sentences
from ..functions.tokenizer import filtered_and_normalized_tokens


def sentence_tokens(text: str, tag_mode: int = 3) -> list[list[str]]:
    """Text -> per-sentence token sequences (scorer tokenization path)."""
    out = []
    for s in split_sentences(text):
        toks = filtered_and_normalized_tokens(s)
        if toks:
            out.append(ngram_mod.insert_sentence_tags(toks, tag_mode))
    return out


def _emit_ngrams(tokens: list[str], order: int, counter: Counter) -> None:
    """All 1..order-grams of a token sequence (``Ngrams.java:197-240``)."""
    n = len(tokens)
    for k in range(1, order + 1):
        for i in range(n - k + 1):
            counter[" ".join(tokens[i : i + k])] += 1


def ngram_count_batch(order: int, column: str = "text", tokenizer=None):
    """Batch fn: text column -> partial (ngram, n, num) counts."""
    tok = tokenizer or sentence_tokens

    def fn(batch: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for text in batch.column(column).to_pylist():
            if not text:
                continue
            for tokens in tok(text):
                _emit_ngrams(tokens, order, c)
        ngrams = list(c.keys())
        return pa.table(
            {
                "ngram": pa.array(ngrams, pa.string()),
                "n": pa.array([g.count(" ") + 1 for g in ngrams], pa.int8()),
                "num": pa.array([c[g] for g in ngrams], pa.int64()),
            }
        )

    return fn


def count_ngrams(ds, order: int, column: str = "text", mincount: int = 1, tokenizer=None):
    """A1: Dataset of (ngram, n, num) with num >= mincount."""
    from ray.data.aggregate import Max, Sum

    partial = ds.map_batches(
        ngram_count_batch(order, column, tokenizer), batch_format="pyarrow"
    )
    counts = partial.groupby("ngram").aggregate(
        Sum("num", alias_name="num"), Max("n", alias_name="n")
    )
    if mincount > 1:
        counts = counts.filter(expr="num >= %d" % mincount)
    return counts


def vocabulary(counts_ds):
    """A2: distinct words over the counted n-grams."""

    def words(batch: pa.Table) -> pa.Table:
        out = set()
        for g in batch.column("ngram").to_pylist():
            out.update(g.split(" "))
        return pa.table({"word": pa.array(sorted(out), pa.string())})

    from ray.data.aggregate import Count

    distinct = (
        counts_ds.map_batches(words, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Count(alias_name="cnt"))
    )
    return distinct.select_columns(["word"])


def _cont_stats(counts_ds, key_fn_name: str):
    """Shared A3-A5 shape: group counted n-grams (n>=2) by a derived key;
    emit n=sum(num), N1/N2/N3+ = #members with num==1/==2/>=3."""

    def derive(batch: pa.Table) -> pa.Table:
        ngrams = batch.column("ngram").to_pylist()
        nums = batch.column("num").to_pylist()
        keys, oknum = [], []
        for g, c in zip(ngrams, nums):
            parts = g.split(" ")
            if len(parts) < 2:
                continue
            if key_fn_name == "history":
                key = " ".join(parts[:-1])
            elif key_fn_name == "suffix":
                key = " ".join(parts[1:])
            else:  # middle
                if len(parts) < 3:
                    continue
                key = " ".join(parts[1:-1])
            keys.append(key)
            oknum.append(c)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "num": pa.array(oknum, pa.int64()),
            }
        )

    def indicators(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        num = batch.column("num")
        return batch.append_column(
            "i1", pc.cast(pc.equal(num, 1), pa.int64())
        ).append_column("i2", pc.cast(pc.equal(num, 2), pa.int64())).append_column(
            "i3", pc.cast(pc.greater_equal(num, 3), pa.int64())
        )

    from ray.data.aggregate import Sum

    derived = counts_ds.map_batches(derive, batch_format="pyarrow").map_batches(
        indicators, batch_format="pyarrow"
    )
    return derived.groupby("key").aggregate(
        Sum("num", alias_name="n_sum"),
        Sum("i1", alias_name="n1"),
        Sum("i2", alias_name="n2"),
        Sum("i3", alias_name="n3"),
    )


def nfollow(counts_ds):
    """A3 (``mr_ngram_nfollow.py:33-58``): keyed on the history."""
    return _cont_stats(counts_ds, "history")


def nprecede(counts_ds):
    """A4 (``mr_ngram_nprecede.py:32-57``): keyed on the suffix."""
    return _cont_stats(counts_ds, "suffix")


def nfollowerprecede(counts_ds):
    """A5 (``mr_ngram_nfollowerprecede.py:101-126``): keyed on the middle."""
    return _cont_stats(counts_ds, "middle")


def count_of_counts(counts_ds, order: int, max_c: int = 6) -> dict:
    """A6 (``GenerateNgramIndex.java:470-498``): N[n][i] = #n-grams of
    order n occurring i times (bucket max_c-1 = '>=max_c-1'); S[n] =
    total occurrences. Tiny result -> driver dict."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("n")
        num = batch.column("num")
        b = pc.min_element_wise(num, max_c - 1)
        return pa.table({"n": n, "bucket": b, "num": num})

    rows = (
        counts_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["n", "bucket"])
        .aggregate(Count(alias_name="cnt"), Sum("num", alias_name="sum_num"))
        .take_all()
    )
    N = [[0] * max_c for _ in range(order + 1)]
    S = [0] * (order + 1)
    for r in rows:
        n = int(r["n"])
        N[n][int(r["bucket"])] = int(r["cnt"])
        N[n][0] += int(r["cnt"])  # bucket 0 = occurring at least once
        S[n] += int(r["sum_num"])
    return {"N": N, "S": S, "max_n": order, "max_c": max_c}


# --------------------------------------------------------------------------
# J4: the unified per-ngram index record + __sum_ngrams__ artifact


INDEX_STAT_PREFIXES = ("np", "nf", "nfp")  # reference join order


def ngram_index(ds, order: int, column: str = "text", mincount: int = 1,
                tokenizer=None, num_partitions: int | None = None):
    """J4 (``GenerateNgramIndex.java:297-309``): the ``join -a1`` of the
    n-gram counts with the nprecede / nfollow / nfollowerprecede
    continuation stats on the ngram key - the unified index record
    ``ngram, n, num, np_n, np_n1..3, nf_n, nf_n1..3, nfp_n, nfp_n1..3``
    (missing stats filled with 0, like ``join -a1 -e ''``).

    Ray shape: one counting shuffle produces the counts; the three
    continuation stats derive from the SAME counts Dataset; three
    left-outer ``Dataset.join``s all keyed on the ngram string (the one
    partitioning key reused across every stage).  Partitioning
    assumption: the ngram key is hash-partitioned; no skew handling
    needed since single hot n-grams are single rows here.
    """
    from ..stages.dedup import _default_partitions

    num_partitions = _default_partitions(num_partitions)
    counts = count_ngrams(ds, order, column, mincount, tokenizer)
    # Ray 2.49: aggregates emit 0-column empty blocks that break
    # downstream joins; repartition() concatenates them away
    counts = counts.repartition(num_partitions)

    def _with_sentinel(stats_ds):
        """A stats side can be globally EMPTY (e.g. nfp at order 2) -
        then even repartition leaves schema-less blocks.  Union one
        sentinel row whose key contains NUL (unreachable by any real
        ngram) so every block carries the schema; the left join simply
        never matches it."""
        import ray.data

        sentinel = ray.data.from_arrow(
            pa.table(
                {
                    "key": pa.array(["\x00sentinel\x00"], pa.string()),
                    "n_sum": pa.array([0], pa.int64()),
                    "n1": pa.array([0], pa.int64()),
                    "n2": pa.array([0], pa.int64()),
                    "n3": pa.array([0], pa.int64()),
                }
            )
        )
        return stats_ds.union(sentinel).repartition(num_partitions)

    stats = {
        "np": _with_sentinel(nprecede(counts)),
        "nf": _with_sentinel(nfollow(counts)),
        "nfp": _with_sentinel(nfollowerprecede(counts)),
    }
    out = counts
    for prefix in INDEX_STAT_PREFIXES:
        out = out.join(
            stats[prefix],
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("ngram",),
            right_on=("key",),
        )

        def rename_fill(batch: pa.Table, prefix=prefix) -> pa.Table:
            import pyarrow.compute as pc

            for src, dst in (
                ("n_sum", "%s_n" % prefix),
                ("n1", "%s_n1" % prefix),
                ("n2", "%s_n2" % prefix),
                ("n3", "%s_n3" % prefix),
            ):
                col = pc.coalesce(
                    batch.column(src).cast(pa.int64()), pa.scalar(0, pa.int64())
                )
                batch = batch.drop_columns([src]).append_column(dst, col)
            return batch

        out = out.map_batches(rename_fill, batch_format="pyarrow")
    return out


def write_sum_ngrams(stats: dict, path: str) -> str:
    """Write the ``__sum_ngrams__`` stats artifact
    (``GenerateNgramIndex.java:493-498`` format parity).  ``stats`` is
    the :func:`count_of_counts` result."""
    order = stats["max_n"]
    N, S = stats["N"], stats["S"]
    lines = [
        "#",
        "# Number of times where an ngram occurred: ",
        "#  at_least_once, exactly_once, exactly_twice, exactly_three_times,"
        " exactly_four_times, five_times_or_more.",
        "#",
        "max_n=%d" % order,
        "max_c=6",
    ]
    for n in range(1, order + 1):
        lines.append("n%d=%s" % (n, ",".join(str(x) for x in N[n])))
    for n in range(1, order + 1):
        lines.append("s%d=%d" % (n, S[n]))
    text = "\n".join(lines) + "\n"
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)
    return text


def read_sum_ngrams(path: str) -> dict:
    """Parse a ``__sum_ngrams__`` artifact back into the stats dict."""
    vals: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, v = line.split("=", 1)
            vals[k] = v
    order = int(vals["max_n"])
    max_c = int(vals["max_c"])
    N = [[0] * max_c for _ in range(order + 1)]
    S = [0] * (order + 1)
    for n in range(1, order + 1):
        N[n] = [int(x) for x in vals["n%d" % n].split(",")]
        S[n] = int(vals["s%d" % n])
    return {"N": N, "S": S, "max_n": order, "max_c": max_c}


def kn_stats_from_index(index_table, order: int):
    """Feed Kneser-Ney from the J4 index record (the disk-backed path
    the reference uses via its Lucene index): rebuild
    :class:`~.kneserney.KNStats` from the joined table instead of from
    in-memory ``NgramCounts`` scans."""
    from ..lm.backoff import NgramCounts
    from ..lm.kneserney import KNStats

    if hasattr(index_table, "iter_batches"):  # a Ray Dataset
        batches = list(index_table.iter_batches(batch_size=65536, batch_format="pyarrow"))
        index_table = pa.concat_tables(batches) if batches else None
    counts = NgramCounts(order)
    nf: dict[tuple, list[int]] = {}
    np_: dict[tuple, list[int]] = {}
    nfp: dict[tuple, list[int]] = {}
    cols = {
        name: index_table.column(name).to_pylist()
        for name in index_table.schema.names
    }
    for i, g in enumerate(cols["ngram"]):
        key = tuple(g.split(" "))
        counts.counts[len(key)][key] = int(cols["num"][i])
        for prefix, table in (("nf", nf), ("np", np_), ("nfp", nfp)):
            b = [
                int(cols["%s_n1" % prefix][i]),
                int(cols["%s_n2" % prefix][i]),
                int(cols["%s_n3" % prefix][i]),
            ]
            if any(b):
                table[key] = b
    stats = KNStats.__new__(KNStats)
    stats.order = order
    stats.counts = counts
    stats.nf = nf
    stats.np = np_
    stats.nfp = nfp
    max_c = 6
    stats.N = [[0] * max_c for _ in range(order + 1)]
    stats.sum_ngrams = [0] * (order + 1)
    stats.num_ngrams = [0] * (order + 1)
    for n in range(1, order + 1):
        for c in counts.counts[n].values():
            stats.N[n][min(c, max_c - 1)] += 1
            stats.sum_ngrams[n] += c
        stats.num_ngrams[n] = len(counts.counts[n])
        stats.N[n][0] = stats.num_ngrams[n]
    return stats


# --------------------------------------------------------------------------
# whitespace-token variant (SQL-oracle-able over the documents table)


def ws_tokens(text: str) -> list[list[str]]:
    """Plain whitespace tokenization, no tags (documents.text is already
    single-space separated)."""
    toks = text.split(" ")
    return [toks] if toks else []


def count_word_ngrams_ws(ds, order: int, column: str = "text", mincount: int = 1):
    """A1 over whitespace tokens - DuckDB can reproduce this exactly."""
    return count_ngrams(ds, order, column, mincount, tokenizer=ws_tokens)


def counts_from_dataset(counts_ds, order: int):
    """Collect a (ngram, n, num) counts Dataset into an in-memory
    :class:`~..lm.backoff.NgramCounts` - the bridge from the distributed
    count job to the scorer LMs (StartLM parity, SURVEY par.3.2: the
    reference shells out to sort/python reducers then loads a Lucene
    index; here the Ray groupby feeds the in-memory tables).

    The collected table is the PRUNED model-sized artifact (combiner +
    groupby upstream), not raw corpus n-grams."""
    from .backoff import NgramCounts

    counts = NgramCounts(order)
    for batch in counts_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ngrams = batch.column("ngram").to_pylist()
        ns = batch.column("n").to_pylist()
        nums = batch.column("num").to_pylist()
        for g, n, c in zip(ngrams, ns, nums):
            counts.counts[int(n)][tuple(g.split(" "))] = int(c)
    return counts


def build_lm_distributed(ds, order: int, column: str = "text", scorer: str = "stupid_backoff",
                         tokenizer=None):
    """End-to-end distributed LM build: text Dataset -> Ray count job ->
    scorer LM (stupid_backoff or kneser_ney)."""
    from .backoff import StupidBackoffLM, freeze_lm
    from .kneserney import KNStats, KneserNeyLM

    counts = counts_from_dataset(
        count_ngrams(ds, order, column, tokenizer=tokenizer), order
    )
    if scorer == "stupid_backoff":
        return freeze_lm(StupidBackoffLM(counts))
    if scorer == "kneser_ney":
        return KneserNeyLM(KNStats(counts))
    raise KeyError("unknown scorer %r" % scorer)


def vocab_coverage(ds, v: int, column: str = "text"):
    """Top-``v`` vocabulary coverage: what fraction of all corpus
    tokens the ``v`` most frequent words cover — the tokenizer-design
    gauge (how big must a word vocab be before OOV is rare).

    Scale shape: rides the A1 combiner + ONE groupby of the unigram
    count job (corpus tokens never shuffle, only distinct words); the
    top-``v`` cut is a per-block partial top-v + an O(v x blocks)
    driver merge with the (-count, word) tiebreak; the coverage fold
    then re-scans the SAME counts table against the broadcast top-v
    set and emits one partial row per block into a single merge task.
    Output is ONE row — (vocab_size, covered_tokens, total_tokens,
    coverage_e9), the ratio e9-quantized from exact int64 sums with a
    fixed float expression (identical in the DuckDB oracle).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    counts = count_word_ngrams_ws(ds, order=1, column=column, mincount=1)

    def partial_top(batch: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                batch.column("num").to_pylist(),
                batch.column("ngram").to_pylist(),
            ),
            key=lambda r: (-r[0], r[1]),
        )[:v]
        return pa.table(
            {
                "ngram": pa.array([r[1] for r in rows], pa.string()),
                "num": pa.array([r[0] for r in rows], pa.int64()),
            }
        )

    counts = counts.materialize()  # consumed twice: top-v cut + coverage fold
    partials = counts.map_batches(partial_top, batch_format="pyarrow").take_all()
    best = sorted(partials, key=lambda r: (-r["num"], r["ngram"]))[:v]
    vocab = frozenset(r["ngram"] for r in best)
    vocab_ref = ray.put(vocab)

    def fold(batch: pa.Table, _ref=vocab_ref) -> pa.Table:
        vset = _ref if isinstance(_ref, frozenset) else ray.get(_ref)
        words = batch.column("ngram").to_pylist()
        nums = batch.column("num").to_numpy(zero_copy_only=False)
        mask = np.fromiter((w in vset for w in words), dtype=bool, count=len(words))
        return pa.table(
            {
                "covered": pa.array([int(nums[mask].sum())], pa.int64()),
                "total": pa.array([int(nums.sum())], pa.int64()),
            }
        )

    merged = counts.map_batches(fold, batch_format="pyarrow").repartition(1)

    def finish(batch: pa.Table) -> pa.Table:
        covered = int(np.sum(batch.column("covered").to_numpy()))
        total = int(np.sum(batch.column("total").to_numpy()))
        cov_e9 = (
            int(np.floor(float(covered) / float(total) * 1e9)) if total else 0
        )
        return pa.table(
            {
                "vocab_size": pa.array([len(vocab)], pa.int64()),
                "covered_tokens": pa.array([covered], pa.int64()),
                "total_tokens": pa.array([total], pa.int64()),
                "coverage_e9": pa.array([cov_e9], pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
