"""Batch perplexity evaluation pipelines (SURVEY.md par.3.3).

* ``line_prob_perp`` - port of ``lt.lm/.../app/LineProbPerp.java:51``:
  per sentence row emit ``#ngrams, #oov, logprob, perp, logprob_noov,
  perp_noov`` (the *_noov variants skip n-grams ending in OOV).
* ``doc_perplexity`` - port of ``lt.lm/.../app/PerpDoc.java:49-54,195-280``:
  group sentence rows by url (the reference groups CONSECUTIVE lines;
  grouped-by-url is order-insensitive once grouped - SURVEY A9), one row
  per document with OOV accounting against an optional reference LM
  (``--oovreflm``, J5).
* ``filter_lines`` - ``lt.lm/.../app/FilterLines.java:45,65-75``: keep
  rows whose perplexity column <= max (default 1000).
* ``truncate_by_token_budget`` - eval-corpus head_tokens truncation
  (``lt.ltbot/src/test/scripts/prepare_eval.sh:6-8``, O3): keep rows in
  key order until the running token sum exceeds the budget.  Implemented
  scale-aware: per-block partial sums -> driver prefix sum -> single
  boundary block refined; only 2 small columns ever reach the driver.
* ``perp_stats`` - crawl-wide perplexity aggregate (A8).
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa

from ..lm.perplexity import calculate_perplexity, text_ngrams


def _line_metrics(lm, text: str, oov_lm=None) -> tuple[int, int, float, float, float, float]:
    ref = oov_lm if oov_lm is not None else lm
    ngrams = text_ngrams(text, lm.order)
    n = len(ngrams)
    n_oov = sum(1 for g in ngrams if ref.ngram_ends_with_oov(g))
    logp = sum(lm.ngram_log10_prob(g) for g in ngrams)
    perp = math.pow(10, -(logp / n)) if n and math.isfinite(logp) else float(2**31 - 1)
    logp_noov = 0.0
    n_eff = 0
    for g in ngrams:
        if ref.ngram_ends_with_oov(g):
            continue
        logp_noov += lm.ngram_log10_prob(g)
        n_eff += 1
    perp_noov = (
        math.pow(10, -(logp_noov / n_eff))
        if n_eff and math.isfinite(logp_noov)
        else float(2**31 - 1)
    )
    return n, n_oov, logp, perp, logp_noov, perp_noov


def sent_perp_metrics(lm, text: str) -> tuple[int, int, int, float]:
    """``SentPerp.java:195-240`` per-sentence accounting: every
    non-empty ngram counts; ngrams containing an OOV bump oov_ngrams
    and, when the FINAL word is OOV, oov_terms too (default
    ``--noov false``: everything still gets scored).  Returns
    (n_ngrams, n_oov_ngrams, n_oov_terms, mean log10 prob)."""
    ngrams = text_ngrams(text, lm.order)
    n = 0
    oov_ngrams = 0
    oov_terms = 0
    logp = 0.0
    for g in ngrams:
        if not g:
            continue
        n += 1
        if lm.ngram_contains_oov(g):
            oov_ngrams += 1
            if lm.ngram_ends_with_oov(g):
                oov_terms += 1
        logp += lm.ngram_log10_prob(g)
    avg = logp / n if n else 0.0
    return n, oov_ngrams, oov_terms, avg


_LOG10_2 = math.log10(2.0)


def _java_pow2(e: float) -> float:
    """Java ``Math.pow(2, e)``: overflow -> Infinity (Python raises)."""
    try:
        return math.pow(2.0, e)
    except OverflowError:
        return math.inf


def prob_dist_product_e9(lm, ngram: list[str]) -> int | None:
    """``ProbDistPerplexity.calcProbProduct`` (:71-84): p(x)*log2(p(x))
    for one ngram, floor-quantized at 1e9 (integer sums are associative
    so the distributed reduce is order-independent).  ``None`` flags the
    -Infinity case (zero probability)."""
    log10p = lm.ngram_log10_prob(ngram)
    if math.isinf(log10p):
        return None
    log2p = log10p / _LOG10_2
    product = math.pow(2.0, log2p) * log2p
    return math.floor(product * 1e9)


class SentPerpBatch:
    """Actor-pool batch fn: SentPerp per-sentence rows."""

    def __init__(self, lm_ref, column: str = "sentence"):
        import ray

        self._lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self._col = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_n, o_og, o_ot, o_avg = [], [], [], []
        for text in batch.column(self._col).to_pylist():
            n, og, ot, avg = sent_perp_metrics(self._lm, text or "")
            o_n.append(n)
            o_og.append(og)
            o_ot.append(ot)
            o_avg.append(avg)
        out = batch.select(["url", "sent_idx"])
        return out.append_column(
            "n_ngrams", pa.array(o_n, pa.int64())
        ).append_column(
            "n_oov_ngrams", pa.array(o_og, pa.int64())
        ).append_column(
            "n_oov_terms", pa.array(o_ot, pa.int64())
        ).append_column("sent_log10_avg", pa.array(o_avg, pa.float64()))


def prob_dist_perplexity(sentences_ds, lm_ref, column: str = "sentence"):
    """``ProbDistPerplexity.java`` as a distributed aggregate: per-batch
    partial rows (n_ngrams, sum of quantized p*log2(p) products, count
    of -Inf products), one tiny groupby-sum, ONE final float expression
    on the driver: perp = 2^(-(sum_e9/1e9)), +Inf when any product was
    -Inf.  Returns a one-row Dataset."""
    import ray
    import ray.data

    def partial(batch: pa.Table, _ref=lm_ref) -> pa.Table:
        lm = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        n = 0
        s = 0
        n_inf = 0
        for text in batch.column(column).to_pylist():
            for g in text_ngrams(text or "", lm.order):
                if not g:
                    continue
                n += 1
                p = prob_dist_product_e9(lm, g)
                if p is None:
                    n_inf += 1
                else:
                    s += p
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_ngrams": pa.array([n], pa.int64()),
                "sum_plog2p_e9": pa.array([s], pa.int64()),
                "n_inf": pa.array([n_inf], pa.int64()),
            }
        )

    rows = (
        sentences_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum(["n_ngrams", "sum_plog2p_e9", "n_inf"])
        .take_all()
    )
    n = sum(int(r["sum(n_ngrams)"]) for r in rows)
    s = sum(int(r["sum(sum_plog2p_e9)"]) for r in rows)
    n_inf = sum(int(r["sum(n_inf)"]) for r in rows)
    perp = math.inf if n_inf else _java_pow2(-(s / 1e9))
    return ray.data.from_arrow(
        pa.table(
            {
                "n_ngrams": pa.array([n], pa.int64()),
                "sum_plog2p_e9": pa.array([s], pa.int64()),
                "n_inf": pa.array([n_inf], pa.int64()),
                # the reference prints `Perplexity: %6.3e`; a formatted
                # string also dodges float +-inf hashing pitfalls
                "perp_str": pa.array(["%6.3e" % perp], pa.string()),
            }
        )
    )


class LineProbPerp:
    """Actor-pool batch fn over a sentence column."""

    def __init__(self, lm_ref, column: str = "sentence", oov_lm_ref=None):
        import ray

        self._lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self._oov = (
            ray.get(oov_lm_ref) if isinstance(oov_lm_ref, ray.ObjectRef) else oov_lm_ref
        )
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the sentence corpus carries the page-level "perp" string column
        # (SentenceWriter layout); drop it so our metric column can own
        # the name the FilterLines app expects
        if "perp" in batch.schema.names:
            batch = batch.drop_columns(["perp"])
        rows = [
            _line_metrics(self._lm, t or "", self._oov)
            for t in batch.column(self._column).to_pylist()
        ]
        cols = list(zip(*rows)) if rows else [[]] * 6
        return (
            batch.append_column("n_ngrams", pa.array(cols[0], pa.int64()))
            .append_column("n_oov", pa.array(cols[1], pa.int64()))
            .append_column("logprob", pa.array(cols[2], pa.float64()))
            .append_column("perp", pa.array(cols[3], pa.float64()))
            .append_column("logprob_noov", pa.array(cols[4], pa.float64()))
            .append_column("perp_noov", pa.array(cols[5], pa.float64()))
        )


class NgramProbsBatch:
    """Actor-pool batch fn: per-ngram log10-probability dump.

    Batch analog of ``lt.lm/.../app/NgramProbs.java:172-216``: the app
    reads one ngram per line and prints ``ngram TAB prob(%6.3e)`` plus
    OOV accounting (``ngramContainsOOV`` / ``ngramEndsWithOOV``,
    NgramProbs.java:188-193).  Here the ngram stream is the segmented
    corpus itself (``LtSegProvider.getNgrams`` per sentence, the same
    enumeration the Ngrams app would dump), exploded into one row per
    ngram occurrence with a stable (url, sent_idx, pos) key.
    """

    def __init__(self, lm_ref, column: str = "sentence"):
        import ray

        self._lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        lm = self._lm
        urls_in = batch.column("url").to_pylist()
        idxs_in = batch.column("sent_idx").to_pylist()
        texts = batch.column(self._column).to_pylist()
        urls, idxs, poss, grams, lps, pstrs, c_oov, e_oov = (
            [], [], [], [], [], [], [], [],
        )
        for url, sidx, text in zip(urls_in, idxs_in, texts):
            for pos, g in enumerate(text_ngrams(text or "", lm.order)):
                lp = lm.ngram_log10_prob(g)
                urls.append(url)
                idxs.append(sidx)
                poss.append(pos)
                grams.append(" ".join(g))
                lps.append(lp)
                # NgramProbs.java:197 prints Math.pow(10, log10prob) via
                # %6.3e (width 6 never pads a 9-char mantissa+exponent)
                pstrs.append("%.3e" % math.pow(10.0, lp))
                c_oov.append(lm.ngram_contains_oov(g))
                e_oov.append(lm.ngram_ends_with_oov(g))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "sent_idx": pa.array(idxs, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "ngram": pa.array(grams, pa.string()),
                "log10_prob": pa.array(lps, pa.float64()),
                "prob_str": pa.array(pstrs, pa.string()),
                "contains_oov": pa.array(c_oov, pa.bool_()),
                "ends_with_oov": pa.array(e_oov, pa.bool_()),
            }
        )


def ngram_probs(sentences_ds, lm_ref, column: str = "sentence", concurrency: int = 2):
    """NgramProbs app analog over the sentence corpus (one row per
    ngram occurrence)."""
    return sentences_ds.select_columns(["url", "sent_idx", column]).map_batches(
        NgramProbsBatch,
        fn_constructor_kwargs={"lm_ref": lm_ref, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def doc_perplexity(sentences_ds, lm_ref, url_column: str = "url",
                   sentence_column: str = "sentence", oov_lm_ref=None):
    """PerpDoc: one row per url with skip-OOV perplexity accounting."""
    import ray

    lm_handle = lm_ref if isinstance(lm_ref, ray.ObjectRef) else ray.put(lm_ref)
    oov_handle = (
        oov_lm_ref
        if (oov_lm_ref is None or isinstance(oov_lm_ref, ray.ObjectRef))
        else ray.put(oov_lm_ref)
    )

    def score_doc(group: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(lm_handle)
        ref = ray.get(oov_handle) if oov_handle is not None else lm
        if "sent_idx" in group.columns:
            group = group.sort_values("sent_idx")
        ngrams = []
        for s in group[sentence_column]:
            ngrams.extend(text_ngrams(s or "", lm.order))
        n_oov = sum(1 for g in ngrams if ref.ngram_ends_with_oov(g))
        perp = calculate_perplexity(lm, ngrams, skip_oov=False)
        perp_noov = calculate_perplexity(
            lm, [g for g in ngrams if not ref.ngram_ends_with_oov(g)], skip_oov=False
        )
        return pd.DataFrame(
            {
                url_column: [group[url_column].iloc[0]],
                "n_ngrams": [len(ngrams)],
                "n_oov": [n_oov],
                "perp": [perp],
                "perp_noov": [perp_noov],
            }
        )

    return sentences_ds.groupby(url_column).map_groups(score_doc, batch_format="pandas")


def filter_lines(ds, max_perp: float = 1000.0, column: str = "perp"):
    """``FilterLines``: keep rows with perp <= max."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.less_equal(t.column(column), pa.scalar(float(max_perp)))),
        batch_format="pyarrow",
    )


def truncate_by_token_budget(ds, budget: int, order_column: str, token_column: str):
    """Keep rows (in ``order_column`` order) while the running token sum
    stays <= budget.  Two-phase: per-block (min,max,sum) partials ->
    driver prefix sum over the (tiny, one-row-per-block) partials ->
    exact cutoff computed from the single boundary block only, whose
    rows are filtered INSIDE the Dataset before they reach the driver —
    the driver never holds more than one block's worth of rows."""
    import pyarrow.compute as pc

    meta = ds.select_columns([order_column, token_column]).materialize()

    def partial(batch: pa.Table) -> pa.Table:
        o = batch.column(order_column)
        t = batch.column(token_column)
        return pa.table(
            {
                "min_o": pa.array([pc.min(o).as_py()], pa.int64()),
                "max_o": pa.array([pc.max(o).as_py()], pa.int64()),
                "sum_t": pa.array([pc.sum(t).as_py() or 0], pa.int64()),
            }
        )

    def _block_ranges(m):
        return sorted(
            m.map_batches(partial, batch_format="pyarrow").take_all(),
            key=lambda r: r["min_o"],
        )

    parts = _block_ranges(meta)
    # The prefix sum is only valid when block ranges partition the order
    # space.  Inputs usually arrive ordered (blocks are contiguous order
    # ranges); if not, sort the slim 2-column meta once and recompute.
    if any(
        parts[i]["max_o"] >= parts[i + 1]["min_o"] for i in range(len(parts) - 1)
    ):
        meta = meta.sort(order_column).materialize()
        parts = _block_ranges(meta)
        if any(
            parts[i]["max_o"] >= parts[i + 1]["min_o"]
            for i in range(len(parts) - 1)
        ):
            raise ValueError(
                f"truncate_by_token_budget: duplicate {order_column!r} values "
                "span block boundaries; order_column must be unique"
            )
    running = 0
    cutoff = None  # exclusive upper bound on order value
    boundary: tuple[int, int] | None = None
    for p in parts:
        if running + p["sum_t"] > budget:
            boundary = (p["min_o"], p["max_o"])
            break
        running += p["sum_t"]
    if boundary is None:
        return ds  # budget never exceeded
    lo, hi = boundary
    # Range filter pushed into the Dataset: only the boundary block's
    # rows are materialized on the driver (O(block), not O(corpus)).
    boundary_rows = meta.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column(order_column), pa.scalar(lo)),
                pc.less_equal(t.column(order_column), pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    )
    rows = sorted(boundary_rows.take_all(), key=lambda r: r[order_column])
    cutoff = lo
    for r in rows:
        if running + r[token_column] > budget:
            cutoff = r[order_column]
            break
        running += r[token_column]
    return ds.map_batches(
        lambda t: t.filter(pc.less(t.column(order_column), pa.scalar(cutoff))),
        batch_format="pyarrow",
    )


def perp_stats(scored_ds, column: str = "perp"):
    """A8: crawl-wide min/max/mean/count over finite perplexities.

    The mean is computed from an INTEGER micro-quantized sum
    (``rint(perp * 1e6)`` summed as int64) so the distributed reduce is
    exact and order-independent - a float Sum/Mean aggregate would be
    nondeterministic in its last ulp across block orders, breaking
    hash-compare against the sequential oracle."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    def finite_with_e6(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_finite(t.column(column)), pc.greater(t.column(column), 1.0))
        )
        e6 = np.rint(np.asarray(t.column(column), dtype=np.float64) * 1e6).astype(
            np.int64
        )
        return t.append_column("perp_e6", pa.array(e6, pa.int64()))

    finite = scored_ds.map_batches(finite_with_e6, batch_format="pyarrow")
    agg = finite.aggregate(
        Min(column, alias_name="perp_min"),
        Max(column, alias_name="perp_max"),
        Sum("perp_e6", alias_name="sum_e6"),
        Count(alias_name="n_docs"),
    )
    n = int(agg["n_docs"]) or 1
    mean = (int(agg["sum_e6"] or 0) / n) / 1e6
    return pa.table(
        {
            "perp_min": pa.array([agg["perp_min"]], pa.float64()),
            "perp_max": pa.array([agg["perp_max"]], pa.float64()),
            "perp_mean": pa.array([mean], pa.float64()),
            "n_docs": pa.array([int(agg["n_docs"])], pa.int64()),
        }
    )


def distinct_sentences(sentences_ds, column: str = "sentence"):
    """O4: ``sort | uniq`` sentence dedup (exact distinct) - an
    aggregate-based distinct (no per-group python calls)."""
    from ray.data.aggregate import Count

    return (
        sentences_ds.select_columns([column])
        .groupby(column)
        .aggregate(Count(alias_name="cnt"))
        .select_columns([column])
    )
