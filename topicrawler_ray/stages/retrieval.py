"""Lexical retrieval: distributed BM25 top-k over a document corpus.

The sparse-retrieval complement to the dense ANN family
(``stages/similarity.py``) — the standard first-stage ranker for
training-data curation (query-based corpus audits, decontamination
probes, seed selection).

Shape (two streaming passes, no shuffle of documents):

1. **Corpus statistics pass** — one ``map_batches`` emits per-batch
   PARTIAL rows: document frequency for each query term the batch's
   docs contain, plus sentinel rows for the doc count and total token
   length (the combiner discipline: the exchange carries one row per
   (batch, term), never per doc).  One tiny ``groupby(term).sum``
   finalizes; the result is at most |query vocabulary| + 2 rows —
   driver-safe at any corpus size.
2. **Scoring pass** — the stats (idf table, N, avgdl) are broadcast
   via ``ray.put``; each batch scores its docs against every query
   locally and reduces to a per-batch partial top-k.  Only
   ``k × |queries| × num_batches`` candidate rows leave the pass; the
   driver merges a k-bounded heap per query (the knn_bruteforce
   pattern, similarity.py:33).

Determinism: scores are computed per doc with scalar float64 ops in a
FIXED term order (query order, duplicates dropped), so the sequential
oracle reproduces them bit-for-bit; the emitted score is
micro-quantized (``floor(score * 1e6)``) with doc_id ASC tie-breaks.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

K1 = 1.5
B = 0.75

_N_SENTINEL = "\x00n_docs"
_LEN_SENTINEL = "\x00total_len"


def query_terms(query_text: str) -> list[str]:
    """Whitespace terms, duplicates dropped, FIRST-occurrence order
    (the fixed score-summation order both sides rely on)."""
    seen: dict[str, None] = {}
    for t in query_text.split(" "):
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_idf(df: int, n_docs: int) -> float:
    """Robertson-Sparck-Jones idf (the Lucene/BM25+ variant that never
    goes negative): ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def bm25_doc_score(tf_by_term, dl: int, terms, idf, avgdl: float) -> float:
    """Scalar BM25 for one doc over ``terms`` in order; shared by the
    distributed scorer and the sequential oracle (bit-identical)."""
    score = 0.0
    norm = K1 * (1.0 - B + B * (dl / avgdl))
    for t in terms:
        tf = tf_by_term.get(t, 0)
        if tf:
            score += idf[t] * (tf * (K1 + 1.0)) / (tf + norm)
    return score


def corpus_stats(ds, vocab: set[str], text_column: str = "text"):
    """(df: dict term->doc_freq, n_docs, avgdl) for the query vocab —
    partial-per-batch rows then one tiny groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        df: Counter[str] = Counter()
        n = 0
        total_len = 0
        for text in batch.column(text_column).to_pylist():
            words = (text or "").split(" ")
            n += 1
            total_len += len(words)
            for t in set(words) & vocab:
                df[t] += 1
        terms = sorted(df)
        return pa.table(
            {
                "term": pa.array(terms + [_N_SENTINEL, _LEN_SENTINEL], pa.string()),
                "cnt": pa.array(
                    [df[t] for t in terms] + [n, total_len], pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("cnt")
        .take_all()
    )
    df: dict[str, int] = {}
    n_docs = 0
    total_len = 0
    for r in rows:
        if r["term"] == _N_SENTINEL:
            n_docs = int(r["sum(cnt)"])
        elif r["term"] == _LEN_SENTINEL:
            total_len = int(r["sum(cnt)"])
        else:
            df[r["term"]] = int(r["sum(cnt)"])
    avgdl = total_len / n_docs if n_docs else 1.0
    return df, n_docs, avgdl


def bm25_topk(
    ds,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """-> (query_id, rank, doc_id, score_e6) — exact BM25 top-k per
    query; docs with score 0 (no term overlap) never rank."""
    import ray

    terms_by_q = [(qid, query_terms(qtext)) for qid, qtext in queries]
    vocab = {t for _, ts in terms_by_q for t in ts}
    df, n_docs, avgdl = corpus_stats(ds, vocab, text_column)
    idf = {t: bm25_idf(df.get(t, 0), n_docs) for t in vocab}
    ref = ray.put((terms_by_q, idf, avgdl))

    def partial_topk(batch: pa.Table, _ref=ref) -> pa.Table:
        from collections import Counter

        tq, idf_l, avg = ray.get(_ref)
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(text_column).to_pylist()
        heaps: dict[int, list] = {qid: [] for qid, _ in tq}
        for did, text in zip(ids, texts):
            words = (text or "").split(" ")
            tf = Counter(words)
            dl = len(words)
            for qid, terms in tq:
                s = bm25_doc_score(tf, dl, terms, idf_l, avg)
                if s > 0.0:
                    # per-batch partial top-k: only k rows per query
                    # ever leave this pass
                    heapq.heappush(heaps[qid], (s, -int(did)))
                    if len(heaps[qid]) > k:
                        heapq.heappop(heaps[qid])
        o_q, o_id, o_s = [], [], []
        for qid, _ in tq:
            for s, nid in heaps[qid]:
                o_q.append(qid)
                o_id.append(-nid)
                o_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "score": pa.array(o_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()

    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []),
            (float(r["score"]), -int(r["doc_id"])),
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    o_q, o_rank, o_id, o_s = [], [], [], []
    for qid in sorted(heaps):
        best = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (s, nid) in enumerate(best):
            o_q.append(qid)
            o_rank.append(rank)
            o_id.append(-nid)
            o_s.append(int(np.floor(s * 1e6)))
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "rank": pa.array(o_rank, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "score_e6": pa.array(o_s, pa.int64()),
            }
        )
    )
