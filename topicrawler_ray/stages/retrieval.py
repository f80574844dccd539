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


# ---------------------------------------------------------------------------
# disk-backed inverted index (build once, serve queries without a corpus scan)


def build_bm25_index(ds, out_dir: str, num_buckets: int = 32,
                     id_column: str = "doc_id", text_column: str = "text"):
    """Write a bucketed inverted-index artifact::

        <dir>/meta.json              {"num_buckets": B, "n_docs": N,
                                      "total_len": L}
        <dir>/bucket=NNNN.parquet    postings (term, doc_id, tf, dl)
                                     sorted by (term, doc_id),
                                     siphash(term) % B == NNNN

    The scan-based :func:`bm25_topk` re-reads the corpus per query
    set; the index is built ONCE (each bucket file written inside its
    own ``map_groups`` task - distributed, resumable per bucket) and
    every later query touches only its terms' buckets - the Lucene
    cost model, same shape as the disk LM artifact (lm/diskserve.py).

    Caveat (documented, standard): stop-term postings are Zipf-huge;
    production rankers skip them via WAND/max-score bounds.  Here the
    serve path loads whole per-term postings, so cap the query
    vocabulary or prefilter stop terms upstream (ranking.word_df).
    """
    import json
    import os
    import tempfile

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".bm25-", dir=out_dir)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        o_t, o_d, o_tf, o_dl, o_b = [], [], [], [], []
        n = 0
        total = 0
        for did, text in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            words = (text or "").split(" ")
            n += 1
            total += len(words)
            for t, tf in Counter(words).items():
                o_t.append(t)
                o_d.append(did)
                o_tf.append(tf)
                o_dl.append(len(words))
                o_b.append(_term_bucket(t, num_buckets))
        # one stats row per block (bucket -1, folded on the driver)
        o_t.append(None)
        o_d.append(n)
        o_tf.append(total)
        o_dl.append(0)
        o_b.append(-1)
        return pa.table(
            {
                "term": pa.array(o_t, pa.string()),
                "doc_id": pa.array(o_d, pa.int64()),
                "tf": pa.array(o_tf, pa.int64()),
                "dl": pa.array(o_dl, pa.int64()),
                "bucket": pa.array(o_b, pa.int64()),
            }
        )

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        if b < 0:
            return pd.DataFrame(
                {
                    "bucket": [-1],
                    "n_docs": [int(group["doc_id"].sum())],
                    "total_len": [int(group["tf"].sum())],
                }
            )
        g = group.sort_values(["term", "doc_id"], kind="mergesort")
        import pyarrow.parquet as _pq

        _pq.write_table(
            pa.Table.from_pandas(
                g[["term", "doc_id", "tf", "dl"]], preserve_index=False
            ),
            os.path.join(tmp, "bucket=%04d.parquet" % b),
        )
        return pd.DataFrame(
            {"bucket": [b], "n_docs": [0], "total_len": [0]}
        )

    stats = (
        ds.select_columns([id_column, text_column])
        .map_batches(postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .take_all()
    )
    n_docs = sum(s["n_docs"] for s in stats if s["bucket"] == -1)
    total_len = sum(s["total_len"] for s in stats if s["bucket"] == -1)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(
            {"num_buckets": num_buckets, "n_docs": int(n_docs),
             "total_len": int(total_len)}, f
        )
    final = os.path.join(out_dir, "index")
    os.rename(tmp, final)
    return final


def _term_bucket(term: str, num_buckets: int) -> int:
    import pandas as pd

    return int(
        pd.util.hash_array(np.asarray([term], dtype=object))[0]
        % np.uint64(num_buckets)
    )


def bm25_disk_topk(index_dir: str, queries: list[tuple[int, str]], k: int = 10):
    """Serve BM25 queries from the index artifact: one Ray task per
    touched bucket loads ONLY the query terms' postings (parquet
    predicate pushdown), the driver accumulates doc scores in fixed
    query-term order - bit-identical to :func:`bm25_topk` on the same
    corpus."""
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_docs, total_len = meta["n_docs"], meta["total_len"]
    avgdl = total_len / n_docs if n_docs else 1.0

    terms_by_q = [(qid, query_terms(qtext)) for qid, qtext in queries]
    vocab = sorted({t for _, ts in terms_by_q for t in ts})
    by_bucket: dict[int, list[str]] = {}
    for t in vocab:
        by_bucket.setdefault(_term_bucket(t, meta["num_buckets"]), []).append(t)

    @ray.remote
    def load_postings(bucket: int, terms: list[str]):
        import pyarrow.parquet as _pq

        p = os.path.join(index_dir, "bucket=%04d.parquet" % bucket)
        if not os.path.exists(p):
            return {}
        tab = _pq.read_table(p, filters=[("term", "in", terms)])
        out: dict[str, list[tuple[int, int, int]]] = {}
        for t, d, tf, dl in zip(
            tab.column("term").to_pylist(),
            tab.column("doc_id").to_pylist(),
            tab.column("tf").to_pylist(),
            tab.column("dl").to_pylist(),
        ):
            out.setdefault(t, []).append((d, tf, dl))
        return out

    postings: dict[str, list[tuple[int, int, int]]] = {}
    for part in ray.get(
        [load_postings.remote(b, ts) for b, ts in sorted(by_bucket.items())]
    ):
        postings.update(part)

    idf = {t: bm25_idf(len(postings.get(t, ())), n_docs) for t in vocab}

    o_q, o_rank, o_id, o_s = [], [], [], []
    for qid, terms in terms_by_q:
        scores: dict[int, float] = {}
        for t in terms:  # FIXED term order = the scalar loop's order
            w = idf[t]
            for d, tf, dl in postings.get(t, ()):
                norm = K1 * (1.0 - B + B * (dl / avgdl))
                contrib = w * (tf * (K1 + 1.0)) / (tf + norm)
                scores[d] = scores.get(d, 0.0) + contrib
        best = sorted(
            ((s, -d) for d, s in scores.items() if s > 0.0), reverse=True
        )[:k]
        for rank, (s, nd) in enumerate(best):
            o_q.append(qid)
            o_rank.append(rank)
            o_id.append(-nd)
            o_s.append(int(np.floor(s * 1e6)))
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "rank": pa.array(o_rank, pa.int64()),
            "doc_id": pa.array(o_id, pa.int64()),
            "score_e6": pa.array(o_s, pa.int64()),
        }
    )
