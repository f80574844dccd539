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

Determinism — integer contribution algebra (round 4): each per-term
contribution is ONE fixed float64 expression then floor-quantized to
an int64 at 1e9 (``contrib_e9``).  Integer sums are associative, so a
document's score is identical no matter how its term contributions
are partitioned across batches, buckets, or shuffle reducers — this
is what lets the disk-index serve path (:func:`bm25_disk_topk`) score
per bucket and merge with a plain distributed ``groupby.sum`` while
staying bit-identical to the scan ranker and the sequential oracle.
The emitted ``score_e6`` is ``sum(contrib_e9) // 1000``; ties break
doc_id ASC.  Bounds: idf ≤ ln(1+2N) < 50 for N ≤ 1e20, per-term
contribution ≤ idf·(K1+1) < 125, so e9 quantization stays below
1.25e11 per term and an int64 holds sums over ~7e7 query terms.

Tokenization is vectorized Arrow/numpy (round 4): texts are split
with ``pc.split_pattern``, exploded to (doc_idx, word) pairs, and
per-doc term frequencies come from one ``np.unique`` over packed
integer pair codes — no per-row Python ``Counter`` in any hot pass.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.5
B = 0.75

_N_SENTINEL = "\x00n_docs"
_LEN_SENTINEL = "\x00total_len"


def query_terms(query_text: str) -> list[str]:
    """Whitespace terms, duplicates dropped, FIRST-occurrence order
    (kept for rank-stable query parsing; summation order no longer
    matters under the integer contribution algebra)."""
    seen: dict[str, None] = {}
    for t in query_text.split(" "):
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_idf(df: int, n_docs: int) -> float:
    """Robertson-Sparck-Jones idf (the Lucene/BM25+ variant that never
    goes negative): ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def contrib_e9(idf_t: float, tf, dl, avgdl: float):
    """Quantized per-term BM25 contribution, vectorized: ONE fixed
    float64 expression tree then ``floor(x * 1e9)`` as int64.  Shared
    verbatim by the scan ranker, the disk-serve bucket tasks and the
    sequential oracle — elementwise numpy float64 ops are IEEE-exact,
    so scalar and vector evaluation agree bit-for-bit."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    norm = K1 * (1.0 - B + B * (dl / avgdl))
    c = idf_t * (tf * (K1 + 1.0)) / (tf + norm)
    return np.floor(c * 1e9).astype(np.int64)


def _explode_tokens(texts: pa.ChunkedArray | pa.Array):
    """Vectorized whitespace tokenization for a column of texts ->
    (flat_words: pa.Array, doc_idx: np.int64[], dl: np.int64[]).

    Matches Python ``(text or "").split(" ")`` exactly (empty/None
    text yields one empty-string token, dl == 1)."""
    texts = pc.fill_null(texts, "")
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    dl = pc.list_value_length(words).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    flat = pc.list_flatten(words)
    return flat, doc_idx, dl


def _doc_term_tf(flat: pa.Array, doc_idx: np.ndarray, vocab_arr: pa.Array):
    """Per-(doc, vocab-term) term frequencies from exploded tokens,
    via packed-pair ``np.unique`` -> (doc_idx: int64[], term_code:
    int64[] indexing vocab_arr, tf: int64[])."""
    # vocab codes: position of each flat word in vocab_arr, -1 if absent
    codes = pc.index_in(flat, value_set=vocab_arr)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    codes = codes.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = codes >= 0
    if not keep.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    v = len(vocab_arr)
    pairs = doc_idx[keep] * v + codes[keep]
    uniq, counts = np.unique(pairs, return_counts=True)
    return uniq // v, uniq % v, counts.astype(np.int64)


def corpus_stats(ds, vocab: set[str], text_column: str = "text"):
    """(df: dict term->doc_freq, n_docs, avgdl) for the query vocab —
    partial-per-batch rows then one tiny groupby."""
    vocab_list = sorted(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        vocab_arr = pa.array(vocab_list, pa.string())
        flat, doc_idx, dl = _explode_tokens(batch.column(text_column))
        _, term_code, _tf = _doc_term_tf(flat, doc_idx, vocab_arr)
        # df per term = number of (doc, term) pairs per term code
        code_uniq, code_counts = np.unique(term_code, return_counts=True)
        terms = [vocab_list[c] for c in code_uniq]
        return pa.table(
            {
                "term": pa.array(
                    terms + [_N_SENTINEL, _LEN_SENTINEL], pa.string()
                ),
                "cnt": pa.array(
                    list(code_counts) + [len(dl), int(dl.sum())], pa.int64()
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


def _merge_partial_topk(partials, k: int) -> pa.Table:
    """Driver-side k-bounded heap merge over per-block partial top-k
    rows (score_e9 ints, ties doc_id ASC) -> final ranked table."""
    heaps: dict[int, list] = {}
    for r in partials:
        qid = int(r["query_id"])
        heapq.heappush(
            heaps.setdefault(qid, []), (int(r["score_e9"]), -int(r["doc_id"]))
        )
        if len(heaps[qid]) > k:
            heapq.heappop(heaps[qid])
    o_q, o_rank, o_id, o_s = [], [], [], []
    for qid in sorted(heaps):
        best = sorted(heaps[qid], key=lambda t: (-t[0], -t[1]))
        for rank, (s, nid) in enumerate(best):
            o_q.append(qid)
            o_rank.append(rank)
            o_id.append(-nid)
            o_s.append(s // 1000)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "rank": pa.array(o_rank, pa.int64()),
            "doc_id": pa.array(o_id, pa.int64()),
            "score_e6": pa.array(o_s, pa.int64()),
        }
    )


def bm25_topk(
    ds,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """-> (query_id, rank, doc_id, score_e6) — exact BM25 top-k per
    query; docs with score 0 (no term overlap) never rank."""
    # delegates to the weighted pass with all weights 1 — ONE scan
    # kernel for both certified paths (the weight-1 reduction is
    # proven exactly by tests/test_rrf.py::TestRM3)
    weighted = [(qid, {t: 1 for t in query_terms(qtext)}) for qid, qtext in queries]
    return _weighted_bm25_pass(ds, weighted, k, id_column, text_column)


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

    Stop-term postings are Zipf-huge, but the serve path
    (:func:`bm25_disk_topk`) scores them INSIDE per-bucket tasks and
    merges integer partials with a distributed groupby-sum, so no
    posting list ever lands on the driver.
    """
    import json
    import os
    import tempfile

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".bm25-", dir=out_dir)

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        flat, doc_idx, dl = _explode_tokens(batch.column(text_column))
        # batch-local term dictionary -> packed-pair unique for tf
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        terms_dict = enc.dictionary
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(terms_dict)
        if v:
            pairs = doc_idx * v + codes
            uniq, counts = np.unique(pairs, return_counts=True)
            p_doc = uniq // v
            p_code = (uniq % v).astype(np.int64)
        else:
            p_doc = p_code = counts = np.zeros(0, dtype=np.int64)
        buckets_by_code = _term_buckets(terms_dict, num_buckets)
        tab = pa.table(
            {
                "term": terms_dict.take(pa.array(p_code, pa.int64())),
                "doc_id": pa.array(ids[p_doc], pa.int64()),
                "tf": pa.array(counts, pa.int64()),
                "dl": pa.array(dl[p_doc], pa.int64()),
                "bucket": pa.array(buckets_by_code[p_code], pa.int64()),
            }
        )
        # one stats row per block (bucket -1, folded on the driver)
        stats = pa.table(
            {
                "term": pa.array([None], pa.string()),
                "doc_id": pa.array([len(ids)], pa.int64()),
                "tf": pa.array([int(dl.sum())], pa.int64()),
                "dl": pa.array([0], pa.int64()),
                "bucket": pa.array([-1], pa.int64()),
            }
        )
        return pa.concat_tables([tab, stats])

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
            ).replace_schema_metadata(None),
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


def _term_buckets(terms: pa.Array, num_buckets: int) -> np.ndarray:
    """Vectorized siphash bucket assignment for an array of terms."""
    import pandas as pd

    vals = np.asarray(terms.to_pylist(), dtype=object)
    if len(vals) == 0:
        return np.zeros(0, dtype=np.int64)
    return (
        pd.util.hash_array(vals) % np.uint64(num_buckets)
    ).astype(np.int64)


def _term_bucket(term: str, num_buckets: int) -> int:
    import pandas as pd

    return int(
        pd.util.hash_array(np.asarray([term], dtype=object))[0]
        % np.uint64(num_buckets)
    )


def bm25_disk_topk(index_dir: str, queries: list[tuple[int, str]],
                   k: int = 10, debug: dict | None = None):
    """Serve BM25 queries from the index artifact — fully distributed,
    bit-identical to :func:`bm25_topk` on the same corpus.

    Shape (no posting list ever reaches the driver):

    1. **df pass** — one tiny Ray task per touched bucket counts
       postings per query term (parquet predicate pushdown, reads the
       ``term`` column only); the driver receives ≤ |vocab| counts and
       builds the broadcast idf table.
    2. **bucket scoring** — a Ray Data pipeline with one block per
       touched bucket: each task reads ONLY its bucket's query-term
       postings and emits quantized integer partial rows
       ``(query_id, doc_id, contrib_e9)`` summed over the query terms
       living in that bucket (integer sums are associative — see the
       module docstring).
    3. **merge** — a distributed ``groupby(query_id, doc_id).sum``
       totals cross-bucket partials, then a per-block partial top-k
       bounds what the driver merges to ``k × |queries| × num_blocks``
       rows.

    ``debug``, if given, receives {"merged_rows": N} — the number of
    candidate rows the driver actually materialized (the O(k·Q·blocks)
    bound a stop-term query must respect)."""
    import json
    import os

    import ray
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_docs, total_len = meta["n_docs"], meta["total_len"]
    num_buckets = meta["num_buckets"]
    avgdl = total_len / n_docs if n_docs else 1.0

    terms_by_q = [(qid, query_terms(qtext)) for qid, qtext in queries]
    vocab = sorted({t for _, ts in terms_by_q for t in ts})
    by_bucket: dict[int, list[str]] = {}
    for t in vocab:
        by_bucket.setdefault(_term_bucket(t, num_buckets), []).append(t)
    if not by_bucket:
        return _merge_partial_topk([], k)

    # ---- pass 1: per-term document frequencies (counts only) --------
    @ray.remote
    def term_dfs(bucket: int, terms: list[str]) -> dict[str, int]:
        import pyarrow.parquet as _pq

        p = os.path.join(index_dir, "bucket=%04d.parquet" % bucket)
        if not os.path.exists(p):
            return {}
        tab = _pq.read_table(
            p, columns=["term"], filters=[("term", "in", terms)]
        )
        vc = pc.value_counts(tab.column("term"))
        return {
            str(f["values"]): int(f["counts"]) for f in vc.to_pylist()
        }

    df: dict[str, int] = {}
    for part in ray.get(
        [term_dfs.remote(b, ts) for b, ts in sorted(by_bucket.items())]
    ):
        df.update(part)
    idf = {t: bm25_idf(df.get(t, 0), n_docs) for t in vocab}
    ref = ray.put((terms_by_q, idf, avgdl, dict(by_bucket), index_dir))

    # ---- pass 2: score inside per-bucket tasks ----------------------
    def score_bucket(batch: pa.Table, _ref=ref) -> pa.Table:
        import pyarrow.parquet as _pq

        tq, idf_l, avg, bterms, idx_dir = ray.get(_ref)
        o_q, o_id, o_s = [], [], []
        for b in batch.column("bucket").to_pylist():
            terms = bterms.get(int(b), [])
            p = os.path.join(idx_dir, "bucket=%04d.parquet" % int(b))
            if not terms or not os.path.exists(p):
                continue
            tab = _pq.read_table(p, filters=[("term", "in", terms)])
            if tab.num_rows == 0:
                continue
            term_col = tab.column("term")
            d = tab.column("doc_id").to_numpy(zero_copy_only=False)
            tf = tab.column("tf").to_numpy(zero_copy_only=False)
            dl = tab.column("dl").to_numpy(zero_copy_only=False)
            here = set(terms)
            for qid, qterms in tq:
                docs_parts, contrib_parts = [], []
                for t in qterms:
                    if t not in here:
                        continue
                    m = pc.equal(term_col, t)
                    sel = np.asarray(m.combine_chunks()
                                     if isinstance(m, pa.ChunkedArray)
                                     else m)
                    if not sel.any():
                        continue
                    docs_parts.append(d[sel])
                    contrib_parts.append(
                        contrib_e9(idf_l[t], tf[sel], dl[sel], avg)
                    )
                if not docs_parts:
                    continue
                # in-bucket combiner: one partial row per (query, doc)
                # leaves this task, not one per posting
                dq = np.concatenate(docs_parts)
                cq = np.concatenate(contrib_parts)
                order = np.argsort(dq, kind="stable")
                dq, cq = dq[order], cq[order]
                uniq, starts = np.unique(dq, return_index=True)
                sums = np.add.reduceat(cq, starts)
                o_q.extend([qid] * len(uniq))
                o_id.extend(uniq.tolist())
                o_s.extend(sums.tolist())
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "contrib_e9": pa.array(o_s, pa.int64()),
            }
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score_e9": pa.array([], pa.int64()),
                }
            )
        q = batch.column("query_id").to_numpy(zero_copy_only=False)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = batch.column("sum(contrib_e9)").to_numpy(zero_copy_only=False)
        keep = s > 0
        q, d, s = q[keep], d[keep], s[keep]
        o_q, o_id, o_s = [], [], []
        for qid in np.unique(q):
            m = q == qid
            dq, sq = d[m], s[m]
            if len(dq) > k:
                sel = np.lexsort((dq, -sq))[:k]
                dq, sq = dq[sel], sq[sel]
            o_q.extend([int(qid)] * len(dq))
            o_id.extend(dq.tolist())
            o_s.extend(sq.tolist())
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "score_e9": pa.array(o_s, pa.int64()),
            }
        )

    buckets_ds = ray.data.from_items(
        [{"bucket": b} for b in sorted(by_bucket)],
        override_num_blocks=len(by_bucket),
    )
    partials = (
        buckets_ds.map_batches(score_bucket, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .sum("contrib_e9")
        .map_batches(partial_topk, batch_format="pyarrow")
        .take_all()
    )
    if debug is not None:
        debug["merged_rows"] = len(partials)
    return _merge_partial_topk(partials, k)


def rrf_fuse(rankings, k0: int = 60, topk: int = 10):
    """Reciprocal-rank fusion of multiple retriever rankings (the
    standard hybrid lexical+dense merge, Cormack/Clarke/Buettcher SIGIR
    2009): fused(d) = sum over retrievers of 1 / (k0 + rank_r(d) + 1).

    ``rankings`` is a list of ``(table, id_column)`` pairs where each
    table carries (query_id, rank, <id_column>) - the K-BOUNDED output
    of ``bm25_topk`` / ``similarity.brute_force_topk``.  Each input is
    at most Q*k rows by construction (the heavy distributed work - the
    corpus scans and partial top-k merges - already happened inside the
    retrievers), so fusing on the driver is O(Q*k*retrievers), not a
    data-plane pass.

    Determinism: each reciprocal term is quantized as the INTEGER
    ``10**9 // (k0 + rank + 1)`` before summing - integer sums are
    associative and exactly mirrored by the sequential oracle; ties
    break toward the smaller id.  Returns (query_id, doc_id, rrf_e9,
    rank)."""
    scores: dict[tuple[int, int], int] = {}
    for table, id_column in rankings:
        if not isinstance(table, pa.Table):
            # a k-bounded Dataset result (e.g. bm25_topk) - tiny by
            # contract, safe to collect
            table = pa.Table.from_pandas(
                table.to_pandas(), preserve_index=False
            )
        qs = table.column("query_id").to_pylist()
        ids = table.column(id_column).to_pylist()
        rks = table.column("rank").to_pylist()
        for q, i, r in zip(qs, ids, rks):
            key = (int(q), int(i))
            scores[key] = scores.get(key, 0) + 10**9 // (k0 + int(r) + 1)
    o_q, o_id, o_s, o_r = [], [], [], []
    by_q: dict[int, list[tuple[int, int]]] = {}
    for (q, i), s in scores.items():
        by_q.setdefault(q, []).append((-s, i))
    for q in sorted(by_q):
        for rank, (neg_s, i) in enumerate(sorted(by_q[q])[:topk]):
            o_q.append(q)
            o_id.append(i)
            o_s.append(-neg_s)
            o_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int64()),
            "doc_id": pa.array(o_id, pa.int64()),
            "rrf_e9": pa.array(o_s, pa.int64()),
            "rank": pa.array(o_r, pa.int64()),
        }
    )


def phrase_search(ds, phrases, id_column: str = "doc_id",
                  text_column: str = "text"):
    """Exact positional phrase search: which documents contain each
    consecutive-token phrase, and how many times (overlapping
    occurrences counted — 'a a' occurs twice in 'a a a').

    The positional complement to :func:`bm25_topk` (a bag-of-words
    ranker): phrase/proximity constraints are what positional postings
    exist for in every web-scale index.  Shape: the phrase list is
    tiny (broadcast once via ``ray.put``); matching is embarrassingly
    per-document, so the whole operator is ONE stateless
    ``map_batches`` with NO shuffle — token equality masks are
    vectorized pyarrow/numpy kernels over the batch-exploded token
    array, window conjunction is m-1 shifted ANDs, per-doc counts a
    bincount.

    ``phrases``: list of ``(phrase_id, [w1, w2, ...])``.
    -> (phrase_id, doc_id, n_matches), matching docs only.
    """
    import ray

    ref = ray.put([(int(pid), tuple(ws)) for pid, ws in phrases])

    def find(batch: pa.Table, _ref=ref) -> pa.Table:
        plist = ray.get(_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        flat, doc_idx, _dl = _explode_tokens(batch.column(text_column))
        L = len(flat)
        o_pid, o_doc, o_n = [], [], []
        for pid, words in plist:
            m = len(words)
            if m == 0 or L < m:
                continue
            ok = pc.equal(flat, words[0]).to_numpy(zero_copy_only=False)[
                : L - m + 1
            ].copy()
            for j in range(1, m):
                ok &= pc.equal(flat, words[j]).to_numpy(zero_copy_only=False)[
                    j : L - m + 1 + j
                ]
            # the window must not straddle a document boundary
            ok &= doc_idx[: L - m + 1] == doc_idx[m - 1 : L]
            hit_docs = doc_idx[: L - m + 1][ok]
            if hit_docs.size == 0:
                continue
            counts = np.bincount(hit_docs, minlength=len(ids))
            nz = np.nonzero(counts)[0]
            o_pid.extend([pid] * len(nz))
            o_doc.extend(ids[nz].tolist())
            o_n.extend(counts[nz].tolist())
        return pa.table(
            {
                "phrase_id": pa.array(o_pid, pa.int64()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "n_matches": pa.array(o_n, pa.int64()),
            }
        )

    return ds.map_batches(find, batch_format="pyarrow")


def _weighted_bm25_pass(ds, weighted_queries, k, id_column, text_column):
    """Weighted-term BM25 scan: like :func:`bm25_topk`'s pass but each
    query term carries an integer weight (score += w_t * contrib_e9).
    ``weighted_queries`` = [(qid, {term: weight})]."""
    import ray

    vocab = {t for _, wts in weighted_queries for t in wts}
    vocab_list = sorted(vocab)
    df, n_docs, avgdl = corpus_stats(ds, vocab, text_column)
    idf = {t: bm25_idf(df.get(t, 0), n_docs) for t in vocab}
    ref = ray.put((weighted_queries, vocab_list, idf, avgdl))

    def partial_topk(batch: pa.Table, _ref=ref) -> pa.Table:
        wq, vlist, idf_l, avg = ray.get(_ref)
        vocab_arr = pa.array(vlist, pa.string())
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        flat, doc_idx, dl = _explode_tokens(batch.column(text_column))
        d_idx, t_code, tf = _doc_term_tf(flat, doc_idx, vocab_arr)
        order = np.argsort(t_code, kind="stable")
        d_idx, t_code, tf = d_idx[order], t_code[order], tf[order]
        bounds = np.searchsorted(t_code, np.arange(len(vlist) + 1))
        code_of = {t: i for i, t in enumerate(vlist)}
        n = len(ids)
        o_q, o_id, o_s = [], [], []
        for qid, weights in wq:
            score = np.zeros(n, dtype=np.int64)
            for t, w in weights.items():
                c = code_of[t]
                lo, hi = bounds[c], bounds[c + 1]
                if lo == hi:
                    continue
                di = d_idx[lo:hi]
                score[di] += w * contrib_e9(idf_l[t], tf[lo:hi], dl[di], avg)
            pos = np.nonzero(score > 0)[0]
            if len(pos) == 0:
                continue
            if len(pos) > k:
                sel = np.lexsort((ids[pos], -score[pos]))[:k]
                pos = pos[sel]
            o_q.extend([qid] * len(pos))
            o_id.extend(ids[pos].tolist())
            o_s.extend(score[pos].tolist())
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "doc_id": pa.array(o_id, pa.int64()),
                "score_e9": pa.array(o_s, pa.int64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    import ray.data

    return ray.data.from_arrow(_merge_partial_topk(partials, k))


def rm3_expansions(ds, queries, fb_docs: int, fb_terms: int,
                   orig_weight: int, exp_weight: int,
                   id_column: str, text_column: str):
    """RM3-style pseudo-relevance expansion (Lavrenko & Croft 2001
    relevance models, the Anserini RM3 default shape, made exactly
    deterministic): per query, the top ``fb_docs`` BM25 docs vote with
    their raw term frequencies; the ``fb_terms`` highest-count terms of
    length >= 3 (count desc, term asc — no floats anywhere) join the
    original terms.  Weights are integers: original terms get
    ``orig_weight`` (+ ``exp_weight`` if also selected), expansion
    terms ``exp_weight``.

    -> ([(qid, {term: weight})], feedback_doc_ids) — the feedback doc
    TEXTS are fetched by a pruned key-set scan (<= queries x fb_docs
    rows to the driver), never a corpus materialization.
    """
    import numpy as np

    first = bm25_topk(
        ds, queries, k=fb_docs, id_column=id_column, text_column=text_column
    ).take_all()
    fb_by_q: dict[int, list[int]] = {}
    for r in first:
        fb_by_q.setdefault(int(r["query_id"]), []).append(int(r["doc_id"]))
    all_fb = sorted({d for ds_ in fb_by_q.values() for d in ds_})
    fb_arr = np.array(all_fb, dtype=np.int64)

    def pick(batch: pa.Table, _keys=fb_arr) -> pa.Table:
        vals = batch.column(id_column).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(vals, _keys)))

    texts = {
        int(r[id_column]): r[text_column]
        for r in ds.select_columns([id_column, text_column])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    }

    out = []
    for qid, qtext in queries:
        orig = query_terms(qtext)
        counts: dict[str, int] = {}
        for did in fb_by_q.get(qid, []):
            for w in (texts.get(did) or "").split(" "):
                if len(w) >= 3:
                    counts[w] = counts.get(w, 0) + 1
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:fb_terms]
        weights: dict[str, int] = {}
        for t in orig:
            weights[t] = weights.get(t, 0) + orig_weight
        for t, _c in top:
            weights[t] = weights.get(t, 0) + exp_weight
        out.append((qid, weights))
    return out, all_fb


def bm25_rm3(ds, queries, k: int = 10, fb_docs: int = 5, fb_terms: int = 5,
             orig_weight: int = 2, exp_weight: int = 1,
             id_column: str = "doc_id", text_column: str = "text"):
    """BM25 + RM3 pseudo-relevance feedback as a two-pass batch
    operator: exact first-pass top-``fb_docs``, integer term-count
    expansion, weighted exact second pass.

    Scale shape: two corpus scans (the first-pass and the weighted
    re-scan — both the bm25_topk partial-top-k combiner shape), one
    pruned key-set fetch of <= |queries| x fb_docs feedback texts in
    between; every score is an integer so any partitioning agrees bit
    for bit.  -> (query_id, rank, doc_id, score_e6).
    """
    weighted, _fb = rm3_expansions(
        ds, queries, fb_docs, fb_terms, orig_weight, exp_weight,
        id_column, text_column,
    )
    return _weighted_bm25_pass(ds, weighted, k, id_column, text_column)
