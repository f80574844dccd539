"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk``: exact cosine top-k of every row against a small
  broadcast query matrix - ``ray.put`` the queries once, numpy matmul
  per batch, per-batch partial top-k, final exact merge on the driver
  (the classic scatter-gather ANN baseline).
* ``ivf_topk``: IVF-style scale path - k-means-lite centroids (sampled,
  deterministic), every row assigned to its nearest centroid in
  ``map_batches``, queries probe only ``nprobe`` nearest lists via a
  ``groupby(list_id)`` search (documented recall < 1).
* ``lsh_topk``: random-hyperplane LSH scale path - seeded signature
  bits assigned row-locally, queries multi-probe their signature's
  Hamming-1 neighbourhood via a ``groupby(bucket)`` search (documented
  recall < 1; no training pass at all, unlike IVF).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _merge_topk(partials, k: int) -> pa.Table:
    """Exact driver-side merge of per-partition partial top-k rows
    (only k x Q x partitions rows ever reach the driver): similarity
    desc, ties by smaller vec_id."""
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []),
            (float(r["cosine"]), -int(r["vec_id"])),
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    o_q, o_rank, o_id, o_c = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (c, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(c)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int32()),
            "rank": pa.array(o_rank, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine": pa.array(o_c, pa.float64()),
        }
    )


def lsh_planes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Seeded random hyperplanes - shared by the distributed path and
    the sequential oracle (bit-identical)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack sign bits of the hyperplane projections into uint32
    bucket ids (row-local, no training)."""
    bits = (mat @ planes.T) > 0  # (N, n_bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint32)).astype(np.uint32)
    return (bits.astype(np.uint32) * weights).sum(axis=1, dtype=np.uint32)


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    probe_hamming: int = 1,
    seed: int = 7,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Random-hyperplane LSH approximate top-k (scale path).

    Rows bucket by signature in ONE row-local ``map_batches``; each
    query probes its own bucket plus every bucket within
    ``probe_hamming`` bit flips (1 + n_bits buckets at the default).
    The only exchange is the ``groupby(bucket)`` shuffle; the query
    matrix and probe map are ``ray.put`` once.  Recall < 1 (candidates
    outside the probed buckets are unseen) - raise ``n_bits`` for
    smaller buckets, ``probe_hamming`` for recall."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    planes = lsh_planes(q.shape[1], n_bits, seed)
    qsigs = lsh_signatures(q, planes)
    probe_map: dict[int, list[int]] = {}
    for qi, sig in enumerate(map(int, qsigs)):
        buckets = {sig}
        if probe_hamming >= 1:
            buckets |= {sig ^ (1 << b) for b in range(n_bits)}
        if probe_hamming >= 2:
            buckets |= {
                sig ^ (1 << a) ^ (1 << b)
                for a in range(n_bits)
                for b in range(a + 1, n_bits)
            }
        for bkt in buckets:
            probe_map.setdefault(bkt, []).append(qi)
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_map)

    def assign(batch: pa.Table) -> pa.Table:
        p = ray.get(planes_ref)
        mat = _normalize(np.array(batch.column(vec_column).to_pylist(), dtype=np.float32))
        sigs = lsh_signatures(mat, p).astype(np.int64)
        return batch.append_column("bucket", pa.array(sigs, pa.int64()))

    def search(group: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        probes = ray.get(probe_ref)
        qids = probes.get(int(group["bucket"].iloc[0]), [])
        if not qids:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        group = group.sort_values(id_column)
        mat = _normalize(np.array(group[vec_column].tolist(), dtype=np.float32))
        ids = group[id_column].to_numpy()
        sims = qm[qids] @ mat.T
        o_q, o_id, o_c = [], [], []
        kk = min(k, sims.shape[1])
        for row, qi in enumerate(qids):
            idx = np.lexsort((ids, -sims[row]))[:kk]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_c.append(float(sims[row, j]))
        return pd.DataFrame({"query_id": o_q, "vec_id": o_id, "cosine": o_c})

    partials = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(search, batch_format="pandas")
        .take_all()
    )
    return _merge_topk(partials, k)


def quantize_int8(mat: np.ndarray) -> np.ndarray:
    """Symmetric int8 quantization of L2-normalized vectors: the
    QUANTIZATION SPEC shared with the sequential oracle (re-derived
    there, not imported).  Elementwise float ops on the normalized
    row + round-half-even -> bit-reproducible for a given row; all
    downstream ranking math is integer."""
    mat = np.asarray(mat, dtype=np.float32)
    n = np.linalg.norm(mat, axis=1, keepdims=True).astype(np.float32)
    n[n == 0] = 1.0
    return np.clip(np.rint((mat / n) * 127.0), -127, 127).astype(np.int8)


def int8_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Quantized exact-scan top-k: embeddings are symmetric-int8
    quantized per row (4x smaller than float32, 8-bit integer SIMD
    matmuls on real hardware) and ranked by the EXACT int32 dot
    product of quantized vectors (~127^2 * cosine).  Unlike the float
    cosine path, every score is integer, so the distributed result is
    bit-identical to a sequential scan regardless of batch shape or
    reduce order - the scale-path trade is quantization error (rank
    flips only where true cosines differ by < ~1/127), not
    nondeterminism.

    Ray shape mirrors ``brute_force_topk``: ``ray.put`` the quantized
    query matrix once, per-batch integer matmul + partial top-k
    (combiner), exact driver merge of k x Q x partitions slim rows.

    Returns (query_id, rank, vec_id, qdot) - ``qdot`` is the raw
    int32 dot; ties break toward the smaller vec_id.
    """
    import ray

    q8 = quantize_int8(np.asarray(queries, dtype=np.float32)).astype(np.int32)
    q_ref = ray.put(q8)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        m8 = quantize_int8(
            np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        ).astype(np.int32)
        dots = qm @ m8.T  # (Q, B) int32, exact: |dot| <= 127^2 * dim
        o_q, o_id, o_d = [], [], []
        kk = min(k, dots.shape[1])
        for qi in range(dots.shape[0]):
            idx = np.lexsort((ids, -dots[qi]))[:kk]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_d.append(int(dots[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int32()),
                "vec_id": pa.array(o_id, pa.int64()),
                "qdot": pa.array(o_d, pa.int64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []),
            (int(r["qdot"]), -int(r["vec_id"])),
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    o_q, o_rank, o_id, o_d = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (d, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_d.append(d)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int32()),
            "rank": pa.array(o_rank, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "qdot": pa.array(o_d, pa.int64()),
        }
    )


def _exact_floor_e4(a: np.ndarray, b: np.ndarray) -> int:
    """``floor(1e4 * cos(a, b))`` decided by EXACT rational arithmetic
    over the float values (every float converts to a Fraction exactly).

    Float cosine quantization is knife-edged precisely where it matters
    structurally: a self-pair's cosine is exactly 1.0, and float32 GEMM
    layout noise can land at 0.99999994 (floor -> 9999) while a float64
    oracle sees 1.0 (-> 10000).  The integer test
    ``t <= 1e4 * dot / sqrt(na * nb)  <=>  sign-aware t^2 * na * nb vs
    (1e4 * dot)^2`` removes the sqrt and the rounding, so the boundary
    case is decided correctly regardless of summation order."""
    import math
    from fractions import Fraction

    fa = [Fraction(float(x)) for x in a]
    fb = [Fraction(float(x)) for x in b]
    num = 10**4 * sum(x * y for x, y in zip(fa, fb))
    p = sum(x * x for x in fa) * sum(y * y for y in fb)
    if p == 0:
        return 0

    def le(t: int) -> bool:  # t <= num / sqrt(p) ?
        if num >= 0:
            return t <= 0 or t * t * p <= num * num
        return t < 0 and t * t * p >= num * num

    t = int(math.floor(float(num) / math.sqrt(float(p))))
    while not le(t):
        t -= 1
    while le(t + 1):
        t += 1
    return t


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    where: tuple | None = None,
    exact_e4: bool = False,
):
    """Exact top-k by cosine: returns a pyarrow Table
    (query_id, rank, vec_id, cosine), ties broken by smaller vec_id.
    ``where=(column, value)`` applies a vectorized equality prefilter
    INSIDE the scan task, before the matmul (filtered vector search);
    fully-filtered batches emit an empty table in the OUTPUT schema so
    the streaming executor sees one schema throughout.  ``exact_e4``
    appends a ``cosine_e4`` column holding ``floor(1e4 * cosine)``
    decided by exact rational arithmetic for the k selected pairs per
    batch (see :func:`_exact_floor_e4`); ranking stays float32."""
    import ray

    q64 = np.asarray(queries, dtype=np.float64)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put((q, q64.astype(np.float32).astype(np.float64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if where is not None:
            import pyarrow.compute as _pc

            batch = batch.filter(_pc.equal(batch.column(where[0]), where[1]))
        if batch.num_rows == 0:
            cols = {
                "query_id": pa.array([], pa.int32()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
            if exact_e4:
                cols["cosine_e4"] = pa.array([], pa.int64())
            return pa.table(cols)
        qm, qraw = ray.get(q_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        raw = np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        mat = _normalize(raw)
        sims = qm @ mat.T  # (Q, B)
        o_q, o_id, o_c, o_e4 = [], [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # partial top-k inside the batch (combiner before the merge)
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_c.append(float(sims[qi, j]))
                if exact_e4:
                    o_e4.append(
                        _exact_floor_e4(qraw[qi], raw[j].astype(np.float64))
                    )
        cols = {
            "query_id": pa.array(o_q, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine": pa.array(o_c, pa.float64()),
        }
        if exact_e4:
            cols["cosine_e4"] = pa.array(o_e4, pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        # heap key: (cosine, -vec_id) so ties prefer the SMALLER vec_id
        heapq.heappush(
            heaps.setdefault(r["query_id"], []),
            (r["cosine"], -r["vec_id"], r.get("cosine_e4", 0)),
        )
        if len(heaps[r["query_id"]]) > k:
            heapq.heappop(heaps[r["query_id"]])
    o_q, o_rank, o_id, o_c, o_e4 = [], [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (c, nid, e4) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(c)
            o_e4.append(e4)
    cols = {
        "query_id": pa.array(o_q, pa.int32()),
        "rank": pa.array(o_rank, pa.int32()),
        "vec_id": pa.array(o_id, pa.int64()),
        "cosine": pa.array(o_c, pa.float64()),
    }
    if exact_e4:
        cols["cosine_e4"] = pa.array(o_e4, pa.int64())
    return pa.table(cols)


def label_filtered_topk(
    ds,
    query_rows: list,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    label_column: str = "label",
) -> pa.Table:
    """Metadata-filtered vector search: each query sees only candidates
    sharing its label.  The predicate is pushed INTO the candidate scan
    (one vectorized Arrow mask per batch, BEFORE the matmul) rather
    than post-filtering a wider unfiltered top-k — post-filtering can
    silently return fewer than k survivors and wastes distance compute
    on rows the filter would drop.  Queries are grouped by label so
    each label's candidate scan runs once (|distinct labels| passes;
    at open-web scale you'd instead partition the corpus by the filter
    key once and route each query group to its partition).

    ``query_rows``: [(query_id, label, vector)];
    -> (query_id, rank, vec_id, cosine) with true query ids.
    """
    by_label: dict = {}
    for qid, lab, vec in query_rows:
        by_label.setdefault(lab, []).append((qid, vec))
    tables = []
    for lab in sorted(by_label):
        group = sorted(by_label[lab])
        t = brute_force_topk(
            ds,
            np.array([v for _, v in group], dtype=np.float64),
            k=k,
            id_column=id_column,
            vec_column=vec_column,
            where=(label_column, lab),
            exact_e4=True,
        )
        qids = pa.array(
            [group[i][0] for i in t.column("query_id").to_pylist()], pa.int32()
        )
        tables.append(
            t.set_column(t.schema.get_field_index("query_id"), "query_id", qids)
        )
    return pa.concat_tables(tables)


def _decimated_sample(ds, id_column: str, vec_column: str,
                      max_sample: int) -> np.ndarray:
    """The shared deterministic training-sample SPEC: modulo-decimation
    on the id column (``id % stride == 0``) read in id order — NO
    distributed RNG, so a sequential oracle replicates it bit-for-bit.
    Used by BOTH centroid trainers (IVF + PQ); change it in one place
    only."""
    import pyarrow.compute as pc

    total = ds.count()
    stride = max(1, (total + max_sample - 1) // max_sample)
    sampled = ds
    if stride > 1:
        sampled = ds.map_batches(
            lambda t: t.filter(
                pc.equal(pc.mod(t.column(id_column), stride), 0)
            ),
            batch_format="pyarrow",
        )
    rows = sorted(
        sampled.select_columns([id_column, vec_column]).take_all(),
        key=lambda r: r[id_column],
    )[:max_sample]
    return np.array([r[vec_column] for r in rows], dtype=np.float32)


def train_centroids(ds, n_lists: int = 16, vec_column: str = "embedding",
                    iters: int = 5, seed: int = 23, id_column: str = "vec_id",
                    max_sample: int = 4096) -> np.ndarray:
    """Deterministic mini k-means on the shared decimated sample
    (driver-side; the sample is small by construction)."""
    vecs = _decimated_sample(ds, id_column, vec_column, max_sample)
    return kmeans_lite(vecs, n_lists, iters, seed)


def kmeans_lite(vecs: np.ndarray, n_lists: int, iters: int = 5, seed: int = 23) -> np.ndarray:
    """Pure-numpy seeded mini k-means on normalized vectors - shared by
    the distributed path and the sequential oracle (bit-identical)."""
    vecs = _normalize(np.asarray(vecs, dtype=np.float32))
    rng = np.random.default_rng(seed)
    cent = vecs[rng.choice(len(vecs), size=min(n_lists, len(vecs)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(vecs @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = vecs[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """IVF-bucketed approximate top-k (scale path)."""
    import ray

    cent = train_centroids(ds, n_lists, vec_column)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [set(map(int, row)) for row in probes]
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_sets)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _normalize(np.array(batch.column(vec_column).to_pylist(), dtype=np.float32))
        lists = np.argmax(mat @ c.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lists, pa.int32()))

    def search(group: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        psets = ray.get(probe_ref)
        lid = int(group["list_id"].iloc[0])
        qids = [qi for qi, s in enumerate(psets) if lid in s]
        if not qids:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        # sort the list members by id so the partial top-k (incl. float
        # tie-breaks) is independent of Ray's within-group row order
        group = group.sort_values(id_column)
        mat = _normalize(np.array(group[vec_column].tolist(), dtype=np.float32))
        ids = group[id_column].to_numpy()
        sims = qm[qids] @ mat.T
        o_q, o_id, o_c = [], [], []
        kk = min(k, sims.shape[1])
        for row, qi in enumerate(qids):
            # deterministic selection: by similarity desc, ties by id asc
            idx = np.lexsort((ids, -sims[row]))[:kk]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_c.append(float(sims[row, j]))
        return pd.DataFrame({"query_id": o_q, "vec_id": o_id, "cosine": o_c})

    partials = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(search, batch_format="pandas")
        .take_all()
    )
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []), (r["cosine"], -int(r["vec_id"]))
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    o_q, o_rank, o_id, o_c = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (c, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(c)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int32()),
            "rank": pa.array(o_rank, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine": pa.array(o_c, pa.float64()),
        }
    )


def hard_negatives(
    ds,
    queries: np.ndarray,
    query_labels: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    label_column: str = "label",
):
    """Contrastive hard-negative mining: for each query vector, the
    top-``k`` most-cosine-similar corpus vectors with a DIFFERENT
    label (and a different id) - the standard retrieval-training
    negatives pass (e.g. DPR, Karpukhin et al. 2020).

    Same scale shape as :func:`brute_force_topk`: queries broadcast
    once, per-batch vectorized matmul + label mask + partial top-k
    combiner, driver merges only ``k x Q x num_blocks`` slim rows.
    Returns (query_id, rank, vec_id, cosine); ties prefer smaller
    vec_id.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_labels = np.asarray(query_labels)
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((q, q_labels, q_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, ql, qi_ids = ray.get(q_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        labels = batch.column(label_column).to_numpy(zero_copy_only=False)
        mat = _normalize(
            np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        )
        sims = qm @ mat.T  # (Q, B)
        # mask same-label columns and the query row itself
        same_label = ql[:, None] == labels[None, :]
        same_id = qi_ids[:, None] == ids[None, :]
        sims = np.where(same_label | same_id, -np.inf, sims)
        o_q, o_id, o_c = [], [], []
        for qi in range(sims.shape[0]):
            valid = np.isfinite(sims[qi])
            nv = int(valid.sum())
            if nv == 0:
                continue
            kk = min(k, nv)
            cand = np.nonzero(valid)[0]
            idx = cand[np.argpartition(-sims[qi][cand], kk - 1)[:kk]]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_c.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int32()),
                "vec_id": pa.array(o_id, pa.int64()),
                "cosine": pa.array(o_c, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(r["query_id"], []), (r["cosine"], -r["vec_id"])
        )
        if len(heaps[r["query_id"]]) > k:
            heapq.heappop(heaps[r["query_id"]])
    o_q, o_rank, o_id, o_c = [], [], [], []
    for qi in sorted(heaps):
        best = sorted(heaps[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (c, nid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(-nid)
            o_c.append(c)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int32()),
            "rank": pa.array(o_rank, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "cosine": pa.array(o_c, pa.float64()),
        }
    )


def kmeans_assign_exact(
    ds,
    k: int = 8,
    quant: int = 1000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """One exact Lloyd ASSIGN step: every vector is assigned to the
    nearest of ``k`` deterministic centroids (the vectors with
    ``id < k``) by squared L2 over floor(x*quant)-quantized int64
    coordinates - ties break to the smallest centroid id.  All-integer
    distance algebra, so any partitioning/execution order agrees bit
    for bit with the cross-join SQL oracle (the building block the IVF
    index's ``kmeans_lite`` trainer iterates; surfaced here as a
    certified operator).

    Ray shape: the k centroid rows are collected once (a filtered
    point read, k rows), quantized, ``ray.put`` broadcast; each batch
    computes distances via the |a|^2 - 2a.c + |c|^2 expansion in int64
    matmul (exact - no float dot products) and appends (cluster, d2).
    Zero shuffle.
    """
    import ray

    def _quantize(mat: np.ndarray) -> np.ndarray:
        q = np.floor(mat.astype(np.float64) * float(quant))
        assert np.abs(q).max(initial=0.0) < 2**31, "quantized coords overflow"
        return q.astype(np.int64)

    cent_tab = pa.concat_tables(
        ds.filter(expr="%s < %d" % (id_column, k))
        .select_columns([id_column, vec_column])
        .iter_batches(batch_format="pyarrow")
    )
    order = np.argsort(cent_tab.column(id_column).to_numpy(zero_copy_only=False))
    cents = _quantize(
        np.stack(
            [
                np.asarray(v, dtype=np.float64)
                for v in cent_tab.column(vec_column).to_pylist()
            ]
        )[order]
    )
    cent_ids = cent_tab.column(id_column).to_numpy(zero_copy_only=False)[order]
    cent_ref = ray.put((cent_ids.astype(np.int64), cents))

    def assign(batch: pa.Table) -> pa.Table:
        ids, cmat = ray.get(cent_ref)
        col = batch.column(vec_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        mat = _quantize(flat.reshape(batch.num_rows, -1))
        # |a|^2 - 2 a.c + |c|^2, all int64 (exact)
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2 * (mat @ cmat.T)
            + (cmat * cmat).sum(axis=1)[None, :]
        )
        best = np.argmin(d2, axis=1)  # first occurrence = smallest cid
        return pa.table(
            {
                id_column: batch.column(id_column),
                "cluster": pa.array(ids[best], pa.int64()),
                "d2": pa.array(d2[np.arange(len(best)), best], pa.int64()),
            }
        )

    return ds.select_columns([id_column, vec_column]).map_batches(
        assign, batch_format="pyarrow"
    )


def group_centroids(
    docs_ds,
    embs_ds,
    quant: int = 1000,
    group_column: str = "lang",
    doc_id_column: str = "doc_id",
    vec_id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Per-group embedding centroid in exact integers: for every
    ``group_column`` value, the count of vectors and the per-dimension
    sum of floor(x*quant)-quantized coordinates (long format - one row
    per (group, dim)).  Downstream consumers divide sum/n for the
    float centroid; keeping the SUM exact makes the operator
    associative and certifiable under any partitioning.

    Ray shape: acero cannot carry list<float> as a join payload (see
    docs_embeddings), and exploding to (vec, dim) rows would inflate
    the exchange 64x - so each vector is packed into ONE int32 binary
    cell (dim x 4 bytes) BEFORE the hash join with the slim (doc_id,
    group) stream.  After the join a per-batch combiner unpacks the
    buffers (one np.frombuffer per batch) and folds them into (group,
    dim) partial sums; ONE groups*dims-sized groupby merges partials.
    """
    from ray.data.aggregate import Sum

    from .dedup import _default_partitions

    def pack(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        q = np.floor(flat * float(quant))
        assert np.abs(q).max(initial=0.0) < 2**31, "quantized coords overflow"
        mat = q.astype(np.int32).reshape(batch.num_rows, -1)
        return pa.table(
            {
                vec_id_column: batch.column(vec_id_column),
                "qvec": pa.array([row.tobytes() for row in mat], pa.binary()),
            }
        )

    joined = docs_ds.join(
        embs_ds.map_batches(pack, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_default_partitions(None),
        on=(doc_id_column,),
        right_on=(vec_id_column,),
    )

    def fold(batch: pa.Table) -> pa.Table:
        groups = np.asarray(batch.column(group_column).to_pylist(), dtype=object)
        bufs = batch.column("qvec").to_pylist()
        if not bufs:
            return pa.table(
                {
                    group_column: pa.array([], pa.string()),
                    "dim": pa.array([], pa.int64()),
                    "n_part": pa.array([], pa.int64()),
                    "sum_part": pa.array([], pa.int64()),
                }
            )
        mat = np.frombuffer(b"".join(bufs), dtype=np.int32).reshape(
            len(bufs), -1
        ).astype(np.int64)
        dims = mat.shape[1]
        out_g: list[str] = []
        out_d: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for g in sorted(set(groups.tolist())):
            sub = mat[groups == g]
            out_g.extend([g] * dims)
            out_d.append(np.arange(dims, dtype=np.int64))
            out_n.append(np.full(dims, len(sub), dtype=np.int64))
            out_s.append(sub.sum(axis=0))
        return pa.table(
            {
                group_column: pa.array(out_g, pa.string()),
                "dim": pa.array(np.concatenate(out_d), pa.int64()),
                "n_part": pa.array(np.concatenate(out_n), pa.int64()),
                "sum_part": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    return (
        joined.map_batches(fold, batch_format="pyarrow")
        .groupby([group_column, "dim"])
        .aggregate(
            Sum("n_part", alias_name="n_vecs"),
            Sum("sum_part", alias_name="sum_q"),
        )
    )


PQ_QSHIFT = 1 << 20  # subvector quantization step for exact int distances


def kmeans_plain(vecs: np.ndarray, k: int, iters: int = 5, seed: int = 23) -> np.ndarray:
    """Seeded mini k-means WITHOUT row normalization (Euclidean
    assignment, plain mean updates) — the product-quantization
    codebook trainer (subvectors are not unit vectors).  Shared SPEC
    with the golden freezer's independent re-implementation."""
    vecs = np.asarray(vecs, dtype=np.float32)
    rng = np.random.default_rng(seed)
    cent = vecs[rng.choice(len(vecs), size=min(k, len(vecs)), replace=False)].copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(cent.shape[0]):
            members = vecs[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train_codebooks(ds, m: int = 8, n_codes: int = 16,
                       vec_column: str = "embedding",
                       id_column: str = "vec_id",
                       max_sample: int = 4096) -> np.ndarray:
    """Per-subspace PQ codebooks (Jegou, Douze & Schmid 2011) from the
    SAME deterministic modulo-decimation sample as ``train_centroids``
    (id % stride == 0, id order, no distributed RNG) — a sequential
    oracle replicates training bit-for-bit.  -> (m, n_codes, dim/m)."""
    sample = _normalize(
        _decimated_sample(ds, id_column, vec_column, max_sample)
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError("dim %d not divisible by m=%d" % (dim, m))
    sub = dim // m
    return np.stack(
        [
            kmeans_plain(sample[:, i * sub : (i + 1) * sub], n_codes)
            for i in range(m)
        ]
    )


def _pq_int(mat: np.ndarray) -> np.ndarray:
    """floor(float64(x) * 2^20) — the exact-integer quantization SPEC
    for PQ assignment and ADC lookups (headroom: normalized coords in
    [-1, 1] => squared diffs <= 4*2^40; x dim x m < 2^48 per score)."""
    return np.floor(mat.astype(np.float64) * PQ_QSHIFT).astype(np.int64)


def pq_topk(
    ds,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_max_id: int = 5,
):
    """Product-quantization ADC top-k (Jegou, Douze & Schmid 2011, the
    billion-vector scale path): vectors collapse to ``m`` one-byte
    codes (here 8 bytes vs 256 float bytes, 32x), queries rank the
    whole corpus by ``m`` table lookups per vector instead of a
    ``dim``-wide multiply.

    Determinism: codebooks are trained on the deterministic
    modulo-decimation sample; code ASSIGNMENT and the ADC distance
    tables use exact int64 squared distances over the floor(x * 2^20)
    quantization spec — every score is an integer, so the distributed
    result is bit-identical to a sequential scan under ANY batch
    decomposition (the int8_topk discipline applied to PQ).

    Ray shape: codebooks (float + int form) ``ray.put`` once; per-batch
    encode (m x n_codes x B integer distance argmins) + LUT gather +
    partial top-k combiner; O(k x Q x blocks) slim rows to the driver
    merge.  -> (query_id, rank, vec_id, adist) — adist ascending, ties
    toward the smaller vec_id.
    """
    import heapq

    import ray

    books = pq_train_codebooks(
        ds, m=m, n_codes=n_codes, vec_column=vec_column, id_column=id_column
    )
    books_int = _pq_int(books)  # (m, n_codes, sub)

    # queries: the first ids, same convention as the sibling knn ops —
    # a FILTERED point read (query_max_id rows), never a full take_all
    q_rows = sorted(
        ds.filter(expr="%s < %d" % (id_column, query_max_id))
        .select_columns([id_column, vec_column])
        .take_all(),
        key=lambda r: r[id_column],
    )
    qmat = _normalize(np.array([r[vec_column] for r in q_rows], dtype=np.float32))
    q_int = _pq_int(qmat)  # (Q, dim)
    sub = books.shape[2]
    # ADC tables: (Q, m, n_codes) exact int64 squared distances
    luts = np.stack(
        [
            (
                (
                    q_int[:, i * sub : (i + 1) * sub][:, None, :]
                    - books_int[i][None, :, :]
                )
                ** 2
            ).sum(axis=2)
            for i in range(m)
        ],
        axis=1,
    )
    ref = ray.put((books_int, luts))

    def partial_topk(batch: pa.Table) -> pa.Table:
        b_int, b_luts = ray.get(ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        mat = _normalize(
            np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        )
        v_int = _pq_int(mat)  # (B, dim)
        nq = b_luts.shape[0]
        scores = np.zeros((nq, len(ids)), dtype=np.int64)
        for i in range(m):
            d = (
                (v_int[:, i * sub : (i + 1) * sub][:, None, :] - b_int[i][None, :, :])
                ** 2
            ).sum(axis=2)  # (B, n_codes)
            codes = np.argmin(d, axis=1)  # first-min = smallest code id
            scores += b_luts[:, i, :][:, codes]
        o_q, o_id, o_d = [], [], []
        kk = min(k, len(ids))
        for qi in range(nq):
            idx = np.lexsort((ids, scores[qi]))[:kk]
            for j in idx:
                o_q.append(qi)
                o_id.append(int(ids[j]))
                o_d.append(int(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int32()),
                "vec_id": pa.array(o_id, pa.int64()),
                "adist": pa.array(o_d, pa.int64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    # keep the k smallest (adist, vec_id): min-heap on (-adist, -vec_id)
    # puts the WORST survivor (largest distance, then largest id) at the
    # root, so the pop evicts it and ties resolve toward smaller ids
    heaps: dict[int, list] = {}
    for r in partials:
        heapq.heappush(
            heaps.setdefault(int(r["query_id"]), []),
            (-int(r["adist"]), -int(r["vec_id"])),
        )
        if len(heaps[int(r["query_id"])]) > k:
            heapq.heappop(heaps[int(r["query_id"])])
    o_q, o_rank, o_id, o_d = [], [], [], []
    for qi in sorted(heaps):
        best = sorted((-nd, -nvid) for nd, nvid in heaps[qi])
        for rank, (d, vid) in enumerate(best):
            o_q.append(qi)
            o_rank.append(rank)
            o_id.append(vid)
            o_d.append(d)
    return pa.table(
        {
            "query_id": pa.array(o_q, pa.int32()),
            "rank": pa.array(o_rank, pa.int32()),
            "vec_id": pa.array(o_id, pa.int64()),
            "adist": pa.array(o_d, pa.int64()),
        }
    )
