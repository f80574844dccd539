"""Deterministic sampling operators for training-data curation.

A 100-TB corpus pipeline samples constantly (data mixes, eval holdouts,
ablation subsets).  Random sampling is irreproducible and unverifiable;
these operators key every decision on a HASH of a stable id, so

* the sample is a pure function of (id, seed, fraction) - rerunning a
  failed partition reproduces the same rows (resumable output),
* membership is decidable ROW-LOCALLY inside ``map_batches`` - no
  shuffle, no coordination, perfectly linear at any scale,
* an oracle (DuckDB ``md5``) can recompute the exact member set.

The decision function: ``md5("<seed>:<id>")`` interpreted as a hex
string; a row is kept when the first 8 hex chars (32 bits, uniform)
fall below ``fraction``.  Granularity 1/2^32.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SCALE = 1 << 32


def _bucket32(seed: str, key: str) -> int:
    """First 32 bits of md5("<seed>:<key>") - the sampling coordinate."""
    return int(
        hashlib.md5(("%s:%s" % (seed, key)).encode("utf-8")).hexdigest()[:8],
        16,
    )


def hash_sample(ds, id_column: str, fraction: float, seed: str = "0"):
    """Keep each row iff its id's hash coordinate < fraction (stateless
    row-local filter; deterministic, resumable, oracle-recomputable)."""
    threshold = int(fraction * _SCALE)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        mask = pa.array(
            [_bucket32(seed, str(i)) < threshold for i in ids], pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def shuffle_shards(ds, id_column: str, num_shards: int, seed: str = "0"):
    """Deterministic global shuffle into ordered shards - the
    training-data writer's layout step.

    Each row gets ``shuffle_key = hash32(seed, id)``; rows land in
    ``shard = key % num_shards`` and are ranked inside their shard by
    ``(key, id)``.  The concatenation shard 0..S-1 in rank order IS a
    uniform seeded permutation of the corpus, yet:

    * assignment is row-local (one ``map_batches``), the only exchange
      is ONE hash-keyed ``groupby(shard)`` shuffle,
    * layout is a pure function of (ids, seed) - a failed shard can be
      rewritten alone (resumable output), and an oracle (DuckDB md5 +
      window rank) recomputes it exactly,
    * at 100 TB pick ``num_shards`` so one shard (~corpus/S) fits a
      task's heap, e.g. S = 1e5 for ~GB shards; shard files then map
      1:1 to output parquet parts.
    """

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        keys = [_bucket32(seed, str(i)) for i in ids]
        batch = batch.append_column("shuffle_key", pa.array(keys, pa.int64()))
        return batch.append_column(
            "shard", pa.array([k % num_shards for k in keys], pa.int32())
        )

    def rank_group(df):
        df = df.sort_values(["shuffle_key", id_column]).reset_index(drop=True)
        df["shard_pos"] = pa.array(range(len(df)), pa.int64()).to_pandas()
        return df

    ds = ds.map_batches(assign, batch_format="pyarrow")
    return ds.groupby("shard").map_groups(rank_group)


def stratified_sample(ds, id_column: str, strata_column: str,
                      fractions: dict, default_fraction: float = 0.0,
                      seed: str = "0"):
    """Per-stratum hash sampling (training-mix construction): stratum s
    keeps ``fractions.get(s, default_fraction)`` of its rows.  Still a
    stateless row-local filter - the strata map is broadcast inside the
    closure (small side, never shuffled)."""
    thresholds = {
        s: int(f * _SCALE) for s, f in fractions.items()
    }
    default_threshold = int(default_fraction * _SCALE)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        strata = batch.column(strata_column).to_pylist()
        mask = pa.array(
            [
                _bucket32(seed, str(i))
                < thresholds.get(s, default_threshold)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(
    ds,
    id_column: str,
    weight_column: str,
    k: int,
    seed: str = "0",
):
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis A-ES
    (Inf. Proc. Letters 97(5), 2006): each row gets the key
    ``ln(u) / w`` with ``u`` uniform in (0,1); the k LARGEST keys are a
    weighted sample without replacement.

    Determinism discipline: ``u = (h64 + 0.5) / 2^64`` from
    ``md5("<seed>:<id>")`` - a pure function of the id, same standard
    as the other sampling ops (reproducible, resumable, auditable).
    Keys are floor-quantized to ``score_e9`` int64 BEFORE ranking, so
    engine and oracle rank identical integers (ties to the smaller
    id); the only float is one fixed elementwise ``np.log`` expression.

    Ray shape: row-local scoring + per-batch partial top-k (combiner);
    only ``k x partitions`` slim rows reach the driver merge - no
    shuffle, linear at any scale.  Rows with weight <= 0 are excluded
    (they cannot be sampled under A-ES).

    Returns (id_column, weight_column, score_e9), score descending.
    """
    import heapq

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        w = np.asarray(batch.column(weight_column), dtype=np.float64)
        h = np.array(
            [
                int(
                    hashlib.md5(
                        ("%s:%s" % (seed, i)).encode("utf-8")
                    ).hexdigest()[:16],
                    16,
                )
                for i in ids
            ],
            dtype=np.float64,
        )
        u = (h + 0.5) / float(1 << 64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.log(u) / w
        ok = np.nonzero(w > 0)[0]
        score_e9 = np.floor(score[ok] * 1e9).astype(np.int64)
        ids_ok = [ids[i] for i in ok]
        sel = np.lexsort((ids_ok, -score_e9))[: min(k, len(ok))]
        order = ok[sel]
        score_e9 = score_e9[sel]
        return pa.table(
            {
                id_column: pa.array([ids[i] for i in order]),
                weight_column: batch.column(weight_column).take(
                    pa.array(order, pa.int64())
                ),
                "score_e9": pa.array(score_e9, pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    top = heapq.nlargest(
        k, rows, key=lambda r: (r["score_e9"], _neg_id(r[id_column]))
    )
    return pa.table(
        {
            id_column: pa.array([r[id_column] for r in top]),
            weight_column: pa.array([r[weight_column] for r in top]),
            "score_e9": pa.array([r["score_e9"] for r in top], pa.int64()),
        }
    )


def _neg_id(v):
    """Ordering helper: ties on score prefer the SMALLER id for both
    int and string ids (max-heap key needs the inverse)."""
    if isinstance(v, (int,)):
        return -v
    return tuple(-b for b in str(v).encode("utf-8"))


# --------------------------------------------------------------------------
# token-budget mixture sampling (data mixing)


def mixture_sample(
    ds,
    budgets: dict,
    source_column: str = "source",
    token_column: str = "n_chars",
    id_column: str = "doc_id",
    seed: str = "0",
    mode: str = "group",
    bins: int = 256,
    max_pull: int = 65536,
):
    """Token-budget data mixing: per source, keep documents in
    deterministic hash order until the source's token budget is
    reached (the mixture-weighting step of LLM corpus assembly).

    Semantics (exactly the SQL window cumsum): rows of source ``s``
    are ordered by ``(hash32(seed, id), id)``; a row is kept iff its
    INCLUSIVE running ``token_column`` sum is ``<= budgets[s]``.
    Sources missing from ``budgets`` keep nothing.  Returns
    ``(id_column, source_column, keep)`` for every input row.

    Two exact implementations:

    * ``mode="group"``: ONE ``groupby(source)`` shuffle, vectorized
      sort + cumsum per group.  Assumes one source's rows fit a task -
      fine for few/medium sources, wrong for a source holding half the
      corpus.
    * ``mode="threshold"`` (the scale path): NO shuffle of the data at
      all.  The keep set is ``hash < T_s`` (plus an exact boundary-row
      tie rule), and each source's threshold is found by weighted
      histogram refinement over the 32-bit hash space - the same
      selection machinery as ``stages.quantiles`` with token sums as
      weights.  Per pass, only (sources x bins) counter rows cross the
      wire; the final bracket (<= ``max_pull`` rows) is pulled to
      resolve the boundary exactly, then membership is a row-local
      ``map_batches`` filter against the broadcast threshold table.
      Scales to any skew: a source with 10^9 docs costs the same
      counters as one with 10^2.
    """
    if mode == "group":
        return _mixture_sample_group(
            ds, budgets, source_column, token_column, id_column, seed
        )
    if mode != "threshold":
        raise ValueError("mode must be 'group' or 'threshold'")
    return _mixture_sample_threshold(
        ds,
        budgets,
        source_column,
        token_column,
        id_column,
        seed,
        bins,
        max_pull,
    )


def _hash_ids(ids, seed: str):
    import numpy as np

    return np.asarray(
        [_bucket32(seed, str(i)) for i in ids], dtype=np.int64
    )


def _mixture_sample_group(
    ds, budgets, source_column, token_column, id_column, seed
):
    import numpy as np
    import pandas as pd

    def per_source(group: pd.DataFrame) -> pd.DataFrame:
        src = group[source_column].iloc[0]
        budget = budgets.get(src)
        if budget is None:
            return pd.DataFrame(
                {
                    id_column: group[id_column],
                    source_column: group[source_column],
                    "keep": np.zeros(len(group), dtype=bool),
                }
            )
        h = _hash_ids(group[id_column].tolist(), seed)
        order = np.lexsort((group[id_column].to_numpy(), h))
        toks = group[token_column].to_numpy()[order]
        keep_sorted = np.cumsum(toks) <= budget
        keep = np.empty(len(group), dtype=bool)
        keep[order] = keep_sorted
        return pd.DataFrame(
            {
                id_column: group[id_column],
                source_column: group[source_column],
                "keep": keep,
            }
        )

    return (
        ds.select_columns([id_column, source_column, token_column])
        .groupby(source_column)
        .map_groups(per_source, batch_format="pandas")
    )


def _mixture_sample_threshold(
    ds, budgets, source_column, token_column, id_column, seed, bins, max_pull
):
    import numpy as np

    proj = ds.select_columns(
        [id_column, source_column, token_column]
    ).materialize()

    # state per source: bracket [lo, hi] over hash space, tokens/rows
    # already accounted below lo, and the resolved boundary
    state = {
        s: {
            "lo": 0,
            "hi": (1 << 32) - 1,
            "tok_before": 0,
            "resolved": False,
            # boundary: (hash, id) of the LAST kept row; None while
            # unresolved; (-1, -1) = keep nothing
            "boundary": None,
        }
        for s in budgets
    }

    for _ in range(16):  # 32-bit domain / 256 bins -> <= 4 real rounds
        active = {s: st for s, st in state.items() if not st["resolved"]}
        if not active:
            break
        plans = {
            s: (st["lo"], st["hi"], max(1, (st["hi"] - st["lo"] + 1 + bins - 1) // bins))
            for s, st in active.items()
        }

        import pyarrow as pa

        def weigh(batch: pa.Table, plans=dict(plans)) -> pa.Table:
            srcs = batch.column(source_column).to_pylist()
            ids = batch.column(id_column).to_pylist()
            toks = np.asarray(
                batch.column(token_column).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            h = _hash_ids(ids, seed)
            out_s, out_b, out_t, out_r = [], [], [], []
            srcs_arr = np.asarray(srcs, dtype=object)
            for s, (lo, hi, width) in plans.items():
                m = (srcs_arr == s) & (h >= lo) & (h <= hi)
                if not m.any():
                    continue
                b = (h[m] - lo) // width
                for bb in np.unique(b):
                    sel = b == bb
                    out_s.append(s)
                    out_b.append(int(bb))
                    out_t.append(int(toks[m][sel].sum()))
                    out_r.append(int(sel.sum()))
            return pa.table(
                {
                    "s": pa.array(out_s, pa.string()),
                    "bin": pa.array(out_b, pa.int64()),
                    "tok": pa.array(out_t, pa.int64()),
                    "rows": pa.array(out_r, pa.int64()),
                }
            )

        hist = (
            proj.map_batches(weigh, batch_format="pyarrow")
            .groupby(["s", "bin"])
            .sum(["tok", "rows"])
            .to_pandas()
        )
        for s, st in active.items():
            lo, hi, width = plans[s]
            budget_left = budgets[s] - st["tok_before"]
            rows = hist[hist["s"] == s].sort_values("bin")
            cum_tok = 0
            placed = False
            for _, r in rows.iterrows():
                b, btok, brows = int(r["bin"]), int(r["sum(tok)"]), int(r["sum(rows)"])
                if cum_tok + btok > budget_left:
                    # boundary falls inside this bin
                    st["tok_before"] += cum_tok
                    st["lo"] = lo + b * width
                    st["hi"] = min(lo + (b + 1) * width - 1, hi)
                    if brows <= max_pull:
                        _resolve_boundary(
                            proj,
                            st,
                            s,
                            budgets[s],
                            source_column,
                            token_column,
                            id_column,
                            seed,
                        )
                    placed = True
                    break
                cum_tok += btok
            if not placed:
                # whole bracket fits in budget: keep everything
                st["resolved"] = True
                st["boundary"] = ((1 << 32), 0)

    if any(not st["resolved"] for st in state.values()):
        raise RuntimeError("mixture threshold refinement did not resolve")

    import pyarrow as pa

    bounds = {s: st["boundary"] for s, st in state.items()}

    def flag(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_column).to_pylist()
        ids = batch.column(id_column).to_pylist()
        h = _hash_ids(ids, seed)
        keep = np.zeros(len(ids), dtype=bool)
        for i, (s, hid, rid) in enumerate(zip(srcs, h, ids)):
            bnd = bounds.get(s)
            if bnd is None:
                continue
            bh, bid = bnd
            keep[i] = hid < bh or (hid == bh and rid <= bid)
        return pa.table(
            {
                id_column: batch.column(id_column),
                source_column: batch.column(source_column),
                "keep": pa.array(keep),
            }
        )

    return proj.map_batches(flag, batch_format="pyarrow")


def _resolve_boundary(
    proj, st, s, budget, source_column, token_column, id_column, seed
):
    """Pull the (bounded) bracket rows for one source and fix the exact
    boundary (hash, id) of the last kept row."""
    import numpy as np
    import pyarrow as pa

    lo, hi = st["lo"], st["hi"]

    def in_bracket(batch: pa.Table) -> pa.Table:
        srcs = np.asarray(batch.column(source_column).to_pylist(), object)
        ids = batch.column(id_column).to_pylist()
        h = _hash_ids(ids, seed)
        m = (srcs == s) & (h >= lo) & (h <= hi)
        return batch.filter(pa.array(m))

    rows = []
    for b in proj.map_batches(
        in_bracket, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        ids = b.column(id_column).to_pylist()
        toks = b.column(token_column).to_pylist()
        h = _hash_ids(ids, seed)
        rows.extend(zip(h.tolist(), ids, toks))
    rows.sort()
    cum = st["tok_before"]
    # even when nothing in the bracket fits, every row strictly below
    # the bracket is kept (it is already accounted in tok_before):
    # hash < lo, expressed as boundary (lo-1, max-id)
    boundary = (lo - 1, (1 << 63) - 1)
    for hh, rid, tok in rows:
        if cum + tok > budget:
            break
        cum += tok
        boundary = (hh, rid)
    st["boundary"] = boundary
    st["resolved"] = True


def diverse_sample(
    ds,
    quota_per_cluster: int = 8,
    n_lists: int = 16,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
):
    """Cluster-balanced (diversity) sampling over an embedding column:
    deterministic mini k-means centroids (similarity.train_centroids -
    id-decimated sample, seeded, oracle-replicable), then every vector
    is assigned to its nearest centroid and each cluster contributes
    its ``quota_per_cluster`` lowest-hash members - the embedding-space
    analog of stratified sampling (cluster-balanced data selection,
    cf. SemDeDup / DiverseEvol style curation).

    Exchange shape: one broadcast of the (tiny) centroid matrix, one
    vectorized assignment pass, then the per-group top-k exchange of
    slim (id, cluster, priority) rows.  -> (vec_id, cluster, rank).
    """
    import pandas as pd
    import ray

    from .ranking import topk_per_group
    from .similarity import _normalize, train_centroids

    cent = train_centroids(
        ds, n_lists=n_lists, vec_column=vec_column, id_column=id_column
    )
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = np.asarray(batch.column(id_column).to_pylist(), dtype=np.int64)
        mat = _normalize(
            np.array(batch.column(vec_column).to_pylist(), dtype=np.float32)
        )
        cluster = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        # deterministic sampling priority: SipHash of the id; negated so
        # the DESC top-k picks the LOWEST hashes
        prio = pd.util.hash_array(np.ascontiguousarray(ids))
        neg_prio = -(prio.view(np.int64))
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(cluster, pa.int64()),
                "neg_priority": pa.array(neg_prio, pa.int64()),
            }
        )

    assigned = ds.select_columns([id_column, vec_column]).map_batches(
        assign, batch_format="pyarrow"
    )
    out = topk_per_group(
        assigned,
        group_column="cluster",
        score_column="neg_priority",
        tie_column=id_column,
        k=quota_per_cluster,
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_column: batch.column(id_column),
                "cluster": batch.column("cluster"),
                "rank": pc.cast(batch.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
