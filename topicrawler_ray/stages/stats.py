"""Per-group sufficient-statistics analytics: streaming mean/variance
and z-score outlier flagging.

The aggregate-pushdown shape again (cf. stages/pca.py): per-group
``(n, sum, sum-of-squares)`` are EXACT int64 partials every block
computes locally; one slim groupby folds them, the driver broadcasts
the (few) group stats, and a second streaming pass flags each row -
the fact table never shuffles.

Outlier rule (k-sigma, population variance), evaluated WITHOUT ever
forming a mean or dividing:

    (n*x - S)^2  >  k^2 * (n*Sxx - S^2)

Both sides are converted to float64 from exact integer sufficient
statistics with a FIXED expression shape, so the distributed result is
bit-identical to any sequential (or SQL) evaluation of the same
expression - quantize float measures upstream.

Reference context: remstef/topicrawler tracks running perplexity
mean/stddev for its crawl threshold (A8, pipelines/perpeval.py); this
generalizes that to arbitrary grouped measures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def group_moments(ds, key: str, value: str):
    """-> driver dict ``key -> (n, S, Sxx)`` of exact int64 sufficient
    statistics (value must be an integer column)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, ginv = np.unique(keys, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        sxx = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, ginv, 1)
        np.add.at(s, ginv, v)
        np.add.at(sxx, ginv, v * v)
        return pa.table(
            {
                key: pa.array(list(uniq)),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "sxx": pa.array(sxx, pa.int64()),
            }
        )

    moments: dict = {}
    for b in (
        ds.select_columns([key, value])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for k_, n_, s_, sxx_ in zip(
            b.column(key).to_pylist(),
            b.column("n").to_pylist(),
            b.column("s").to_pylist(),
            b.column("sxx").to_pylist(),
        ):
            pn, ps, psxx = moments.get(k_, (0, 0, 0))
            moments[k_] = (pn + n_, ps + s_, psxx + sxx_)
    return moments


class OutlierFlagger:
    """Actor-pool stage: appends ``is_outlier`` via the integer-exact
    k-sigma rule (see module docstring)."""

    def __init__(self, moments_ref, key: str, value: str, k_sigma: float):
        import ray

        self.moments = ray.get(moments_ref)
        self.key = key
        self.value = value
        self.k2 = float(k_sigma) * float(k_sigma)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        v = (
            batch.column(self.value)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        nf = np.empty(len(keys), dtype=np.float64)
        sf = np.empty(len(keys), dtype=np.float64)
        sxxf = np.empty(len(keys), dtype=np.float64)
        for i, k_ in enumerate(keys):
            n_, s_, sxx_ = self.moments.get(k_, (0, 0, 0))
            nf[i], sf[i], sxxf[i] = float(n_), float(s_), float(sxx_)
        lhs = (nf * v - sf) * (nf * v - sf)
        rhs = self.k2 * (nf * sxxf - sf * sf)
        return batch.append_column("is_outlier", pa.array(lhs > rhs))


def flag_outliers(ds, key: str, value: str, k_sigma: float = 3.0,
                  concurrency: int | None = None):
    """Two streaming passes: exact grouped moments, then per-row
    k-sigma flags against the broadcast stats."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    moments = group_moments(ds, key, value)
    moments_ref = ray.put(moments)
    return ds.map_batches(
        OutlierFlagger,
        fn_constructor_kwargs={
            "moments_ref": moments_ref,
            "key": key,
            "value": value,
            "k_sigma": k_sigma,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def grouped_regression(ds, key: str, x: str, y: str):
    """Per-group OLS slope/intercept from exact integer sufficient
    statistics ``(n, Sx, Sy, Sxy, Sxx)`` - one slim combiner exchange,
    the fact table never shuffles, and the final float evaluation is a
    FIXED expression over exact ints (same parity contract as
    :func:`flag_outliers`).

    ``x`` and ``y`` must be int64 columns pre-scaled so the products
    fit int64 (e.g. hours-since-epoch-min, cents).  Returns a pyarrow
    Table ``(key, n, slope_e9, intercept_e2)``; degenerate groups
    (n < 2 or constant x) get slope_e9 = intercept_e2 = 0.
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        xv = batch.column(x).to_numpy(zero_copy_only=False).astype(np.int64)
        yv = batch.column(y).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, ginv = np.unique(keys, return_inverse=True)
        agg = {
            "n": np.zeros(len(uniq), dtype=np.int64),
            "sx": np.zeros(len(uniq), dtype=np.int64),
            "sy": np.zeros(len(uniq), dtype=np.int64),
            "sxy": np.zeros(len(uniq), dtype=np.int64),
            "sxx": np.zeros(len(uniq), dtype=np.int64),
        }
        np.add.at(agg["n"], ginv, 1)
        np.add.at(agg["sx"], ginv, xv)
        np.add.at(agg["sy"], ginv, yv)
        np.add.at(agg["sxy"], ginv, xv * yv)
        np.add.at(agg["sxx"], ginv, xv * xv)
        cols = {key: pa.array(list(uniq))}
        cols.update({c: pa.array(v, pa.int64()) for c, v in agg.items()})
        return pa.table(cols)

    stats: dict = {}
    for b in (
        ds.select_columns([key, x, y])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for row in b.to_pylist():
            k_ = row[key]
            prev = stats.get(k_, (0, 0, 0, 0, 0))
            stats[k_] = tuple(
                p + row[c] for p, c in zip(prev, ("n", "sx", "sy", "sxy", "sxx"))
            )

    keys_out = sorted(stats)
    slopes, intercepts, ns = [], [], []
    for k_ in keys_out:
        n, sx, sy, sxy, sxx = stats[k_]
        nf, sxf, syf = float(n), float(sx), float(sy)
        sxyf, sxxf = float(sxy), float(sxx)
        denom = nf * sxxf - sxf * sxf
        if n < 2 or denom <= 0.0:
            slopes.append(0)
            intercepts.append(0)
        else:
            slope = (nf * sxyf - sxf * syf) / denom
            intercept = (syf - slope * sxf) / nf
            slopes.append(int(np.floor(slope * 1e9)))
            intercepts.append(int(np.floor(intercept * 100.0)))
        ns.append(n)
    return pa.table(
        {
            key: pa.array(keys_out),
            "n": pa.array(ns, pa.int64()),
            "slope_e9": pa.array(slopes, pa.int64()),
            "intercept_e2": pa.array(intercepts, pa.int64()),
        }
    )
