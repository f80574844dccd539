"""Distributed PCA over an embedding column via exact integer
sufficient statistics.

The d x d covariance of an n x d embedding table needs only
``G = X^T X``, ``S = sum(X)`` and ``n`` - fixed-size partials every
block can compute locally and the driver can sum (the classic
aggregate-pushdown shape: the 100-TB table never moves, only
``O(d^2)`` bytes per block do).  Everything that crosses the exchange
is int64:

* embeddings are quantized once (``floor(x * 2^10)``), so per-block
  Gram/sum partials and their driver-side fold are EXACT integer math
  - the distributed result is bit-identical to a sequential pass no
  matter the block layout;
* the centered scatter ``n*G - S S^T`` is formed exactly in int64,
  converted to float64 once, and eigendecomposed on the driver
  (``d x d`` - trivial);
* eigenvectors are re-quantized (``floor(v * 2^20)``) and broadcast,
  so the projection pass is again an associative integer dot product
  against the exactly-centered rows ``n*q - S``.

Eigenvector sign is canonicalized (largest-|component| made positive,
earliest index on ties) so the decomposition is unique.

The exactness guarantee has an explicit int64 bound: ``n * max|G|``,
``max|S|^2`` and the worst-case integer projection must stay below
2^62 (roughly n ≤ ~3M unit-norm rows at Q_IN=2^10).
:func:`check_int64_exactness` raises past it - fit the axes on a
bounded sample/shard (statistically equivalent) for larger tables.

Reference context: the reference has no vector analytics; this extends
the embedding-column surface (ANN / SemDeDup / hard negatives) with
the standard dimensionality-reduction preprocessing step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q_IN = 1 << 10   # embedding quantization steps
Q_VEC = 1 << 20  # eigenvector quantization steps


def quantize_embeddings(mat: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(mat, dtype=np.float64) * Q_IN).astype(np.int64)


def gram_partials(ds, vec_column: str = "embedding"):
    """Streaming pass -> (G, S, n) exact int64 sufficient statistics."""

    def partial(batch: pa.Table) -> pa.Table:
        q = quantize_embeddings(np.array(batch.column(vec_column).to_pylist()))
        g = q.T @ q  # int64 (d, d)
        s = q.sum(axis=0)
        return pa.table(
            {
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "s": pa.array([s.tobytes()], pa.large_binary()),
                "n": pa.array([len(q)], pa.int64()),
                "d": pa.array([q.shape[1]], pa.int64()),
            }
        )

    G = None
    S = None
    n = 0
    for b in (
        ds.select_columns([vec_column])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for gb, sb, nn, d in zip(
            b.column("g").to_pylist(),
            b.column("s").to_pylist(),
            b.column("n").to_pylist(),
            b.column("d").to_pylist(),
        ):
            g = np.frombuffer(gb, dtype=np.int64).reshape(d, d)
            s = np.frombuffer(sb, dtype=np.int64)
            if G is None:
                G, S = g.copy(), s.copy()
            else:
                G += g
                S += s
            n += nn
    return G, S, n


_INT64_SAFE = 1 << 62  # headroom below the int64 ceiling


def check_int64_exactness(G: np.ndarray, S: np.ndarray, n: int) -> None:
    """Raise when the exact-integer claim would silently break: the
    centered scatter ``n*G - S S^T`` and the projection
    ``(n*q - S) @ axes_q^T`` are formed in int64, which wraps (numpy
    does NOT promote) once ``n * max|G|``, ``max|S|^2`` or the
    worst-case projected dot product crosses 2^63.  In practice this
    caps the EXACT path at roughly n ~ 3M rows for unit-norm
    embeddings (Q_IN=2^10); beyond that, sample/shard the PCA fit
    (statistically equivalent for axis estimation) or lower Q_IN."""
    g_max = int(np.abs(G).max(initial=0))
    s_max = int(np.abs(S).max(initial=0))
    d = G.shape[0]
    # max |component| of a quantized row, from the Gram diagonal
    q_max = int(np.sqrt(max(int(G.diagonal().max(initial=0)), 0))) + 1
    proj_bound = d * (n * q_max + s_max) * Q_VEC
    if (
        n * g_max >= _INT64_SAFE
        or s_max * s_max >= _INT64_SAFE
        or proj_bound >= _INT64_SAFE
    ):
        raise OverflowError(
            "exact-int64 PCA bound exceeded (n=%d, max|G|=%d, max|S|=%d): "
            "n*G - S S^T or the integer projection would wrap int64. "
            "Fit the axes on a sample/shard of at most ~2^21 rows (same "
            "axes in expectation) or reduce Q_IN." % (n, g_max, s_max)
        )


def principal_axes(G: np.ndarray, S: np.ndarray, n: int, k: int) -> np.ndarray:
    """Top-``k`` eigenvectors of the exact centered scatter, sign-
    canonicalized, quantized to int64 (k, d)."""
    check_int64_exactness(G, S, n)
    scatter = (n * G - np.outer(S, S)).astype(np.float64)
    w, v = np.linalg.eigh(scatter)
    top = v[:, ::-1][:, :k].T  # (k, d), descending eigenvalue
    out = np.zeros_like(top)
    for i, vec in enumerate(top):
        j = int(np.argmax(np.abs(vec)))
        out[i] = -vec if vec[j] < 0 else vec
    return np.floor(out * Q_VEC).astype(np.int64)


class PcaProjector:
    """Actor-pool projection stage: appends ``pc<i>_q`` int64 scores
    (exact integer dot products against the broadcast axes)."""

    def __init__(self, model_ref, vec_column: str):
        import ray

        self.axes_q, self.S, self.n = ray.get(model_ref)
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quantize_embeddings(
            np.array(batch.column(self.vec_column).to_pylist())
        )
        centered = self.n * q - self.S[None, :]  # exact int64
        scores = centered @ self.axes_q.T  # int64 (n_rows, k)
        out = batch.drop_columns([self.vec_column])
        for i in range(scores.shape[1]):
            out = out.append_column(
                "pc%d_q" % i, pa.array(scores[:, i], pa.int64())
            )
        return out


def pca_project(ds, k: int = 2, vec_column: str = "embedding",
                id_column: str = "vec_id", concurrency: int | None = None):
    """Two streaming passes: exact sufficient statistics, then integer
    projection onto the top-``k`` axes."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(1, min(8, cpus // 2))
    G, S, n = gram_partials(ds, vec_column)
    if G is None:
        raise ValueError("empty dataset")
    axes_q = principal_axes(G, S, n, k)
    model_ref = ray.put((axes_q, S, n))
    return ds.select_columns([id_column, vec_column]).map_batches(
        PcaProjector,
        fn_constructor_kwargs={"model_ref": model_ref,
                               "vec_column": vec_column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
