"""Distributed PCA: exact partial sums, sign canonicalization,
partition invariance, and axis correctness on a known distribution."""

import numpy as np
import ray.data

from topicrawler_ray.stages.pca import principal_axes, quantize_embeddings


def _rows(n=300, seed=5):
    rng = np.random.RandomState(seed)
    # dominant variance along (1, 1)/sqrt(2), minor along (1, -1)
    t = rng.randn(n) * 10.0
    u = rng.randn(n) * 1.0
    x = np.stack([t + u, t - u], axis=1) / 40.0
    return [
        {"vec_id": i, "embedding": x[i].tolist()} for i in range(n)
    ]


class TestPca:
    def test_partition_invariant(self, ray_session):
        from topicrawler_ray.stages.pca import pca_project

        rows = _rows()
        outs = []
        for parts in (1, 7):
            ds = ray.data.from_items(rows).repartition(parts)
            got = {
                r["vec_id"]: (r["pc0_q"], r["pc1_q"])
                for r in pca_project(ds, k=2).take_all()
            }
            outs.append(got)
        assert outs[0] == outs[1]

    def test_first_axis_is_dominant_direction(self, ray_session):
        from topicrawler_ray.stages.pca import gram_partials

        ds = ray.data.from_items(_rows())
        G, S, n = gram_partials(ds)
        axes_q = principal_axes(G, S, n, k=2)
        v0 = axes_q[0].astype(np.float64)
        v0 /= np.linalg.norm(v0)
        # dominant direction ~ (1,1)/sqrt(2); sign canonicalized positive
        assert abs(v0 @ np.array([1, 1]) / np.sqrt(2)) > 0.99
        assert v0[int(np.argmax(np.abs(v0)))] > 0

    def test_quantize_floor(self):
        q = quantize_embeddings(np.array([[0.5, -0.5]]))
        assert q.tolist() == [[512, -512]]


class TestInt64ExactnessGuard:
    def test_overflow_raises(self):
        import numpy as np
        import pytest

        from topicrawler_ray.stages.pca import check_int64_exactness

        d = 4
        G = np.full((d, d), 1 << 41, dtype=np.int64)
        S = np.full(d, 1 << 20, dtype=np.int64)
        with pytest.raises(OverflowError, match="int64"):
            check_int64_exactness(G, S, n=1 << 22)

    def test_small_ok(self):
        import numpy as np

        from topicrawler_ray.stages.pca import check_int64_exactness

        d = 4
        G = np.full((d, d), 1 << 20, dtype=np.int64)
        S = np.full(d, 1 << 10, dtype=np.int64)
        check_int64_exactness(G, S, n=1000)  # no raise
