"""Distributed exact-quantile selection (histogram refinement)."""

import numpy as np
import pyarrow as pa
import pytest


def _duck_quantiles(values, qs):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest($1::DOUBLE[]) AS x", [list(map(float, values))]
    )
    return [
        con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        for q in qs
    ]


class TestExactQuantiles:
    def test_int_column_matches_duckdb(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.quantiles import exact_quantiles

        rng = np.random.RandomState(7)
        vals = rng.randint(-500, 5000, size=3000)
        # heavy ties
        vals[::5] = 42
        ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
        qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        out = exact_quantiles(ds, "x", qs=qs, bins=8).to_pandas()
        expect = _duck_quantiles(vals, qs)
        assert out["value"].tolist() == [int(e) for e in expect]

    def test_float_column_matches_duckdb(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.quantiles import exact_quantiles

        rng = np.random.RandomState(11)
        vals = np.round(rng.lognormal(3, 1.5, size=2000), 4)
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(vals, pa.float64())})
        )
        qs = (0.25, 0.5, 0.9)
        out = exact_quantiles(
            ds, "x", qs=qs, bins=16, max_pull=64
        ).to_pandas()
        expect = _duck_quantiles(vals, qs)
        assert out["value"].tolist() == pytest.approx(expect, abs=0)

    def test_tiny_and_boundary_q(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.quantiles import exact_quantiles

        ds = ray.data.from_arrow(
            pa.table({"x": pa.array([5, 1, 3], pa.int64())})
        )
        out = exact_quantiles(
            ds, "x", qs=(0.01, 0.5, 1.0), bins=4
        ).to_pandas()
        assert out["value"].tolist() == [1, 3, 5]

    def test_constant_column(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.quantiles import exact_quantiles

        ds = ray.data.from_arrow(
            pa.table({"x": pa.array([7] * 100, pa.int64())})
        )
        out = exact_quantiles(ds, "x", qs=(0.1, 0.9), bins=4).to_pandas()
        assert out["value"].tolist() == [7, 7]
