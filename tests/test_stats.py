"""Grouped sufficient statistics and k-sigma outlier flags."""

import numpy as np
import ray.data

from topicrawler_ray.stages.stats import group_moments


class TestGroupMoments:
    def test_exact_sums_partition_invariant(self, ray_session):
        rows = [{"g": "a" if i % 2 else "b", "v": i} for i in range(101)]
        outs = []
        for parts in (1, 7):
            ds = ray.data.from_items(rows).repartition(parts)
            outs.append(group_moments(ds, "g", "v"))
        assert outs[0] == outs[1]
        a_vals = [r["v"] for r in rows if r["g"] == "a"]
        assert outs[0]["a"] == (
            len(a_vals), sum(a_vals), sum(v * v for v in a_vals)
        )


class TestOutliers:
    def test_obvious_outlier_flagged(self, ray_session):
        from topicrawler_ray.stages.stats import flag_outliers

        rows = [{"id": i, "g": "x", "v": 100 + (i % 3)} for i in range(50)]
        rows.append({"id": 99, "g": "x", "v": 100_000})
        ds = ray.data.from_items(rows).repartition(3)
        got = {r["id"]: r["is_outlier"]
               for r in flag_outliers(ds, "g", "v").take_all()}
        assert got[99] is True
        assert sum(got.values()) == 1  # only the spike

    def test_constant_group_no_outliers(self, ray_session):
        from topicrawler_ray.stages.stats import flag_outliers

        ds = ray.data.from_items([{"id": i, "g": "c", "v": 7} for i in range(9)])
        got = flag_outliers(ds, "g", "v").take_all()
        assert not any(r["is_outlier"] for r in got)


class TestGroupedRegression:
    def test_known_line(self, ray_session):
        from topicrawler_ray.stages.stats import grouped_regression

        # y = 3x + 7 exactly
        rows = [{"g": "l", "x": i, "y": 3 * i + 7} for i in range(20)]
        rows += [{"g": "flat", "x": i, "y": 5} for i in range(10)]
        rows += [{"g": "single", "x": 1, "y": 9}]
        ds = ray.data.from_items(rows).repartition(4)
        out = {r["g"]: r for r in grouped_regression(ds, "g", "x", "y").to_pylist()}
        assert out["l"]["slope_e9"] == 3_000_000_000
        assert out["l"]["intercept_e2"] == 700
        assert out["flat"]["slope_e9"] == 0
        assert out["single"]["slope_e9"] == 0  # degenerate: constant x
        assert out["single"]["n"] == 1

    def test_partition_invariant(self, ray_session):
        from topicrawler_ray.stages.stats import grouped_regression

        rows = [{"g": "a", "x": i % 17, "y": (i * 13) % 101} for i in range(200)]
        outs = []
        for parts in (1, 6):
            ds = ray.data.from_items(rows).repartition(parts)
            outs.append(grouped_regression(ds, "g", "x", "y").to_pylist())
        assert outs[0] == outs[1]
