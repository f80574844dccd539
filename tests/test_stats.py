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
