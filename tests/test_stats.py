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


class TestReadability:
    def test_integer_rational_matches_python_reference(self, ray_session):
        import re

        import pandas as pd
        import pyarrow as pa

        from topicrawler_ray.stages.textstats import readability_batch

        texts = [
            "The cat sat. The dog ran! Did it?",
            "supercalifragilistic expialidocious",
            "",
            None,
            "no terminal punctuation here",
            "a.b.c...d!!e?? ok",
            "Y y Y rhythm myth",
        ]
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = readability_batch(batch).to_pandas()
        for i, t in enumerate(texts):
            t = t or ""
            w = len(re.findall(r"\S+", t))
            s = len(re.findall(r"[.!?]+", t))
            y = len(re.findall(r"[aeiouyAEIOUY]+", t))
            s1, w1 = max(s, 1), max(w, 1)
            row = out.iloc[i]
            assert row.n_words == w and row.n_sents == s and row.n_syll == y
            assert row.grade_num == 39 * w * w + 1180 * y * s1 - 1559 * s1 * w
            assert row.grade_den == 100 * s1 * w1
            # rational reproduces the float formula when defined
            if w and s:
                grade = 0.39 * w / s + 11.8 * y / w - 15.59
                assert abs(row.grade_num / row.grade_den - grade) < 1e-9
