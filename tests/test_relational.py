"""Broadcast dimension join and grouping-sets rollup."""

import pyarrow as pa
import pytest
import ray.data


def _dims():
    return ray.data.from_items(
        [
            {"k": 1, "name": "one", "grp": "odd"},
            {"k": 2, "name": "two", "grp": "even"},
            {"k": 3, "name": "three", "grp": "odd"},
        ]
    )


def _facts():
    return ray.data.from_items(
        [{"fk": v, "x": i} for i, v in enumerate([1, 2, 2, 3, 9])]
    ).repartition(3)


class TestBroadcastLookupJoin:
    def test_inner_drops_misses(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        out = broadcast_lookup_join(
            _facts(), _dims(), "fk", "k", ["name", "grp"]
        ).take_all()
        assert len(out) == 4  # fk=9 dropped
        byx = {r["x"]: r["name"] for r in out}
        assert byx == {0: "one", 1: "two", 2: "two", 3: "three"}

    def test_left_keeps_misses_with_nulls(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        out = broadcast_lookup_join(
            _facts(), _dims(), "fk", "k", ["name"], how="left"
        ).take_all()
        assert len(out) == 5
        miss = [r for r in out if r["fk"] == 9][0]
        assert miss["name"] is None

    def test_duplicate_dim_key_raises(self, ray_session):
        from topicrawler_ray.stages.relational import broadcast_lookup_join

        dup = ray.data.from_items([{"k": 1, "name": "a"}, {"k": 1, "name": "b"}])
        with pytest.raises(ValueError, match="not unique"):
            broadcast_lookup_join(_facts(), dup, "fk", "k", ["name"])


class TestRollup:
    def test_levels_and_totals(self, ray_session):
        from topicrawler_ray.stages.relational import rollup_aggregate

        ds = ray.data.from_items(
            [
                {"a": "x", "b": "p", "v": 1},
                {"a": "x", "b": "q", "v": 2},
                {"a": "y", "b": "p", "v": 4},
            ]
        ).repartition(2)
        rows = {
            (r["a"], r["b"]): (r["v"], r["n_rows"])
            for r in rollup_aggregate(ds, ["a", "b"], "v").take_all()
        }
        assert rows[("x", "p")] == (1, 1)
        assert rows[("x", "q")] == (2, 1)
        assert rows[("y", "p")] == (4, 1)
        assert rows[("x", "__all__")] == (3, 2)
        assert rows[("y", "__all__")] == (4, 1)
        assert rows[("__all__", "__all__")] == (7, 3)
        assert len(rows) == 6
