"""Snapshot-diff operator (stages/snapshot.py): full_outer join diff of
two (url, digest) crawl snapshots."""

import hashlib

import pytest
import ray.data

from topicrawler_ray.stages.snapshot import add_digest, md5_hex, snapshot_diff


def _diff(a_rows, b_rows):
    a = ray.data.from_items([{"url": u, "digest_a": d} for u, d in a_rows])
    b = ray.data.from_items([{"url": u, "digest_b": d} for u, d in b_rows])
    out = snapshot_diff(a, b).to_pandas()
    return {r.url: r.status for r in out.itertuples()}, out


class TestSnapshotDiff:
    def test_all_four_statuses(self, ray_session):
        statuses, out = _diff(
            [("u1", "x"), ("u2", "y"), ("u3", "z")],
            [("u2", "y"), ("u3", "z2"), ("u4", "w")],
        )
        assert statuses == {
            "u1": "gone",
            "u2": "same",
            "u3": "changed",
            "u4": "new",
        }
        assert len(out) == 4
        # digest columns carry through, null on the absent side
        row = out[out.url == "u1"].iloc[0]
        assert row.digest_a == "x" and row.digest_b is None

    def test_disjoint_snapshots(self, ray_session):
        statuses, _ = _diff([("a", "1")], [("b", "2")])
        assert statuses == {"a": "gone", "b": "new"}

    def test_identical_snapshots(self, ray_session):
        rows = [("u%d" % i, "d%d" % i) for i in range(50)]
        statuses, _ = _diff(rows, rows)
        assert set(statuses.values()) == {"same"} and len(statuses) == 50

    def test_md5_matches_duckdb(self, ray_session):
        import duckdb

        for s in ["", "abc", "päge \t text", "#v2"]:
            (expected,) = duckdb.sql("SELECT md5(?)", params=[s]).fetchone()
            assert md5_hex(s) == expected
        assert md5_hex(None) == hashlib.md5(b"").hexdigest()

    def test_revisit_schedule_tiers(self, ray_session):
        from topicrawler_ray.stages.snapshot import revisit_schedule

        rows = []
        # fast.example: 2 changed / 1 same -> rate 666666
        for i, st in enumerate(["changed", "changed", "same"]):
            rows.append({"url": "http://fast.example/p%d" % i, "status": st})
        # slow.example: 0 changed / 3 same -> rate 0
        for i in range(3):
            rows.append({"url": "http://slow.example/p%d" % i, "status": "same"})
        # churn.example: only gone/new -> denominator 0 -> rate 0, slow
        rows.append({"url": "http://churn.example/a", "status": "gone"})
        rows.append({"url": "http://churn.example/b", "status": "new"})
        # med.example: 1 changed / 4 same -> rate 200000 -> medium
        rows.append({"url": "http://med.example/c", "status": "changed"})
        for i in range(4):
            rows.append({"url": "http://med.example/s%d" % i, "status": "same"})

        out = revisit_schedule(ray.data.from_items(rows)).to_pandas()
        by_host = {r.host: r for r in out.itertuples()}
        assert by_host["fast.example"].revisit_tier == "fast"
        assert by_host["fast.example"].change_rate_e6 == 666666
        assert by_host["slow.example"].revisit_tier == "slow"
        assert by_host["churn.example"].change_rate_e6 == 0
        assert by_host["churn.example"].revisit_tier == "slow"
        assert by_host["churn.example"].n_gone == 1
        assert by_host["churn.example"].n_new == 1
        assert by_host["med.example"].revisit_tier == "medium"
        assert by_host["med.example"].change_rate_e6 == 200000

    def test_snapshot_drift_classes(self, ray_session):
        from topicrawler_ray.stages.snapshot import snapshot_drift

        base = " ".join("w%d" % i for i in range(20))
        minor = " ".join("w%d" % i for i in range(1, 20))  # first word gone
        major = " ".join("z%d" % i for i in range(20))  # full rewrite
        a = ray.data.from_items(
            [
                {"url": "u_minor", "text_a": base},
                {"url": "u_major", "text_a": base},
                {"url": "u_same", "text_a": base},
            ]
        )
        b = ray.data.from_items(
            [
                {"url": "u_minor", "text_b": minor},
                {"url": "u_major", "text_b": major},
                {"url": "u_same", "text_b": base},
                {"url": "u_only_b", "text_b": major},  # dropped by inner join
            ]
        )
        out = {r["url"]: r for r in snapshot_drift(a, b).take_all()}
        assert set(out) == {"u_minor", "u_major", "u_same"}
        # 18 grams vs 17, 17 shared: j = 17/18 = 0.9444
        assert out["u_minor"]["jaccard_e4"] == 9444
        assert out["u_minor"]["change_class"] == "minor"
        assert out["u_major"]["jaccard_e4"] == 0
        assert out["u_major"]["change_class"] == "major"
        assert out["u_same"]["jaccard_e4"] == 10000

    def test_randomized_parity_vs_sequential(self, ray_session):
        """Distributed diff == sequential dict derivation on random
        snapshot pairs (fixed seed)."""
        import random

        rng = random.Random(42)
        for trial in range(3):
            urls = ["u%d" % i for i in range(rng.randint(1, 120))]
            a_rows = [(u, "d%d" % rng.randint(0, 3)) for u in urls if rng.random() < 0.8]
            b_rows = [(u, "d%d" % rng.randint(0, 3)) for u in urls if rng.random() < 0.8]
            got, _ = _diff(a_rows, b_rows) if a_rows and b_rows else ({}, None)
            if not (a_rows and b_rows):
                continue
            da, db = dict(a_rows), dict(b_rows)
            expected = {}
            for u in set(da) | set(db):
                if u not in da:
                    expected[u] = "new"
                elif u not in db:
                    expected[u] = "gone"
                elif da[u] == db[u]:
                    expected[u] = "same"
                else:
                    expected[u] = "changed"
            assert got == expected, "trial %d" % trial

    def test_add_digest_slim_projection(self, ray_session):
        ds = ray.data.from_items(
            [{"url": "u", "text": "hello", "html": b"<p>hello</p>"}]
        )
        out = add_digest(ds, out="digest_a")
        assert set(out.schema().names) == {"url", "digest_a"}
        assert out.take_all()[0]["digest_a"] == md5_hex("hello")
