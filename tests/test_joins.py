"""Bloom-filter semi-join: bitmap math, false-positive bound, and the
three verify paths (broadcast / join / none)."""

import numpy as np
import pyarrow as pa
import pytest

from topicrawler_ray.stages.joins import (
    _bloom_positions,
    _hash_keys,
    _set_bits,
    _test_bits,
)


class TestBitmapMath:
    def test_members_always_pass(self):
        keys = pa.array(np.arange(1000, dtype=np.int64))
        h = _hash_keys(keys)
        bitmap = np.zeros((1 << 16) // 64, dtype=np.uint64)
        pos = _bloom_positions(h, 1 << 16, 5)
        _set_bits(bitmap, pos)
        assert _test_bits(bitmap, pos).all()

    def test_fp_rate_bounded(self):
        m, k, n = 1 << 17, 7, 1000
        members = pa.array(np.arange(n, dtype=np.int64))
        probes = pa.array(np.arange(10_000, 60_000, dtype=np.int64))
        bitmap = np.zeros(m // 64, dtype=np.uint64)
        _set_bits(bitmap, _bloom_positions(_hash_keys(members), m, k))
        hits = _test_bits(bitmap, _bloom_positions(_hash_keys(probes), m, k))
        # theoretical fp ~ (1-e^{-kn/m})^k ~ 2e-9 at these params; allow
        # a generous margin
        assert hits.mean() < 1e-3

    def test_string_keys_deterministic(self):
        a = _hash_keys(pa.array(["x", "y", "z"]))
        b = _hash_keys(pa.chunked_array([pa.array(["x"]), pa.array(["y", "z"])]))
        assert (a == b).all()


def _fixture_tables():
    import ray.data

    rng = np.random.RandomState(7)
    big_keys = rng.randint(0, 500, size=5000).astype(np.int64)
    big = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(big_keys),
                "payload": pa.array(np.arange(5000, dtype=np.int64)),
            }
        )
    ).repartition(4)
    small_keys = np.arange(0, 500, 3, dtype=np.int64)  # every 3rd key
    small = ray.data.from_arrow(pa.table({"sk": pa.array(small_keys)})).repartition(2)
    expected = {int(p) for k, p in zip(big_keys, range(5000)) if k % 3 == 0}
    return big, small, expected


class TestBloomSemijoin:
    def test_broadcast_verify_exact(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_semijoin

        big, small, expected = _fixture_tables()
        out = bloom_semijoin(big, small, key="k", right_key="sk", num_bits=1 << 12)
        got = {r["payload"] for r in out.take_all()}
        assert got == expected

    def test_join_verify_exact(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_semijoin

        big, small, expected = _fixture_tables()
        out = bloom_semijoin(
            big, small, key="k", right_key="sk", num_bits=1 << 12, verify="join"
        )
        got = {r["payload"] for r in out.take_all()}
        assert got == expected
        assert set(out.schema().names) == {"k", "payload"}

    def test_none_verify_is_superset(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_semijoin

        big, small, expected = _fixture_tables()
        # tiny bitmap -> real false positives, but never false negatives
        out = bloom_semijoin(
            big, small, key="k", right_key="sk", num_bits=1 << 8, verify="none"
        )
        got = {r["payload"] for r in out.take_all()}
        assert got >= expected

    def test_empty_small_side(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.joins import bloom_semijoin

        big, small, _ = _fixture_tables()
        empty = small.filter(expr="sk < 0")
        out = bloom_semijoin(big, empty, key="k", right_key="sk", num_bits=1 << 12)
        assert out.count() == 0

    def test_bad_verify_mode_raises(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_semijoin

        big, small, _ = _fixture_tables()
        with pytest.raises(ValueError):
            bloom_semijoin(big, small, key="k", right_key="sk", verify="fuzzy")


class TestHardNegatives:
    def test_excludes_same_label_and_self(self, ray_session):
        import numpy as np
        import ray.data

        from topicrawler_ray.stages.similarity import hard_negatives

        vecs = {
            0: ([1.0, 0.0], "a"),
            1: ([0.99, 0.1], "a"),   # same label as query - excluded
            2: ([0.9, 0.2], "b"),    # closest different-label
            3: ([0.0, 1.0], "b"),
            4: ([-1.0, 0.0], "c"),
        }
        ds = ray.data.from_items(
            [
                {"vec_id": i, "embedding": v, "label": l}
                for i, (v, l) in vecs.items()
            ]
        ).repartition(2)
        out = hard_negatives(
            ds,
            queries=np.array([vecs[0][0]]),
            query_labels=np.array(["a"]),
            query_ids=np.array([0]),
            k=3,
        )
        got = out.column("vec_id").to_pylist()
        assert 0 not in got and 1 not in got
        assert got[0] == 2  # rank 0 = nearest different-label
        assert set(got) == {2, 3, 4}


class TestBloomAntijoin:
    def test_complement_of_semijoin(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_antijoin

        big, small, expected = _fixture_tables()
        out = bloom_antijoin(big, small, key="k", right_key="sk")
        got = {r["payload"] for r in out.take_all()}
        assert got == set(range(5000)) - expected

    def test_empty_small_side_keeps_all(self, ray_session):
        from topicrawler_ray.stages.joins import bloom_antijoin

        big, small, _ = _fixture_tables()
        out = bloom_antijoin(big, small.filter(expr="sk < 0"), "k", "sk")
        assert out.count() == 5000
