"""Exact two-pass heavy hitters: superset guarantee, certificate,
and end-to-end equality with a brute-force count."""

from collections import Counter

import pytest
import ray.data


def _brute_topk(texts, k):
    c = Counter()
    for t in texts:
        c.update(t.split(" "))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


class TestHeavyHitters:
    TEXTS = [
        "a a a b b c",
        "a b d d d d",
        "e e e e e f",
        "a c c g h i",
    ] * 5

    def test_matches_bruteforce(self, ray_session):
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        ds = ray.data.from_items([{"text": t} for t in self.TEXTS]).repartition(3)
        out = heavy_hitters(ds, k=5, capacity=64)
        got = list(zip(out.column("word").to_pylist(), out.column("cnt").to_pylist()))
        assert got == _brute_topk(self.TEXTS, 5)

    def test_tie_break_word_asc(self, ray_session):
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        ds = ray.data.from_items([{"text": "z y x z y x"}])
        out = heavy_hitters(ds, k=2, capacity=16)
        assert out.column("word").to_pylist() == ["x", "y"]

    def test_uncertifiable_raises(self, ray_session):
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        # near-uniform counts: with capacity 1 the k-th count can't
        # clear N/(capacity+1)
        texts = [" ".join("w%d" % i for i in range(50))] * 4
        ds = ray.data.from_items([{"text": t} for t in texts]).repartition(2)
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitters(ds, k=10, capacity=1)

    def test_empty_dataset(self, ray_session):
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        ds = ray.data.from_items([{"text": "a b"}]).filter(lambda r: False)
        out = heavy_hitters(ds, k=3, capacity=8)
        assert out.num_rows == 0


class TestFewerCandidatesThanK:
    def test_complete_vocabulary_certifies_short_result(self, ray_session):
        """< k distinct words total: result is the complete ranking."""
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        ds = ray.data.from_items(
            [{"text": "a a a b b c"}, {"text": "a b c"}]
        ).repartition(2)
        out = heavy_hitters(ds, k=10, capacity=64)
        assert out.column("word").to_pylist() == ["a", "b", "c"]
        assert out.column("cnt").to_pylist() == [4, 3, 2]

    def test_truncated_candidates_raise(self, ray_session):
        """Fewer candidates than k AND uncovered tokens: positions
        len(cand)+1..k are unknowable -> must refuse, not truncate."""
        from topicrawler_ray.stages.heavyhitters import heavy_hitters

        # one dominant word + a long tail; with capacity 2 only the
        # dominant word clears n/(capacity+1) while tail tokens stay
        # uncovered -> 1 candidate < k and unknowable tail positions
        texts = [" ".join(["dom"] * 20) + " "
                 + " ".join("t%d" % i for i in range(10))]
        ds = ray.data.from_items([{"text": t} for t in texts])
        with pytest.raises(ValueError, match="candidates"):
            heavy_hitters(ds, k=5, capacity=2)
