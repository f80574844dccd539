"""BPE training and tokenization: merge order determinism, greedy
apply semantics, round-trip reconstruction, partition invariance."""

import ray.data

from topicrawler_ray.stages.bpe import END, _encode_word, learn_bpe


class TestLearnBpe:
    def test_classic_example(self):
        # "low lower newest widest" toy from Sennrich et al.
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = learn_bpe(freqs, 4)
        # 'es' appears 9x (newest+widest) - the unambiguous first merge
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", END)

    def test_tie_break_lexicographic(self):
        # all four pairs tie at 2; ('a', '</w>') is lexicographically
        # smallest ('<' sorts before 'b')
        freqs = {"ab": 2, "ba": 2}
        merges = learn_bpe(freqs, 1)
        assert merges[0] == ("a", END)

    def test_stops_below_two(self):
        assert learn_bpe({"xy": 1}, 10) == []


class TestEncodeWord:
    def test_applies_ranks_in_order(self):
        ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", END): 2}
        assert _encode_word("newest", ranks) == ("n", "e", "w", "est" + END)
        assert _encode_word("best", ranks) == ("b", "est" + END)

    def test_unknown_chars_pass_through(self):
        assert _encode_word("qz", {}) == ("q", "z", END)


class TestDistributed:
    ROWS = [
        {"doc_id": 0, "text": "low low low low low lower lower"},
        {"doc_id": 1, "text": "newest newest newest newest newest newest"},
        {"doc_id": 2, "text": "widest widest widest"},
    ]

    def _run(self, parts):
        from topicrawler_ray.stages.bpe import bpe_tokenize, train_bpe

        ds = ray.data.from_items(self.ROWS).repartition(parts)
        merges = train_bpe(ds, num_merges=10, min_count=1)
        out = bpe_tokenize(ds, merges).take_all()
        return merges, {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_head"]) for r in out}

    def test_partition_invariant(self, ray_session):
        m1, o1 = self._run(1)
        m2, o2 = self._run(3)
        assert m1 == m2
        assert o1 == o2

    def test_frequent_words_become_single_tokens(self, ray_session):
        _, out = self._run(2)
        # 'newest' x6 should compress to one token per word
        n, head = out[1]
        assert n == 6
        assert head.split("|")[0] == "newest" + END
