"""LM golden tests mirroring ``lt.lm`` test suites.

* sqrt(2) perplexity: ``lt.lm/src/test/java/.../perplexity/PerplexityTest.java:96-127``
* CountingLM / LaplaceSmoothedLM semantics: ``CountingLmTest``
"""

import math

import pytest

from topicrawler_ray.functions.ngrams import ngram_sequence
from topicrawler_ray.lm.counting import CountingLM, LaplaceSmoothedLM
from topicrawler_ray.lm.perplexity import (
    ModelPerplexity,
    calculate_perplexity,
    document_perplexity,
    text_ngrams,
)


def _fox_cat_lm(order=3):
    lm = CountingLM(order)
    for s in ("The quick brown fox", "The quick brown cat"):
        for ng in ngram_sequence(s.split(" "), order):
            lm.add_ngram(ng)
    return lm


class TestCountingLM:
    def test_sqrt2_perplexity(self):
        lm = _fox_cat_lm()
        test = "The quick brown fox".split(" ")
        p = calculate_perplexity(lm, ngram_sequence(test, 3), skip_oov=False)
        assert p == pytest.approx(1.41421, abs=1e-4)

    def test_sqrt2_model_perplexity(self):
        lm = _fox_cat_lm()
        mp = ModelPerplexity(lm)
        for ng in ngram_sequence("The quick brown cat".split(" "), 3):
            mp.add_log10_prob(ng)
        assert mp.get() == pytest.approx(1.41421, abs=1e-4)

    def test_oov_gives_base_perplexity(self):
        lm = _fox_cat_lm()
        mp = ModelPerplexity(lm)
        for ng in ngram_sequence("The quick brown dog".split(" "), 3):
            mp.add_log10_prob(ng)
        # -inf in the sum -> base perplexity; for CountingLM the ctor quirk
        # makes the base 0.0 (ModelPerplexity.java:28-43)
        assert mp.get() == 0.0

    def test_calculate_perplexity_oov_maxint(self):
        lm = _fox_cat_lm()
        p = calculate_perplexity(
            lm, ngram_sequence("X Y Z W".split(" "), 3), skip_oov=False
        )
        assert p == float(2**31 - 1)

    def test_skip_oov(self):
        lm = _fox_cat_lm()
        seq = ngram_sequence("The quick brown dog".split(" "), 3)
        p = calculate_perplexity(lm, seq, skip_oov=True)
        # only [The quick brown] counted -> p(brown|The quick)=1 -> perp 1
        assert p == pytest.approx(1.0, abs=1e-9)

    def test_unigram_prob(self):
        lm = CountingLM(1)
        for w in ["a", "a", "b"]:
            lm.add_ngram([w])
        assert lm.ngram_log10_prob(["a"]) == pytest.approx(math.log10(2 / 3))
        assert lm.ngram_log10_prob(["c"]) == -math.inf


class TestLaplace:
    def test_smoothed_oov_finite(self):
        lm = LaplaceSmoothedLM(_fox_cat_lm())
        p = lm.ngram_log10_prob("The quick dog".split(" "))
        assert math.isfinite(p)
        # count 0 + 1 over history count 2 + V(=5) -> log10(1/7)
        assert p == pytest.approx(math.log10(1.0 / 7.0))

    def test_base_perplexity_is_vocab_sized(self):
        base_lm = _fox_cat_lm()
        lm = LaplaceSmoothedLM(base_lm)
        mp = ModelPerplexity(lm)
        # base = 10^(-log10(1/(0+V))) = V = 5
        assert mp.get() == pytest.approx(5.0)


class TestDocumentPerplexity:
    def test_empty_text(self):
        lm = LaplaceSmoothedLM(_fox_cat_lm())
        assert document_perplexity(lm, "") == pytest.approx(5.0)  # base

    def test_text_ngrams_shape(self):
        ngs = text_ngrams("The quick brown fox. The quick brown cat.", 3)
        # two sentences, each: <s> The quick brown fox </s> -> 4 trigrams
        assert len(ngs) == 8
        assert ngs[0] == ["<s>", "The", "quick"]
        assert ngs[3] == ["brown", "fox", "</s>"]

    def test_short_sentence_skipped(self):
        # computePerplexity skips sentences whose last ngram is shorter than
        # the LM order (DecesiveValueProducerPerplexity.java:144-147)
        lm = LaplaceSmoothedLM(_fox_cat_lm(order=5))
        # "Hi." -> tokens [Hi] + tags = [<s>, Hi, </s>] -> single 3-token
        # ngram < order 5 -> skipped -> base perplexity
        mp_base = ModelPerplexity(lm).get()
        assert document_perplexity(lm, "Hi.") == pytest.approx(mp_base)

    def test_on_topic_scores_lower(self):
        corpus = [
            "the cat sat on the mat .",
            "the cat ran after the dog .",
            "a dog and a cat met on the mat .",
            "cats and dogs are animals .",
        ]
        lm0 = CountingLM(3)
        for s in corpus:
            toks = ["<s>"] + s.split(" ") + ["</s>"]
            for ng in ngram_sequence(toks, 3):
                lm0.add_ngram(ng)
        lm = LaplaceSmoothedLM(lm0)
        on_topic = document_perplexity(lm, "The cat sat on the mat.")
        off_topic = document_perplexity(lm, "Quantum flux reactors emit neutrinos.")
        assert on_topic < off_topic


class TestNgramIndex:
    """J4: unified per-ngram index record + __sum_ngrams__ artifact."""

    DOCS = ["the cat sat on the mat", "the cat ran", "a dog sat on the mat"]

    def _index(self, ray_session):
        import ray.data

        from topicrawler_ray.lm.build import ngram_index

        ds = ray.data.from_items([{"text": t} for t in self.DOCS])
        return ngram_index(ds, 3)

    def test_wide_record_vs_python_oracle(self, ray_session):
        """The joined record must equal a sequential dict-based oracle."""
        from collections import Counter, defaultdict

        from topicrawler_ray.lm.build import sentence_tokens

        c = Counter()
        for t in self.DOCS:
            for toks in sentence_tokens(t):
                for k in range(1, 4):
                    for i in range(len(toks) - k + 1):
                        c[" ".join(toks[i : i + k])] += 1
        stats = {p: defaultdict(lambda: [0, 0, 0, 0]) for p in ("np", "nf", "nfp")}
        for g, num in c.items():
            parts = g.split(" ")
            b = 1 if num == 1 else (2 if num == 2 else 3)
            if len(parts) >= 2:
                for p, key in (
                    ("nf", " ".join(parts[:-1])),
                    ("np", " ".join(parts[1:])),
                ):
                    stats[p][key][0] += num
                    stats[p][key][b] += 1
            if len(parts) >= 3:
                key = " ".join(parts[1:-1])
                stats["nfp"][key][0] += num
                stats["nfp"][key][b] += 1

        df = self._index(ray_session).to_pandas().set_index("ngram")
        assert len(df) == len(c)
        for g, num in c.items():
            row = df.loc[g]
            assert row["num"] == num
            assert row["n"] == g.count(" ") + 1
            for p in ("np", "nf", "nfp"):
                exp = stats[p].get(g, [0, 0, 0, 0])
                got = [row["%s_n" % p], row["%s_n1" % p], row["%s_n2" % p], row["%s_n3" % p]]
                assert got == exp, (g, p, got, exp)

    def test_sum_ngrams_artifact_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from topicrawler_ray.lm.build import (
            count_ngrams,
            count_of_counts,
            read_sum_ngrams,
            write_sum_ngrams,
        )

        ds = ray.data.from_items([{"text": t} for t in self.DOCS])
        stats = count_of_counts(count_ngrams(ds, 3), 3)
        p = str(tmp_path / "__sum_ngrams__")
        text = write_sum_ngrams(stats, p)
        assert text.startswith("#\n# Number of times where an ngram occurred: \n")
        assert "max_n=3\nmax_c=6\n" in text
        back = read_sum_ngrams(p)
        assert back["N"] == stats["N"] and back["S"] == stats["S"]

    def test_kn_fed_from_index_matches_in_memory(self, ray_session):
        from topicrawler_ray.functions import ngrams as ngram_mod  # noqa: F401
        from topicrawler_ray.lm.backoff import NgramCounts
        from topicrawler_ray.lm.build import kn_stats_from_index, sentence_tokens
        from topicrawler_ray.lm.kneserney import KneserNeyLM, KNStats

        counts = NgramCounts(3)
        for t in self.DOCS:
            for toks in sentence_tokens(t):
                counts.add_sequence(toks)
        lm_mem = KneserNeyLM(KNStats(counts))
        lm_idx = KneserNeyLM(kn_stats_from_index(self._index(ray_session), 3))
        for g in (
            ["the", "cat", "sat"],
            ["a", "dog", "ran"],
            ["the", "mat"],
            ["unknownword"],
        ):
            assert lm_mem.ngram_log10_prob(g) == lm_idx.ngram_log10_prob(g)


class TestJelinekMercer:
    def _counts(self, seqs):
        from topicrawler_ray.lm.backoff import NgramCounts

        c = NgramCounts(2)
        for s in seqs:
            c.add_sequence(s)
        return c

    def test_hand_computed_interpolation(self):
        """Corpus 'a b': V=2, base=1/3, t1=2.
        P(a)   = .7*(1/2) + .3*(1/3) = 0.45
        P(b|a) = .7*(c(ab)/c(a)=1) + .3*P(b)= .7 + .3*.45 = 0.835"""
        from topicrawler_ray.lm.jm import JelinekMercerLM

        lm = JelinekMercerLM(self._counts([["a", "b"]]), lam=0.7)
        assert abs(lm.score(["a"]) - 0.45) < 1e-12
        assert abs(lm.score(["a", "b"]) - 0.835) < 1e-12
        # OOV floor: (1-lam)^2 * base for a bigram ending OOV after OOV
        assert abs(lm.score(["x", "y"]) - 0.3 * 0.3 / 3) < 1e-12
        assert lm.ngram_ends_with_oov(["a", "y"])
        assert not lm.ngram_ends_with_oov(["y", "a"])

    def test_proper_distribution_over_vocab_plus_oov(self):
        """For a history whose continuations are complete in the corpus,
        sum_w P(w|h) over V + one OOV class must be exactly 1."""
        from topicrawler_ray.lm.jm import JelinekMercerLM

        lm = JelinekMercerLM(
            self._counts([["a", "b", "a", "b", "a", "c"]]), lam=0.7
        )
        total = sum(lm.score(["a", w]) for w in ("a", "b", "c"))
        total += lm.score(["a", "UNSEEN"])  # the single reserved OOV class
        assert abs(total - 1.0) < 1e-12

    def test_freeze_parity_and_pickle(self):
        import pickle

        from topicrawler_ray.lm.jm import build_jelinek_mercer

        c = self._counts([["the", "cat", "sat"], ["the", "dog", "ran"]])
        a = build_jelinek_mercer(c, freeze=False)
        b = build_jelinek_mercer(c, freeze=True)
        b = pickle.loads(pickle.dumps(b))
        for g in (["the"], ["the", "cat"], ["cat", "sat"], ["x"], ["the", "x"]):
            assert a.ngram_log10_prob(g) == b.ngram_log10_prob(g)


class TestJMTuning:
    def test_grid_matches_sequential(self, ray_session):
        """Distributed grid tuning equals the sequential per-doc loop on
        a tiny split corpus (even docs train, odd docs score)."""
        import ray.data

        from topicrawler_ray.lm.backoff import NgramCounts
        from topicrawler_ray.lm.jm import JelinekMercerLM
        from topicrawler_ray.lm.tune import heldout_perplexity_e6, tune_jm

        docs = [
            {"doc_id": 0, "text": "the cat sat on the mat"},
            {"doc_id": 1, "text": "the cat sat"},
            {"doc_id": 2, "text": "a dog sat on a log"},
            {"doc_id": 3, "text": "a dog ran on the mat"},
        ]
        got = tune_jm(
            ray.data.from_items(docs).repartition(2), order=3
        ).to_pylist()

        counts = NgramCounts(3)
        for d in docs:
            if d["doc_id"] % 2 == 0:
                counts.add_sequence(d["text"].split(" "))
        exp = []
        for lam_e1 in range(1, 10):
            lm = JelinekMercerLM(counts, lam_e1 / 10.0)
            s = sum(
                heldout_perplexity_e6(lm, d["text"], 3)
                for d in docs
                if d["doc_id"] % 2 == 1
            )
            exp.append((lam_e1, s, 2))
        best = min((s, l) for l, s, _ in exp)[1]
        assert [
            (r["lam_e1"], r["sum_perp_e6"], r["n_docs"]) for r in got
        ] == exp
        assert [r["is_best"] for r in got] == [l == best for l, _, _ in exp]

    def test_best_is_unique_and_finite(self, ray_session):
        import ray.data

        from topicrawler_ray.lm.tune import tune_jm

        docs = [
            {"doc_id": i, "text": "w%d common word stream %d" % (i % 5, i)}
            for i in range(12)
        ]
        out = tune_jm(ray.data.from_items(docs), order=2).to_pylist()
        assert sum(r["is_best"] for r in out) == 1
        assert all(r["sum_perp_e6"] > 0 for r in out)
