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
