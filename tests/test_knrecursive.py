"""Recursive / modified KN family vs hand-computed goldens and the
reference's property suite (``KneserNeyTests.java:120-148``: every
indexed n-gram has a finite, non-NaN log10 probability <= ~0)."""

import math

import pytest

from topicrawler_ray.lm.backoff import NgramCounts
from topicrawler_ray.lm.kneserney import KNStats
from topicrawler_ray.lm.knrecursive import (
    KneserNeyLMRecursive,
    ModifiedKneserNeyLMRecursive,
    OneBackoffKneserNeyLM,
    PoptKneserNeyLMRecursive,
)


def _tiny_counts() -> NgramCounts:
    # corpus: "a b", "a c", "b a" -> c(a)=3 c(b)=2 c(c)=1;
    # bigrams (a,b) (a,c) (b,a) each once
    c = NgramCounts(2)
    c.add_sequence(["a", "b"])
    c.add_sequence(["a", "c"])
    c.add_sequence(["b", "a"])
    return c


def _prop_counts() -> NgramCounts:
    c = NgramCounts(3)
    sents = [
        "the quick brown fox jumps over the lazy dog".split(),
        "the quick brown cat sleeps".split(),
        "a lazy dog sleeps all day".split(),
        "the cat and the dog".split(),
        "a quick cat jumps".split(),
    ]
    for s in sents:
        c.add_sequence(s)
    return c


# hand-derived on paper from the KneserNeyLMRecursive.java formulas with
# D = 0.7: lower p(b) = 0.3/3 + (0.7/3)*(1/4) = 19/120;
# p(b|a) = 0.3/3 + (0.7/3)*2 * 19/120 = 313/1800
def test_kn_recursive_hand_golden():
    lm = KneserNeyLMRecursive(KNStats(_tiny_counts()), discount=0.7)
    assert lm.kn_recursive(["b"], True, 1) == pytest.approx(19 / 120, abs=1e-15)
    assert lm.ngram_prob(["a", "b"]) == pytest.approx(313 / 1800, abs=1e-15)


def test_modified_kn_hand_golden():
    lm = ModifiedKneserNeyLMRecursive(KNStats(_tiny_counts()), discount=0.7)
    # all counts are 1 -> D1 everywhere -> identical to plain recursive
    assert lm.ngram_prob(["a", "b"]) == pytest.approx(313 / 1800, abs=1e-15)
    # ud = (D[1]/num_bigrams) * 1/(num_unigrams+1) = (0.7/3)/4
    assert lm._ud == pytest.approx(7 / 120, abs=1e-15)
    # OOV last word short-circuits to ud (ModifiedKN...java:106-107)
    assert lm.ngram_prob(["a", "zzz"]) == pytest.approx(7 / 120, abs=1e-15)


# popt: lower p(b) = np(b)/num_bigrams = 1/3 (no discounting at base);
# p(b|a) = 0.3/3 + (0.7/3)*2 * 1/3 = 23/90
def test_popt_kn_hand_golden():
    lm = PoptKneserNeyLMRecursive(KNStats(_tiny_counts()), discount=0.7)
    assert lm.ngram_prob(["a", "b"]) == pytest.approx(23 / 90, abs=1e-15)
    assert lm.ngram_prob(["a", "zzz"]) == pytest.approx(lm._ud, abs=1e-18)


# one-backoff: pkn = np(b)/num_bigrams = 1/3, then one interpolation:
# 0.3/3 + (2*0.7/3) * 1/3 = 23/90 (> punk = (2/3)*(0.7/3) = 1.4/9)
def test_one_backoff_hand_golden():
    lm = OneBackoffKneserNeyLM(KNStats(_tiny_counts()), discount=0.7)
    assert lm.ngram_prob(["a", "b"]) == pytest.approx(23 / 90, abs=1e-15)
    # OOV-final ngram floors at punk
    p = lm.ngram_prob(["a", "zzz"])
    assert p == pytest.approx(lm.punk(["a", "zzz"]), abs=1e-18)


@pytest.mark.parametrize("discount", [0.7, -1.0])
@pytest.mark.parametrize(
    "cls",
    [
        KneserNeyLMRecursive,
        ModifiedKneserNeyLMRecursive,
        PoptKneserNeyLMRecursive,
        OneBackoffKneserNeyLM,
    ],
)
def test_reference_property_suite(cls, discount):
    """KneserNeyTests.testProbabilities over every indexed ngram:
    logprob <= log(1.001), finite, not NaN."""
    counts = _prop_counts()
    lm = cls(KNStats(counts), discount=discount)
    n_checked = 0
    for k in range(1, counts.order + 1):
        for ngram in counts.counts[k]:
            lp = lm.ngram_log10_prob(list(ngram))
            assert lp <= math.log(1.001), (ngram, lp)
            assert math.isfinite(lp), (ngram, lp)
            n_checked += 1
    assert n_checked > 50


def test_seen_beats_unseen_ordering():
    """The reference's bear/cat ordering spirit: an attested bigram
    scores at least as high as an unattested one with the same
    history."""
    counts = _prop_counts()
    for cls in (
        KneserNeyLMRecursive,
        ModifiedKneserNeyLMRecursive,
        PoptKneserNeyLMRecursive,
        OneBackoffKneserNeyLM,
    ):
        lm = cls(KNStats(counts), discount=0.7)
        seen = lm.ngram_log10_prob(["quick", "brown"])
        unseen = lm.ngram_log10_prob(["quick", "dog"])
        assert seen >= unseen, cls.__name__


def test_mkn_auto_discounts_estimated():
    lm = ModifiedKneserNeyLMRecursive(KNStats(_prop_counts()), discount=-1.0)
    for n in range(1, lm.order + 1):
        for d in (lm._D1[n], lm._D2[n], lm._D3p[n]):
            assert 0.05 <= d <= 0.95
        assert 0.05 <= lm._D[n] <= 0.5


def test_registry_and_scorer_protocol():
    """All four variants resolve through the registry and satisfy the
    PerplexityScorer protocol (order / ngram_log10_prob /
    ngram_ends_with_oov)."""
    from topicrawler_ray.registry import resolve

    counts = _prop_counts()
    for name in (
        "kneser_ney_recursive",
        "modified_kneser_ney",
        "popt_kneser_ney",
        "one_backoff_kneser_ney",
    ):
        lm = resolve("scorer_lm", name)(counts)
        assert lm.order == 3
        assert math.isfinite(lm.ngram_log10_prob(["the", "quick", "brown"]))
        assert lm.ngram_ends_with_oov(["the", "zzz"])
        assert not lm.ngram_ends_with_oov(["zzz", "the"])
