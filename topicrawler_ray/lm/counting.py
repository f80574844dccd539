"""Map-based counting language models.

Ports of ``lt.lm/.../mapbased/CountingLM.java:42-180`` and
``LaplaceSmoothedLM.java:38-57``.  N-grams are stored as tuples of word
ids; OOV words map to id -1 (``AbstractLanguageModel.getWordIndex``).

``_sum_one_grams`` counts each added unigram AND each added bigram (a
quirk of ``CountingLM.addNgramAsIds``: ``lt.lm/.../mapbased/CountingLM.java:142-152``)
- preserved exactly, it feeds unigram probabilities.
"""

from __future__ import annotations

import math
from collections import Counter


class CountingLM:
    """Unsmoothed MLE n-gram model: log10(c(ngram) / c(history))."""

    def __init__(self, order: int):
        self.order = order
        self.index: list[str] = []
        self.inv_index: dict[str, int] = {}
        self.sum_one_grams = 0
        self.ngrams_of_order: Counter[tuple[int, ...]] = Counter()
        self.ngrams_of_lower_order: Counter[tuple[int, ...]] = Counter()

    # -- vocabulary --------------------------------------------------------
    def get_word_index(self, word: str) -> int:
        idx = self.inv_index.get(word)
        return -1 if idx is None else idx

    def get_or_add_word(self, word: str) -> int:
        idx = self.inv_index.get(word)
        if idx is None:
            idx = len(self.index)
            self.index.append(word)
            self.inv_index[word] = idx
        return idx

    def to_id_tuple(self, ngram: list[str]) -> tuple[int, ...]:
        return tuple(self.get_word_index(w) for w in ngram)

    # -- training ----------------------------------------------------------
    def add_ngram(self, ngram: list[str]) -> None:
        for w in ngram:
            self.get_or_add_word(w)
        self.add_ngram_ids(self.to_id_tuple(ngram))

    def add_ngram_ids(self, ngram: tuple[int, ...]) -> None:
        assert 0 < len(ngram) <= self.order
        self.ngrams_of_order[ngram] += 1
        if len(ngram) == 1:
            self.sum_one_grams += 1
            return
        self.ngrams_of_lower_order[ngram[:-1]] += 1
        if len(ngram) == 2:
            self.sum_one_grams += 1

    def add_ngram_sequence(self, ngram_sequence: list[list[str]]) -> None:
        for ngram in ngram_sequence:
            self.add_ngram(ngram)

    # -- scoring -----------------------------------------------------------
    def ngram_log10_prob_ids(self, ngram: tuple[int, ...]) -> float:
        if len(ngram) < 1:
            return -math.inf
        nom = self.ngrams_of_order.get(ngram, 0)
        if nom == 0:
            return -math.inf
        if len(ngram) == 1:
            return math.log10(nom) - math.log10(self.sum_one_grams)
        den = self.ngrams_of_lower_order.get(ngram[:-1], 0)
        if den == 0:
            return -math.inf
        return math.log10(nom) - math.log10(den)

    def ngram_log10_prob(self, ngram: list[str]) -> float:
        return self.ngram_log10_prob_ids(self.to_id_tuple(ngram))

    def ngram_ends_with_oov(self, ngram: list[str]) -> bool:
        return self.get_word_index(ngram[-1]) < 0

    def ngram_contains_oov(self, ngram: list[str]) -> bool:
        return any(self.get_word_index(w) < 0 for w in ngram)


class LaplaceSmoothedLM(CountingLM):
    """Add-one smoothing over a trained :class:`CountingLM`
    (``LaplaceSmoothedLM.getNgramLogProbabilityFromIds``)."""

    def __init__(self, base: CountingLM):
        self.order = base.order
        self.index = base.index
        self.inv_index = base.inv_index
        # the reference ctor resets _sum_one_grams to 0 instead of copying
        # (LaplaceSmoothedLM.java:33) - preserved for score parity
        self.sum_one_grams = 0
        self.ngrams_of_order = base.ngrams_of_order
        self.ngrams_of_lower_order = base.ngrams_of_lower_order

    def ngram_log10_prob_ids(self, ngram: tuple[int, ...]) -> float:
        if len(ngram) < 1:
            return -math.inf
        v = len(self.index)
        nom = self.ngrams_of_order.get(ngram, 0) + 1
        if len(ngram) == 1:
            return math.log10(nom) - math.log10(self.sum_one_grams + v)
        den = self.ngrams_of_lower_order.get(ngram[:-1], 0) + v
        return math.log10(nom) - math.log10(den)
