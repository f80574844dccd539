"""Document perplexity - port of ``ModelPerplexity``
(``lt.lm/.../perplexity/ModelPerplexity.java:55-125``) and the crawl
scorer's document loop
(``DecesiveValueProducerPerplexity.computePerplexity``,
``lt.ltbot/.../postprocessor/DecesiveValueProducerPerplexity.java:140-152``).
"""

from __future__ import annotations

import math

from ..functions import ngrams as ngram_mod
from ..functions.sentences import split_sentences
from ..functions.tokenizer import filtered_and_normalized_tokens


class ModelPerplexity:
    """Accumulating perplexity ``10^(-sum_log10/N)``.

    The base perplexity is initialised from ``<unk>^order`` exactly like
    the reference ctor: for models where that n-gram scores -inf the
    ctor's ``get()`` reads the still-unset field, so base == 0.0
    (``ModelPerplexity.java:28-43`` quirk, preserved).
    """

    def __init__(self, lm):
        self._lm = lm
        self._sum_ngrams = 0
        self._sum_log10 = 0.0
        self._base = 0.0
        unk = [ngram_mod.UNKNOWN_WORD] * lm.order
        self.add_log10_prob(unk)
        self._base = self.get()
        self.reset()

    def reset(self) -> None:
        self._sum_ngrams = 0
        self._sum_log10 = 0.0

    def add_log10_prob(self, ngram: list[str]) -> float:
        lp = self._lm.ngram_log10_prob(ngram)
        self._sum_ngrams += 1
        self._sum_log10 += lp
        return lp

    @property
    def n(self) -> int:
        return self._sum_ngrams

    @property
    def sum_log10(self) -> float:
        return self._sum_log10

    def get(self) -> float:
        if self._sum_ngrams == 0 or not math.isfinite(self._sum_log10):
            return self._base
        return math.pow(10.0, -(self._sum_log10 / self._sum_ngrams))


def calculate_perplexity(lm, ngram_seq: list[list[str]], skip_oov: bool) -> float:
    """Static ``ModelPerplexity.calculatePerplexity`` (returns
    ``Integer.MAX_VALUE`` == 2147483647.0 on empty/infinite sums)."""
    sum_log10 = 0.0
    n_oov = 0
    for ngram in ngram_seq:
        if skip_oov and lm.ngram_ends_with_oov(ngram):
            n_oov += 1
            continue
        sum_log10 += lm.ngram_log10_prob(ngram)
    n = len(ngram_seq) - n_oov
    if n == 0 or not math.isfinite(sum_log10):
        return float(2**31 - 1)
    return math.pow(10.0, -(sum_log10 / n))


def text_ngrams(text: str, order: int) -> list[list[str]]:
    """``LtSegProvider.getNgrams``: sentences -> tokens (+<s></s>) ->
    n-gram windows, concatenated across sentences."""
    out: list[list[str]] = []
    for sentence in split_sentences(text):
        tokens = filtered_and_normalized_tokens(sentence)
        if not tokens:
            continue
        tokens = ngram_mod.insert_sentence_tags(tokens, mode=3)
        out.extend(ngram_mod.ngram_sequence(tokens, order, boundary_mode=0))
    return out


def document_perplexity(lm, text: str) -> float:
    """``DecesiveValueProducerPerplexity.computePerplexity``
    (``DecesiveValueProducerPerplexity.java:140-152`` with the cxml:205-218
    wiring): SentenceMaker sentences (minLength=2 words, readable-rendered)
    -> ``LtSegProvider.getNgrams`` per sentence; sentences with no n-grams
    or whose last n-gram is shorter than the LM order are skipped."""
    from ..functions.sentencemaker import get_sentences

    perp = ModelPerplexity(lm)
    for sentence in get_sentences(text, min_length=2):
        ngrams = text_ngrams(sentence, lm.order)
        if len(ngrams) < 1:
            continue
        if len(ngrams[-1]) < lm.order:
            continue
        for ngram in ngrams:
            perp.add_log10_prob(ngram)
    return perp.get()
