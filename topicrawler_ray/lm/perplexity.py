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


def _document_perplexity_packed(lm, text: str) -> float:
    """Id-space fast path of :func:`document_perplexity` for
    ``StupidBackoffLM`` over ``FrozenCounts``.

    Words are mapped to vocab ids once per sentence; each full-width
    window key is derived by rolling integer arithmetic and memoized in a
    per-LM ``int -> log10`` cache (OOV-containing windows fall back to the
    generic tuple-keyed path).  Window order, skip rules and the
    sequential float accumulation mirror the generic loop exactly, so the
    result is bit-identical.
    """
    from ..functions.sentencemaker import get_sentences

    c = lm._c
    vocab = c.vocab
    b = c.base
    order = lm.order
    cache = lm.__dict__.get("_packed_doc_cache")
    if cache is None:
        cache = lm.__dict__["_packed_doc_cache"] = {}
    perp = ModelPerplexity(lm)
    n_total = 0
    sum_total = 0.0
    log10 = math.log10
    score_ids = lm._score_ids
    generic = lm.ngram_log10_prob
    for sentence in get_sentences(text, min_length=2):
        # windows per outer sentence, concatenated across inner sentences
        # (text_ngrams semantics); each entry is (packed_key|None, tokens, ids)
        wins: list[tuple] = []
        for inner in split_sentences(sentence):
            tokens = filtered_and_normalized_tokens(inner)
            if not tokens:
                continue
            tokens = ngram_mod.insert_sentence_tags(tokens, mode=3)
            l = len(tokens)
            ids = [vocab.get(w) for w in tokens]
            if l == 1 or l <= order:
                # single (possibly short) window == whole sequence
                key = None
                if None not in ids:
                    key = 0
                    for i in ids:
                        key = key * b + (i + 1)
                wins.append((key, tokens, ids, l))
                continue
            o = order
            top = b ** (o - 1)
            # rolling packed key over full-width windows
            key = 0
            ok = True
            for i in ids[:o]:
                if i is None:
                    ok = False
                    break
                key = key * b + (i + 1)
            wins.append((key if ok else None, tokens[:o], ids[:o], o))
            for j in range(1, l - o + 1):
                w_out = ids[j - 1]
                w_in = ids[j + o - 1]
                if ok and w_out is not None and w_in is not None:
                    key = (key - (w_out + 1) * top) * b + (w_in + 1)
                # re-anchor when the outgoing window was not packable
                elif w_in is not None and None not in ids[j : j + o]:
                    key = 0
                    for i in ids[j : j + o]:
                        key = key * b + (i + 1)
                    ok = True
                else:
                    ok = False
                if ok:
                    wins.append((key, None, None, o))
                else:
                    wins.append((None, tokens[j : j + o], ids[j : j + o], o))
        if not wins:
            continue
        if wins[-1][3] < order:
            continue
        for key, tokens, ids, _l in wins:
            if key is not None:
                lp = cache.get(key)
                if lp is None:
                    if ids is None:
                        # rolling windows skip materializing ids; recover
                        # by decoding is wasteful - score via packed key
                        # decomposition is unnecessary: score_ids needs
                        # ids, so decode from the key
                        ids = _unpack_key(key, b)
                    lp = log10(score_ids(ids, len(ids)))
                    if len(cache) < 1 << 20:
                        cache[key] = lp
            else:
                lp = generic(tokens)
            n_total += 1
            sum_total += lp
    perp._sum_ngrams = n_total
    perp._sum_log10 = sum_total
    return perp.get()


def _unpack_key(key: int, b: int) -> list[int]:
    digits = []
    while key:
        digits.append(key % b - 1)
        key //= b
    digits.reverse()
    return digits


def document_perplexity(lm, text: str) -> float:
    """``DecesiveValueProducerPerplexity.computePerplexity``
    (``DecesiveValueProducerPerplexity.java:140-152`` with the cxml:205-218
    wiring): SentenceMaker sentences (minLength=2 words, readable-rendered)
    -> ``LtSegProvider.getNgrams`` per sentence; sentences with no n-grams
    or whose last n-gram is shorter than the LM order are skipped."""
    from ..functions.sentencemaker import get_sentences
    from .backoff import FrozenCounts, StupidBackoffLM

    if type(lm) is StupidBackoffLM and isinstance(lm._c, FrozenCounts):
        return _document_perplexity_packed(lm, text)

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
