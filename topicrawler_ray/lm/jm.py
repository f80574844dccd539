"""Jelinek-Mercer interpolated n-gram language model.

The classic fixed-weight linear interpolation (Jelinek & Mercer 1980;
Chen & Goodman 1999 eq. 4): for a k-gram with history h,

    P_k(w | h) = lambda * ML_k(w | h) + (1 - lambda) * P_{k-1}(w | h')

recursing down to the uniform base P_0 = 1 / (V + 1) (the +1 reserves
mass for OOV, the same convention as the stupid-backoff ``ud`` floor,
``lt.lm/.../lucenebased/StupidBackoffLM.java:31-137``).  Every ngram -
including all-OOV ones - gets probability >= (1-lambda)^order / (V+1),
so log-scores are always finite.

Completes the smoothing family next to F14 Laplace (``counting.py``),
F15 MLE, F16 Kneser-Ney (``kneserney.py``) and F17 backoff
(``backoff.py``); scorer-protocol compatible (``order``,
``ngram_log10_prob``, ``ngram_ends_with_oov``) so it drops into the
same actor-pool :class:`~topicrawler_ray.stages.score.PerplexityScorer`
stage and the sequential oracle path unchanged.
"""

from __future__ import annotations

import math

from .backoff import FrozenCounts, NgramCounts


class JelinekMercerLM:
    """Scorer protocol over :class:`NgramCounts` / :class:`FrozenCounts`."""

    def __init__(self, counts, lam: float = 0.7, total_unigrams: int | None = None):
        if not 0.0 < lam < 1.0:
            raise ValueError("lambda must be in (0, 1)")
        self._c = counts
        self.order = counts.order
        self._lam = lam
        self._base = 1.0 / (counts.num_distinct(1) + 1)
        if total_unigrams is None:
            if isinstance(counts, NgramCounts):
                total_unigrams = counts.total(1)
            else:
                raise ValueError(
                    "FrozenCounts carries no totals - pass total_unigrams"
                )
        self._t1 = total_unigrams

    def ngram_ends_with_oov(self, ngram: list[str]) -> bool:
        return self._c.count((ngram[-1],)) == 0

    def ngram_contains_oov(self, ngram: list[str]) -> bool:
        return any(self._c.count((w,)) == 0 for w in ngram)

    def score(self, ngram: list[str]) -> float:
        n = len(ngram)
        if n < 1:
            return self._base
        c = self._c
        lam = self._lam
        p = self._base
        for k in range(1, min(n, self.order) + 1):
            sub = tuple(ngram[n - k : n])
            if k == 1:
                denom = self._t1
            else:
                denom = c.count(sub[:-1])
            ml = c.count(sub) / denom if denom > 0 else 0.0
            p = lam * ml + (1.0 - lam) * p
        return p

    _SCORE_CACHE_MAX = 1 << 20

    def ngram_log10_prob(self, ngram: list[str]) -> float:
        cache = self.__dict__.get("_score_cache")
        if cache is None:
            cache = self.__dict__["_score_cache"] = {}
        key = tuple(ngram)
        v = cache.get(key)
        if v is None:
            v = math.log10(self.score(ngram))
            if len(cache) < self._SCORE_CACHE_MAX:
                cache[key] = v
        return v

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_score_cache", None)
        return state


def build_jelinek_mercer(
    counts: NgramCounts, lam: float = 0.7, freeze: bool = True
) -> JelinekMercerLM:
    """Build a JM model; ``freeze=True`` swaps the tuple-keyed counter
    for packed-int :class:`FrozenCounts` (identical counts, cheaper to
    broadcast/unpickle per scorer actor)."""
    t1 = counts.total(1)
    if freeze:
        return JelinekMercerLM(FrozenCounts(counts), lam, total_unigrams=t1)
    return JelinekMercerLM(counts, lam, total_unigrams=t1)
