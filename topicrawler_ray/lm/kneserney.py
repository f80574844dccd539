"""Kneser-Ney language model - faithful port of
``lt.lm/.../lucenebased/KneserNeyLM.java`` over in-memory count tables.

The reference reads (num, nf_N1..3, np_N1..3, nfp_N1..3) per n-gram from
a Lucene index built by ``GenerateNgramIndex``; here :class:`KNStats`
derives the same tables from :class:`~.backoff.NgramCounts` (or from the
distributed count job in ``lm/build.py``):

* ``nf(h)``  = distinct continuations of history h, bucketed by their
  count being 1 / 2 / >=3 (``mr_ngram_nfollow.py``; the accessor value
  ``[0]`` is N1+N2+N3, ``KneserNeyLM.java:350-363``),
* ``np(g)``  = distinct predecessors of suffix g,
* ``nfp(m)`` = distinct (v, w) surrounds of middle m,
* discounts ``D[n] = N1/(N1 + 2*N2)`` auto-estimated from the
  count-of-counts table with the reference's adjustment loop
  (``KneserNeyLM.java:106-122``),
* the uniform floor ``ud = (D[1]/num_unigrams) * (1/num_bigrams)`` and
  the continuation-aware ``punk`` (``KneserNeyLM.java:131-161``).

``kn()`` is a line-by-line port of ``KneserNeyLM.kn`` (:196-343)
including the mincount-pruning hacks (nfph >= max(nf, np), nf reset to
1, fallback paths on zero denominators).
"""

from __future__ import annotations

import math
from collections import defaultdict

from .backoff import NgramCounts

_ln = math.log
_exp = math.exp


class KNStats:
    """Count tables + continuation stats the KN formula needs."""

    def __init__(self, counts: NgramCounts, max_c: int = 6):
        self.order = counts.order
        self.counts = counts
        nf: dict[tuple, list[int]] = defaultdict(lambda: [0, 0, 0])
        np_: dict[tuple, list[int]] = defaultdict(lambda: [0, 0, 0])
        nfp: dict[tuple, list[int]] = defaultdict(lambda: [0, 0, 0])
        for k in range(2, counts.order + 1):
            for ngram, c in counts.counts[k].items():
                b = 0 if c == 1 else (1 if c == 2 else 2)
                nf[ngram[:-1]][b] += 1
                np_[ngram[1:]][b] += 1
                if k >= 3:
                    nfp[ngram[1:-1]][b] += 1
        self.nf = dict(nf)
        self.np = dict(np_)
        self.nfp = dict(nfp)
        # count-of-counts N[n][i] + totals (the __sum_ngrams__ stats)
        self.N = [[0] * max_c for _ in range(counts.order + 1)]
        self.sum_ngrams = [0] * (counts.order + 1)
        self.num_ngrams = [0] * (counts.order + 1)
        for n in range(1, counts.order + 1):
            for c in counts.counts[n].values():
                self.N[n][min(c, max_c - 1)] += 1
                self.sum_ngrams[n] += c
            self.num_ngrams[n] = len(counts.counts[n])
            self.N[n][0] = self.num_ngrams[n]

    def count(self, ngram: tuple) -> int:
        return self.counts.count(ngram)

    def _stat(self, table: dict, ngram: tuple) -> float:
        v = table.get(ngram)
        return float(v[0] + v[1] + v[2]) if v else 0.0


class KneserNeyLM:
    def __init__(self, stats: KNStats, discount: float = -1.0,
                 static_punk_log10: float | None = None):
        self.stats = stats
        self.order = stats.order
        self._D = [0.7] * (self.order + 1)
        if 0.0 <= discount <= 1.0:
            self._D = [discount] * (self.order + 1)
        else:
            # auto-estimate per order (KneserNeyLM.java:106-122)
            for n in range(1, self.order + 1):
                N = list(stats.N[n])
                for i in range(len(N) - 1, 1, -1):
                    if N[i] == 0:
                        N[i] = 1
                    if i * N[i] >= (i - 1) * N[i - 1]:
                        N[i - 1] = N[i] * i + 1
                self._D[n] = N[1] / (N[1] + 2.0 * N[2])
        if static_punk_log10 is not None and math.isfinite(static_punk_log10):
            self._use_static_punk = True
            self._ud = 10.0**static_punk_log10
            self._up_log = float("nan")
            self._uw_log = float("nan")
        else:
            self._use_static_punk = False
            self._up_log = -_ln(max(1, stats.num_ngrams[2]))
            self._uw_log = _ln(self._D[1]) - _ln(max(1, stats.num_ngrams[1]))
            self._ud = _exp(self._up_log + self._uw_log)

    # -- accessors mirroring the Lucene-doc readers ------------------------
    def _nf(self, ngram: tuple) -> float:
        return self.stats._stat(self.stats.nf, ngram)

    def _np(self, ngram: tuple) -> float:
        return self.stats._stat(self.stats.np, ngram)

    def _nfp(self, ngram: tuple) -> float:
        return self.stats._stat(self.stats.nfp, ngram)

    def ngram_ends_with_oov(self, ngram: list[str]) -> bool:
        return self.stats.count((ngram[-1],)) == 0

    def ngram_contains_oov(self, ngram: list[str]) -> bool:
        return any(self.stats.count((w,)) == 0 for w in ngram)

    # -- punk (KneserNeyLM.java:150-161) -----------------------------------
    def punk(self, ngram: list[str]) -> float:
        if self._use_static_punk:
            return self._ud
        if len(ngram) < 2:
            return self._ud
        bigram_hist = tuple(ngram[len(ngram) - 2 : len(ngram) - 1])
        nom = self._nf(bigram_hist)
        if nom == 0:
            return self._ud
        up = _ln(nom) - _ln(max(1, self.stats.num_ngrams[2]))
        return _exp(up + self._uw_log)

    # -- probability (KneserNeyLM.java:168-194) ----------------------------
    def ngram_prob(self, ngram: list[str]) -> float:
        punk = self.punk(ngram)
        prob = self.kn(ngram, punk)
        if math.isnan(prob):
            return self._ud
        if prob > 1.0:
            return 1.0
        if prob < punk:
            return punk
        return prob

    _SCORE_CACHE_MAX = 1 << 20

    def ngram_log10_prob(self, ngram: list[str]) -> float:
        # memoized per instance (pure function of the ngram; lazy init
        # so pickled artifacts without the attr still load)
        cache = self.__dict__.get("_score_cache")
        if cache is None:
            cache = self.__dict__["_score_cache"] = {}
        key = tuple(ngram)
        v = cache.get(key)
        if v is None:
            v = math.log10(self.ngram_prob(ngram))
            if len(cache) < self._SCORE_CACHE_MAX:
                cache[key] = v
        return v

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_score_cache", None)  # never ship the cache
        return state

    # -- the KN recursion, iterative form (KneserNeyLM.java:196-343) -------
    def kn(self, ngram: list[str], punk: float) -> float:
        st = self.stats
        n = len(ngram)
        if n < 1:
            return punk
        if self.ngram_ends_with_oov(ngram):
            return punk

        lp = 0.0
        nfh_prev = 0.0
        hist_prev: tuple | None = None
        ch = 0.0

        # unigram continuation probability
        last = tuple(ngram[n - 1 : n])
        nom = self._np(last)
        denom = st.num_ngrams[2]
        if nom == 0:
            nom = st.count(last)
            if nom == 0:
                return _exp(-_ln(max(1, st.num_ngrams[1])))  # 1/num_unigrams
            return _exp(_ln(nom) - _ln(max(1, st.sum_ngrams[1])))  # c(w)/sum
        pkn = _exp(_ln(nom) - _ln(denom))

        ngram_cur = last
        i = 2
        while i < n and i < self.order:
            hist = tuple(ngram[n - i : n - 1])
            nfph = self._nfp(hist)
            nfh = self._nf(hist)
            nph = self._np(hist)
            nfph = max(nfh, nph, nfph)  # mincount-pruning correction
            if nfph == 0:
                if ch != 0 and lp != 0 and nfh_prev != 0 and hist_prev is not None:
                    nom = st.count(ngram_cur)
                    denom_l = _ln(ch)
                    nom = max(nom - self._D[i], 0.0)
                    p = _exp(_ln(nom) - denom_l) if nom != 0 else 0.0
                    lw = (_ln(self._D[i]) - denom_l) + _ln(nfh_prev)
                    pkn = p + _exp(lw + _ln(lp))
                return pkn
            denom_l = _ln(nfph)
            ngram_cur = tuple(ngram[n - i : n])
            nom = self._np(ngram_cur)
            ch = float(st.count(hist))
            if nfh == 0:
                nfh = 1.0  # pruning hack (KneserNeyLM.java:262-268)
            lp = pkn
            lw = (_ln(self._D[i]) - denom_l) + _ln(nfh)
            nom = max(nom - self._D[i], 0.0)
            p = _exp(_ln(nom) - denom_l) if nom != 0 else 0.0
            pkn = p + _exp(lw + _ln(lp))
            if nom == 0:
                return pkn
            nfh_prev = nfh
            hist_prev = hist
            i += 1

        # full-order step
        hist = tuple(ngram[max(0, n - self.order) : n - 1])
        ch = float(st.count(hist))
        if ch == 0:
            if hist_prev is not None:
                ch2 = float(st.count(hist_prev))
                if ch2 != 0 and lp != 0 and nfh_prev != 0:
                    nom = st.count(ngram_cur)
                    denom_l = _ln(ch2)
                    nom = max(nom - self._D[n], 0.0)
                    p = _exp(_ln(nom) - denom_l) if nom != 0 else 0.0
                    lw = (_ln(self._D[n]) - denom_l) + _ln(nfh_prev)
                    pkn = p + _exp(lw + _ln(lp))
            return pkn
        ngram_cur = tuple(ngram[max(0, n - self.order) : n])
        nom = st.count(ngram_cur)
        denom_l = _ln(ch)
        nfh = self._nf(hist)
        if nfh == 0:
            nfh = 1.0
        lp = pkn
        nom = max(nom - self._D[n], 0.0)
        p = _exp(_ln(nom) - denom_l) if nom != 0 else 0.0
        lw = (_ln(self._D[n]) - denom_l) + _ln(nfh)
        return p + _exp(lw + _ln(lp))


def build_kneser_ney(counts: NgramCounts, discount: float = -1.0) -> KneserNeyLM:
    return KneserNeyLM(KNStats(counts), discount)
