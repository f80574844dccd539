"""Recursive / modified Kneser-Ney LM family - faithful ports of the
reference's four remaining smoothing variants over the same in-memory
:class:`~.kneserney.KNStats` count tables the iterative KN uses:

* :class:`KneserNeyLMRecursive` -
  ``lt.lm/.../lucenebased/KneserNeyLMRecursive.java:50-118`` - the
  textbook top-down interpolated KN recursion ``pkn = p + lw * lp``
  with a bounded number of backoff recursion steps
  (``lt.lm.knMaxbackoffrecursions``, default -1 = LM order).
* :class:`ModifiedKneserNeyLMRecursive` -
  ``ModifiedKneserNeyLMRecursive.java:36-178`` - Chen & Goodman's
  three-discount variant (D1/D2/D3+ per order, estimated from the
  count-of-counts table) with the OOV fast path ``p(unk) = ud``.
* :class:`PoptKneserNeyLMRecursive` -
  ``PoptKneserNeyLMRecursive.java:24-90`` - the "popt" variant that
  backs off with weight 1 on zero counts and scores unigrams by raw
  continuation probability.
* :class:`OneBackoffKneserNeyLM` -
  ``OneBackoffKneserNeyLM.java:34-88`` - exactly one backoff step:
  continuation probability of the (order-1)-suffix, interpolated once
  with the full-order discounted estimate.

Semantics notes (all verified against the Java line by line):

* The recursive family does NOT floor probabilities at ``punk`` - its
  ``getNgramProbability`` (``KneserNeyLMRecursive.java:49-67``) maps
  NaN -> 0 and clamps > 1 -> 1, nothing else.  Only
  :class:`OneBackoffKneserNeyLM` inherits the base-class wrapper with
  the punk floor (``KneserNeyLM.java:168-194``).
* Java double division by zero yields +-Inf / NaN rather than raising;
  :func:`_jdiv` reproduces that so unguarded divisions in the Java
  land in the same NaN->0 / >1->1 wrapper clamps.
* ``OneBackoffKneserNeyLM`` indexes ``subList(n-order+1, n)`` which
  throws in Java for unigram queries with order >= 3 (the branch is
  unreachable in the reference's own harness); the port defines the
  unigram case as the natural continuation probability
  ``np(w) / num_bigrams`` - the same denominator convention the
  reachable ``n == 2`` branch uses.
"""

from __future__ import annotations

import math

from .kneserney import KneserNeyLM, KNStats

_NAN = float("nan")
_INF = float("inf")


def _jdiv(nom: float, denom: float) -> float:
    """Java double division: x/0 -> +-Inf, 0/0 -> NaN (Python raises)."""
    if denom == 0.0:
        if nom == 0.0:
            return _NAN
        return _INF if nom > 0 else -_INF
    return nom / denom


class KneserNeyLMRecursive(KneserNeyLM):
    """``KneserNeyLMRecursive.java`` - top-down interpolated KN."""

    def __init__(self, stats: KNStats, discount: float = -1.0,
                 num_recursions: int = -1,
                 static_punk_log10: float | None = None):
        super().__init__(stats, discount, static_punk_log10)
        # Properties.knMaxbackoffrecursions(): -1 = recurse to uniform
        self._num_recursions = (
            num_recursions if num_recursions >= 0 else self.order
        )

    # KneserNeyLMRecursive.java:49-67 - no punk floor, NaN -> 0, >1 -> 1
    def ngram_prob(self, ngram: list[str]) -> float:
        prob = self.kn_recursive(list(ngram), False, self._num_recursions)
        if math.isnan(prob):
            return 0.0
        if prob > 1.0:
            return 1.0
        return prob

    def is_unknown_word(self, word: str) -> bool:
        return self.stats.count((word,)) == 0

    # KneserNeyLMRecursive.java:69-118
    def kn_recursive(self, ngram: list[str], is_lower: bool,
                     num_recursions: int) -> float:
        st = self.stats
        n = len(ngram)
        if n > 1:
            hist = tuple(ngram[:-1])
            lower = ngram[1:]
            if not is_lower:
                c = float(st.count(tuple(ngram)))
                c_hist = float(st.count(hist))
                if num_recursions == 0:
                    return 0.0 if c_hist == 0 else c / c_hist
                lp = self.kn_recursive(lower, True, num_recursions - 1)
                if c_hist == 0:
                    return self._D[n] * lp
                p = max(c - self._D[n], 0.0) / c_hist
                lw = (self._D[n] / c_hist) * self._nf(hist)
                return p + lw * lp
            nom = self._np(tuple(ngram))
            denom = self._nfp(hist)
            if num_recursions == 0:
                return 0.0 if denom == 0 else nom / denom
            lp = self.kn_recursive(lower, True, num_recursions - 1)
            if denom == 0:
                return self._D[n] * lp
            p = max(nom - self._D[n], 0.0) / denom
            lw = (self._D[n] / denom) * self._nf(hist)
            return p + lw * lp
        # unigram continuation prob (KneserNeyLMRecursive.java:96-117)
        if not is_lower:
            nom = float(st.count(tuple(ngram)))
            denom = float(st.sum_ngrams[2])
        else:
            nom = self._np(tuple(ngram))
            denom = float(st.num_ngrams[2])
        if num_recursions == 0:
            return _jdiv(nom, denom)
        p = _jdiv(max(nom - self._D[1], 0.0), denom)
        lw = _jdiv(self._D[1], denom)
        lp = 1.0 / (st.num_ngrams[1] + 1)
        return p + lw * lp


class ModifiedKneserNeyLMRecursive(KneserNeyLMRecursive):
    """``ModifiedKneserNeyLMRecursive.java`` - three-discount MKN."""

    def __init__(self, stats: KNStats, discount: float = -1.0,
                 num_recursions: int = -1):
        super().__init__(stats, discount, num_recursions)
        o = self.order
        self._D1 = [0.7] * (o + 1)
        self._D2 = [0.7] * (o + 1)
        self._D3p = [0.7] * (o + 1)
        auto = discount < 0 or discount > 1
        if not auto:
            self._D1 = [discount] * (o + 1)
            self._D2 = [discount] * (o + 1)
            self._D3p = [discount] * (o + 1)
        else:
            # ModifiedKneserNeyLMRecursive.java:48-77: clamp-adjusted
            # count-of-counts, Y discount, D1/D2/D3+ normalized by Y
            for n in range(1, o + 1):
                N = [float(x) for x in stats.N[n]]
                for i in range(len(N) - 1, 1, -1):
                    if N[i] == 0:
                        N[i] = 1.0
                    if i * N[i] >= (i - 1) * N[i - 1]:
                        N[i - 1] = N[i] * i + 1.0
                Y = max(0.05, min(0.5, N[1] / (N[1] + 2.0 * N[2])))
                self._D[n] = Y
                d1 = 1.0 - 2.0 * Y * (N[2] / N[1])
                d2 = 2.0 - 3.0 * Y * (N[3] / N[2])
                d3p = 3.0 - 4.0 * Y * (N[4] / N[3])
                s = d1 + d2 + d3p
                self._D1[n] = max(0.05, min(0.95, _jdiv(d1, s) * Y))
                self._D2[n] = max(0.05, min(0.95, _jdiv(d2, s) * Y))
                self._D3p[n] = max(0.05, min(0.95, _jdiv(d3p, s) * Y))
        # :86-89 - ud is recomputed unconditionally (ignores knUnkLog10Prob)
        uw = _jdiv(self._D[1], float(stats.num_ngrams[2]))
        up = 1.0 / (stats.num_ngrams[1] + 1)
        self._ud = uw * up

    # ModifiedKneserNeyLMRecursive.java:92-99
    def _discount(self, n: int, count: float) -> float:
        if count <= 0:
            return 0.0
        if count == 1:
            return self._D1[n]
        if count == 2:
            return self._D2[n]
        return self._D3p[n]

    def _nf3(self, hist: tuple) -> tuple[float, float, float]:
        v = self.stats.nf.get(hist)
        return (float(v[0]), float(v[1]), float(v[2])) if v else (0.0, 0.0, 0.0)

    # ModifiedKneserNeyLMRecursive.java:101-178
    def kn_recursive(self, ngram: list[str], is_lower: bool,
                     num_recursions: int) -> float:
        st = self.stats
        n = len(ngram)
        if self.is_unknown_word(ngram[n - 1]):
            return self._ud
        if n > 1:
            hist = tuple(ngram[:-1])
            lower = ngram[1:]
            if not is_lower:
                c = float(st.count(tuple(ngram)))
                d = self._discount(n, c)
                c_hist = float(st.count(hist))
                if num_recursions == 0:
                    return 0.0 if c_hist == 0 else c / c_hist
                lp = self.kn_recursive(lower, True, num_recursions - 1)
                if c_hist == 0:
                    return self._D[n] * lp
                p = max(c - d, 0.0) / c_hist
                n1, n2, n3 = self._nf3(hist)
                lw = (self._D1[n] * n1 + self._D2[n] * n2
                      + self._D3p[n] * n3) / c_hist
                return p + lw * lp
            nom = self._np(tuple(ngram))
            denom = self._nfp(hist)
            if num_recursions == 0:
                return 0.0 if denom == 0 else nom / denom
            lp = self.kn_recursive(lower, True, num_recursions - 1)
            d = self._discount(n, nom)
            if denom == 0:
                return self._D[n] * lp
            p = max(nom - d, 0.0) / denom
            n1, n2, n3 = self._nf3(hist)
            lw = (self._D1[n] * n1 + self._D2[n] * n2
                  + self._D3p[n] * n3) / denom
            return p + lw * lp
        # unigram (ModifiedKneserNeyLMRecursive.java:160-177)
        if not is_lower:
            nom = float(st.count(tuple(ngram)))
            denom = float(st.sum_ngrams[2])
        else:
            nom = self._np(tuple(ngram))
            denom = float(st.num_ngrams[2])
        if num_recursions == 0:
            return _jdiv(nom, denom)
        d = self._discount(n, nom)
        p = _jdiv(max(nom - d, 0.0), denom)
        lw = _jdiv(self._D[1], denom)
        lp = 1.0 / (st.num_ngrams[1] + 1)
        return p + lw * lp


class PoptKneserNeyLMRecursive(KneserNeyLMRecursive):
    """``PoptKneserNeyLMRecursive.java`` - weight-1 backoff on zero
    counts, raw continuation probability at the unigram base."""

    # PoptKneserNeyLMRecursive.java:24-90
    def kn_recursive(self, ngram: list[str], is_lower: bool,
                     num_recursions: int) -> float:
        st = self.stats
        n = len(ngram)
        if self.ngram_ends_with_oov(ngram):
            return self._ud
        if n > 1:
            hist = tuple(ngram[:-1])
            lower = ngram[1:]
            if not is_lower:
                c = float(st.count(tuple(ngram)))
                c_hist = float(st.count(hist))
                if num_recursions == 0:
                    return 0.0 if c_hist == 0 else c / c_hist
                if c == 0 or c_hist == 0:
                    # :41-45 - back off whole mass, NOT as lower order
                    return self.kn_recursive(lower, False,
                                             num_recursions - 1)
                lp = self.kn_recursive(lower, True, num_recursions - 1)
                p = max(c - self._D[n], 0.0) / c_hist
                lw = (self._D[n] / c_hist) * self._nf(hist)
                return p + lw * lp
            nom = self._np(tuple(ngram))
            denom = self._nfp(hist)
            if num_recursions == 0:
                return 0.0 if denom == 0 else nom / denom
            lp = self.kn_recursive(lower, True, num_recursions - 1)
            if denom == 0:
                return lp  # :62-66 - lw = 1
            p = max(nom - self._D[n], 0.0) / denom
            lw = (self._D[n] / denom) * self._nf(hist)
            return p + lw * lp
        # unigram (:74-88): plain continuation prob, ud fallbacks
        nom = self._np(tuple(ngram))
        denom = float(st.num_ngrams[2])
        if nom == 0:
            return self._ud
        if denom == 0:
            return self._ud
        return nom / denom


class OneBackoffKneserNeyLM(KneserNeyLM):
    """``OneBackoffKneserNeyLM.java`` - single-step backoff KN.

    Inherits the base-class probability wrapper (punk floor, NaN/OOV
    handling, ``KneserNeyLM.java:168-194``) and overrides only
    ``kn``."""

    # OneBackoffKneserNeyLM.java:34-88
    def kn(self, ngram: list[str], punk: float) -> float:
        st = self.stats
        n = len(ngram)
        o = self.order
        if n < 1:
            return punk
        if self.ngram_ends_with_oov(ngram):
            return punk
        sub = tuple(ngram[max(0, n - o + 1): n])
        nom = self._np(sub)
        if nom == 0:
            return punk
        if n <= 2:
            # n == 2 per the Java; n == 1 is the defined extension
            # (Java subList(n-order+1, n) throws there) - same
            # num-bigrams denominator convention
            denom = float(st.num_ngrams[2])
        else:
            hist = tuple(ngram[max(0, n - o + 1): n - 1])
            denom = self._nfp(hist)
        pkn = _jdiv(nom, denom)
        if n < o:
            return pkn
        full = tuple(ngram[n - o: n])
        hist_f = tuple(ngram[n - o: n - 1])
        nom2 = float(st.count(full))
        denom2 = float(st.count(hist_f))
        if denom2 == 0:
            return pkn
        lp = pkn
        d = self._D[min(n, o)]
        p = max(nom2 - d, 0.0) / denom2
        lw = self._nf(hist_f) * d / denom2
        return p + lw * lp


def build_kn_recursive(counts, discount: float = -1.0):
    return KneserNeyLMRecursive(KNStats(counts), discount)


def build_modified_kn(counts, discount: float = -1.0):
    return ModifiedKneserNeyLMRecursive(KNStats(counts), discount)


def build_popt_kn(counts, discount: float = -1.0):
    return PoptKneserNeyLMRecursive(KNStats(counts), discount)


def build_one_backoff_kn(counts, discount: float = -1.0):
    return OneBackoffKneserNeyLM(KNStats(counts), discount)
