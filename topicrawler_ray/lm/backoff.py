"""Stupid-backoff language model over all-order n-gram counts.

Port of ``lt.lm/.../lucenebased/StupidBackoffLM.java:31-137`` (which reads
counts from a Lucene index; here counts live in an in-memory
:class:`NgramCounts`, built either driver-side for fixtures or by the
distributed Ray count job in ``lm/build.py``).

Faithful quirks preserved:

* the unigram "probability" is ``c(w) / num_distinct_unigrams``
  (``_num_ngrams[1][0]`` is the *distinct* unigram count,
  ``CountingStringLM.java:140-147``),
* the OOV floor is ``ud = D / (num_distinct_unigrams + 1)``,
* on a missing sub-order the model returns the lower-order score times a
  single discount factor (not cumulative).
"""

from __future__ import annotations

import math
from collections import Counter


class NgramCounts:
    """Counts of every k-gram, k = 1..order, over a token-sequence corpus."""

    def __init__(self, order: int):
        self.order = order
        self.counts: list[Counter[tuple[str, ...]]] = [Counter() for _ in range(order + 1)]

    def add_sequence(self, tokens: list[str]) -> None:
        for k in range(1, self.order + 1):
            c = self.counts[k]
            for i in range(len(tokens) - k + 1):
                c[tuple(tokens[i : i + k])] += 1

    def count(self, ngram: tuple[str, ...]) -> int:
        k = len(ngram)
        if k < 1 or k > self.order:
            return 0
        return self.counts[k].get(ngram, 0)

    def num_distinct(self, k: int) -> int:
        return len(self.counts[k])

    def total(self, k: int) -> int:
        return sum(self.counts[k].values())


class StupidBackoffLM:
    """Scorer protocol: ``order``, ``ngram_log10_prob``, ``ngram_ends_with_oov``."""

    def __init__(self, counts: NgramCounts, discount: float = 0.4):
        self._c = counts
        self.order = counts.order
        self._D = discount
        self._up = 1.0 / (counts.num_distinct(1) + 1)
        self._ud = self._up * discount

    def ngram_ends_with_oov(self, ngram: list[str]) -> bool:
        return self._c.count((ngram[-1],)) == 0

    def ngram_contains_oov(self, ngram: list[str]) -> bool:
        return any(self._c.count((w,)) == 0 for w in ngram)

    def _score_packed(self, ngram: list[str]) -> float:
        """Id-space replica of :meth:`score` for :class:`FrozenCounts`.

        Converts each word to its vocab id ONCE and derives every
        sub-ngram/history key by integer arithmetic instead of re-packing
        tuples per ``count()`` probe.  Control flow and float arithmetic
        mirror ``score`` exactly (same ``nom/denom`` divisions in the same
        order), so results are bit-identical.
        """
        c = self._c
        n = len(ngram)
        if n < 1:
            return self._ud
        vocab = c.vocab
        ids = [vocab.get(w) for w in ngram]
        return self._score_ids(ids, n)

    def _score_ids(self, ids: list, n: int) -> float:
        """Score an ngram given its vocab ids (``None`` == OOV word)."""
        c = self._c
        if ids[-1] is None:  # unigram count 0 <=> not in vocab
            return self._ud
        tables = c.tables
        last1 = ids[-1] + 1
        nom = tables[1].get(last1, 0)
        denom = c.num_distinct(1)
        if nom == 0 or denom == 0:
            return self._ud
        s = nom / denom
        if n == 1:
            return s
        b = c.base
        order = self.order
        # incrementally packed keys for windows ending at n:
        # K_sub(i) = packed(ids[n-i:n]), K_hist(i) = packed(ids[n-i:n-1])
        k_sub = last1
        k_hist = 0
        pw_sub = b  # b^(i-1) multiplier for the word newly joining K_sub
        pw_hist = 1
        oov_in_window = False  # any None id inside the current window
        i = 2
        while i < n and i < order:
            w = ids[n - i]
            if w is None:
                oov_in_window = True
            else:
                k_sub += (w + 1) * pw_sub
                k_hist += (w + 1) * pw_hist
            pw_sub *= b
            pw_hist *= b
            ls = s
            if oov_in_window:
                nom = 0
                denom = 0
            else:
                nom = tables[i].get(k_sub, 0)
                denom = tables[i - 1].get(k_hist, 0)
            if nom == 0 or denom == 0:
                lw = self._D
                if i < order:  # len(sub) == i
                    s = ls * lw
                return s
            s = nom / denom
            i += 1
        if n < order:
            return s
        w = ids[n - order]
        if w is None:
            oov_in_window = True
        else:
            k_sub += (w + 1) * pw_sub
            k_hist += (w + 1) * pw_hist
        if oov_in_window:
            nom = 0
        else:
            nom = tables[order].get(k_sub, 0)
            denom = tables[order - 1].get(k_hist, 0)
        if oov_in_window or nom == 0 or denom == 0:
            # reference: `if (len(sub) < order)` is False here (len == order)
            # so the discount is NOT applied - s returned unchanged
            return s
        return nom / denom

    def score(self, ngram: list[str]) -> float:
        """``StupidBackoffLM.score`` control flow, ported verbatim."""
        if isinstance(self._c, FrozenCounts):
            return self._score_packed(ngram)
        n = len(ngram)
        if n < 1:
            return self._ud
        if self.ngram_ends_with_oov(ngram):
            return self._ud
        c = self._c
        # unigram of the last word
        nom = c.count(tuple(ngram[n - 1 : n]))
        denom = c.num_distinct(1)
        if nom == 0 or denom == 0:
            return self._ud
        s = nom / denom
        if n == 1:
            return s
        # intermediate sub-orders 2..min(n, order)-1
        i = 2
        while i < n and i < self.order:
            ls = s
            sub = tuple(ngram[n - i : n])
            hist = tuple(ngram[n - i : n - 1])
            nom = c.count(sub)
            denom = c.count(hist)
            if nom == 0 or denom == 0:
                lw = self._D
                if len(sub) < self.order:
                    s = ls * lw
                return s
            s = nom / denom
            i += 1
        if n < self.order:
            return s
        ls = s
        sub = tuple(ngram[n - self.order : n])
        hist = tuple(ngram[n - self.order : n - 1])
        nom = c.count(sub)
        denom = c.count(hist)
        if nom == 0 or denom == 0:
            lw = self._D
            if len(sub) < self.order:
                s = ls * lw
            return s
        return nom / denom

    _SCORE_CACHE_MAX = 1 << 20

    def ngram_log10_prob(self, ngram: list[str]) -> float:
        # memoized per instance: ngram TYPES are Zipf-few relative to
        # token count, and the score is a pure function of the ngram
        # (lazy init so artifacts pickled before this attr still load)
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
        state.pop("_score_cache", None)  # never ship the caches
        state.pop("_packed_doc_cache", None)
        return state


class FrozenCounts:
    """Immutable n-gram counts with integer-packed keys.

    Words are interned to ids (insertion order of first occurrence -
    deterministic); a k-gram becomes a single integer key in base
    ``B = len(vocab) + 1`` and counts live in one flat ``dict[int, int]``
    per order.  Compared to tuple-of-str keys this deserializes several
    times faster per actor (no per-string object churn) and looks up
    faster (int hashing).  The count values are IDENTICAL to the mutable
    :class:`NgramCounts` - freezing never changes scores.
    """

    def __init__(self, counts: "NgramCounts"):
        self.order = counts.order
        vocab: dict[str, int] = {}
        for (w,) in counts.counts[1].keys():
            vocab.setdefault(w, len(vocab))
        self.vocab = vocab
        self.base = len(vocab) + 1
        self._num_distinct = [0] * (counts.order + 1)
        self.tables: list[dict[int, int]] = [{} for _ in range(counts.order + 1)]
        b = self.base
        for k in range(1, counts.order + 1):
            c = counts.counts[k]
            self._num_distinct[k] = len(c)
            tab = self.tables[k]
            for ngram, n in c.items():
                key = 0
                for w in ngram:
                    key = key * b + (vocab[w] + 1)
                tab[key] = n

    def pack(self, ngram) -> int | None:
        key = 0
        b = self.base
        vocab = self.vocab
        for w in ngram:
            i = vocab.get(w)
            if i is None:
                return None
            key = key * b + (i + 1)
        return key

    def count(self, ngram) -> int:
        k = len(ngram)
        if k < 1 or k > self.order:
            return 0
        key = self.pack(ngram)
        if key is None:
            return 0
        return self.tables[k].get(key, 0)

    def num_distinct(self, k: int) -> int:
        return self._num_distinct[k]

    def total(self, k: int) -> int:
        if k < 1 or k > self.order:
            return 0
        return sum(self.tables[k].values())

    def iter_ngrams(self, k: int):
        """(ngram_tuple, count) pairs for order k (decodes packed keys;
        inspection path - not used while scoring)."""
        inv = [None] * (len(self.vocab) + 1)
        for w, i in self.vocab.items():
            inv[i + 1] = w
        b = self.base
        for key, n in self.tables[k].items():
            digits = []
            while key:
                digits.append(key % b)
                key //= b
            yield tuple(inv[d] for d in reversed(digits)), n


def freeze_lm(lm: StupidBackoffLM) -> StupidBackoffLM:
    """Return an equivalent StupidBackoffLM over FrozenCounts."""
    frozen = FrozenCounts(lm._c)
    return StupidBackoffLM(frozen, discount=lm._D)
