"""ARPA ``.arpa.gz`` language-model interchange format (S10).

The reference caches its BerkeleyLM as ``<dir>.<order>.arpa.gz`` and
reloads it with an ArpaLmReader
(``lt.lm/.../LanguageModelHelper.java:207-254``); round 1 shipped only a
pickle artifact.  This module adds the interchange format:

* :func:`write_arpa` exports any scorer LM (stupid backoff, Kneser-Ney)
  over its training counts: one entry per counted n-gram carrying the
  model's own conditional log10 probability, a constant backoff weight
  per context (``log10(0.4)`` stupid-backoff discount), and a ``<unk>``
  unigram carrying the model's OOV floor.
* :func:`read_arpa` loads an :class:`ArpaBackoffLM` - the standard
  Katz-style lookup/backoff recursion over the stored tables.

Round-trip guarantee (tested): for every n-gram present in the training
counts the loaded model scores EXACTLY like the source model (direct
table lookup of the exported probability); unseen n-grams follow the
standard ARPA backoff recursion (the same property a BerkeleyLM ARPA
export has - the file stores what the estimator produced).
"""

from __future__ import annotations

import gzip
import math
import os
import tempfile

from .backoff import FrozenCounts, NgramCounts

UNK = "<unk>"


def _iter_counted_ngrams(counts):
    """Yield (order, tuple_of_words) for every counted n-gram; supports
    both NgramCounts and FrozenCounts (packed keys are decoded)."""
    if isinstance(counts, NgramCounts):
        for k in range(1, counts.order + 1):
            for ngram in counts.counts[k].keys():
                yield k, ngram
        return
    if isinstance(counts, FrozenCounts):
        words = [None] * len(counts.vocab)
        for w, i in counts.vocab.items():
            words[i] = w
        b = counts.base
        for k in range(1, counts.order + 1):
            for key in counts.tables[k].keys():
                digits = []
                while key:
                    digits.append(key % b)
                    key //= b
                ngram = tuple(words[d - 1] for d in reversed(digits))
                yield k, ngram
        return
    raise TypeError("unsupported counts type %r" % type(counts))


def _unk_log10(lm) -> float:
    """The model's OOV floor as a log10 probability."""
    if hasattr(lm, "_ud"):  # StupidBackoffLM / KneserNeyLM
        return math.log10(lm._ud)
    return lm.ngram_log10_prob(["\x00never-seen"])


def write_arpa(lm, counts, path: str, backoff_log10: float | None = None) -> None:
    """Export ``lm`` (with its training ``counts``) as gzip ARPA text."""
    if backoff_log10 is None:
        backoff_log10 = math.log10(getattr(lm, "_D", 0.4)) if isinstance(
            getattr(lm, "_D", None), float
        ) else math.log10(0.4)
    order = lm.order
    grams: list[dict] = [dict() for _ in range(order + 1)]
    for k, ngram in _iter_counted_ngrams(counts):
        grams[k][ngram] = lm.ngram_log10_prob(list(ngram))
    grams[1][(UNK,)] = _unk_log10(lm)

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    with gzip.open(tmp, "wt", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for k in range(1, order + 1):
            f.write("ngram %d=%d\n" % (k, len(grams[k])))
        for k in range(1, order + 1):
            f.write("\n\\%d-grams:\n" % k)
            for ngram in sorted(grams[k]):
                logp = grams[k][ngram]
                if not math.isfinite(logp):
                    logp = -99.0  # ARPA convention for -inf
                line = "%.7f\t%s" % (logp, " ".join(ngram))
                # contexts (orders below the top) carry a backoff weight
                if k < order:
                    line += "\t%.7f" % backoff_log10
                f.write(line + "\n")
        f.write("\n\\end\\\n")
    os.replace(tmp, path)


class ArpaBackoffLM:
    """Scorer protocol over ARPA tables (standard backoff recursion)."""

    def __init__(self, order: int, probs: list[dict], bows: list[dict]):
        self.order = order
        self._probs = probs  # [k] -> {ngram tuple: log10 p}
        self._bows = bows  # [k] -> {ngram tuple: log10 backoff weight}
        self._unk = probs[1].get((UNK,), -99.0)

    def ngram_ends_with_oov(self, ngram: list[str]) -> bool:
        return (ngram[-1],) not in self._probs[1]

    def ngram_contains_oov(self, ngram: list[str]) -> bool:
        return any((w,) not in self._probs[1] for w in ngram)

    def ngram_log10_prob(self, ngram: list[str]) -> float:
        g = tuple(ngram[-self.order:])
        return self._score(g)

    def _score(self, g: tuple) -> float:
        n = len(g)
        if n == 0:
            return self._unk
        p = self._probs[n].get(g)
        if p is not None:
            return p
        if n == 1:
            return self._unk
        bow = self._bows[n - 1].get(g[:-1], 0.0)
        return bow + self._score(g[1:])


def read_arpa(path: str) -> ArpaBackoffLM:
    """Load an ``.arpa`` / ``.arpa.gz`` file."""
    opener = gzip.open if path.endswith(".gz") else open
    order = 0
    probs: list[dict] = [{}]
    bows: list[dict] = [{}]
    current_k = None
    with opener(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip("\n")
            if not line or line == "\\data\\":
                continue
            if line == "\\end\\":
                break
            if line.startswith("ngram "):
                k = int(line.split()[1].split("=")[0])
                order = max(order, k)
                while len(probs) <= order:
                    probs.append({})
                    bows.append({})
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                current_k = int(line[1:].split("-")[0])
                continue
            if current_k is None:
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                continue
            ngram = tuple(parts[1].split(" "))
            probs[current_k][ngram] = float(parts[0])
            if len(parts) >= 3:
                bows[current_k][ngram] = float(parts[2])
    return ArpaBackoffLM(order, probs, bows)


def export_topic_lm_arpa(sf_dir: str, order: int = 3) -> str:
    """Write the topic LM next to its pickle artifact as
    ``lm_order{N}.arpa.gz`` (reference naming: ``<dir>.<order>.arpa.gz``,
    ``LanguageModelHelper.java:208-214``); returns the path."""
    from pathlib import Path

    from ..sources.pages import pages_path
    from .train import build_topic_counts, build_topic_lm

    lm = build_topic_lm(sf_dir, order)
    path = str(Path(pages_path(sf_dir)).parent / ("lm_order%d.arpa.gz" % order))
    if not os.path.exists(path):
        write_arpa(lm, build_topic_counts(sf_dir, order), path)
    return path
