"""N-gram windowing with boundary modes and sentence-tag insertion.

* ``LMProviderUtils.getNgramSequence`` (``lt.lm/.../service/LMProviderUtils.java:14-56``):
  boundary modes -1/0/1/2 (default 0: a sequence shorter than the order is
  kept as one single short n-gram).
* sentence-tag insertion modes 0-3 (default 3 = both ``<s>`` and ``</s>``,
  ``AbstractStringProvider.tokenizeSentence``,
  ``lt.lm/.../service/AbstractStringProvider.java:187-200``).
"""

from __future__ import annotations

SEQUENCE_START = "<s>"
SEQUENCE_END = "</s>"
UNKNOWN_WORD = "<unk>"


def insert_sentence_tags(tokens: list[str], mode: int = 3) -> list[str]:
    if mode <= 0 or not tokens:
        return tokens
    out = []
    if mode % 2 == 1:
        out.append(SEQUENCE_START)
    out.extend(tokens)
    if mode > 1:
        out.append(SEQUENCE_END)
    return out


def ngram_sequence(
    sequence: list[str], order: int, boundary_mode: int = 0
) -> list[list[str]]:
    """Faithful port of ``LMProviderUtils.getNgramSequence``."""
    if not sequence:
        return []
    if boundary_mode == 1:
        sequence = [sequence[0]] * (order - 2) + list(sequence)
    if boundary_mode == -1 and len(sequence) < order:
        return []
    if len(sequence) == 1 or (len(sequence) <= order and boundary_mode < 2):
        return [list(sequence)]
    l = len(sequence)
    o = min(l, order)
    n = l - o + 1
    i = 0
    if boundary_mode == 2:
        n = n + o - 2
    out: list[list[str]] = []
    if boundary_mode == 2:
        while i < o - 2:
            out.append(list(sequence[: i + 2]))
            i += 1
    j = 0
    while i < n:
        out.append(list(sequence[j : j + o]))
        j += 1
        i += 1
    return out
