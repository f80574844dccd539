"""Char-class tokenizer - port of the reference ``lt.seg`` token pipeline.

* ``DiffTokenizer`` (``lt.seg/.../token/DiffTokenizer.java:55-93``): emits a
  new segment whenever the "empty-space-ness" or the membership in
  ``WORD_WITH_NUMBER``'s allowed char types flips between consecutive
  UTF-16 units.  Scanning stops at a NUL unit (Java ``while (_cp > 0)``).
* ``SegmentType.infer`` (``lt.seg/.../SegmentType.java:156-174``): choose,
  among the 8 token types WORD..NON_WORD in declaration order, the type
  whose allowed-char-type set is the minimal superset of the segment's
  observed char types (first wins on ties).
* filter levels 0-5 (``lt.seg/.../token/ITokenizer.java:79-107``) and
  normalize levels 0-4 (``lt.seg/.../Segment.java:48-97``), plus the
  merge-consecutive-types / merge-consecutive-tokens iterators
  (``lt.seg/.../SegmentationUtils.java:256-327``).

The scorer path uses filter=5, normalize=2, merge types only
(``lt.lm/.../util/Properties.java:150-184`` defaults with
``LtSegProvider.tokenizeSentence_intern``).

Implementation is numpy-vectorised over the UTF-16 units of a sentence:
boundary detection, per-token char-type OR-masks (``bitwise_or.reduceat``)
and type inference via a memoised mask -> type lookup.
"""

from __future__ import annotations

from enum import IntEnum
from functools import lru_cache

import numpy as np

from . import jchar


class SegmentType(IntEnum):
    # order matters: mirrors the reference enum declaration order
    WORD = 0
    WORD_WITH_NUMBER = 1
    NUMBER = 2
    WORD_UPPERCASE = 3
    WORD_LOWERCASE = 4
    PUNCTUATION = 5
    EMPTY_SPACE = 6
    NON_WORD = 7
    CONTROL = 8  # not a TOKEN_TYPE; listed for completeness
    UNKNOWN = 9


# allowed Java char types per token type (SegmentType.java:29-136)
_LETTERS = (
    jchar.UPPERCASE_LETTER,
    jchar.LOWERCASE_LETTER,
    jchar.TITLECASE_LETTER,
    jchar.MODIFIER_LETTER,
    jchar.OTHER_LETTER,
)
_NUMBERS = (jchar.DECIMAL_DIGIT_NUMBER, jchar.LETTER_NUMBER, jchar.OTHER_NUMBER)
_PUNCT = (
    jchar.NON_SPACING_MARK,
    jchar.ENCLOSING_MARK,
    jchar.COMBINING_SPACING_MARK,
    jchar.DASH_PUNCTUATION,
    jchar.START_PUNCTUATION,
    jchar.END_PUNCTUATION,
    jchar.CONNECTOR_PUNCTUATION,
    jchar.OTHER_PUNCTUATION,
    jchar.INITIAL_QUOTE_PUNCTUATION,
    jchar.FINAL_QUOTE_PUNCTUATION,
)
_EMPTY_SPACE_TYPES = (
    jchar.SPACE_SEPARATOR,
    jchar.LINE_SEPARATOR,
    jchar.PARAGRAPH_SEPARATOR,
    jchar.CONTROL,
)
# SegmentationUtils.chartypes - the 30-entry universe
_ALL_CHARTYPES = (
    jchar.UNASSIGNED,
    jchar.UPPERCASE_LETTER,
    jchar.LOWERCASE_LETTER,
    jchar.TITLECASE_LETTER,
    jchar.MODIFIER_LETTER,
    jchar.OTHER_LETTER,
    jchar.NON_SPACING_MARK,
    jchar.ENCLOSING_MARK,
    jchar.COMBINING_SPACING_MARK,
    jchar.DECIMAL_DIGIT_NUMBER,
    jchar.LETTER_NUMBER,
    jchar.OTHER_NUMBER,
    jchar.SPACE_SEPARATOR,
    jchar.LINE_SEPARATOR,
    jchar.PARAGRAPH_SEPARATOR,
    jchar.CONTROL,
    jchar.FORMAT,
    jchar.PRIVATE_USE,
    jchar.SURROGATE,
    jchar.DASH_PUNCTUATION,
    jchar.START_PUNCTUATION,
    jchar.END_PUNCTUATION,
    jchar.CONNECTOR_PUNCTUATION,
    jchar.OTHER_PUNCTUATION,
    jchar.MATH_SYMBOL,
    jchar.CURRENCY_SYMBOL,
    jchar.MODIFIER_SYMBOL,
    jchar.OTHER_SYMBOL,
    jchar.INITIAL_QUOTE_PUNCTUATION,
    jchar.FINAL_QUOTE_PUNCTUATION,
)

_WWN_TYPES = _LETTERS + _NUMBERS

ALLOWED: dict[SegmentType, frozenset[int]] = {
    SegmentType.WORD: frozenset(_LETTERS),
    SegmentType.WORD_WITH_NUMBER: frozenset(_WWN_TYPES),
    SegmentType.NUMBER: frozenset(_NUMBERS),
    SegmentType.WORD_UPPERCASE: frozenset((jchar.UPPERCASE_LETTER, jchar.TITLECASE_LETTER)),
    SegmentType.WORD_LOWERCASE: frozenset(
        (jchar.LOWERCASE_LETTER, jchar.MODIFIER_LETTER, jchar.OTHER_LETTER)
    ),
    SegmentType.PUNCTUATION: frozenset(_PUNCT),
    SegmentType.EMPTY_SPACE: frozenset(_EMPTY_SPACE_TYPES),
    SegmentType.NON_WORD: frozenset(t for t in _ALL_CHARTYPES if t not in _LETTERS),
}

_TOKEN_TYPES_ORDER = (
    SegmentType.WORD,
    SegmentType.WORD_WITH_NUMBER,
    SegmentType.NUMBER,
    SegmentType.WORD_UPPERCASE,
    SegmentType.WORD_LOWERCASE,
    SegmentType.PUNCTUATION,
    SegmentType.EMPTY_SPACE,
    SegmentType.NON_WORD,
)

_TYPE_SYMBOL = {
    SegmentType.NUMBER: "0",
    SegmentType.PUNCTUATION: ".",
    SegmentType.EMPTY_SPACE: " ",
}

# ---------------------------------------------------------------------------
# vectorised lookup tables (built lazily once per process)

_tables: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None


def _build_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(chartype_bit, is_empty_space, is_wwn) per UTF-16 unit."""
    global _tables
    if _tables is None:
        jt = jchar.java_type_table()  # uint8 per unit
        # bit index per java char type (0..30); bit 31 for any other type
        bit = np.full(256, 31, dtype=np.uint8)
        for t in range(31):
            bit[t] = t
        unit_bit = bit[jt].astype(np.uint32)
        es_types = np.zeros(256, dtype=bool)
        for t in _EMPTY_SPACE_TYPES:
            es_types[t] = True
        wwn_types = np.zeros(256, dtype=bool)
        for t in _WWN_TYPES:
            wwn_types[t] = True
        _tables = (unit_bit, es_types[jt], wwn_types[jt])
    return _tables


# fused per-unit tables for the tokenize hot path: one gather yields the
# boundary class (es*2 + wwn), one yields the chartype bit mask
_fused: tuple[np.ndarray, np.ndarray] | None = None


def _build_fused() -> tuple[np.ndarray, np.ndarray]:
    global _fused
    if _fused is None:
        unit_bit, is_es, is_wwn = _build_tables()
        cls = (is_es.astype(np.uint8) << 1) | is_wwn.astype(np.uint8)
        maskbits = (np.uint32(1) << unit_bit).astype(np.uint32)
        _fused = (cls, maskbits)
    return _fused


# plain-dict memo used by the tokenize hot loop (cheaper than the
# lru_cache wrapper per token); masks are Zipf-few
_mask_memo: dict[int, SegmentType] = {}


@lru_cache(maxsize=65536)
def _infer_type_from_mask(mask: int) -> SegmentType:
    """``SegmentType.infer``: minimal superset among TOKEN_TYPES, first wins."""
    observed = {t for t in range(32) if mask >> t & 1}
    best = SegmentType.UNKNOWN
    best_diff = 1 << 30
    for st in _TOKEN_TYPES_ORDER:
        allowed = ALLOWED[st]
        if not observed <= allowed:
            continue
        diff = len(allowed) - len(observed)
        if diff < best_diff:
            best_diff = diff
            best = st
    return best


def tokenize(sentence: str) -> list[tuple[str, SegmentType]]:
    """DiffTokenizer segmentation: full list of (text, type) segments."""
    if not sentence:
        return []
    # Java stops at NUL (`while (_cp > 0)`) - C-speed scan on the str
    if "\x00" in sentence:
        sentence = sentence[: sentence.index("\x00")]
        if not sentence:
            return []
    units = jchar.utf16_units(sentence)
    cls_tab, mask_tab = _build_fused()
    cls = cls_tab[units]
    # boundary after position i when empty-space-ness or wwn-ness flips
    edges = np.flatnonzero(cls[:-1] != cls[1:])
    n_tok = edges.size + 1
    starts = np.empty(n_tok, dtype=np.int64)
    starts[0] = 0
    np.add(edges, 1, out=starts[1:])
    masks = np.bitwise_or.reduceat(mask_tab[units], starts)
    bounds = starts.tolist()
    bounds.append(units.size)
    memo = _mask_memo
    out = []
    if units.size == len(sentence):
        # BMP-only (no surrogate pairs): unit indices == str indices, so
        # token text is a plain slice - avoids a numpy round trip per token
        for i, m in enumerate(masks.tolist()):
            t = memo.get(m)
            if t is None:
                t = memo[m] = _infer_type_from_mask(m)
            out.append((sentence[bounds[i] : bounds[i + 1]], t))
    else:
        for i, m in enumerate(masks.tolist()):
            t = memo.get(m)
            if t is None:
                t = memo[m] = _infer_type_from_mask(m)
            out.append((jchar.units_to_str(units[bounds[i] : bounds[i + 1]]), t))
    return out


# ---------------------------------------------------------------------------
# filter / normalize / merge (ITokenizer.filteredAndNormalizedTokens)


def _is_readable(t: SegmentType) -> bool:
    return t in (
        SegmentType.WORD,
        SegmentType.NUMBER,
        SegmentType.WORD_WITH_NUMBER,
        SegmentType.WORD_UPPERCASE,
        SegmentType.WORD_LOWERCASE,
        SegmentType.PUNCTUATION,
    )


def _is_word(t: SegmentType) -> bool:
    return t in (SegmentType.WORD, SegmentType.WORD_UPPERCASE, SegmentType.WORD_LOWERCASE)


def normalize_segment(text: str, t: SegmentType, level: int) -> str:
    """``Segment.asNormalizedString`` levels 0-4."""
    result = text
    if level >= 1 and t == SegmentType.NON_WORD:
        # collapse consecutive identical codepoints
        out = []
        for ch in text:
            if not out or out[-1] != ch:
                out.append(ch)
        result = "".join(out)
    if level >= 2:
        if t == SegmentType.WORD_WITH_NUMBER:
            # Java Character.isDigit == category Nd (Python isdigit is wider)
            out = []
            for ch in text:
                if jchar.java_char_type(ord(ch)) == jchar.DECIMAL_DIGIT_NUMBER:
                    if not out or out[-1] != "0":
                        out.append("0")
                else:
                    out.append(ch)
            result = "".join(out)
        elif t == SegmentType.NUMBER:
            result = "0"
    if level >= 3 and t in (SegmentType.EMPTY_SPACE, SegmentType.PUNCTUATION):
        result = _TYPE_SYMBOL[t]
    if level >= 4:
        result = result.lower()
    return result


def filtered_segments(
    segments: list[tuple[str, SegmentType]], level: int, mergetypes: bool
) -> list[tuple[str, SegmentType]]:
    segs = segments
    if level >= 1:
        segs = [s for s in segs if s[1] != SegmentType.CONTROL]
    if level >= 2:
        segs = [s for s in segs if s[1] != SegmentType.EMPTY_SPACE]
    if level >= 3:
        segs = [s for s in segs if _is_readable(s[1])]
    if level >= 4:
        segs = [s for s in segs if s[1] != SegmentType.PUNCTUATION]
    if level >= 5:
        segs = [
            s
            for s in segs
            if s[1] not in (SegmentType.NUMBER, SegmentType.WORD_WITH_NUMBER)
        ]
    if mergetypes:
        # SegmentationUtils.mergeConsectutiveTypes: drop repeats of the same
        # non-word type (keep words / word-with-number always)
        merged: list[tuple[str, SegmentType]] = []
        last_type: SegmentType | None = None
        for s in segs:
            keep = _is_word(s[1]) or s[1] == SegmentType.WORD_WITH_NUMBER
            if last_type is None or keep or s[1] != last_type:
                merged.append(s)
            last_type = s[1]
        segs = merged
    return segs


def merge_consecutive_tokens(tokens: list[str]) -> list[str]:
    """``SegmentationUtils.mergeConsecutiveTokens``: drop equal repeats."""
    out: list[str] = []
    for t in tokens:
        if not out or out[-1] != t:
            out.append(t)
    return out


_WORD_SET = frozenset(
    (SegmentType.WORD, SegmentType.WORD_UPPERCASE, SegmentType.WORD_LOWERCASE)
)


def filtered_and_normalized_tokens(
    sentence: str,
    level_filter: int = 5,
    level_normalize: int = 2,
    merge_types: bool = True,
    merge_tokens: bool = False,
) -> list[str]:
    """``LtSegProvider.tokenizeSentence_intern`` defaults: 5/2/merge>=1."""
    if level_filter >= 5 and level_normalize <= 3 and not merge_tokens:
        # hot path: at filter level 5 only the three WORD types survive,
        # so merge-consecutive-types keeps everything (words always kept)
        # and normalize levels <= 3 leave WORD-type text unchanged
        ws = _WORD_SET
        return [text for text, t in tokenize(sentence) if t in ws]
    segs = filtered_segments(tokenize(sentence), level_filter, merge_types)
    tokens = [normalize_segment(text, t, level_normalize) for text, t in segs]
    if merge_tokens:
        tokens = merge_consecutive_tokens(tokens)
    return tokens
