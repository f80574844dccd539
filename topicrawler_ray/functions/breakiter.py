"""UAX #29 sentence / word segmentation - the ``BreakIteratorStringProvider``
analog.

Reference: ``lt.lm/src/main/java/de/tudarmstadt/lt/lm/service/
BreakIteratorStringProvider.java:66-104`` splits sentences with
``java.text.BreakIterator.getSentenceInstance(locale)`` and tokenizes with
``getWordInstance(locale)``.  Java's BreakIterator implements Unicode
UAX #29 default segmentation (TR29, public spec); this module is a pure
Python implementation of the same published rules:

* sentence boundaries: rules SB1-SB11 + SB998,
* word boundaries: rules WB1-WB13b + WB999 (sufficient for the
  alphabetic / numeric / CJK-adjacent text this engine processes; the
  dictionary-based Thai/Lao/Khmer refinement of ICU is out of scope and
  documented as such).

Property classes are derived from ``unicodedata`` general categories plus
the published UCD code-point lists for the small closed classes (ATerm,
STerm, SContinue, MidLetter, MidNum, MidNumLet) - no external data files.
Unlike ICU's English locale data we apply **no abbreviation suppression
list**, i.e. plain UAX #29 semantics: ``"Mr. Smith"`` breaks after
``"Mr."`` (SB7 only joins ATerm *directly* followed by Upper, as inside
``"U.S.A."``; across a space the SB8 look-ahead sees Upper and fails),
while ``"3 p.m. sharp"`` does not break (SB8 lowercase look-ahead).

Provider composition (``BreakIteratorStringProvider.splitSentences``):
``trim_and_replace_emptyspace(text, " ")`` -> per line -> sentence
bounds -> ``trim`` -> skip empties; ``tokenizeSentence_intern``: word
bounds over the trimmed sentence -> ``trim_and_replace_emptyspace(tok,
"_")`` -> skip empties (punctuation tokens are kept - Java's word
iterator emits every segment).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

from .strings import java_trim, trim_and_replace_emptyspace

# ---------------------------------------------------------------------------
# Sentence_Break property (UAX #29 table 4 / UCD SentenceBreakProperty)
# ---------------------------------------------------------------------------

SB_OTHER = 0
SB_CR = 1
SB_LF = 2
SB_SEP = 3  # ParaSep = Sep | CR | LF
SB_SP = 4
SB_LOWER = 5
SB_UPPER = 6
SB_OLETTER = 7
SB_NUMERIC = 8
SB_ATERM = 9
SB_STERM = 10
SB_CLOSE = 11
SB_SCONTINUE = 12
SB_EXTEND = 13
SB_FORMAT = 14

_ATERM = frozenset((0x002E, 0x2024, 0xFE52, 0xFF0E))
# UCD STerm list (BMP core; the long Brahmic tail beyond these is rare in
# crawled web text and falls back to OTHER -> treated as mid-sentence)
_STERM = frozenset(
    (
        0x0021, 0x003F, 0x0589, 0x061D, 0x061E, 0x061F, 0x06D4,
        0x0700, 0x0701, 0x0702, 0x07F9, 0x0837, 0x0839, 0x083D, 0x083E,
        0x0964, 0x0965, 0x104A, 0x104B, 0x1362, 0x1367, 0x1368, 0x166E,
        0x1735, 0x1736, 0x1803, 0x1809, 0x1944, 0x1945,
        0x1AA8, 0x1AA9, 0x1AAA, 0x1AAB, 0x1B5A, 0x1B5B, 0x1B5E, 0x1B5F,
        0x1C3B, 0x1C3C, 0x1C7E, 0x1C7F, 0x203C, 0x203D,
        0x2047, 0x2048, 0x2049, 0x2E2E, 0x2E3C, 0x3002,
        0xA4FF, 0xA60E, 0xA60F, 0xA6F3, 0xA6F7, 0xA876, 0xA877,
        0xA8CE, 0xA8CF, 0xA92F, 0xA9C8, 0xA9C9, 0xAA5D, 0xAA5E, 0xAA5F,
        0xAAF0, 0xAAF1, 0xABEB, 0xFE56, 0xFE57, 0xFF01, 0xFF1F, 0xFF61,
    )
)
# UCD SContinue list
_SCONTINUE = frozenset(
    (
        0x002C, 0x002D, 0x003A, 0x055D, 0x060C, 0x060D, 0x07F8,
        0x1802, 0x1808, 0x2013, 0x2014, 0x3001,
        0xFE10, 0xFE11, 0xFE13, 0xFE31, 0xFE32, 0xFE50, 0xFE51, 0xFE55,
        0xFE58, 0xFE63, 0xFF0C, 0xFF0D, 0xFF1A, 0xFF64,
    )
)
# SB Close adds the plain quote characters to the paired-punctuation
# categories (Ps/Pe/Pi/Pf)
_CLOSE_EXTRA = frozenset((0x0022, 0x0027, 0xFF02, 0xFF07, 0x05F3))
_SEP = frozenset((0x0085, 0x2028, 0x2029))
_SP_EXTRA = frozenset((0x0009, 0x000B, 0x000C, 0x0020, 0x00A0, 0x1680, 0x202F, 0x205F, 0x3000))


@lru_cache(maxsize=4096)
def sb_class(cp: int) -> int:
    if cp == 0x000D:
        return SB_CR
    if cp == 0x000A:
        return SB_LF
    if cp in _SEP:
        return SB_SEP
    if cp in _ATERM:
        return SB_ATERM
    if cp in _STERM:
        return SB_STERM
    if cp in _SCONTINUE:
        return SB_SCONTINUE
    if cp in _CLOSE_EXTRA:
        return SB_CLOSE
    if cp in _SP_EXTRA or (0x2000 <= cp <= 0x200A):
        return SB_SP
    cat = unicodedata.category(chr(cp))
    if cat in ("Mn", "Mc", "Me"):
        return SB_EXTEND
    if cat == "Cf":
        return SB_FORMAT
    if cat in ("Ps", "Pe", "Pi", "Pf"):
        return SB_CLOSE
    if cat == "Ll":
        return SB_LOWER
    if cat in ("Lu", "Lt"):
        return SB_UPPER
    if cat in ("Lo", "Lm", "Nl"):
        return SB_OLETTER
    if cat == "Nd":
        return SB_NUMERIC
    if cat == "Zs":
        return SB_SP
    return SB_OTHER


_PARASEP = frozenset((SB_CR, SB_LF, SB_SEP))
_SATERM = frozenset((SB_ATERM, SB_STERM))


def _sb_effective(text: str) -> tuple[list[int], list[int]]:
    """Class + original-index sequence after SB5 (Extend/Format attach to
    the preceding char; they stand alone after sot/ParaSep)."""
    classes: list[int] = []
    indices: list[int] = []
    for i, ch in enumerate(text):
        k = sb_class(ord(ch))
        if k in (SB_EXTEND, SB_FORMAT) and classes and classes[-1] not in _PARASEP:
            continue  # SB5: X (Extend|Format)* -> X
        classes.append(k)
        indices.append(i)
    return classes, indices


def _sb_backchain(classes: list[int], j: int, allow_sp: bool) -> int | None:
    """Walk back from effective position ``j`` (inclusive) over
    ``Sp*`` (if ``allow_sp``) then ``Close*``; return the terminator class
    if it is ATerm/STerm, else None."""
    i = j
    if allow_sp:
        while i >= 0 and classes[i] == SB_SP:
            i -= 1
    while i >= 0 and classes[i] == SB_CLOSE:
        i -= 1
    if i >= 0 and classes[i] in _SATERM:
        return classes[i]
    return None


def sentence_breaks(text: str) -> list[int]:
    """Return break positions (original string indices, ascending,
    excluding 0, including ``len(text)``) per UAX #29 SB1-SB11."""
    if not text:
        return []
    classes, indices = _sb_effective(text)
    n = len(classes)
    breaks: list[int] = []
    for j in range(1, n):
        prev, cur = classes[j - 1], classes[j]
        # SB3
        if prev == SB_CR and cur == SB_LF:
            continue
        # SB4
        if prev in _PARASEP:
            breaks.append(indices[j])
            continue
        # SB6
        if prev == SB_ATERM and cur == SB_NUMERIC:
            continue
        # SB7: (Upper|Lower) ATerm x Upper
        if (
            prev == SB_ATERM
            and j >= 2
            and classes[j - 2] in (SB_UPPER, SB_LOWER)
            and cur == SB_UPPER
        ):
            continue
        term = _sb_backchain(classes, j - 1, allow_sp=True)
        term_nosp = _sb_backchain(classes, j - 1, allow_sp=False)
        # SB8: ATerm Close* Sp* x [^OLetter Upper Lower ParaSep SATerm]* Lower
        if term == SB_ATERM:
            k = j
            while k < n and classes[k] not in (
                SB_OLETTER,
                SB_UPPER,
                SB_LOWER,
                SB_CR,
                SB_LF,
                SB_SEP,
                SB_ATERM,
                SB_STERM,
            ):
                k += 1
            if k < n and classes[k] == SB_LOWER:
                continue
        # SB8a: SATerm Close* Sp* x (SContinue | SATerm)
        if term is not None and (cur == SB_SCONTINUE or cur in _SATERM):
            continue
        # SB9: SATerm Close* x (Close | Sp | ParaSep)
        if term_nosp is not None and (cur in (SB_CLOSE, SB_SP) or cur in _PARASEP):
            continue
        # SB10: SATerm Close* Sp* x (Sp | ParaSep)
        if term is not None and (cur == SB_SP or cur in _PARASEP):
            continue
        # SB11: SATerm Close* Sp* ParaSep? (div)  -- ParaSep? handled by SB4
        if term is not None:
            breaks.append(indices[j])
            continue
        # SB998: no break
    breaks.append(len(text))
    return breaks


def split_sentences_uax29(text: str) -> list[str]:
    """Sentence substrings between UAX #29 breaks (untrimmed, covering)."""
    out = []
    start = 0
    for b in sentence_breaks(text):
        out.append(text[start:b])
        start = b
    return [s for s in out if s]


# ---------------------------------------------------------------------------
# Word_Break property (UAX #29 table 3)
# ---------------------------------------------------------------------------

WB_OTHER = 0
WB_CR = 1
WB_LF = 2
WB_NEWLINE = 3
WB_EXTEND = 4
WB_FORMAT = 5
WB_KATAKANA = 6
WB_ALETTER = 7
WB_MIDLETTER = 8
WB_MIDNUM = 9
WB_MIDNUMLET = 10
WB_NUMERIC = 11
WB_EXTENDNUMLET = 12

_WB_NEWLINES = frozenset((0x000B, 0x000C, 0x0085, 0x2028, 0x2029))
_MIDLETTER = frozenset((0x003A, 0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A))
_MIDNUM = frozenset(
    (
        0x002C, 0x003B, 0x037E, 0x060C, 0x060D, 0x066C, 0x07F8,
        0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B,
    )
)
# MidNumLet + the Single_Quote class (WB treats them identically enough
# for this engine: join cased letters and digits across them pairwise)
_MIDNUMLET = frozenset((0x002E, 0x0027, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E))
# Ideographic ranges excluded from ALetter (they tokenize char-by-char
# under WB999, matching default UAX #29 without a CJK dictionary)
_HAN = ((0x2E80, 0x2FDF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF))
_HIRAGANA = ((0x3040, 0x309F),)
_KATAKANA = (
    (0x30A0, 0x30FF),
    (0x31F0, 0x31FF),
    (0x32D0, 0x32FE),
    (0xFF66, 0xFF9F),
    (0x3031, 0x3035),
    (0x309B, 0x309C),
)


def _in_ranges(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


@lru_cache(maxsize=4096)
def wb_class(cp: int) -> int:
    if cp == 0x000D:
        return WB_CR
    if cp == 0x000A:
        return WB_LF
    if cp in _WB_NEWLINES:
        return WB_NEWLINE
    if cp in _MIDLETTER:
        return WB_MIDLETTER
    if cp in _MIDNUM:
        return WB_MIDNUM
    if cp in _MIDNUMLET:
        return WB_MIDNUMLET
    if _in_ranges(cp, _KATAKANA):
        return WB_KATAKANA
    cat = unicodedata.category(chr(cp))
    if cat in ("Mn", "Mc", "Me"):
        return WB_EXTEND
    if cat == "Cf":
        return WB_FORMAT
    if cat == "Pc":
        return WB_EXTENDNUMLET
    if cat == "Nd":
        return WB_NUMERIC
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
        if _in_ranges(cp, _HAN) or _in_ranges(cp, _HIRAGANA):
            return WB_OTHER
        return WB_ALETTER
    return WB_OTHER


_WB_SKIP = frozenset((WB_EXTEND, WB_FORMAT))
_WB_BREAKING_WS = frozenset((WB_CR, WB_LF, WB_NEWLINE))
_WB_AHL = frozenset((WB_ALETTER,))
_WB_MID_LETTER_JOIN = frozenset((WB_MIDLETTER, WB_MIDNUMLET))
_WB_MID_NUM_JOIN = frozenset((WB_MIDNUM, WB_MIDNUMLET))
_WB_AKN = frozenset((WB_ALETTER, WB_NUMERIC, WB_KATAKANA))


def word_breaks(text: str) -> list[int]:
    """Break positions per UAX #29 WB1-WB13b + WB999 (ascending original
    indices, excluding 0, including ``len(text)``)."""
    if not text:
        return []
    classes: list[int] = []
    indices: list[int] = []
    for i, ch in enumerate(text):
        k = wb_class(ord(ch))
        if k in _WB_SKIP and classes and classes[-1] not in _WB_BREAKING_WS:
            continue  # WB4
        classes.append(k)
        indices.append(i)
    n = len(classes)
    breaks: list[int] = []
    for j in range(1, n):
        prev, cur = classes[j - 1], classes[j]
        if prev == WB_CR and cur == WB_LF:
            continue  # WB3
        if prev in _WB_BREAKING_WS or cur in _WB_BREAKING_WS:
            breaks.append(indices[j])  # WB3a/WB3b
            continue
        if prev == WB_ALETTER and cur == WB_ALETTER:
            continue  # WB5
        # WB6: AL x (MidLetter|MidNumLet) AL
        if (
            prev == WB_ALETTER
            and cur in _WB_MID_LETTER_JOIN
            and j + 1 < n
            and classes[j + 1] == WB_ALETTER
        ):
            continue
        # WB7: AL (MidLetter|MidNumLet) x AL
        if (
            cur == WB_ALETTER
            and prev in _WB_MID_LETTER_JOIN
            and j >= 2
            and classes[j - 2] == WB_ALETTER
        ):
            continue
        if prev == WB_NUMERIC and cur == WB_NUMERIC:
            continue  # WB8
        if prev == WB_ALETTER and cur == WB_NUMERIC:
            continue  # WB9
        if prev == WB_NUMERIC and cur == WB_ALETTER:
            continue  # WB10
        # WB11: NU (MidNum|MidNumLet) x NU
        if (
            cur == WB_NUMERIC
            and prev in _WB_MID_NUM_JOIN
            and j >= 2
            and classes[j - 2] == WB_NUMERIC
        ):
            continue
        # WB12: NU x (MidNum|MidNumLet) NU
        if (
            prev == WB_NUMERIC
            and cur in _WB_MID_NUM_JOIN
            and j + 1 < n
            and classes[j + 1] == WB_NUMERIC
        ):
            continue
        if prev == WB_KATAKANA and cur == WB_KATAKANA:
            continue  # WB13
        # WB13a: (AL|NU|KA|ENL) x ENL
        if cur == WB_EXTENDNUMLET and (prev in _WB_AKN or prev == WB_EXTENDNUMLET):
            continue
        # WB13b: ENL x (AL|NU|KA)
        if prev == WB_EXTENDNUMLET and cur in _WB_AKN:
            continue
        breaks.append(indices[j])  # WB999
    breaks.append(len(text))
    return breaks


def split_words_uax29(text: str) -> list[str]:
    out = []
    start = 0
    for b in word_breaks(text):
        out.append(text[start:b])
        start = b
    return [s for s in out if s]


# ---------------------------------------------------------------------------
# BreakIteratorStringProvider composition
# ---------------------------------------------------------------------------


def provider_split_sentences(text: str) -> list[str]:
    """``BreakIteratorStringProvider.splitSentences`` (java:66-88): collapse
    empty space to single spaces, iterate lines (one line post-collapse),
    UAX #29 sentence bounds, ``trim`` each, skip empties."""
    text = trim_and_replace_emptyspace(text, " ")
    sentences: list[str] = []
    for line in text.splitlines() or ([text] if text else []):
        for raw in split_sentences_uax29(line):
            s = java_trim(raw)
            if s:
                sentences.append(s)
    return sentences


def provider_tokenize(sentence: str) -> list[str]:
    """``tokenizeSentence_intern`` (java:91-103): word bounds over the
    trimmed sentence; empty space inside a token becomes ``_``; empty
    tokens dropped (punctuation segments are kept)."""
    tokens: list[str] = []
    for raw in split_words_uax29(java_trim(sentence)):
        tok = trim_and_replace_emptyspace(raw, "_")
        if tok:
            tokens.append(tok)
    return tokens


def provider_text_ngrams(text: str, order: int) -> list[list[str]]:
    """``BreakIteratorStringProvider.getNgrams`` (java:41-64): sentences ->
    tokens -> ``<s>``-tagged n-gram windows, concatenated."""
    from . import ngrams as ngram_mod

    out: list[list[str]] = []
    for sentence in provider_split_sentences(text):
        tokens = provider_tokenize(sentence)
        if not tokens:
            continue
        tokens = ngram_mod.insert_sentence_tags(tokens, mode=3)
        out.extend(ngram_mod.ngram_sequence(tokens, order, boundary_mode=0))
    return out
