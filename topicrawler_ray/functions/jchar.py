"""Java ``Character.getType`` equivalence layer.

The reference tokenizer (``lt.seg/.../token/DiffTokenizer.java:55-93``) and
segment-type inference (``lt.seg/.../SegmentType.java:29-174``) are driven by
Java character-type constants over UTF-16 code units.  This module provides

* the Java type-constant values,
* a vectorised ``numpy`` lookup table codepoint -> java type built from
  ``unicodedata`` (general categories map 1:1 onto Java constants), and
* helpers to expand a Python string into UTF-16 code units (the reference
  reads ``Reader.read()`` one UTF-16 unit at a time, so non-BMP codepoints
  are seen as two SURROGATE-typed units).

Category tables may drift slightly between the JDK's Unicode version and
CPython's; ``_OVERRIDES`` pins any codepoint we need to be bit-faithful on.
"""

from __future__ import annotations

import unicodedata

import numpy as np

# Java Character.getType() constants (java.lang.Character)
UNASSIGNED = 0
UPPERCASE_LETTER = 1
LOWERCASE_LETTER = 2
TITLECASE_LETTER = 3
MODIFIER_LETTER = 4
OTHER_LETTER = 5
NON_SPACING_MARK = 6
ENCLOSING_MARK = 7
COMBINING_SPACING_MARK = 8
DECIMAL_DIGIT_NUMBER = 9
LETTER_NUMBER = 10
OTHER_NUMBER = 11
SPACE_SEPARATOR = 12
LINE_SEPARATOR = 13
PARAGRAPH_SEPARATOR = 14
CONTROL = 15
FORMAT = 16
PRIVATE_USE = 18
SURROGATE = 19
DASH_PUNCTUATION = 20
START_PUNCTUATION = 21
END_PUNCTUATION = 22
CONNECTOR_PUNCTUATION = 23
OTHER_PUNCTUATION = 24
MATH_SYMBOL = 25
CURRENCY_SYMBOL = 26
MODIFIER_SYMBOL = 27
OTHER_SYMBOL = 28
INITIAL_QUOTE_PUNCTUATION = 29
FINAL_QUOTE_PUNCTUATION = 30

_CATEGORY_TO_JAVA = {
    "Cn": UNASSIGNED,
    "Lu": UPPERCASE_LETTER,
    "Ll": LOWERCASE_LETTER,
    "Lt": TITLECASE_LETTER,
    "Lm": MODIFIER_LETTER,
    "Lo": OTHER_LETTER,
    "Mn": NON_SPACING_MARK,
    "Me": ENCLOSING_MARK,
    "Mc": COMBINING_SPACING_MARK,
    "Nd": DECIMAL_DIGIT_NUMBER,
    "Nl": LETTER_NUMBER,
    "No": OTHER_NUMBER,
    "Zs": SPACE_SEPARATOR,
    "Zl": LINE_SEPARATOR,
    "Zp": PARAGRAPH_SEPARATOR,
    "Cc": CONTROL,
    "Cf": FORMAT,
    "Co": PRIVATE_USE,
    "Cs": SURROGATE,
    "Pd": DASH_PUNCTUATION,
    "Ps": START_PUNCTUATION,
    "Pe": END_PUNCTUATION,
    "Pc": CONNECTOR_PUNCTUATION,
    "Po": OTHER_PUNCTUATION,
    "Sm": MATH_SYMBOL,
    "Sc": CURRENCY_SYMBOL,
    "Sk": MODIFIER_SYMBOL,
    "So": OTHER_SYMBOL,
    "Pi": INITIAL_QUOTE_PUNCTUATION,
    "Pf": FINAL_QUOTE_PUNCTUATION,
}

# Codepoints whose category changed between the JDK-8 Unicode tables (6.2)
# and current CPython; pin to the Java 8 value where our fixtures care.
_OVERRIDES: dict[int, int] = {}

_BMP_SIZE = 0x10000

_table_cache: np.ndarray | None = None


def java_type_table() -> np.ndarray:
    """uint8 table of size 0x10000 mapping a UTF-16 unit -> Java char type.

    Only the BMP is needed because input is processed as UTF-16 units; the
    surrogate ranges carry SURROGATE like Java sees them.
    """
    global _table_cache
    if _table_cache is None:
        tab = np.empty(_BMP_SIZE, dtype=np.uint8)
        cat = unicodedata.category
        chr_ = chr
        m = _CATEGORY_TO_JAVA
        for cp in range(_BMP_SIZE):
            tab[cp] = m[cat(chr_(cp))]
        for cp, t in _OVERRIDES.items():
            if cp < _BMP_SIZE:
                tab[cp] = t
        _table_cache = tab
    return _table_cache


def utf16_units(text: str) -> np.ndarray:
    """Return the UTF-16 code units of ``text`` as a uint32 array.

    Mirrors how the reference consumes characters one ``char`` at a time.
    Lone surrogates already present in ``text`` are preserved.
    """
    if not text:
        return np.empty(0, dtype=np.uint32)
    b = text.encode("utf-16-le", "surrogatepass")
    return np.frombuffer(b, dtype=np.uint16).astype(np.uint32)


def units_to_str(units) -> str:
    """Inverse of :func:`utf16_units` (surrogate pairs re-combine)."""
    arr = np.asarray(units, dtype=np.uint16)
    return arr.tobytes().decode("utf-16-le", "surrogatepass")


def java_char_type(cp: int) -> int:
    """Java ``Character.getType`` for a single codepoint (BMP or astral)."""
    if cp < _BMP_SIZE:
        return int(java_type_table()[cp])
    ov = _OVERRIDES.get(cp)
    if ov is not None:
        return ov
    return _CATEGORY_TO_JAVA[unicodedata.category(chr(cp))]
