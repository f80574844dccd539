"""UTF-8 "dirty character" cleaners.

Port of the reference's per-char replacement semantics:

* ``UTF8CleanerMin`` (``lt.ltbot/.../text/UTF8CleanerMin.java:28-59``):
  replaces U+FEFF (BOM) and U+FFFD with U+00BF (inverted question mark).
* ``UTF8CleanerExt`` (``lt.ltbot/.../text/UTF8CleanerExt.java:26-129``):
  same replacement over a ~100-entry dirty list (C0/C1 controls, odd
  currency symbols, roman numerals, surrogate halves, private-use chars).

The reference iterates Java ``char``s (UTF-16 units); replacing a lone high
surrogate (U+D83C/U+D83D in the Ext list) therefore splits an astral pair.
We reproduce that by translating on UTF-16 units when the input contains
astral codepoints, else via the much faster ``str.translate``.
"""

from __future__ import annotations

REPLACEMENT = "¿"  # inverted question mark

MIN_DIRTY_CODEPOINTS: tuple[int, ...] = (0xFEFF, 0xFFFD)

EXT_DIRTY_CODEPOINTS: tuple[int, ...] = (
    # C0 controls (tab/newline-family excluded by the reference)
    *range(0x0001, 0x0009),
    *range(0x000E, 0x0020),
    0x007F,
    # C1 controls
    0x0081, 0x0082, 0x0083, 0x0084, 0x0086, 0x0087, 0x0088, 0x0089,
    0x008A, 0x008B, 0x008C, 0x008D, 0x008E, 0x008F, 0x0090, 0x0095,
    0x0098, 0x0099, 0x009A, 0x009B, 0x009C, 0x009D, 0x009E, 0x009F,
    # assorted script/currency marks
    0x09F3, 0x0D03, 0x0F9D, 0x0D4D, 0x17DB,
    # zero-width / hyphen variants / narrow nbsp
    0x200C, 0x2010, 0x2011, 0x2012, 0x202F,
    # currency symbols
    0x20A1, 0x20A2, 0x20A3, 0x20A5, 0x20A6, 0x20A7, 0x20A8, 0x20A9,
    0x20AA, 0x20AB, 0x20AD, 0x20AE, 0x20AF, 0x20B0, 0x20B3, 0x20B4, 0x20B5,
    # roman numerals I-IX
    0x2160, 0x2161, 0x2162, 0x2163, 0x2164, 0x2165, 0x2166, 0x2167, 0x2168,
    # lone surrogate halves (emoji leads)
    0xD83C, 0xD83D,
    # private use
    0xE716, 0xE776, 0xF020, 0xF044, 0xF074,
    # BOM / object replacement / replacement char
    0xFEFF, 0xFFFC, 0xFFFD,
)

_MIN_TABLE = {cp: REPLACEMENT for cp in MIN_DIRTY_CODEPOINTS}
_EXT_TABLE = {cp: REPLACEMENT for cp in EXT_DIRTY_CODEPOINTS}
_EXT_UNITS = frozenset(EXT_DIRTY_CODEPOINTS)


def clean_min(text: str) -> str:
    """``UTF8CleanerMin.clean`` - BOM / U+FFFD -> U+00BF."""
    return text.translate(_MIN_TABLE)


def _has_astral(text: str) -> bool:
    return max(map(ord, text), default=0) > 0xFFFF


def clean_ext(text: str) -> str:
    """``UTF8CleanerExt.clean`` over the full dirty list (UTF-16-faithful)."""
    if not _has_astral(text):
        return text.translate(_EXT_TABLE)
    # slow path: operate on UTF-16 units so lone surrogate halves are
    # replaced exactly like the Java char loop does
    units = text.encode("utf-16-le", "surrogatepass")
    out = []
    rep = REPLACEMENT
    dirty = _EXT_UNITS
    for i in range(0, len(units), 2):
        u = units[i] | (units[i + 1] << 8)
        out.append(rep if u in dirty else chr(u))
    # re-pair any surviving surrogate pairs back into astral codepoints
    joined = "".join(out)
    return joined.encode("utf-16-le", "surrogatepass").decode("utf-16-le", "surrogatepass")
