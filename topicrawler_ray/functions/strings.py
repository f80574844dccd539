"""String scalar functions ported from the reference semantics.

* Java-regex-faithful trims (``lt.utilities/.../StringUtils.java:28-47``):
  Java ``\\s`` is ASCII-only (``[ \\t\\n\\x0B\\f\\r]``); the reference's
  empty-space class additionally includes NBSP (U+00A0).
* ``java_trim`` = ``String.trim()``: strips leading/trailing chars <= U+0020.
* ``format_g12`` = Java ``String.format("%012g", x)``
  (``DecesiveValueProducerPerplexity.java:263``) - 6 significant digits,
  HALF_UP rounding, no trailing-zero stripping, zero-padded to width 12.
* ``abbreviate`` = commons-lang ``StringUtils.abbreviate(text, n)``.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

# Java \s == [ \t\n\x0B\f\r]; the reference adds   explicitly.
_EMPTYSPACE_CLS = " \t\n\x0b\f\r\u00a0"
_EMPTYSPACE = re.compile("[%s]+" % _EMPTYSPACE_CLS)
_EMPTYSPACE_START = re.compile("^[%s]+" % _EMPTYSPACE_CLS)
_EMPTYSPACE_END = re.compile("[%s]+$" % _EMPTYSPACE_CLS)


def ltrim(text: str) -> str:
    return _EMPTYSPACE_START.sub("", text, count=1)


def rtrim(text: str) -> str:
    return _EMPTYSPACE_END.sub("", text, count=1)


def trim(text: str) -> str:
    return ltrim(rtrim(text))


def trim_and_replace_emptyspace(text: str, replacement: str = " ") -> str:
    return _EMPTYSPACE.sub(replacement, trim(text))


def java_trim(text: str) -> str:
    """``java.lang.String.trim()``: strip chars with codepoint <= U+0020."""
    start, end = 0, len(text)
    while start < end and ord(text[start]) <= 0x20:
        start += 1
    while end > start and ord(text[end - 1]) <= 0x20:
        end -= 1
    return text[start:end]


def abbreviate(text: str, maxlen: int) -> str:
    """commons-lang ``StringUtils.abbreviate``: truncate + \"...\" suffix."""
    if text is None:
        return None
    if len(text) <= maxlen:
        return text
    if maxlen < 4:
        raise ValueError("Minimum abbreviation width is 4")
    return text[: maxlen - 3] + "..."


def _java_g(x: float, precision: int = 6) -> str:
    """Java ``%g`` body (no width/pad): 6 sig digits, HALF_UP, no stripping."""
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "-Infinity" if x < 0 else "Infinity"
    neg = math.copysign(1.0, x) < 0
    ax = abs(x)
    if ax == 0.0:
        body = "0." + "0" * (precision - 1)
        return ("-" + body) if neg else body
    d = Decimal(ax)  # exact binary expansion, like Java's FP-decimal path
    e = d.adjusted()
    # round to `precision` significant digits, HALF_UP (Java Formatter)
    q = d.scaleb(-e).quantize(Decimal(1).scaleb(-(precision - 1)), rounding=ROUND_HALF_UP)
    if q >= 10:  # rounding bumped the magnitude (9.999995 -> 10.0000)
        q = q.scaleb(-1)
        e += 1
    m = q.scaleb(e)  # rounded magnitude
    if Decimal("1e-4") <= m < Decimal(10) ** precision:
        frac_digits = (precision - 1) - e
        if frac_digits <= 0:
            body = str(m.quantize(Decimal(1)))
        else:
            body = str(m.quantize(Decimal(1).scaleb(-frac_digits)))
    else:
        mant = str(q.quantize(Decimal(1).scaleb(-(precision - 1))))
        body = "%se%+03d" % (mant, e)
    return ("-" + body) if neg else body


def format_g12(x: float) -> str:
    """Java ``String.format(\"%012g\", x)``: zero-pad after the sign."""
    body = _java_g(x)
    if len(body) >= 12:
        return body
    if body[0] == "-":
        return "-" + body[1:].rjust(11, "0")
    return body.rjust(12, "0")


_MULTISPACE_ASCII = re.compile(r"\s+", re.ASCII)


def collapse_spaces_ascii(text: str) -> str:
    """Java ``\\s+`` -> single space (abbreviated-plaintext logging,
    ``DecesiveValueProducerPerplexity.java:54,303``)."""
    return _MULTISPACE_ASCII.sub(" ", text)
