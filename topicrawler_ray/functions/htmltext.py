"""Jsoup-equivalent plaintext extraction for the supported HTML subset.

Reproduces the reference extraction composite byte-for-byte
(``lt.ltbot/.../text/JSoupTextExtractor.java:34-54`` +
``TextExtractor.getCleanedUtf8PlainText``, ``TextExtractor.java:80-85``):

1. ``(?i)</p>``   -> ``</p>br2nl``      (preserve paragraph breaks)
2. ``\\r?\\n``      -> ``br2nl``          (preserve source line breaks)
3. ``Jsoup.parse(html).text()``        (DOM text, Jsoup whitespace rules)
4. ``br2nl``      -> ``\\n``
5. ``String.trim()`` then ``(?m)\\s+$`` -> "" (strip trailing ws per line;
   note the Java regex also swallows blank lines' newlines)

Step 3 is re-implemented here for the HTML subset defined by our fixture
grammar (see FIXTURES.md par.1a): tags with quoted attributes, comments,
doctype, rawtext ``script``/``style``, rcdata ``title``, HTML5 named +
numeric entities, no CDATA, no ``<pre>`` whitespace preservation.  The
Jsoup rules mirrored exactly:

* text nodes are whitespace-normalised (``[ \\t\\n\\f\\r]`` runs -> one
  space); the leading space is dropped iff the accumulator already ends
  with a literal space (Jsoup ``TextNode.lastCharIsWhitespace``),
* entering a block-level element or ``br`` appends one space when the
  accumulator is non-empty and does not end with a space,
* NBSP is not whitespace (survives normalisation), and
* the final result is ``String.trim()``-ed (chars <= U+0020).
"""

from __future__ import annotations

import html as _htmlmod
import re

from .strings import java_trim

_END_P = re.compile(r"(?i)</p>")
_NWLN = re.compile(r"\r?\n")
_BR2NL = re.compile(r"br2nl")
_EMPTLN = re.compile(r"\s+$", re.M | re.A)  # Java \s is ASCII-only

# Jsoup 1.8 block-level tags (org.jsoup.parser.Tag blockTags) + "br",
# which Element.text() treats like a block for separator purposes.
_BLOCK_TAGS = frozenset(
    """html head body frameset script noscript style meta link title frame
    noframes section nav aside hgroup header footer p h1 h2 h3 h4 h5 h6 ul
    ol pre div blockquote hr address figure figcaption form fieldset ins
    del s dl dt dd li table caption thead tfoot tbody colgroup col tr th
    td video audio canvas details menu plaintext template article main svg
    math br""".split()
)

_RAWTEXT_TAGS = frozenset(("script", "style"))  # content skipped entirely
_RCDATA_TAGS = frozenset(("title", "textarea"))  # content = entity-decoded text

_JSOUP_WS = frozenset(" \t\n\f\r")

_TAG_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9]*")


def _append_normalised(accum: list[str], text: str, strip_leading: bool) -> None:
    """Jsoup ``StringUtil.appendNormalisedWhitespace``."""
    last_was_white = False
    reached_non_white = False
    for ch in text:
        if ch in _JSOUP_WS:
            if (strip_leading and not reached_non_white) or last_was_white:
                continue
            accum.append(" ")
            last_was_white = True
        else:
            accum.append(ch)
            last_was_white = False
            reached_non_white = True


def _scan_tag(html: str, i: int) -> tuple[int, str | None, bool]:
    """Scan a tag starting at ``html[i] == '<'``.

    Returns ``(next_index, tag_name_lower_or_None, is_end_tag)``.
    ``tag_name`` is None for comments / doctype / bogus markup.  Handles
    quoted attribute values that may contain ``>``.
    """
    n = len(html)
    if html.startswith("<!--", i):
        end = html.find("-->", i + 4)
        return (n if end < 0 else end + 3), None, False
    j = i + 1
    is_end = False
    if j < n and html[j] == "/":
        is_end = True
        j += 1
    m = _TAG_NAME.match(html, j)
    if m is None:
        if j < n and html[j] == "!":  # doctype / bogus comment
            end = html.find(">", j)
            return (n if end < 0 else end + 1), None, False
        # bare '<' treated as text by HTML parsers; caller handles
        return i + 1, "<", False
    name = m.group(0).lower()
    j = m.end()
    # scan to closing '>', respecting quoted attribute values
    quote = None
    while j < n:
        c = html[j]
        if quote is not None:
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c == ">":
            return j + 1, name, is_end
        j += 1
    return n, name, is_end


def jsoup_text(html: str) -> str:
    """Equivalent of ``Jsoup.parse(html).text()`` for the fixture subset."""
    accum: list[str] = []
    i, n = 0, len(html)
    text_start = 0

    def flush_text(end: int) -> None:
        if end > text_start:
            raw = html[text_start:end]
            decoded = _htmlmod.unescape(raw)
            strip_leading = bool(accum) and accum[-1] == " "
            _append_normalised(accum, decoded, strip_leading)

    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            flush_text(n)
            text_start = n
            break
        flush_text(lt)
        nxt, name, is_end = _scan_tag(html, lt)
        if name == "<":  # literal '<' treated as text
            strip_leading = bool(accum) and accum[-1] == " "
            _append_normalised(accum, "<", strip_leading)
            i = text_start = nxt
            continue
        if name is not None and not is_end:
            if name in _BLOCK_TAGS and accum and accum[-1] != " ":
                accum.append(" ")
            if name in _RAWTEXT_TAGS:
                close = re.search(r"(?i)</%s[\s>]" % name, html[nxt:])
                if close is None:
                    i = text_start = n
                    continue
                skip_to = nxt + close.start()
                end = html.find(">", skip_to)
                i = text_start = (n if end < 0 else end + 1)
                continue
            if name in _RCDATA_TAGS:
                close = re.search(r"(?i)</%s[\s>]" % name, html[nxt:])
                content_end = n if close is None else nxt + close.start()
                decoded = _htmlmod.unescape(html[nxt:content_end])
                strip_leading = bool(accum) and accum[-1] == " "
                _append_normalised(accum, decoded, strip_leading)
                if close is None:
                    i = text_start = n
                    continue
                end = html.find(">", content_end)
                i = text_start = (n if end < 0 else end + 1)
                continue
        i = text_start = nxt

    # Jsoup Element.text() ends with String.trim()
    return java_trim("".join(accum))


def get_plaintext(htmltext: str) -> str:
    """``JSoupTextExtractor.getPlaintext`` - the full 5-step composite."""
    h = _END_P.sub("</p>br2nl", htmltext)
    h = _NWLN.sub("br2nl", h)
    plaintext = jsoup_text(h)
    plaintext = _BR2NL.sub("\n", plaintext)
    plaintext = _EMPTLN.sub("", java_trim(plaintext))
    return plaintext
