"""Text-extraction batch stage (Ray Data ``map_batches``, Arrow in/out).

Implements the reference disposition-chain extraction per page:

* decode recorded bytes with the page's charset
  (``TextExtractor.getUtf8HtmlText``,
  ``lt.ltbot/.../text/TextExtractor.java:40-66``: decode with the
  response charset under REPLACE semantics, re-encode UTF-8; an
  unresolvable charset follows the catch block at :57-66 - the error
  string IS the returned text).  Without HTTP headers the charset comes
  from the in-band ``<meta charset>`` declaration (first 1024 bytes),
  defaulting to UTF-8 like the reference's Recorder does,
* ``clean -> jsoup text -> clean`` composite then ``String.trim()``
  (``TextExtractor.java:80-85``;
  ``DecesiveValueProducerPerplexity.getPerplexity`` trim at :303),
* two cleaner variants: Min for the writer/conformance path (cxml:389)
  and Ext for the scorer path (cxml:216),
* the 50-char abbreviated, space-collapsed logging text
  (``DecesiveValueProducerPerplexity.java:54,303``).

Stateless pure function -> runs as elastic Ray tasks, not actors.
"""

from __future__ import annotations

import pyarrow as pa

import re as _re

from ..functions.cleaners import (
    EXT_DIRTY_CODEPOINTS,
    MIN_DIRTY_CODEPOINTS,
    clean_ext,
    clean_min,
)
from ..functions.htmltext import get_plaintext
from ..functions.strings import abbreviate, collapse_spaces_ascii, java_trim

# chars dirty for Ext but NOT Min: when none are present the Min and Ext
# composites produce identical text, so the second full parse is skipped
_EXT_ONLY = sorted(set(EXT_DIRTY_CODEPOINTS) - set(MIN_DIRTY_CODEPOINTS))
_EXT_ONLY_RE = _re.compile(
    "[%s]" % "".join("\\u%04x" % cp for cp in _EXT_ONLY)
)


_META_CHARSET_RE = _re.compile(
    rb"(?i)<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)"
)


def sniff_charset(html_bytes: bytes) -> str | None:
    """In-band charset declaration (``<meta charset=..>`` or
    ``http-equiv`` content charset) in the first 1024 bytes; None when
    absent.  The scan is ASCII-compatible, like browsers' pre-scan."""
    m = _META_CHARSET_RE.search(html_bytes[:1024])
    return m.group(1).decode("ascii", "replace") if m else None


def decode_page_bytes(url: str, html_bytes: bytes) -> str:
    """``TextExtractor.getUtf8HtmlText`` parity (TextExtractor.java:40-66).

    Decode the recorded bytes with the page charset; malformed sequences
    become U+FFFD (java.nio ``Charset.decode`` uses REPLACE - so does
    python ``errors="replace"``).  A charset name Python cannot resolve
    mirrors the reference's catch block (:57-66): the returned "text" is
    the formatted failure string (depth-1 cause chain), which then flows
    through extraction/scoring like any other content.
    """
    import codecs

    name = sniff_charset(html_bytes) or "utf-8"
    try:
        codec = codecs.lookup(name)
    except LookupError:
        return (
            "Failed to get content of URI: '%s'. "
            "(1 UnsupportedCharsetException:%s)\n" % (url, name)
        )
    return html_bytes.decode(codec.name, "replace")


def is_robots_url(url: str) -> bool:
    """Path == /robots.txt (``DecesiveValuePrioritizer.java:362-370``)."""
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else ""
    return path == "/robots.txt"


def extract_one(html_utf8: str) -> tuple[str, str, str]:
    """(clean_text_min, score_text_ext, abbr) for one page.

    The two composites differ only on UTF8CleanerExt's extra dirty list;
    pages without any Ext-only char (the overwhelming majority) run the
    parse once and share the result.
    """
    plain_min = java_trim(clean_min(get_plaintext(clean_min(html_utf8))))
    if _EXT_ONLY_RE.search(html_utf8) is None:
        plain_ext = plain_min
    else:
        plain_ext = java_trim(clean_ext(get_plaintext(clean_ext(html_utf8))))
    abbr = collapse_spaces_ascii(abbreviate(plain_ext, 50))
    return plain_min, plain_ext, abbr


def extract_batch(batch: pa.Table) -> pa.Table:
    """Append ``clean_text`` (Min), ``score_text`` (Ext), ``text_abbr``.

    Robots pages (path /robots.txt) pass through with empty text - the
    content-type decide rules exclude them from scoring (cxml:225-246).
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    clean_texts: list[str] = []
    score_texts: list[str] = []
    abbrs: list[str] = []
    for url, html in zip(urls, htmls):
        if is_robots_url(url):
            clean_texts.append("")
            score_texts.append("")
            abbrs.append("")
            continue
        html_utf8 = decode_page_bytes(url, html)
        c, s, a = extract_one(html_utf8)
        clean_texts.append(c)
        score_texts.append(s)
        abbrs.append(a)
    return (
        batch.append_column("clean_text", pa.array(clean_texts, pa.large_string()))
        .append_column("score_text", pa.array(score_texts, pa.large_string()))
        .append_column("text_abbr", pa.array(abbrs, pa.string()))
    )


def titles_batch(batch: pa.Table) -> pa.Table:
    """``<title>`` metadata extraction: the charset-aware decode (M1
    kernel, byte-parity-certified via extract_text) runs per row, then
    the title scan is ONE vectorized RE2 pass over the decoded column
    (``pc.extract_regex``) — no per-row Python parsing.  Robots pages
    are dropped; a page without a title yields ''.

    -> (url, title).
    """
    import pyarrow.compute as pc

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    keep_urls: list[str] = []
    texts: list[str] = []
    for url, html in zip(urls, htmls):
        if is_robots_url(url):
            continue
        keep_urls.append(url)
        texts.append(decode_page_bytes(url, html))
    m = pc.extract_regex(
        pa.array(texts, pa.large_string()), "<title>(?P<t>[^<]*)</title>"
    )
    titles = pc.fill_null(pc.struct_field(m, "t"), "")
    return pa.table(
        {
            "url": pa.array(keep_urls, pa.string()),
            "title": titles.cast(pa.string()),
        }
    )
