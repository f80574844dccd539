"""URL canonicalization and outlink extraction.

* Canonicalization (M14, mirrors Heritrix UURI normalisation for the
  fixture URL subset): lowercase scheme+host, strip default ports, strip
  fragments, resolve relative references, empty path -> "/".
* Outlink extraction (S3, Heritrix ``ExtractorHTML`` behaviour subset per
  cxml:276-281): ``<a href>`` anchors in document order, no JS links, no
  form actions; hop type 'L'.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)

_SCHEME_RE = re.compile(r"^[a-zA-Z][\w+\-]+:")  # TextPrioSeedModule.java:19

DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize(url: str) -> str:
    """Deterministic canonical form; this is the URL-seen key."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and port != DEFAULT_PORTS.get(scheme):
        netloc = "%s:%d" % (host, port)
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of_url(url: str) -> str:
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0].lower()


def path_of_url(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def seed_line_url(line: str) -> str:
    """``TextPrioSeedModule.seedLine``: default scheme ``http://``."""
    line = line.strip()
    if not _SCHEME_RE.match(line):
        line = "http://" + line
    return canonicalize(line)


def extract_outlinks(html: str, base_url: str) -> list[str]:
    """Canonical absolute outlink URLs in document order (href dedup is
    NOT applied here - the URL-seen filter downstream owns dedup)."""
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if low.startswith(("javascript:", "mailto:", "data:")):
            continue
        absu = urljoin(base_url, href)
        if not absu.lower().startswith(("http://", "https://")):
            continue
        out.append(canonicalize(absu))
    return out


_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_anchors(html: str, base_url: str) -> list[tuple[str, str]]:
    """(canonical target URL, cleaned anchor text) pairs in document
    order - same link filtering as :func:`extract_outlinks`
    (ExtractorHTML subset); the anchor text has inner tags stripped and
    whitespace collapsed (``a > b`` nesting keeps the inner text)."""
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(html):
        href = (m.group(2) or m.group(3) or m.group(4) or "").strip()
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if low.startswith(("javascript:", "mailto:", "data:")):
            continue
        absu = urljoin(base_url, href)
        if not absu.lower().startswith(("http://", "https://")):
            continue
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", m.group(5))).strip()
        out.append((canonicalize(absu), text))
    return out
