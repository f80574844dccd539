"""Rule-based sentence splitter - port of ``lt.seg`` ``RuleSplitter``.

Reference: ``lt.seg/.../sentence/RuleSplitter.java:32-170`` with rule data
from ``lt.seg/src/main/resources/rulesets/sentence/default/*`` (packaged
here as ``resources/sentence_rules_default.json.gz``; escape sequences
already converted per ``SegmentationUtils.convert``).

Algorithm per emitted segment:

* accumulate chars; a candidate boundary fires when the accumulated text
  (last 100 chars) ends with one of the 41 boundary suffixes
  (``BoundaryList.java:66-78``),
* look-back: the last whitespace-delimited token of the accumulated text
  must not be one of 6502 known abbreviations
  (``PreBoundaryListProcessor``), and the last token of the text *without*
  the boundary suffix must pass the pre-boundary regex rules
  (``PreBoundaryRulesProcessor.java:66-90``),
* look-ahead: the next approximate token (``EmptySpaceTokenizer``) must not
  be a known non-starter (``PostBoundaryListProcessor``) and must pass the
  post-boundary regex rules,
* runs of line separators form EMPTY_SPACE segments
  (paragraph handling: ``RuleSplitter.getNext`` ``is_empty`` logic).

Note on suffix ambiguity: the reference scans a Java ``HashSet`` in hash
order; when several boundary strings are simultaneous suffixes (e.g. both
``"\\t"`` and ``".\\t"``) the winner is unspecified there.  We pick the
LONGEST matching suffix and document that as this engine's deterministic
spec (the fixture grammar avoids ambiguous cases).

The crawl scorer path feeds this splitter via
``LtSegProvider.split_and_add_sentences`` (``LtSegProvider.java:50-64``):
input is pre-collapsed with ``trim_and_replace_emptyspace`` and each
emitted SENTENCE segment is collapsed again and skipped when empty.
"""

from __future__ import annotations

import gzip
import json
import re
import unicodedata
from functools import lru_cache
from pathlib import Path

from . import jchar
from .strings import trim_and_replace_emptyspace

_RESOURCE = Path(__file__).resolve().parent.parent / "resources" / "sentence_rules_default.json.gz"

_ES_TYPES = frozenset(
    (jchar.SPACE_SEPARATOR, jchar.LINE_SEPARATOR, jchar.PARAGRAPH_SEPARATOR, jchar.CONTROL)
)


def _char_is_empty_space(cp: int) -> bool:
    return jchar.java_char_type(cp) in _ES_TYPES


def _char_is_line_separator(cp: int) -> bool:
    return cp in (10, 13, 12) or jchar.java_char_type(cp) == jchar.LINE_SEPARATOR


@lru_cache(maxsize=1)
def _mark_class() -> str:
    """Python char-class body equivalent to Java ``\\p{M}`` (BMP)."""
    ranges = []
    start = None
    for cp in range(0x10000):
        ism = unicodedata.category(chr(cp)).startswith("M")
        if ism and start is None:
            start = cp
        elif not ism and start is not None:
            ranges.append((start, cp - 1))
            start = None
    if start is not None:
        ranges.append((start, 0xFFFF))
    return "".join(
        "\\u%04x" % a if a == b else "\\u%04x-\\u%04x" % (a, b) for a, b in ranges
    )


def _compile_java_regex(pattern: str) -> re.Pattern:
    """Translate the Java-regex constructs used by the rule files."""
    m = _mark_class()
    pattern = pattern.replace(r"\p{M}", "[%s]" % m).replace(r"\P{M}", "[^%s]" % m)
    return re.compile(pattern)


class RuleSet:
    """Parsed default ruleset; singleton via :func:`default_ruleset`."""

    def __init__(self, data: dict):
        self.boundaries: list[str] = sorted(data["boundaries"], key=len, reverse=True)
        self.max_boundary_len = max(len(b) for b in self.boundaries)
        # index boundary suffixes by final char for O(1) candidate lookup
        self.by_last: dict[str, list[str]] = {}
        for b in self.boundaries:
            self.by_last.setdefault(b[-1], []).append(b)
        self.pre_exceptions = frozenset(data["pre_exceptions"])
        self.post_exceptions = frozenset(data["post_exceptions"])
        self.pre_rules = [(pos, _compile_java_regex(p)) for pos, p in data["pre_rules"]]
        self.post_rules = [(pos, _compile_java_regex(p)) for pos, p in data["post_rules"]]

    # -- BoundaryList ------------------------------------------------------
    def suffix_as_boundary(self, text: str) -> str | None:
        window = text[-100:]
        if not window:
            return None
        cands = self.by_last.get(window[-1])
        if not cands:
            return None
        for b in cands:  # longest first (see module docstring)
            if window.endswith(b):
                return b
        return None

    # -- Pre/PostBoundaryListProcessor ------------------------------------
    @staticmethod
    def _last_token(text: str) -> str:
        end = len(text)
        while end > 0 and _char_is_empty_space(ord(text[end - 1])):
            end -= 1
        begin = end
        while begin > 0 and not _char_is_empty_space(ord(text[begin - 1])):
            begin -= 1
        return text[begin:end]

    @staticmethod
    def _first_token(text: str) -> str:
        for i in range(1, len(text)):
            if _char_is_empty_space(ord(text[i])):
                return text[:i]
        return text

    def pre_list_complete(self, text: str) -> bool:
        return self._last_token(text) not in self.pre_exceptions

    def post_list_complete(self, token: str) -> bool:
        if not token:
            return True
        return self._first_token(token) not in self.post_exceptions

    def pre_rules_complete(self, text: str) -> bool:
        if len(text) < 1:
            return True
        last = self._last_token(text)
        result = True
        for positive, pat in self.pre_rules:
            if pat.fullmatch(last):
                result &= positive
        return result

    def post_rules_complete(self, token: str) -> bool:
        first = self._first_token(token)
        result = True
        for positive, pat in self.post_rules:
            if pat.fullmatch(first):
                result &= positive
        return result


@lru_cache(maxsize=1)
def default_ruleset() -> RuleSet:
    with gzip.open(_RESOURCE, "rb") as f:
        return RuleSet(json.loads(f.read().decode("utf-8")))


# ---------------------------------------------------------------------------
# vectorised candidate scan (fast path for split_segments)
#
# The reference scans char-by-char and probes the boundary set at every
# char whose value is the last char of SOME boundary ("n" and " " are in
# that set, so the probe fires roughly once per word).  The fast path
# computes the true candidate positions in one regex pass: a position is a
# candidate iff it matches a whole 1-char boundary or the 2-char tail of a
# longer boundary.  Only candidates run the (identical) Python boundary /
# look-back / look-ahead checks, so the output is byte-identical.

# chars that force the slow path: NUL (scanner stop) and the line
# separators that drive the `is_empty` paragraph logic
# (charIsLineSeparator: \n \r \f | Zl; \r only occurs beside \n in rules)
_SLOW_CPS = (0, 10, 12, 13, 0x2028)


@lru_cache(maxsize=1)
def _fast_tables():
    """Compiled regexes for the candidate scan (C-speed on short strings)."""
    rules = default_ruleset()
    slow_re = re.compile("[%s]" % "".join(re.escape(chr(cp)) for cp in _SLOW_CPS))
    singles = [b for b in rules.boundaries if len(b) == 1]
    tails = sorted({b[-2:] for b in rules.boundaries if len(b) >= 2})
    # zero-width lookahead so overlapping tails all produce candidates
    pair_re = re.compile("(?=(?:%s))" % "|".join(re.escape(t) for t in tails))
    single_re = (
        re.compile("[%s]" % "".join(re.escape(s) for s in singles)) if singles else None
    )
    return slow_re, single_re, pair_re


def _candidate_positions(text: str):
    """Positions that can possibly end a boundary suffix: exact for 1-char
    boundaries, a superset for longer ones (their 2-char tail must match;
    ``suffix_as_boundary`` then runs the full check)."""
    slow_re, single_re, pair_re = _fast_tables()
    if slow_re.search(text):
        return None  # caller takes the slow path
    out = [m.start() + 1 for m in pair_re.finditer(text)]
    if single_re is not None and single_re.search(text):
        out = sorted(set(out) | {m.start() for m in single_re.finditer(text)})
    return out


def _next_es_token(text: str, pos: int) -> str | None:
    """First token of ``EmptySpaceTokenizer`` starting at ``pos``."""
    n = len(text)
    if pos >= n:
        return None
    i = pos
    first_es = _char_is_empty_space(ord(text[i]))
    while i < n:
        cp = ord(text[i])
        if cp == 0:
            break
        if _char_is_empty_space(cp) != first_es:
            break
        i += 1
    return text[pos:i] if i > pos else None


def _split_segments_fast(text: str) -> list[tuple[str, bool]] | None:
    """Candidate-scan path: byte-identical to the char loop whenever the
    text has no NUL / line-separator chars (then ``is_empty`` can never
    fire and segments end only at boundary matches or end-of-text).
    Returns None when the slow path is required."""
    if max(text) >= "\U00010000":  # astral chars: keep unit-exact slow path
        return None
    cands = _candidate_positions(text)
    if cands is None:
        return None
    rules = default_ruleset()
    out: list[tuple[str, bool]] = []
    n = len(text)
    start = 0
    for p in cands:
        if p < start:
            continue
        sent = text[start : p + 1]
        boundary = rules.suffix_as_boundary(sent)
        if boundary is None:
            continue
        body = sent[: len(sent) - len(boundary)]
        if not (rules.pre_list_complete(sent) and rules.pre_rules_complete(body)):
            continue
        nxt = _next_es_token(text, p + 1)
        if nxt is None or (rules.post_list_complete(nxt) and rules.post_rules_complete(nxt)):
            out.append((sent, True))
            start = p + 1
    if start < n:
        out.append((text[start:n], True))
    return out


def split_segments(text: str) -> list[tuple[str, bool]]:
    """RuleSplitter segmentation -> list of (segment_text, is_sentence)."""
    if text:
        fast = _split_segments_fast(text)
        if fast is not None:
            return fast
    rules = default_ruleset()
    out: list[tuple[str, bool]] = []
    n = len(text)
    # Java reads UTF-16 units; re-expand so char classes line up
    units = text  # BMP-dominant inputs: python str positions == units for
    # astral-free text; astral chars are never boundaries/empty-space
    i = 0
    while i < n:
        start = i
        cp0 = ord(units[i])
        if cp0 == 0:
            # Java `while (_cp > 0)`: NUL yields zero-length -> splitter stops
            break
        first_is_newline = _char_is_line_separator(cp0)
        is_empty = first_is_newline
        seg_end = n
        by_last = rules.by_last
        while i < n:
            ch = units[i]
            cp = ord(ch)
            if cp == 0:
                seg_end = i
                break
            i += 1
            if is_empty and not _char_is_empty_space(cp):
                is_empty = False
            # fast path: only materialise the sentence text when the
            # current char can end one of the boundary suffixes (the
            # per-char full slice would make splitting quadratic)
            if ch in by_last:
                sent = units[start:i]
                boundary = rules.suffix_as_boundary(sent)
                if boundary is not None:
                    body = sent[: len(sent) - len(boundary)]
                    if rules.pre_list_complete(sent) and rules.pre_rules_complete(body):
                        nxt = _next_es_token(units, i)
                        if (
                            nxt is None
                            or (rules.post_list_complete(nxt) and rules.post_rules_complete(nxt))
                        ):
                            seg_end = i
                            break
            if is_empty and i < n and not _char_is_line_separator(ord(units[i])):
                seg_end = i
                break
            seg_end = i
        seg = units[start:seg_end]
        if not seg:
            break
        out.append((seg, not is_empty))
        i = seg_end
        if seg_end >= n or (seg_end < n and ord(units[seg_end]) == 0):
            break
    return out


def split_sentences(text: str) -> list[str]:
    """``LtSegProvider.splitSentences`` (onedocperline=False default):
    collapse whitespace, split, collapse each SENTENCE, drop empties."""
    collapsed = trim_and_replace_emptyspace(text, " ")
    sentences = []
    for seg, is_sentence in split_segments(collapsed):
        if not is_sentence:
            continue
        s = trim_and_replace_emptyspace(seg, " ")
        if s:
            sentences.append(s)
    return sentences
