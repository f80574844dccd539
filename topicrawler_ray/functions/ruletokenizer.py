"""RuleTokenizer + lookahead rules - faithful port of the reference's
rule-based tokenizer stack (``lt.seg``):

* :func:`es_tokenize` - ``token/EmptySpaceTokenizer.java:33-84``:
  segments flip on empty-space-ness only.
* :func:`es_conservative_segments` / :func:`es_conservative_tokenize` -
  ``token/EmptySpaceTokenizerConservative.java:38-105``: additionally
  breaks on word/non-word and number/non-number flips and after every
  char that is neither (punctuation etc. become single-unit segments).
  This is the base tokenizer of the default rule set
  (``rulesets/token/default/tokenizer.txt``).
* :func:`null_tokenize` - ``token/NullTokenizer.java``: the whole text
  as one segment (including the buffer-iteration quirk that folds a
  CONTROL chartype into the inferred type whenever a read chunk does
  not fill the 8192-char buffer - i.e. for virtually every input).
* :class:`LookaheadList` - ``token/rules/LookaheadList.java:37-110``:
  longest-match merge of buffered segments against an abbreviation
  list (10k entries, ``lookahead-list.txt``).
* :class:`LookaheadRules` - ``token/rules/LookaheadRules.java:36-170``:
  ordered +/- regex rules with global-reject prefix handling, matched
  against the concatenated lookahead buffer; matches must end on a
  segment boundary.
* :func:`rule_tokenize` - ``token/RuleTokenizer.java:31-110``: 100-deep
  lookahead buffer over the base tokenizer; list rule then regex rules
  are BOTH applied per step (the Java uses non-short-circuit ``&``).
* :func:`line_split` / :func:`null_split` -
  ``sentence/LineSplitter.java`` / ``sentence/NullSplitter.java``.

The token rule DATA files are repackaged verbatim under
``resources/token_lookahead_{list,rules}.txt.gz`` - byte-identical
tokenization requires the same rule data (same adjudication as the
sentence rulesets, VERDICT r1).

Dialect notes (documented deltas from java.util.regex):

* Rules are translated by :func:`java_regex_to_python`: ``\\p{L}/
  \\p{M}/\\p{Lu}/\\p{Ll}`` become explicit BMP character classes built
  from the Java chartype table; ``\\w \\d \\s`` (Java = ASCII-only
  without UNICODE_CHARACTER_CLASS) become their ASCII classes;
  variable-width lookbehinds (Java allows bounded ones, Python does
  not) are expanded into fixed-width alternations/conjunctions.
* Processing is per UTF-16 unit like the Java readers (astral chars
  appear as surrogate halves, Character.getType == SURROGATE), so the
  regex stage - like the Java CHAR stream but unlike a Java regex on a
  String - never merges across astral codepoints.  Python ``\\b`` keeps
  unicode word semantics (Java's is ASCII); only affects boundaries
  adjacent to non-ASCII letters.
* ``Pattern.CANON_EQ`` (canonical equivalence) has no Python analog
  and is dropped.
"""

from __future__ import annotations

import gzip
import re
from collections import deque
from functools import lru_cache
from pathlib import Path

import numpy as np

from . import jchar
from .tokenizer import (
    ALLOWED,
    SegmentType,
    _build_tables,
    _infer_type_from_mask,
    filtered_segments,
    merge_consecutive_tokens,
    normalize_segment,
)

_RES = Path(__file__).resolve().parent.parent / "resources"
_LIST_RESOURCE = _RES / "token_lookahead_list.txt.gz"
_RULES_RESOURCE = _RES / "token_lookahead_rules.txt.gz"

_BUFFER_SIZE = 100  # RuleTokenizer.java:37 (ArrayDeque<>(100) fill bound)


# ---------------------------------------------------------------------------
# segment model + base tokenizers


class Segment:
    """Mutable (begin, end, text, type) - positions in UTF-16 units."""

    __slots__ = ("begin", "end", "text", "type")

    def __init__(self, begin: int, end: int, text: str, type_: SegmentType):
        self.begin = begin
        self.end = end
        self.text = text
        self.type = type_


def _unit_str(text: str) -> str:
    """Text as one python char per UTF-16 unit (lone surrogates for
    astral chars), so positions match the Java char stream."""
    units = jchar.utf16_units(text)
    if units.size == len(text):
        return text
    return "".join(map(chr, units.tolist()))


def _units_back(s: str) -> str:
    """Recombine surrogate halves produced by :func:`_unit_str`."""
    try:
        return s.encode("utf-16", "surrogatepass").decode("utf-16")
    except UnicodeDecodeError:
        return s


@lru_cache(maxsize=1)
def _cons_tables() -> tuple[np.ndarray, np.ndarray]:
    """(is_word_type, is_number_type) per UTF-16 unit."""
    jt = jchar.java_type_table()
    w = np.zeros(256, dtype=bool)
    for t in ALLOWED[SegmentType.WORD]:
        w[t] = True
    n = np.zeros(256, dtype=bool)
    for t in ALLOWED[SegmentType.NUMBER]:
        n[t] = True
    return w[jt], n[jt]


def _segments_from_breaks(text: str, brk: np.ndarray,
                          units: np.ndarray) -> list[Segment]:
    unit_bit, _es, _wwn = _build_tables()
    starts = np.concatenate(([0], np.flatnonzero(brk) + 1))
    ends = np.concatenate((starts[1:], [units.size]))
    masks = np.bitwise_or.reduceat(
        (np.uint32(1) << unit_bit[units]).astype(np.uint32), starts
    )
    u = _unit_str(text)[: units.size]
    return [
        Segment(int(s), int(e), u[s:e], _infer_type_from_mask(int(m)))
        for s, e, m in zip(starts.tolist(), ends.tolist(), masks.tolist())
    ]


def _clip_nul(units: np.ndarray) -> np.ndarray:
    # Java `while (_cp > 0)`: NUL terminates the stream
    nul = np.flatnonzero(units == 0)
    return units[: nul[0]] if nul.size else units


def es_segments(text: str) -> list[Segment]:
    """EmptySpaceTokenizer.java: break only on empty-space flips."""
    units = _clip_nul(jchar.utf16_units(text))
    if units.size == 0:
        return []
    _bit, is_es, _wwn = _build_tables()
    es = is_es[units]
    return _segments_from_breaks(text, es[:-1] != es[1:], units)


def es_conservative_segments(text: str) -> list[Segment]:
    """EmptySpaceTokenizerConservative.java:45-89 boundary rules."""
    units = _clip_nul(jchar.utf16_units(text))
    if units.size == 0:
        return []
    _bit, is_es, _wwn = _build_tables()
    is_w, is_n = _cons_tables()
    es, w, num = is_es[units], is_w[units], is_n[units]
    brk = (
        (es[:-1] != es[1:])
        | (w[:-1] != w[1:])
        | (num[:-1] != num[1:])
        | ~(w[:-1] | num[:-1])
    )
    return _segments_from_breaks(text, brk, units)


def es_tokenize(text: str) -> list[tuple[str, SegmentType]]:
    return [(_units_back(s.text), s.type) for s in es_segments(text)]


def es_conservative_tokenize(text: str) -> list[tuple[str, SegmentType]]:
    return [(_units_back(s.text), s.type) for s in es_conservative_segments(text)]


def null_tokenize(text: str) -> list[tuple[str, SegmentType]]:
    """NullTokenizer.java: one segment = the whole text.  The Java
    iterates the full 8192-char read buffer per chunk, so a CONTROL
    chartype (NUL fill) joins the observed set whenever any chunk is
    short - i.e. unless len(text) is a positive multiple of 8192."""
    units = jchar.utf16_units(text)
    unit_bit, _es, _wwn = _build_tables()
    mask = 0
    if units.size:
        mask = int(
            np.bitwise_or.reduce(
                (np.uint32(1) << unit_bit[units]).astype(np.uint32)
            )
        )
    if units.size == 0 or units.size % 8192 != 0:
        mask |= 1 << int(jchar.CONTROL)
    return [(text, _infer_type_from_mask(mask))]


# ---------------------------------------------------------------------------
# sentence splitters (LineSplitter / NullSplitter)


def line_split(text: str) -> list[tuple[str, bool]]:
    """LineSplitter.java: alternate runs of line-separator chars and
    content -> (segment_text, is_content_line).  Like the reference's
    ``sentences()`` every segment is emitted; separator-only runs carry
    ``False`` so provider-level trimming can drop them."""
    from .sentences import _char_is_line_separator

    u = _unit_str(text)
    out: list[tuple[str, bool]] = []
    i, n = 0, len(u)
    while i < n:
        start = i
        first = _char_is_line_separator(ord(u[i]))
        is_empty = first
        while i < n:
            is_empty &= _char_is_line_separator(ord(u[i]))
            i += 1
            if i >= n:
                break
            nxt = _char_is_line_separator(ord(u[i]))
            if is_empty and not nxt:
                break
            if not is_empty and nxt:
                break
        out.append((_units_back(u[start:i]), not is_empty))
    return out


def line_split_sentences(text: str) -> list[str]:
    """Registry adapter: content lines, whitespace-collapsed, non-empty
    (the LtSegProvider trim discipline, LtSegProvider.java:93-120)."""
    from .strings import trim_and_replace_emptyspace

    out = []
    for seg, is_content in line_split(text):
        if not is_content:
            continue
        s = trim_and_replace_emptyspace(seg, " ")
        if s:
            out.append(s)
    return out


def null_split(text: str) -> list[str]:
    """NullSplitter.java: the whole text is one SENTENCE segment."""
    return [text]


# ---------------------------------------------------------------------------
# Java-dialect regex translation


@lru_cache(maxsize=8)
def _class_content(kind: str) -> str:
    """BMP character-class content for \\p{kind} built from the Java
    chartype table (kind in L, M, Lu, Ll)."""
    jt = jchar.java_type_table()
    sets = {
        "L": ALLOWED[SegmentType.WORD],
        "Lu": frozenset((jchar.UPPERCASE_LETTER,)),
        "Ll": frozenset((jchar.LOWERCASE_LETTER,)),
        "M": frozenset(
            (jchar.NON_SPACING_MARK, jchar.ENCLOSING_MARK,
             jchar.COMBINING_SPACING_MARK)
        ),
    }
    member = np.isin(jt, list(sets[kind]))
    cps = np.flatnonzero(member)
    if cps.size == 0:
        return ""
    # compress to ranges
    parts: list[str] = []
    run_s = prev = int(cps[0])
    for cp in cps[1:].tolist() + [-10]:
        if cp == prev + 1:
            prev = cp
            continue
        a, b = run_s, prev
        ea = re.escape(chr(a))
        if a == b:
            parts.append(ea)
        elif b == a + 1:
            parts.append(ea + re.escape(chr(b)))
        else:
            parts.append(ea + "-" + re.escape(chr(b)))
        run_s = prev = cp
    return "".join(parts)


_ASCII_CONTENT = {
    "w": "a-zA-Z0-9_",
    "d": "0-9",
    "s": " \\t\\n\\x0b\\f\\r",
}


def _translate_body(pat: str) -> str:
    """Replace \\p{X} and ASCII-ify \\w \\d \\s, tracking whether we are
    inside a character class so class content nests correctly."""
    out: list[str] = []
    i, n = 0, len(pat)
    in_class = False
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:
            nxt = pat[i + 1]
            if nxt in ("p", "P") and i + 2 < n and pat[i + 2] == "{":
                j = pat.index("}", i + 2)
                kind = pat[i + 3 : j]
                content = _class_content(kind)
                if nxt == "p":
                    out.append(content if in_class else "[" + content + "]")
                else:
                    if in_class:
                        raise ValueError("\\P inside class unsupported: %r" % pat)
                    out.append("[^" + content + "]")
                i = j + 1
                continue
            if nxt in _ASCII_CONTENT:
                content = _ASCII_CONTENT[nxt]
                out.append(content if in_class else "[" + content + "]")
                i += 2
                continue
            if nxt in ("W", "D", "S") and not in_class:
                out.append("[^" + _ASCII_CONTENT[nxt.lower()] + "]")
                i += 2
                continue
            out.append(pat[i : i + 2])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)


def _expand_lookbehinds(pat: str) -> str:
    """Rewrite lookbehinds Python rejects: bounded {a,b} quantifiers
    become fixed-width alternations (positive) / conjunctions
    (negative); top-level | in a negative lookbehind splits into a
    conjunction of single lookbehinds."""
    out = []
    i, n = 0, len(pat)
    while i < n:
        m = re.compile(r"\(\?<([=!])").match(pat, i)
        if not m:
            out.append(pat[i])
            i += 1
            continue
        neg = m.group(1) == "!"
        # find balanced close
        depth, j = 1, m.end()
        while j < n and depth:
            if pat[j] == "\\":
                j += 2
                continue
            if pat[j] == "(":
                depth += 1
            elif pat[j] == ")":
                depth -= 1
            j += 1
        body = pat[m.end() : j - 1]
        full = pat[i:j]
        try:
            re.compile(full)
            out.append(full)
            i = j
            continue
        except re.error:
            pass
        op = "?<!" if neg else "?<="
        # split top-level alternation
        branches = _split_top(body)
        if len(branches) > 1:
            pieces = ["(%s%s)" % (op, b) for b in branches]
            out.append(
                "".join(pieces) if neg else "(?:" + "|".join(pieces) + ")"
            )
            i = j
            continue
        # expand one bounded quantifier {a,b}
        qm = re.compile(r"\{(\d+),(\d+)\}").search(body)
        if not qm:
            raise ValueError("untranslatable lookbehind: %r" % full)
        a, b = int(qm.group(1)), int(qm.group(2))
        pieces = [
            "(%s%s{%d}%s)" % (op, body[: qm.start()], k, body[qm.end() :])
            for k in range(a, b + 1)
        ]
        out.append("".join(pieces) if neg else "(?:" + "|".join(pieces) + ")")
        i = j
    return "".join(out)


def _split_top(body: str) -> list[str]:
    parts, depth, cls, cur = [], 0, False, []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            cur.append(body[i : i + 2])
            i += 2
            continue
        if cls:
            if c == "]":
                cls = False
        elif c == "[":
            cls = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def java_regex_to_python(pat: str) -> str:
    """Translate one lookahead-rule regex from the Java dialect."""
    flags = ""
    m = re.match(r"^\(\?([iu]+)\)", pat)
    if m:
        inline = m.group(1).replace("u", "")
        flags = "(?%s)" % inline if inline else ""
        pat = pat[m.end() :]
    body = _translate_body(pat)
    body = _expand_lookbehinds(body)
    return flags + body


# ---------------------------------------------------------------------------
# lookahead list / rules / rule set


def _convert(line: str) -> str:
    """SegmentationUtils.convert: java escape sequences in rule data."""
    out: list[str] = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        i += 1
        if c != "\\" or i >= n:
            out.append(c)
            continue
        c = line[i]
        i += 1
        if c == "u":
            out.append(chr(int(line[i : i + 4], 16)))
            i += 4
        elif c == "t":
            out.append("\t")
        elif c == "r":
            out.append("\r")
        elif c == "n":
            out.append("\n")
        elif c == "f":
            out.append("\f")
        else:
            out.append(c)
    return "".join(out)


class LookaheadList:
    """LookaheadList.java:37-110."""

    def __init__(self, lines: list[str]):
        self.tokens: set[str] = set()
        longest, shortest = 0, 1 << 31
        for line in lines:
            if not line or line.startswith("#"):
                continue
            conv = _convert(line)
            longest = max(longest, len(conv))
            shortest = min(shortest, len(conv))
            self.tokens.add(conv)
        if not self.tokens:
            shortest = 0
        self.longest = longest
        self.shortest = shortest

    def find_next_token(self, buf: deque) -> bool:
        s = "".join(seg.text for seg in buf)
        first = buf.popleft()
        valid = {seg.end - first.begin for seg in buf}
        match = None
        for i in range(min(self.longest, len(s)), self.shortest - 1, -1):
            if i in valid and s[:i] in self.tokens:
                match = s[:i]
                break
        if match is not None:
            first.type = SegmentType.WORD_WITH_NUMBER
            limit = first.begin + len(match)
            while buf and buf[0].end <= limit:
                first.end = buf.popleft().end
            first.text = s[: first.end - first.begin]
        buf.appendleft(first)
        return match is not None


class LookaheadRules:
    """LookaheadRules.java:36-170 (ordered +/- rules, global rejects)."""

    def __init__(self, lines: list[str]):
        pats: list[tuple[re.Pattern, bool]] = []
        for line in lines:
            if not line.strip() or line.startswith("#"):
                continue
            decision = line[:2]
            if decision not in ("+ ", "- "):
                continue
            try:
                pats.append(
                    (re.compile(java_regex_to_python(line[2:])),
                     decision == "+ ")
                )
            except (re.error, ValueError):
                # Java prints a stacktrace and skips the rule
                continue
        # leading negatives before any positive -> global reject list
        self.global_rejects: list[re.Pattern] = []
        k = 0
        while k < len(pats) and not pats[k][1]:
            self.global_rejects.append(pats[k][0])
            k += 1
        self.patterns = pats[k:]

    def find_next_token(self, buf: deque) -> bool:
        s = "".join(seg.text for seg in buf)
        first = buf.popleft()
        match = None
        pats = self.patterns
        n = len(pats)
        i = 0
        while i < n:
            pat, pos = pats[i]
            i += 1
            if not pos:
                continue
            m = pat.match(s)
            if not m:
                continue
            cand = m.group(0)
            # match must end on a segment boundary
            e = len(cand) + first.begin
            ends_ok = first.end == e
            for seg in buf:
                if ends_ok:
                    break
                if seg.end > e:
                    break
                ends_ok = seg.end == e
            if not ends_ok:
                continue
            if any(g.fullmatch(cand) for g in self.global_rejects):
                continue
            # negative rules directly following this positive rule
            rejected = False
            while i < n:
                pat2, pos2 = pats[i]
                if pos2:
                    break  # next positive -> match stands
                i += 1
                if pat2.fullmatch(cand):
                    rejected = True
                    break
            if rejected:
                continue
            match = cand
            break
        if match is not None:
            first.type = SegmentType.WORD_WITH_NUMBER
            limit = first.begin + len(match)
            while buf and buf[0].end <= limit:
                first.end = buf.popleft().end
            first.text = s[: first.end - first.begin]
        buf.appendleft(first)
        return match is not None


class TokenRuleSet:
    """RuleSet.java: base tokenizer + lookahead list + lookahead rules.
    The default set's base tokenizer is EmptySpaceTokenizerConservative
    (``rulesets/token/default/tokenizer.txt``)."""

    def __init__(self, lookahead_list: LookaheadList,
                 lookahead_rules: LookaheadRules):
        self.lookahead_list = lookahead_list
        self.lookahead_rules = lookahead_rules


def _read_resource(path: Path) -> list[str]:
    with gzip.open(path, "rb") as f:
        return f.read().decode("utf-8").splitlines()


@lru_cache(maxsize=1)
def default_token_ruleset() -> TokenRuleSet:
    return TokenRuleSet(
        LookaheadList(_read_resource(_LIST_RESOURCE)),
        LookaheadRules(_read_resource(_RULES_RESOURCE)),
    )


def rule_tokenize(text: str,
                  ruleset: TokenRuleSet | None = None
                  ) -> list[tuple[str, SegmentType]]:
    """RuleTokenizer.java:40-71: 100-segment lookahead buffer over the
    conservative base tokenizer; per step the list rule AND the regex
    rules both run (non-short-circuit ``&`` in the Java), then the
    front segment is emitted."""
    rs = ruleset or default_token_ruleset()
    it = iter(es_conservative_segments(text))
    buf: deque = deque()
    out: list[tuple[str, SegmentType]] = []
    exhausted = False
    while True:
        while not exhausted and len(buf) < _BUFFER_SIZE:
            nxt = next(it, None)
            if nxt is None:
                exhausted = True
                break
            buf.append(nxt)
        if not buf:
            break
        rs.lookahead_list.find_next_token(buf)
        rs.lookahead_rules.find_next_token(buf)
        seg = buf.popleft()
        out.append((_units_back(seg.text), seg.type))
    return out


def rule_filtered_and_normalized_tokens(
    sentence: str,
    level_filter: int = 2,
    level_normalize: int = 0,
    merge_types: bool = False,
    merge_tokens: bool = False,
) -> list[str]:
    """Segmenter-app token pipeline over the rule tokenizer.  Defaults
    are the lt.seg CLI's (``app/Segmenter.java:87-118``: filter=2,
    normalize=0, merge=0) - NOT the LtSegProvider 5/2/1 defaults,
    because the rule stage re-types every rule-matched token as
    WORD_WITH_NUMBER (catch-all rule) and filter level 5 drops WWN."""
    segs = filtered_segments(rule_tokenize(sentence), level_filter, merge_types)
    tokens = [normalize_segment(text, t, level_normalize) for text, t in segs]
    if merge_tokens:
        tokens = merge_consecutive_tokens(tokens)
    return tokens


def es_filtered_and_normalized_tokens(
    sentence: str,
    level_filter: int = 2,
    level_normalize: int = 0,
    merge_types: bool = False,
    merge_tokens: bool = False,
) -> list[str]:
    segs = filtered_segments(es_tokenize(sentence), level_filter, merge_types)
    tokens = [normalize_segment(text, t, level_normalize) for text, t in segs]
    if merge_tokens:
        tokens = merge_consecutive_tokens(tokens)
    return tokens


def es_conservative_filtered_and_normalized_tokens(
    sentence: str,
    level_filter: int = 2,
    level_normalize: int = 0,
    merge_types: bool = False,
    merge_tokens: bool = False,
) -> list[str]:
    segs = filtered_segments(
        es_conservative_tokenize(sentence), level_filter, merge_types
    )
    tokens = [normalize_segment(text, t, level_normalize) for text, t in segs]
    if merge_tokens:
        tokens = merge_consecutive_tokens(tokens)
    return tokens


def null_filtered_and_normalized_tokens(
    sentence: str,
    level_filter: int = 2,
    level_normalize: int = 0,
    merge_types: bool = False,
    merge_tokens: bool = False,
) -> list[str]:
    segs = filtered_segments(null_tokenize(sentence), level_filter, merge_types)
    tokens = [normalize_segment(text, t, level_normalize) for text, t in segs]
    if merge_tokens:
        tokens = merge_consecutive_tokens(tokens)
    return tokens
