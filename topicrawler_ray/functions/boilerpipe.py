"""Boilerpipe ``ArticleExtractor`` port (densitometric block classification).

The reference plugs boilerpipe's ArticleExtractor into the
``HtmlTextExtractor`` registry slot
(``lt.ltbot/src/main/java/de/tudarmstadt/lt/ltbot/text/BoilerpipeTextExtractor.java:34-45``,
profile slot cxml:220).  This module re-derives the PUBLIC algorithm -
Kohlschütter, Fankhauser, Nejdl: "Boilerplate Detection using Shallow
Text Features" (WSDM 2010) and the boilerpipe 1.2 pipeline structure -
from scratch in Python over the fixture HTML subset:

1. **Block segmentation**: the document is cut into text blocks at
   block-level tag boundaries; inline tags (``a b i u em strong span
   font``) do not cut.  ``script/style/option/object/embed/applet/link``
   subtrees are ignorable; ``<title>`` text is captured as the document
   title, not as a block.  Per block: ``num_words``,
   ``num_anchor_words`` (words inside ``<a>``), link density, text
   density (words per 80-column wrapped line), tag level (DOM depth at
   flush) and offset.

2. **NumWordsRulesClassifier** - the published decision tree on
   (prev, curr, next) features::

       curr.link_density > 1/3                      -> boilerplate
       else if prev.link_density <= 0.555556:
           curr.num_words <= 16 and next.num_words <= 15
               and prev.num_words <= 4              -> boilerplate
           else                                     -> content
       else:
           curr.num_words <= 40 and next.num_words <= 17
                                                    -> boilerplate
           else                                     -> content

3. **ArticleExtractor filter chain** (ported subset, in order):
   TerminatingBlocksFinder, DocumentTitleMatchClassifier,
   NumWordsRulesClassifier, IgnoreBlocksAfterContentFilter(60),
   BlockProximityFusion(1), BoilerplateBlockFilter(keep title),
   BlockProximityFusion(1, content-only, same tag level),
   KeepLargestBlockFilter(expand to same tag level, min 150 words),
   ExpandTitleToContentFilter.  (TrailingHeadlineToBoilerplate,
   LargeBlockSameTagLevelToContent and ListAtEnd are omitted - they
   need heading/list labels the fixture grammar never produces.)

``article_text(html)`` returns content blocks joined by ``"\\n"`` (the
boilerpipe ``getText`` output shape).
"""

from __future__ import annotations

import html as _htmlmod
import re
from dataclasses import dataclass, field

from .htmltext import _BLOCK_TAGS, _scan_tag

_INLINE_TAGS = frozenset(
    "a b i u em strong span font abbr code sub sup small big tt".split()
)
_IGNORABLE_TAGS = frozenset(
    "script style option object embed applet link noscript".split()
)

_WORD_RE = re.compile(r"[^\W_]", re.UNICODE)  # token contains letter/digit
_WS_SPLIT = re.compile(r"\s+")

MAX_LINE_LENGTH = 80  # boilerpipe wrap width for text density


@dataclass
class TextBlock:
    text: str
    num_words: int
    num_anchor_words: int
    num_words_in_wrapped_lines: int
    num_wrapped_lines: int
    offset_start: int
    offset_end: int
    tag_level: int
    is_content: bool = False
    labels: set[str] = field(default_factory=set)

    @property
    def link_density(self) -> float:
        return self.num_anchor_words / self.num_words if self.num_words else 0.0

    @property
    def text_density(self) -> float:
        return self.num_words_in_wrapped_lines / self.num_wrapped_lines

    def merge(self, other: "TextBlock") -> None:
        self.text = self.text + "\n" + other.text
        self.num_words += other.num_words
        self.num_anchor_words += other.num_anchor_words
        self.num_words_in_wrapped_lines += other.num_words_in_wrapped_lines
        self.num_wrapped_lines += other.num_wrapped_lines
        self.offset_end = other.offset_end
        self.is_content = self.is_content or other.is_content
        self.labels |= other.labels
        self.tag_level = min(self.tag_level, other.tag_level)


_EMPTY = TextBlock("", 0, 0, 0, 1, -1, -1, 0)

LABEL_TITLE = "de.l3s.boilerpipe/TITLE"
LABEL_END = "de.l3s.boilerpipe/INDICATES_END_OF_TEXT"


def _flush_block(
    tokens: list[tuple[str, bool]], offset: int, tag_level: int
) -> TextBlock | None:
    """boilerpipe ``BoilerpipeHTMLContentHandler.flushBlock``: token
    stream -> TextBlock with wrapped-line text density accounting."""
    if not tokens:
        return None
    num_words = num_anchor = 0
    num_words_wrapped = num_words_current_line = 0
    num_wrapped_lines = 0
    current_line_length = -1  # don't count the first space
    for tok, in_anchor in tokens:
        if _WORD_RE.search(tok):
            num_words += 1
            num_words_current_line += 1
            if in_anchor:
                num_anchor += 1
            current_line_length += len(tok) + 1
            if current_line_length > MAX_LINE_LENGTH:
                num_wrapped_lines += 1
                current_line_length = len(tok)
                num_words_wrapped += num_words_current_line - 1
                num_words_current_line = 1
    if num_wrapped_lines == 0:
        num_words_wrapped = num_words
        num_wrapped_lines = 1
    text = " ".join(t for t, _ in tokens)
    if not text.strip():
        return None
    return TextBlock(
        text.strip(),
        num_words,
        num_anchor,
        num_words_wrapped,
        num_wrapped_lines,
        offset,
        offset,
        tag_level,
    )


def parse_blocks(html: str) -> tuple[list[TextBlock], str]:
    """Segment HTML into text blocks; returns (blocks, doc_title)."""
    blocks: list[TextBlock] = []
    tokens: list[tuple[str, bool]] = []
    title_parts: list[str] = []
    i, n = 0, len(html)
    text_start = 0
    depth = 0
    anchor_depth = 0
    ignore_depth = 0
    in_title = False
    offset = 0
    flush_level = 0  # tag level at which the current block's text started

    def emit_text(seg: str) -> None:
        if not seg:
            return
        decoded = _htmlmod.unescape(seg)
        if in_title:
            title_parts.append(decoded)
            return
        if ignore_depth:
            return
        for tok in _WS_SPLIT.split(decoded):
            if tok:
                tokens.append((tok, anchor_depth > 0))

    def flush() -> None:
        nonlocal tokens, offset
        b = _flush_block(tokens, offset, flush_level)
        tokens = []
        if b is not None:
            blocks.append(b)
            offset += 1

    while i < n:
        c = html[i]
        if c == "<":
            emit_text(html[text_start:i])
            j, name, is_end = _scan_tag(html, i)
            if name == "<":  # bare '<' is text
                if not in_title and not ignore_depth:
                    tokens.append(("<", anchor_depth > 0))
                i = j
                text_start = j
                continue
            i = j
            text_start = j
            if name is None:  # comment / doctype
                continue
            if name in _IGNORABLE_TAGS:
                ignore_depth += (1 if not is_end else -1)
                ignore_depth = max(0, ignore_depth)
                continue
            if name == "title":
                in_title = not is_end
                continue
            if name in _INLINE_TAGS:
                if name == "a":
                    anchor_depth += (1 if not is_end else -1)
                    anchor_depth = max(0, anchor_depth)
                continue
            if name in _BLOCK_TAGS:
                flush()
                if is_end:
                    depth = max(0, depth - 1)
                else:
                    depth += 1
                flush_level = depth
                continue
            # unknown tag: treat as inline, no flush
            continue
        i += 1
    emit_text(html[text_start:i])
    flush()
    return blocks, " ".join(" ".join(title_parts).split())


# ---------------------------------------------------------------------------
# filters (ArticleExtractor chain)


def classify_num_words_rules(blocks: list[TextBlock]) -> None:
    """NumWordsRulesClassifier.classify - the published decision tree."""
    for k, curr in enumerate(blocks):
        prev = blocks[k - 1] if k > 0 else _EMPTY
        nxt = blocks[k + 1] if k + 1 < len(blocks) else _EMPTY
        if curr.link_density > 0.333333:
            content = False
        elif prev.link_density <= 0.555556:
            if curr.num_words <= 16 and nxt.num_words <= 15 and prev.num_words <= 4:
                content = False
            else:
                content = True
        else:
            if curr.num_words <= 40 and nxt.num_words <= 17:
                content = False
            else:
                content = True
        curr.is_content = content


_TERMINATING_PREFIXES = (
    "comments",
    "© reuters",
    "please rate this",
    "post a comment",
    "what you think...",
    "add your comment",
    "add comment",
    "reader views",
    "have your say",
    "reader comments",
    "rätta artikeln",
)
_N_COMMENTS_RE = re.compile(r"^\d+\s+(comments|users responded in)")


def find_terminating_blocks(blocks: list[TextBlock]) -> None:
    """TerminatingBlocksFinder: label short "comments"-style blocks."""
    for b in blocks:
        if b.num_words >= 15:
            continue
        t = b.text.strip().lower()
        if len(t) >= 8 or t == "comments":
            if t.startswith(_TERMINATING_PREFIXES) or _N_COMMENTS_RE.match(t) or t == (
                "thanks for your comments - this feedback is now closed"
            ):
                b.labels.add(LABEL_END)


def classify_title_match(blocks: list[TextBlock], title: str) -> None:
    """DocumentTitleMatchClassifier (simplified variations): label the
    block whose text equals the doc title or a delimiter-split part."""
    if not title:
        return
    variations = {title.strip().lower()}
    for sep in (" | ", " - ", " :: ", ": "):
        for part in title.split(sep):
            p = part.strip().lower()
            if p:
                variations.add(p)
    for b in blocks:
        if b.text.strip().lower() in variations:
            b.labels.add(LABEL_TITLE)


def ignore_blocks_after_content(blocks: list[TextBlock], min_words: int = 60) -> list[TextBlock]:
    """IgnoreBlocksAfterContentFilter(60): once enough content words
    accumulated, an INDICATES_END_OF_TEXT block ends the document."""
    words = 0
    out = []
    ended = False
    for b in blocks:
        if ended:
            continue
        if b.is_content:
            words += b.num_words
        if LABEL_END in b.labels and words >= min_words:
            ended = True
            continue
        out.append(b)
    return out


def block_proximity_fusion(
    blocks: list[TextBlock], max_distance: int = 1,
    content_only: bool = False, same_tag_level: bool = False,
) -> list[TextBlock]:
    """BlockProximityFusion: merge blocks whose offsets are close."""
    out: list[TextBlock] = []
    for b in blocks:
        if out:
            prev = out[-1]
            ok = (b.offset_start - prev.offset_end) <= max_distance
            if content_only and not (prev.is_content and b.is_content):
                ok = False
            if same_tag_level and prev.tag_level != b.tag_level:
                ok = False
            if ok and not content_only:
                # the non-content-only pass never fuses across a content
                # boundary either (boilerpipe fuses similar classes)
                ok = prev.is_content == b.is_content
            if ok:
                prev.merge(b)
                continue
        out.append(b)
    return out


def boilerplate_block_filter(blocks: list[TextBlock], keep_title: bool = True) -> list[TextBlock]:
    return [
        b
        for b in blocks
        if b.is_content or (keep_title and LABEL_TITLE in b.labels)
    ]


def keep_largest_block(
    blocks: list[TextBlock], expand_same_level: bool = True, min_words: int = 150
) -> None:
    """KeepLargestBlockFilter: only the largest content block survives;
    with expansion, same-tag-level content blocks of >= min_words too."""
    content = [b for b in blocks if b.is_content]
    if not content:
        return
    largest = max(content, key=lambda b: (b.num_words, -b.offset_start))
    for b in blocks:
        if b is largest:
            continue
        if (
            expand_same_level
            and b.is_content
            and b.tag_level == largest.tag_level
            and b.num_words >= min_words
        ):
            continue
        b.is_content = False


def expand_title_to_content(blocks: list[TextBlock]) -> None:
    """ExpandTitleToContentFilter: content-mark blocks between the TITLE
    block and the first content block."""
    title_idx = content_idx = None
    for k, b in enumerate(blocks):
        if title_idx is None and LABEL_TITLE in b.labels:
            title_idx = k
        if content_idx is None and b.is_content:
            content_idx = k
    if title_idx is None or content_idx is None or content_idx <= title_idx:
        return
    for b in blocks[title_idx:content_idx]:
        b.is_content = True


def article_blocks(html: str) -> list[TextBlock]:
    """Run the ported ArticleExtractor chain; returns surviving blocks."""
    blocks, title = parse_blocks(html)
    find_terminating_blocks(blocks)
    classify_title_match(blocks, title)
    classify_num_words_rules(blocks)
    blocks = ignore_blocks_after_content(blocks, 60)
    blocks = block_proximity_fusion(blocks, 1)
    blocks = boilerplate_block_filter(blocks, keep_title=True)
    blocks = block_proximity_fusion(blocks, 1, content_only=True, same_tag_level=True)
    keep_largest_block(blocks, expand_same_level=True, min_words=150)
    expand_title_to_content(blocks)
    return [b for b in blocks if b.is_content]


def article_text(html: str) -> str:
    """``ArticleExtractor.getInstance().getText(html)`` equivalent.

    Error parity with ``BoilerpipeTextExtractor.getPlaintext``
    (:36-44): on failure return ``"Failed to get plaintext content \\n"
    + html``."""
    try:
        return "\n".join(b.text for b in article_blocks(html))
    except Exception:
        return "Failed to get plaintext content \n" + html
