"""SentenceMaker - the writer/scorer sentence pipeline.

Port of ``lt.ltbot/.../writer/SentenceMakerJava8.java:40-76`` (wired into
both ``SentenceWriter`` and ``DecesiveValueProducerPerplexity`` with
``minLength=2``, cxml:205-211):

1. ``LineSplitter`` (``lt.seg/.../sentence/LineSplitter.java``): maximal
   runs without line separators are SENTENCE segments;
2. each line runs through ``RuleSplitter``;
3. each rule sentence is re-rendered through ``DiffTokenizer``:
   EMPTY_SPACE segments -> one space, readable segments -> their text,
   everything else -> dropped; then ``String.trim()``;
4. sentences with fewer than ``min_length`` word tokens (isWord ==
   WORD / WORD_UPPERCASE / WORD_LOWERCASE) are dropped, as are empties.
"""

from __future__ import annotations

from . import jchar
from .sentences import split_segments
from .strings import java_trim
from .tokenizer import SegmentType, tokenize

_LINE_SEP = frozenset((10, 13, 12))


def _is_line_sep(cp: int) -> bool:
    return cp in _LINE_SEP or jchar.java_char_type(cp) == jchar.LINE_SEPARATOR


import re as _re

# charIsLineSeparator: \n \r \f or Unicode Zl (U+2028 is the only Zl char)
_NON_LINESEP_RUN = _re.compile(r"[^\n\r\x0c\u2028]+")


def split_lines(text: str) -> list[str]:
    """LineSplitter SENTENCE segments (maximal non-line-separator runs)."""
    return _NON_LINESEP_RUN.findall(text)


_WORD_TYPES = (SegmentType.WORD, SegmentType.WORD_UPPERCASE, SegmentType.WORD_LOWERCASE)
_READABLE = (
    SegmentType.WORD,
    SegmentType.NUMBER,
    SegmentType.WORD_WITH_NUMBER,
    SegmentType.WORD_UPPERCASE,
    SegmentType.WORD_LOWERCASE,
    SegmentType.PUNCTUATION,
)


def get_sentences(text: str, min_length: int = 2) -> list[str]:
    """``SentenceMaker.getSentences``."""
    sentences: list[str] = []
    for line in split_lines(text):
        for seg, is_sentence in split_segments(line):
            if not is_sentence:
                continue
            word_count = 0
            parts: list[str] = []
            for tok, ttype in tokenize(seg):
                if ttype in _WORD_TYPES:
                    word_count += 1
                if ttype == SegmentType.EMPTY_SPACE:
                    parts.append(" ")
                elif ttype in _READABLE:
                    parts.append(tok)
                # else dropped
            rendered = java_trim("".join(parts))
            if word_count < min_length or not rendered:
                continue
            sentences.append(rendered)
    return sentences
