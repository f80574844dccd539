"""User-extension registries (SURVEY.md par.2.10).

Mirrors the reference's pluggable surfaces as named registries:

* ``HtmlTextExtractor`` (JSoup vs Boilerpipe,
  ``lt.ltbot/.../text/HtmlTextExtractor.java:23-27``),
* ``UTF8Cleaner`` (Min/Ext, ``UTF8Cleaner.java:22-28``),
* ``LanguageModel`` scorer variants (``LanguageModel.java:25-68``),
* sentence splitter / tokenizer strategies
  (``lt.seg/.../app/Segmenter.java:341-366`` reflective instantiation).

Entries are callables / factories; ``register`` lets user code plug new
implementations that the pipeline stages then resolve by name (the Ray
equivalent of the reference's Spring-XML bean wiring).
"""

from __future__ import annotations

from typing import Any

_REGISTRIES: dict[str, dict[str, Any]] = {
    "html_text_extractor": {},
    "utf8_cleaner": {},
    "scorer_lm": {},
    "sentence_splitter": {},
    "tokenizer": {},
}


def register(kind: str, name: str, impl: Any) -> None:
    if kind not in _REGISTRIES:
        raise KeyError("unknown registry %r (have %s)" % (kind, sorted(_REGISTRIES)))
    _REGISTRIES[kind][name] = impl


def resolve(kind: str, name: str) -> Any:
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        raise KeyError(
            "no %r registered as %r (have %s)" % (kind, name, sorted(_REGISTRIES.get(kind, {})))
        ) from None


def available(kind: str) -> list[str]:
    return sorted(_REGISTRIES[kind])


def _boilerpipe_like_text(html: str) -> str:
    """Simplified density-based article extractor - the registry slot the
    reference fills with Boilerpipe's ArticleExtractor
    (``BoilerpipeTextExtractor.java:34-45``, commented out in the default
    profile cxml:220).  Heuristic: keep only block-level text runs whose
    word count exceeds a small threshold (nav/footer boilerplate is
    short)."""
    import re

    from .functions.htmltext import jsoup_text

    # crude block segmentation on block-level tags, then density filter
    blocks = re.split(r"(?i)</?(?:p|div|h[1-6]|li|section|article|td)[^>]*>", html)
    kept: list[str] = []
    for b in blocks:
        text = jsoup_text(b)
        if len(text.split()) >= 6:
            kept.append(text)
    return "\n".join(kept)


def _register_defaults() -> None:
    from .functions.cleaners import clean_ext, clean_min
    from .functions.htmltext import get_plaintext
    from .functions.sentences import split_sentences
    from .functions.sentencemaker import get_sentences
    from .functions.tokenizer import filtered_and_normalized_tokens

    from .functions.boilerpipe import article_text

    register("html_text_extractor", "jsoup", get_plaintext)
    register("html_text_extractor", "boilerpipe", article_text)
    register("html_text_extractor", "boilerpipe_like", _boilerpipe_like_text)
    register("utf8_cleaner", "min", clean_min)
    register("utf8_cleaner", "ext", clean_ext)
    register("sentence_splitter", "rule", split_sentences)
    register("sentence_splitter", "sentence_maker", get_sentences)
    register("tokenizer", "diff", filtered_and_normalized_tokens)

    from .functions.breakiter import provider_split_sentences, provider_tokenize

    register("sentence_splitter", "breakiterator", provider_split_sentences)
    register("tokenizer", "breakiterator", provider_tokenize)

    # the full lt.seg strategy matrix (SURVEY §2.10): RuleTokenizer +
    # lookahead rules, the EmptySpace(Conservative) base tokenizers,
    # NullTokenizer, and the Line/Null splitters
    from .functions.ruletokenizer import (
        es_conservative_filtered_and_normalized_tokens,
        es_filtered_and_normalized_tokens,
        line_split_sentences,
        null_filtered_and_normalized_tokens,
        null_split,
        rule_filtered_and_normalized_tokens,
    )

    register("tokenizer", "rule", rule_filtered_and_normalized_tokens)
    register("tokenizer", "empty_space", es_filtered_and_normalized_tokens)
    register(
        "tokenizer",
        "empty_space_conservative",
        es_conservative_filtered_and_normalized_tokens,
    )
    register("tokenizer", "null", null_filtered_and_normalized_tokens)
    register("sentence_splitter", "line", line_split_sentences)
    register("sentence_splitter", "null", null_split)

    from .lm.backoff import StupidBackoffLM
    from .lm.kneserney import build_kneser_ney

    register("scorer_lm", "stupid_backoff", StupidBackoffLM)
    register("scorer_lm", "kneser_ney", build_kneser_ney)

    from .lm.knrecursive import (
        build_kn_recursive,
        build_modified_kn,
        build_one_backoff_kn,
        build_popt_kn,
    )

    register("scorer_lm", "kneser_ney_recursive", build_kn_recursive)
    register("scorer_lm", "modified_kneser_ney", build_modified_kn)
    register("scorer_lm", "popt_kneser_ney", build_popt_kn)
    register("scorer_lm", "one_backoff_kneser_ney", build_one_backoff_kn)


_register_defaults()
