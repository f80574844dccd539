"""UAX #29 BreakIterator analog - hand-derived goldens for the sentence
(SB1-SB11) and word (WB1-WB13b) rules, plus the provider composition of
``BreakIteratorStringProvider.java:41-103`` and the distributed explode.

The expectations below are derived BY HAND from the published UAX #29
rule tables (not from the implementation), so they independently certify
the kernel semantics the ``sentences_breakiter`` oracle fixture shares.
"""

from __future__ import annotations

import pytest

from topicrawler_ray.functions.breakiter import (
    provider_split_sentences,
    provider_text_ngrams,
    provider_tokenize,
    split_sentences_uax29,
    split_words_uax29,
)


class TestSentenceRules:
    def test_basic_terminators(self):
        assert provider_split_sentences("Hello world. How are you? Fine!") == [
            "Hello world.",
            "How are you?",
            "Fine!",
        ]

    def test_sb8_lowercase_lookahead_joins(self):
        # ATerm Close* Sp* x ...Lower  (SB8): "p.m. sharp" must not split
        assert provider_split_sentences("He arrived at 3 p.m. sharp! Then left.") == [
            "He arrived at 3 p.m. sharp!",
            "Then left.",
        ]

    def test_sb7_internal_acronym_joined_but_space_upper_breaks(self):
        # inside "U.S.A." SB7 joins (Upper ATerm x Upper); after the final
        # period followed by space+lowercase SB8 joins as well
        assert provider_split_sentences("The U.S.A. is big. Indeed.") == [
            "The U.S.A. is big.",
            "Indeed.",
        ]
        # plain UAX #29 (no ICU suppression list): "Mr. Smith" breaks
        assert provider_split_sentences("Mr. Smith went home.") == [
            "Mr.",
            "Smith went home.",
        ]

    def test_sb6_numeric_joins(self):
        # ATerm x Numeric (SB6): "3.14" never splits
        assert provider_split_sentences("Pi is 3.14 roughly. Yes.") == [
            "Pi is 3.14 roughly.",
            "Yes.",
        ]

    def test_sb9_close_quote_attaches(self):
        # SATerm Close* x Close (SB9): the closing quote stays attached
        assert provider_split_sentences('She said "Stop." Then ran.') == [
            'She said "Stop."',
            "Then ran.",
        ]

    def test_sb8a_terminator_runs(self):
        # SATerm Close* Sp* x SATerm (SB8a): "?!" and "..." stay together
        assert provider_split_sentences("Wait... what? Really?! Ok.") == [
            "Wait... what?",
            "Really?!",
            "Ok.",
        ]

    def test_no_terminator_single_sentence(self):
        assert provider_split_sentences("no terminator here") == [
            "no terminator here"
        ]

    def test_raw_spans_cover_text(self):
        text = "One. Two! Three?"
        spans = split_sentences_uax29(text)
        assert "".join(spans) == text

    def test_fullwidth_and_ideographic_stops(self):
        # U+3002 ideographic full stop and U+FF01 fullwidth ! are STerm
        assert provider_split_sentences("こんにちは。すごい！") == [
            "こんにちは。",
            "すごい！",
        ]

    def test_empty_and_whitespace(self):
        assert provider_split_sentences("") == []
        assert provider_split_sentences("   \n\t ") == []


class TestWordRules:
    def test_java_test_fixture_tokens(self):
        # BreakIteratorStringProviderTest.test(): "Schöne neue Wörld."
        assert provider_tokenize("Schöne neue Wörld.") == [
            "Schöne",
            "neue",
            "Wörld",
            ".",
        ]

    def test_wb6_wb7_apostrophe_joins(self):
        # AL (MidNumLet) x AL: "isn't" is one token
        assert provider_tokenize("fox, isn't it?") == [
            "fox",
            ",",
            "isn't",
            "it",
            "?",
        ]

    def test_wb11_wb12_numeric_separators(self):
        # NU (MidNum|MidNumLet) NU joins: 3.14 and 1,000 single tokens
        assert provider_tokenize("3.14 and 1,000") == ["3.14", "and", "1,000"]

    def test_colon_is_midletter_not_midnum(self):
        # 12:30 splits (colon joins letters, not digits) - ICU default
        assert provider_tokenize("12:30") == ["12", ":", "30"]

    def test_wb13a_wb13b_underscore(self):
        assert provider_tokenize("snake_case x_1") == ["snake_case", "x_1"]

    def test_wb9_wb10_alphanumeric(self):
        # AL x NU and NU x AL join: qu1ck is one token
        assert provider_tokenize("The qu1ck br0wn fox") == [
            "The",
            "qu1ck",
            "br0wn",
            "fox",
        ]

    def test_wb13_katakana_run_vs_han_singles(self):
        # Katakana runs join (WB13); Han has no dictionary -> per-char
        toks = split_words_uax29("カタカナ")
        assert toks == ["カタカナ"]
        han = split_words_uax29("漢字")
        assert han == ["漢", "字"]

    def test_raw_word_spans_cover(self):
        text = "a b,c 1.5"
        assert "".join(split_words_uax29(text)) == text


class TestProviderComposition:
    def test_ngrams_sentence_tags(self):
        # getNgrams: per sentence <s>-tagged windows, concatenated
        ngrams = provider_text_ngrams("Hi there. Bye now.", 2)
        assert ngrams[0] == ["<s>", "Hi"]
        assert ["</s>"] not in ngrams  # windows, not bare tags
        flat = [" ".join(g) for g in ngrams]
        assert "Hi there" in flat and "Bye now" in flat
        # both sentences contribute; second starts fresh with <s>
        assert flat.count("<s> Hi") == 1 and flat.count("<s> Bye") == 1

    def test_collapse_before_split(self):
        # splitSentences collapses all whitespace first (java:71)
        assert provider_split_sentences("A one.\n\nB two.") == [
            "A one.",
            "B two.",
        ]

    def test_token_emptyspace_replacement(self):
        # tokens carry "_" for inner empty space (java:98); plain words
        # never contain spaces post-segmentation, NBSP exercises it
        toks = provider_tokenize("a b c")
        assert "_" not in "".join(t for t in toks if len(t) == 1)
        assert toks[-1] == "c"


@pytest.mark.usefixtures("ray_session")
def test_distributed_explode_matches_sequential(sf_dir):
    """The Dataset explode returns exactly the sequential derivation."""
    import pandas as pd

    from topicrawler_ray.oracles import _b_sentences_breakiter
    from topicrawler_ray.sources.pages import read_pages
    from topicrawler_ray.stages.extract import extract_batch
    from topicrawler_ray.stages.sinks import breakiter_sentences_batch

    ds = read_pages(sf_dir, num_blocks=4)
    ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(breakiter_sentences_batch, batch_format="pyarrow")
    got = (
        ds.to_pandas()
        .sort_values(["url", "sent_idx"])
        .reset_index(drop=True)
    )
    exp = (
        _b_sentences_breakiter(sf_dir)
        .to_pandas()
        .sort_values(["url", "sent_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_tokens"] > 0).all()
