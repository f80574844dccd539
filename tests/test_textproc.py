"""Golden tests for the pure text-processing ports (no Ray).

Golden cases mirror the reference test suites:
* ``lt.seg/src/test/java/.../token/TokenizerTest.java:32-41,128-135``
* ``lt.seg/src/test/java/.../sentence/SentenceSplitterTest.java:43-52``
* ``lt.ltbot/src/test/java/.../text/UTF8CleanerTest``
* ``DecesiveValueProducerPerplexity.java:263`` (%012g)
"""

from topicrawler_ray.functions.cleaners import clean_ext, clean_min
from topicrawler_ray.functions.htmltext import get_plaintext, jsoup_text
from topicrawler_ray.functions.ngrams import insert_sentence_tags, ngram_sequence
from topicrawler_ray.functions.sentences import split_sentences
from topicrawler_ray.functions.strings import (
    abbreviate,
    collapse_spaces_ascii,
    format_g12,
    java_trim,
    trim_and_replace_emptyspace,
)
from topicrawler_ray.functions.tokenizer import (
    SegmentType,
    filtered_and_normalized_tokens,
    merge_consecutive_tokens,
    tokenize,
)


class TestCleaners:
    def test_min_replaces_bom_and_fffd(self):
        assert clean_min("a﻿b�c") == "a¿b¿c"

    def test_min_leaves_other_chars(self):
        assert clean_min("ab₡") == "ab₡"

    def test_ext_replaces_controls_and_currency(self):
        assert clean_ext("ab₡cⅠd") == "a¿b¿c¿d"

    def test_ext_keeps_tab_newline(self):
        assert clean_ext("a\tb\nc\rd") == "a\tb\nc\rd"

    def test_ext_splits_surrogate_pair(self):
        # U+1F600 = D83D DE00; the high half is dirty -> lone low remains
        cleaned = clean_ext("x\U0001f600y")
        assert cleaned == "x¿\ude00y"


class TestStrings:
    def test_trim_includes_nbsp(self):
        assert trim_and_replace_emptyspace("  a  b  ", " ") == "a b"

    def test_java_trim(self):
        assert java_trim("\x00 \n abc \t\x1f") == "abc"
        assert java_trim(" abc") == " abc"  # NBSP > U+0020 kept

    def test_abbreviate(self):
        assert abbreviate("abcdefghij", 8) == "abcde..."
        assert abbreviate("abc", 8) == "abc"

    def test_collapse_ascii_spaces_keeps_nbsp(self):
        assert collapse_spaces_ascii("a  \t b c") == "a b c"

    def test_format_g12_java_semantics(self):
        # Java %g: 6 significant digits, never strips zeros, pads to 12
        assert format_g12(2.0) == "000002.00000"
        assert format_g12(49999.0) == "0000049999.0"
        assert format_g12(123456.0) == "000000123456"
        assert format_g12(0.5) == "00000.500000"
        assert format_g12(0.0001) == "00.000100000"
        assert format_g12(0.00005) == "05.00000e-05"
        assert format_g12(1234567.0) == "01.23457e+06"
        assert format_g12(-1.0) == "-00001.00000"
        assert format_g12(1.4142135623730951) == "000001.41421"

    def test_format_g12_half_up(self):
        # 0.0156255 binary-exact expansion decides; HALF_UP on exact value
        assert format_g12(2.5e-07) == "02.50000e-07"


class TestTokenizer:
    def test_simple_words(self):
        toks = [t for t, ty in tokenize("Hello world")]
        assert toks == ["Hello", " ", "world"]

    def test_types(self):
        res = dict(tokenize("The 42 h3ll0 LOUD low"))
        assert res["The"] == SegmentType.WORD
        assert res["42"] == SegmentType.NUMBER
        assert res["h3ll0"] == SegmentType.WORD_WITH_NUMBER
        assert res["LOUD"] == SegmentType.WORD_UPPERCASE
        assert res["low"] == SegmentType.WORD_LOWERCASE

    def test_punct_split(self):
        toks = [t for t, _ in tokenize("state-of-the-art")]
        assert toks == ["state", "-", "of", "-", "the", "-", "art"]

    def test_nul_stops_scan(self):
        assert [t for t, _ in tokenize("ab\x00cd")] == ["ab"]

    def test_filtered_level5_drops_numbers(self):
        toks = filtered_and_normalized_tokens("Hello, world! h3ll0 0815.")
        assert toks == ["Hello", "world"]

    def test_filter2_normalize2(self):
        toks = filtered_and_normalized_tokens(
            "a 0815 h3ll0 ...", level_filter=2, level_normalize=2
        )
        assert toks == ["a", "0", "h0ll0", "..."]

    def test_merge_tokens_golden(self):
        # TokenizerTest.mergeTest input "a a 0 0 0 b 0": type-merge keeps
        # words, drops repeated NUMBER segments; token-merge then drops the
        # equal consecutive "a" and "0" -> a 0 b 0
        toks = filtered_and_normalized_tokens(
            "a a 0 0 0 b 0", level_filter=3, level_normalize=3, merge_tokens=True
        )
        assert toks == ["a", "0", "b", "0"]

    def test_merge_consecutive_tokens(self):
        assert merge_consecutive_tokens(["a", "a", "0", "0", "0", "b", "0"]) == [
            "a",
            "0",
            "b",
            "0",
        ]

    def test_nbsp_is_empty_space_type(self):
        res = tokenize("a b")
        assert res[1] == (" ", SegmentType.EMPTY_SPACE)


class TestSentences:
    def test_basic_split(self):
        s = split_sentences("This is one. And this is two.")
        assert s == ["This is one.", "And this is two."]

    def test_abbreviation_no_split(self):
        s = split_sentences("Prof. Dr. Smith came. He left.")
        assert s == ["Prof. Dr. Smith came.", "He left."]

    def test_single_letter_initial_no_split(self):
        s = split_sentences("A. Miller was here. Yes.")
        assert s == ["A. Miller was here.", "Yes."]

    def test_multi_dot_abbrev_no_split(self):
        s = split_sentences("It is i.e. here. Done.")
        assert s == ["It is i.e. here.", "Done."]

    def test_lowercase_after_boundary_no_split(self):
        s = split_sentences("He said no. and left quickly. Then came back.")
        assert s == ["He said no. and left quickly.", "Then came back."]

    def test_ordinal_year_no_split(self):
        # "- [0-9\.-]+" beats "+ [1-2][0-9]{3}" (result &= each match)
        s = split_sentences("Es geschah 1999. Danach kam mehr.")
        assert s == ["Es geschah 1999. Danach kam mehr."]

    def test_question_exclamation(self):
        s = split_sentences("Really? Yes! Good.")
        assert s == ["Really?", "Yes!", "Good."]

    def test_quote_boundary(self):
        s = split_sentences('He said "stop." Then silence came.')
        assert s == ['He said "stop."', "Then silence came."]

    def test_empty(self):
        assert split_sentences("") == []
        assert split_sentences("   \n\n  ") == []


class TestNgrams:
    def test_tags_mode3(self):
        assert insert_sentence_tags(["a", "b"], 3) == ["<s>", "a", "b", "</s>"]
        assert insert_sentence_tags([], 3) == []

    def test_window_default_mode(self):
        assert ngram_sequence(["a", "b", "c", "d"], 3) == [
            ["a", "b", "c"],
            ["b", "c", "d"],
        ]

    def test_short_seq_kept_single(self):
        assert ngram_sequence(["a", "b"], 3) == [["a", "b"]]
        assert ngram_sequence(["a"], 3) == [["a"]]

    def test_mode_minus1_omits_short(self):
        assert ngram_sequence(["a", "b"], 3, boundary_mode=-1) == []

    def test_mode2_grows_front(self):
        assert ngram_sequence(["a", "b", "c", "d"], 3, boundary_mode=2) == [
            ["a", "b"],
            ["a", "b", "c"],
            ["b", "c", "d"],
        ]


class TestHtmlText:
    def test_jsoup_text_block_separator(self):
        assert jsoup_text("<div>a</div><div>b</div>") == "a b"

    def test_jsoup_text_inline_no_separator(self):
        assert jsoup_text("x<a href='/y'>y</a>z") == "xyz"

    def test_jsoup_whitespace_collapse(self):
        assert jsoup_text("<p>a   b\t\tc</p>") == "a b c"

    def test_entities(self):
        assert jsoup_text("<p>a &amp; b &uuml;</p>") == "a & b ü"

    def test_nbsp_survives(self):
        assert jsoup_text("<p>a&nbsp;b</p>") == "a b"

    def test_script_style_skipped(self):
        assert jsoup_text("<script>var x=1;</script><p>hi</p><style>a{}</style>") == "hi"

    def test_title_included(self):
        assert jsoup_text("<head><title>T &amp; t</title></head><body>x</body>") == "T & t x"

    def test_comment_skipped(self):
        assert jsoup_text("a<!-- hidden -->b") == "ab"

    def test_get_plaintext_paragraphs(self):
        html = "<html><body><p>one</p>\n<p>two</p></body></html>"
        assert get_plaintext(html) == "one\n two"

    def test_get_plaintext_br_is_space(self):
        assert get_plaintext("<p>a<br>b</p>") == "a b"

    def test_get_plaintext_trailing_ws_stripped(self):
        html = "<p>line one   </p>\n<p>line two</p>"
        assert get_plaintext(html) == "line one\n line two"

    def test_plaintext_crlf(self):
        assert get_plaintext("<p>a</p>\r\n<p>b</p>") == "a\n b"


class TestGopherRepetition:
    def test_counts(self):
        import pyarrow as pa

        from topicrawler_ray.stages.textstats import gopher_repetition_batch

        t = pa.table({"text": ["a b\na b\nc d", "x y x y x y", "", "### ...."]})
        out = gopher_repetition_batch(t)
        assert out.column("n_lines").to_pylist() == [3, 1, 1, 1]
        assert out.column("n_distinct_lines").to_pylist() == [2, 1, 1, 1]
        # words split on SPACE only (newline-joined tokens stay fused,
        # matching the SQL oracle): "a b\na b\nc d" has 3 distinct pairs
        # "x y x y x y": pairs (x,y)(y,x)(x,y)(y,x)(x,y) -> top (x,y)=3
        assert out.column("top_bigram_count").to_pylist() == [1, 3, 0, 1]
        assert out.column("n_word_pairs").to_pylist() == [3, 5, 0, 1]
        # '####' would be 4 symbols; '....' = one non-overlapping '...'
        assert out.column("n_symbols").to_pylist() == [0, 0, 0, 4]


class TestPiiRedact:
    def test_masks_and_counts(self):
        import pyarrow as pa

        from topicrawler_ray.stages.textstats import pii_redact_batch

        t = pa.table(
            {
                "text": [
                    "mail bob.smith+x@mail-host.org now",
                    "from 192.168.0.1 to 10.0.0.2",
                    "clean",
                ]
            }
        )
        out = pii_redact_batch(t)
        assert out.column("text_redacted").to_pylist() == [
            "mail <EMAIL> now",
            "from <IP> to <IP>",
            "clean",
        ]
        assert out.column("n_emails").to_pylist() == [1, 0, 0]
        assert out.column("n_ipv4").to_pylist() == [0, 2, 0]


class TestDecontamination:
    def test_word_ngrams_matches_sql_split(self):
        from topicrawler_ray.stages.decontam import word_ngrams

        assert word_ngrams("a b c d", 3) == ["a b c", "b c d"]
        assert word_ngrams("a b", 3) == []
        # double space yields an empty token, same as string_split(text,' ')
        assert word_ngrams("a  b c", 3) == ["a  b", " b c"]

    def test_flags_only_overlapping_docs(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.decontam import decontaminate

        bench = ray.data.from_items(
            [{"doc_id": 0, "text": "the quick brown fox jumps"}]
        )
        corpus = ray.data.from_items(
            [
                {"doc_id": 1, "text": "xx the quick brown fox yy"},  # 2 shared 3-grams
                {"doc_id": 2, "text": "totally different words here"},
                {"doc_id": 3, "text": "quick brown fox jumps again"},  # 2 shared
                {"doc_id": 4, "text": "quick brown"},  # too short for a 3-gram
            ]
        )
        out = (
            decontaminate(corpus, bench, n=3, concurrency=1)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[1, "n_contaminated"] == 2
        assert out.loc[2, "n_contaminated"] == 0
        assert out.loc[3, "n_contaminated"] == 2
        assert out.loc[4, "n_contaminated"] == 0
        assert list(out["contaminated"]) == [True, False, True, False]
