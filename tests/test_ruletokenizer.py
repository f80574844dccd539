"""RuleTokenizer + lookahead rules + the remaining strategy-matrix
tokenizers/splitters (``lt.seg/.../token/RuleTokenizer.java``,
``token/rules/Lookahead*.java``, ``EmptySpaceTokenizer*.java``,
``NullTokenizer.java``, ``sentence/{Line,Null}Splitter.java``).

The reference's TokenizerTest is a print-test; the assertions here
freeze hand-verified behaviour of the port on the reference's own
TEST_TEXT plus targeted cases exercising the documented rule intents
(URLs, emails, German decimals vs dates, abbreviations, emoticons,
empiriST z.B. splitting)."""

from topicrawler_ray.functions.ruletokenizer import (
    es_conservative_tokenize,
    es_tokenize,
    java_regex_to_python,
    line_split,
    line_split_sentences,
    null_split,
    null_tokenize,
    rule_filtered_and_normalized_tokens,
    rule_tokenize,
)
from topicrawler_ray.functions.tokenizer import SegmentType

TOK_TEXT = (
    "0815 4711, 007 done. "
    "﻿Hello World... The answer is 42, but what is the question? "
    "I told this joke 3times.h3ll0 w0rld!!! "
    "4711Today is the 1st of Dec. 2014. "
    "Today is the aniversary of Prof. Dr. Stephen W. Hawking. "
    "Is this state-of-the-art? Could this b\ne state-\nof-\r\nthe-art ? "
    "Today is 2014/01/12 or 1.12.14. "
    "\t\n\t\r\n\f\n\t :-) ^^ α α  "
)


class TestRuleTokenizer:
    def test_reference_test_text(self):
        toks = [t for t, _ in rule_tokenize(TOK_TEXT)]
        assert len(toks) == 143
        # abbreviation merges (lookahead list + single-letter-dot rule)
        for merged in ("Dec.", "Prof.", "Dr.", "W."):
            assert merged in toks
        # hyphen chains merge, ellipses and !!! merge, emoticon merges
        assert "state-of-the-art" in toks
        assert "..." in toks and "!!!" in toks and ":-)" in toks and "^^" in toks
        # date-like 1.12.14 is NOT one token (negative date rule) but
        # the /NN cleanup rule splits 2014/01/12 into 2014 /01 /12
        assert "1.12.14" not in toks
        assert "/01" in toks and "/12" in toks
        assert "1." in toks and "12.14" in toks

    def test_documented_rule_intents(self):
        cases = {
            "Visit https://example.org/page?x=1 now.": [
                "https://example.org/page?x=1"
            ],
            "mail foo.bar@example.co.uk or tagesschau.de": [
                "foo.bar@example.co.uk",
                "tagesschau.de",
            ],
            # german decimal merges; the same digits as a date do not
            "Das kostet 1.234,56 Euro am 12.10.1999": ["1.234,56", "12."],
            # empiriST: split z.B. into z. and B.; lookahead list keeps
            # B-Jugend together
            "z.B. die B-Jugend": ["z.", "B.", "B-Jugend"],
            "don’t stop... what?! 12:30 #tag @you": [
                "don’t", "...", "?!", "12:30", "#tag", "@you",
            ],
        }
        for text, expected in cases.items():
            toks = [t for t, _ in rule_tokenize(text)]
            for e in expected:
                assert e in toks, (text, e, toks)
        toks = [t for t, _ in rule_tokenize("Das kostet 1.234,56 Euro am 12.10.1999")]
        assert "12.10.1999" not in toks

    def test_merged_tokens_are_word_with_number(self):
        for text, t in rule_tokenize("see https://a.example/x and Abb. 4"):
            if text in ("https://a.example/x", "Abb."):
                assert t == SegmentType.WORD_WITH_NUMBER

    def test_filtered_and_normalized(self):
        # Segmenter CLI defaults (filter=2 normalize=0): drop spaces,
        # keep rule-merged tokens verbatim
        toks = rule_filtered_and_normalized_tokens(
            "Visit https://example.org/x?q=1 now, it costs 1.234,56 Euro!"
        )
        assert "https://example.org/x?q=1" in toks
        assert "1.234,56" in toks
        assert "now" in toks and "Euro" in toks and " " not in toks
        # level 2 normalization still collapses WWN digits when asked
        toks2 = rule_filtered_and_normalized_tokens(
            "Visit https://example.org/x?q=1 now", 3, 2
        )
        assert "https://example.org/x?q=0" in toks2


class TestBaseTokenizers:
    def test_empty_space_tokenizer(self):
        toks = [t for t, _ in es_tokenize(TOK_TEXT)]
        # only empty-space flips: punctuation sticks to words
        assert len(toks) == 116
        assert toks[:8] == ["0815", " ", "4711,", " ", "007", " ", "done.", " "]
        assert "﻿Hello" in toks

    def test_conservative_tokenizer(self):
        toks = [t for t, _ in es_conservative_tokenize(TOK_TEXT)]
        # word/number/other flips: every punctuation/space char separates
        assert len(toks) == 177
        assert toks[:9] == ["0815", " ", "4711", ",", " ", "007", " ", "done", "."]

    def test_null_tokenizer(self):
        segs = null_tokenize(TOK_TEXT)
        assert len(segs) == 1
        assert segs[0][0] == TOK_TEXT
        # Java buffer quirk: CONTROL joins the chartype set for any text
        # whose length is not a multiple of 8192 -> UNKNOWN here
        assert segs[0][1] == SegmentType.UNKNOWN

    def test_registry_matrix(self):
        from topicrawler_ray.registry import available, resolve

        for name in ("rule", "empty_space", "empty_space_conservative",
                      "null", "diff", "breakiterator"):
            assert name in available("tokenizer")
            fn = resolve("tokenizer", name)
            assert isinstance(fn("Hello 42 world."), list)
        for name in ("rule", "line", "null", "sentence_maker",
                      "breakiterator"):
            assert name in available("sentence_splitter")


class TestSplitters:
    def test_line_split(self):
        assert line_split("abc\ndef\n\nxyz") == [
            ("abc", True), ("\n", False), ("def", True),
            ("\n\n", False), ("xyz", True),
        ]

    def test_line_split_sentences(self):
        assert line_split_sentences("a  b\n\n  \n c\nd\n") == ["a b", "c", "d"]

    def test_null_split(self):
        assert null_split("a\nb") == ["a\nb"]


class TestRegexTranslation:
    def test_unicode_classes(self):
        import re

        p = re.compile(java_regex_to_python(r"(?>\p{L}\p{M}*)+"))
        assert p.fullmatch("Müller")
        assert p.fullmatch("αβγ")
        assert not p.fullmatch("ab1")

    def test_ascii_w_d_s(self):
        import re

        # Java \w and \d are ASCII-only without UNICODE_CHARACTER_CLASS
        p = re.compile(java_regex_to_python(r"\w+"))
        assert p.fullmatch("abc_9")
        assert not p.fullmatch("Müller")
        p = re.compile(java_regex_to_python(r"[^\s:]+"))
        assert p.fullmatch("a,b")
        assert not p.fullmatch("a b")

    def test_varwidth_lookbehind_expansion(self):
        import re

        # the URL rule's bounded lookbehind and the date rule's
        # alternation lookbehind both compile after expansion
        p = re.compile(
            java_regex_to_python(
                r"((https?)|(ftps?))://[^\s:]+(([/a-zA-Z0-9?])|((?<=\([^\(/]{0,20})\)))"
            )
        )
        m = p.match("http://en.example/wiki/Foo_(bar)")
        assert m and m.group(0).endswith("(bar)")
        p2 = re.compile(java_regex_to_python(r"\d+(?<!\.\d{4}|\d{2})x"))
        assert p2.match("1x") and not p2.match("11x")
