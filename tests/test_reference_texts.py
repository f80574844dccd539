"""Golden behavior on the reference's own hard test texts.

Inputs ported from ``lt.seg/src/test/java/.../token/TokenizerTest.java:31-40``
and ``.../sentence/SentenceSplitterTest.java:43-52`` (the reference's
tests are print-tests; these snapshots freeze our verified port
behaviour on the same inputs and assert the named hard cases)."""

from topicrawler_ray.functions.sentences import split_sentences
from topicrawler_ray.functions.tokenizer import filtered_and_normalized_tokens, tokenize

SENT_TEXT = (
    "\r\n\t\tthis is a sentence!\n\n \n\t\n\n\tThis is another sentence. \t\t\n   "
    'This is yet another sentence. On the 1. dot it\'s: "Not a sentence.", '
    "but on the second it is.\n\nRight? "
    "Das 19. Jahrhundert legte hier Grundsteine für "
    "die Entwicklungen, die im 20. neue Ausprägungen und globale Dimensionen "
    " gewinnen sollten. Der Faschismus und der Nationalsozialismus des 20."
    " Jahrhunderts werden sich als national-völkische Bewegungen"
    " manifestieren. Hochtechnisierte und hochgerüstete Staaten werden sich"
    " hier in romantischen Rückbesinnungen auf völkische Ursprünge definieren"
    " und Konflikte globaler Dimensionen austragen, die die Welt neu ordnen"
    " werden. Es geht aus der Sicht der Haushalte des 17. und 18. Jahrhunderts"
    " darum, den Abfluss von Edelmetall ins Ausland zu verhindern."
)

TOK_TEXT = (
    "0815 4711, 007 done. "
    "﻿Hello World... The answer is 42, but what is the question? "
    "I told this joke 3times.h3ll0 w0rld!!! "
    "4711Today is the 1st of Dec. 2014. "
    "Today is the aniversary of Prof. Dr. Stephen W. Hawking. "
    "Is this state-of-the-art? Could this b\ne state-\nof-\r\nthe-art ? "
    "Today is 2014/01/12 or 1.12.14. "
    "\t\n\t\r\n\f\n\t :-) ^^ α α  "
)


class TestSentenceSplitterTestText:
    def test_sentence_boundaries(self):
        sents = split_sentences(SENT_TEXT)
        assert len(sents) == 9
        assert sents[0] == "this is a sentence!"
        assert sents[1] == "This is another sentence."
        # ordinal "1." does not split, the quoted-period case holds the
        # sentence together until the real boundary
        assert (
            sents[3]
            == 'On the 1. dot it\'s: "Not a sentence.", but on the second it is.'
        )
        assert sents[4] == "Right?"
        # German ordinal centuries: "19. Jahrhundert", "im 20. neue" and
        # "des 20. Jahrhunderts" must not split (pre-boundary digit rule)
        assert sents[5].startswith("Das 19. Jahrhundert legte")
        assert "im 20. neue" in sents[5]
        assert sents[6].startswith("Der Faschismus")
        assert "des 20. Jahrhunderts" in sents[6]
        assert "des 17. und 18. Jahrhunderts" in sents[8]

    def test_deterministic(self):
        assert split_sentences(SENT_TEXT) == split_sentences(SENT_TEXT)


class TestTokenizerTestText:
    def test_raw_segmentation(self):
        toks = [t for t, _ in tokenize(TOK_TEXT)]
        assert len(toks) == 151
        # BOM survives as its own segment; number/word boundaries split
        assert toks[:9] == ["0815", " ", "4711", ",", " ", "007", " ", "done", "."]
        assert "﻿" in toks
        # joined-number prefix stays one WORD_WITH_NUMBER token
        assert "4711Today" in toks
        assert "3times" in toks

    def test_filtered_normalized_level2(self):
        toks = filtered_and_normalized_tokens(TOK_TEXT, 2, 2)
        # digits collapse to the NUMBER symbol; WWN digits -> '0'
        assert toks[0] == "0"
        assert "h0ll0" in toks and "w0rld" in toks
        assert "0times" in toks and "0Today" in toks and "0st" in toks
        # hyphen-linebreak forms survive as word/punct alternation
        i = toks.index("state")
        assert toks[i : i + 7] == ["state", "-", "of", "-", "the", "-", "art"]
        # ':-)' (PUNCTUATION) is dropped by the consecutive-type merge
        # right after the sentence dot; '^^' dedups to '^'
        assert ":-)" not in toks
        assert "^" in toks
        # abbreviations keep their dots as separate PUNCT tokens
        j = toks.index("Prof")
        assert toks[j : j + 4] == ["Prof", ".", "Dr", "."]

    def test_scorer_path_level5(self):
        toks = filtered_and_normalized_tokens(TOK_TEXT)
        # level 5 drops NUMBER and WORD_WITH_NUMBER entirely
        assert "0" not in toks and "h0ll0" not in toks and "0Today" not in toks
        assert "Hello" in toks and "question" in toks
