"""Property tests guarding the round-5 fast paths against the reference
slow paths (no Ray needed).

Every optimisation shipped in round 5 claims BIT-identical output to
the original implementation; these hypothesis properties keep that
claim enforced against arbitrary inputs, not just the corpus the
optimisation was measured on.
"""

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import topicrawler_ray.functions.sentences as S
from topicrawler_ray.functions.tokenizer import (
    filtered_and_normalized_tokens,
    filtered_segments,
    normalize_segment,
    tokenize,
)
from topicrawler_ray.lm.backoff import FrozenCounts, NgramCounts, StupidBackoffLM


def _slow_split(text):
    fast = S._split_segments_fast
    S._split_segments_fast = lambda t: None
    try:
        return S.split_segments(text)
    finally:
        S._split_segments_fast = fast


# text alphabets stressing the boundary machinery: sentence enders,
# quotes, guillemets, tabs, literal backslash-n, NULs, newlines,
# empty-space variants, plus ordinary words
_BOUNDARY_ALPHABET = st.sampled_from(
    list("abcZ .!?؟\t\"'`»«“\\n\x08\x0c\x00\n\r  :;,1")
)
_texts = st.text(alphabet=_BOUNDARY_ALPHABET, min_size=0, max_size=120)


class TestSplitSegmentsProperty:
    @settings(max_examples=400, deadline=None)
    @given(_texts)
    def test_fast_equals_slow(self, text):
        assert S.split_segments(text) == _slow_split(text)

    @settings(max_examples=100, deadline=None)
    @given(st.text(min_size=0, max_size=80))
    def test_fast_equals_slow_arbitrary_unicode(self, text):
        assert S.split_segments(text) == _slow_split(text)


class TestTokenizerFastBranch:
    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=80))
    def test_filter5_shortcut_equals_generic(self, text):
        generic = [
            normalize_segment(t, ty, 2)
            for t, ty in filtered_segments(tokenize(text), 5, True)
        ]
        assert filtered_and_normalized_tokens(text) == generic


def _rand_lm(order, rng):
    words = ["w%d" % i for i in range(30)]
    counts = NgramCounts(order)
    for _ in range(120):
        counts.add_sequence([rng.choice(words) for _ in range(rng.randint(1, 9))])
    return StupidBackoffLM(counts), StupidBackoffLM(FrozenCounts(counts)), words


class TestPackedScorerProperty:
    @pytest.mark.parametrize("order", [2, 3, 4, 5])
    def test_packed_equals_tuple_scoring(self, order):
        rng = random.Random(order)
        lm_t, lm_f, words = _rand_lm(order, rng)
        vocab_plus = words + ["oov1", "oov2", "<s>", "</s>"]
        for _ in range(4000):
            n = rng.randint(1, order + 1)
            ng = [rng.choice(vocab_plus) for _ in range(n)]
            a, b = lm_t.score(ng), lm_f.score(ng)
            assert a == b, (ng, a, b)
            assert lm_t.ngram_log10_prob(ng) == lm_f.ngram_log10_prob(ng)


class TestDocumentPerplexityFastPath:
    @pytest.mark.parametrize("order", [2, 3, 4])
    def test_packed_doc_equals_generic(self, order):
        from topicrawler_ray.functions.sentencemaker import get_sentences
        from topicrawler_ray.lm.perplexity import (
            ModelPerplexity,
            _document_perplexity_packed,
            text_ngrams,
        )

        rng = random.Random(100 + order)
        _, lm_f, words = _rand_lm(order, rng)
        for _ in range(60):
            sents = []
            for _s in range(rng.randint(1, 4)):
                sents.append(
                    " ".join(
                        rng.choice(words + ["qqz", "xxv"])
                        for _ in range(rng.randint(1, 7))
                    )
                    + rng.choice([".", "!", "?", "."])
                )
            doc = " ".join(sents)
            fast = _document_perplexity_packed(lm_f, doc)
            perp = ModelPerplexity(lm_f)
            for sentence in get_sentences(doc, min_length=2):
                ngrams = text_ngrams(sentence, lm_f.order)
                if len(ngrams) < 1 or len(ngrams[-1]) < lm_f.order:
                    continue
                for ng in ngrams:
                    perp.add_log10_prob(ng)
            assert fast == perp.get(), doc


# ---- LangId packed-trigram fast paths (round-5 curation hotspot) ----

_LANGID_ALPHABET = st.sampled_from(
    # profile-language words, CJK profile chars, accents, digits,
    # punctuation, NUL/newlines (the batch path's separator machinery)
    list("theandingofzu 的是不在人我scheißéñàüо .!?\n\x00\t'\"01-")
)
_langid_texts = st.text(alphabet=_LANGID_ALPHABET, min_size=0, max_size=80)


class TestLangIdFastPath:
    @classmethod
    def setup_class(cls):
        from topicrawler_ray.stages.textstats import LangId

        cls.lid = LangId()

    @settings(max_examples=400, deadline=None)
    @given(_langid_texts)
    def test_classify_equals_ref(self, text):
        assert self.lid.classify(text) == self.lid._classify_ref(text)

    @settings(max_examples=100, deadline=None)
    @given(st.text(min_size=0, max_size=60))
    def test_classify_equals_ref_arbitrary_unicode(self, text):
        assert self.lid.classify(text) == self.lid._classify_ref(text)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(_langid_texts, min_size=0, max_size=10))
    def test_batch_equals_ref(self, texts):
        assert self.lid._classify_batch(texts) == [
            self.lid._classify_ref(t) for t in texts
        ]

    def test_call_handles_nulls(self):
        import pyarrow as pa

        texts = ["the and ing is", None, "", "的 是 不"]
        out = self.lid(pa.table({"text": pa.array(texts, pa.string())}))
        exp = [self.lid._classify_ref(t) if t else "und" for t in texts]
        assert out.column("lang_pred").to_pylist() == exp

    def test_lone_surrogate_falls_back_to_ref(self):
        # Arrow string columns can never carry lone surrogates (valid
        # UTF-8 only), so this guards the pure-Python entry points.
        t = "\ud800 der und die das ist"
        assert self.lid.classify(t) == self.lid._classify_ref(t)
        with pytest.raises(UnicodeEncodeError):
            self.lid._classify_batch([t])  # __call__ catches this
