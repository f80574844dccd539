"""Fuzzy (MinHash-LSH) benchmark decontamination
(stages/decontam.py::decontaminate_fuzzy)."""

import pyarrow as pa
import pytest
import ray.data

from topicrawler_ray.stages.decontam import decontaminate, decontaminate_fuzzy

# 60 words with every 12th changed (offset 6): every 13-word window
# contains a change, so the exact n=13 rule finds NO shared n-gram -
# yet shingle Jaccard is 0.589 and the pair shares 1 of 16 LSH bands
# under the fixed minhash seed (all deterministic, verified offline)
BENCH = " ".join("w%d" % i for i in range(60))
PARAPHRASE = " ".join(
    ("changed%d" % i) if i % 12 == 6 else ("w%d" % i) for i in range(60)
)
CLEAN = "completely unrelated text about ray data streaming execution and arrow"


def _run(threshold=0.2):
    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": BENCH},
            {"doc_id": 2, "text": PARAPHRASE},
            {"doc_id": 3, "text": CLEAN},
        ]
    )
    bench = ray.data.from_items([{"doc_id": 100, "text": BENCH}])
    out = decontaminate_fuzzy(corpus, bench, threshold=threshold, concurrency=1)
    return {r["doc_id"]: r for r in out.take_all()}


class TestFuzzyDecontam:
    def test_catches_paraphrase_exact_misses(self, ray_session):
        rows = _run()
        assert rows[1]["contaminated"] and rows[1]["jaccard_e4"] == 10000
        assert rows[2]["contaminated"] and 0 < rows[2]["jaccard_e4"] < 10000
        assert not rows[3]["contaminated"] and rows[3]["best_bench"] == -1

        # the exact n-gram rule (n=13, GPT-3 style) misses the paraphrase
        corpus = ray.data.from_items([{"doc_id": 2, "text": PARAPHRASE}])
        bench = ray.data.from_items([{"doc_id": 100, "text": BENCH}])
        exact = decontaminate(corpus, bench, n=13, concurrency=1).take_all()
        assert not exact[0]["contaminated"]

    def test_threshold_gates(self, ray_session):
        rows = _run(threshold=0.99)
        assert rows[1]["contaminated"]  # identical text survives any bar
        assert not rows[2]["contaminated"]  # paraphrase falls below

    def test_scrub_windows(self, ray_session):
        from topicrawler_ray.stages.decontam import decontaminate_scrub

        bench = ray.data.from_items([{"doc_id": 100, "text": "b c d"}])
        corpus = ray.data.from_items(
            [
                # one hit at pos 1: words b,c,d removed
                {"doc_id": 1, "text": "a b c d e"},
                # overlapping hits (b c d at 1 and 2): union removed
                {"doc_id": 2, "text": "a b c d b c d e"},
                {"doc_id": 3, "text": "x y z"},
                {"doc_id": 4, "text": ""},
                {"doc_id": 5, "text": "b c d"},  # fully scrubbed
            ]
        )
        out = decontaminate_scrub(corpus, bench, n=3, concurrency=1).take_all()
        rows = {r["doc_id"]: r for r in out}
        assert rows[1]["clean_text"] == "a e" and rows[1]["n_removed"] == 3
        assert rows[2]["clean_text"] == "a e" and rows[2]["n_removed"] == 6
        assert rows[3]["clean_text"] == "x y z" and rows[3]["n_removed"] == 0
        assert rows[4]["clean_text"] == "" and rows[4]["n_tokens"] == 1
        assert rows[5]["clean_text"] == "" and rows[5]["n_removed"] == 3

    def test_empty_bench(self, ray_session):
        corpus = ray.data.from_items([{"doc_id": 1, "text": BENCH}])
        bench = corpus.filter(lambda r: False)
        out = decontaminate_fuzzy(corpus, bench, concurrency=1).take_all()
        assert not out[0]["contaminated"] and out[0]["n_matches"] == 0


class TestSplitOverlap:
    def test_known_overlap(self, ray_session):
        """Hand-computable split-half trigram overlap: odd doc 1 shares
        exactly one distinct trigram with the even half; odd doc 3
        shares none; a doc with < 3 tokens emits no grams (absent)."""
        import ray.data

        from topicrawler_ray.stages.decontam import split_overlap_stats

        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b c d"},       # even: grams {a b c, b c d}
                {"doc_id": 1, "text": "x y a b c"},     # odd: {x y a, y a b, a b c}
                {"doc_id": 2, "text": "q r s"},          # even: {q r s}
                {"doc_id": 3, "text": "u v w x"},        # odd: {u v w, v w x}
                {"doc_id": 5, "text": "t u"},            # odd, too short
            ]
        ).repartition(3)
        out = {
            r["doc_id"]: (r["n_grams"], r["n_overlap"])
            for r in split_overlap_stats(docs, n=3, num_partitions=2).take_all()
        }
        assert out == {1: (3, 1), 3: (2, 0)}

    def test_within_doc_duplicates_counted_once(self, ray_session):
        """Repeated grams inside one doc count once (DISTINCT per doc),
        matching the SQL oracle's SELECT DISTINCT doc_id, g."""
        import ray.data

        from topicrawler_ray.stages.decontam import split_overlap_stats

        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b c a b c"},  # even
                {"doc_id": 1, "text": "a b c a b c a b c"},  # odd
            ]
        )
        out = split_overlap_stats(docs, n=3, num_partitions=2).take_all()
        assert len(out) == 1
        r = out[0]
        # odd doc grams: {a b c, b c a, c a b} each seen multiple times
        assert r["doc_id"] == 1 and r["n_grams"] == 3 and r["n_overlap"] == 3
