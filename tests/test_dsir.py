"""DSIR importance selection: feature hashing, integer score
determinism across partitionings, and target-likeness ordering."""

import numpy as np

from topicrawler_ray.stages.dsir import _token_buckets, log_ratio_q


class TestFeatureHashing:
    def test_unigrams_plus_bigrams(self):
        buckets, offsets = _token_buckets(["a b c", "x"], dim=64)
        # doc0: 3 unigrams + 2 bigrams, doc1: 1 unigram
        assert offsets.tolist() == [0, 5, 6]
        assert len(buckets) == 6
        assert (buckets >= 0).all() and (buckets < 64).all()

    def test_empty_text(self):
        buckets, offsets = _token_buckets([""], dim=64)
        # "" splits to one empty token -> 1 unigram, 0 bigrams
        assert offsets.tolist() == [0, 1]

    def test_ratio_shapes(self):
        t = np.array([5, 0, 1], dtype=np.int64)
        r = np.array([1, 1, 10], dtype=np.int64)
        q = log_ratio_q(t, r)
        assert q.dtype == np.int64
        assert q[0] > 0 > q[2]  # target-heavy bucket up, raw-heavy down


class TestDsirSelect:
    ROWS = (
        [{"doc_id": i, "text": "der hund läuft schnell weg", "lang": "de"}
         for i in range(5)]
        + [{"doc_id": 100 + i, "text": "the dog runs very fast", "lang": "en"}
           for i in range(20)]
        + [{"doc_id": 200 + i, "text": "der hund läuft sehr schnell", "lang": "en"}
           for i in range(3)]
    )

    def _run(self, parts):
        import ray.data

        from topicrawler_ray.stages.dsir import dsir_select

        corpus = ray.data.from_items(self.ROWS).repartition(parts)
        target = corpus.filter(expr="lang == 'de'")
        out = dsir_select(corpus, target, n=10, dim=512)
        return list(
            zip(out.column("doc_id").to_pylist(),
                out.column("dsir_score_q").to_pylist())
        )

    def test_partition_invariant(self, ray_session):
        assert self._run(1) == self._run(6)

    def test_german_like_docs_win(self, ray_session):
        got = self._run(1)
        top_ids = {i for i, _ in got[:8]}
        # the de docs and the de-looking en docs outrank the english ones
        assert {0, 1, 2, 3, 4, 200, 201, 202} == top_ids


class TestCorpusDivergence:
    def test_identical_corpora_zero(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dsir import corpus_divergence

        docs = ray.data.from_items(
            [{"text": "the same words here"} for _ in range(10)]
        ).repartition(3)
        t = corpus_divergence(docs, docs, dim=256)
        assert t.column("kl_ab_e9").to_pylist() == [0]
        assert t.column("js_e9").to_pylist() == [0]

    def test_divergent_corpora_positive(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dsir import corpus_divergence

        a = ray.data.from_items([{"text": "aaa bbb ccc"} for _ in range(8)])
        b = ray.data.from_items([{"text": "xxx yyy zzz"} for _ in range(8)])
        t = corpus_divergence(a, b, dim=256)
        assert t.column("kl_ab_e9").to_pylist()[0] > 0
        assert t.column("js_e9").to_pylist()[0] > 0
