"""Naive Bayes: model shapes, partition-invariant training, sensible
predictions, and deterministic tie-breaking."""

import numpy as np
import ray.data


ROWS = (
    [{"doc_id": i, "text": "der hund läuft schnell", "lang": "de"} for i in range(6)]
    + [{"doc_id": 10 + i, "text": "the dog runs fast", "lang": "en"} for i in range(6)]
    + [{"doc_id": 20, "text": "le chien court vite", "lang": "fr"}]
)


class TestNaiveBayes:
    def _train(self, parts):
        from topicrawler_ray.stages.classify import train_naive_bayes

        ds = ray.data.from_items(ROWS).repartition(parts)
        return train_naive_bayes(ds, "text", "lang", dim=256)

    def test_train_partition_invariant(self, ray_session):
        m1, m2 = self._train(1), self._train(5)
        assert m1["labels"] == m2["labels"] == ["de", "en", "fr"]
        assert (m1["log_prior_q"] == m2["log_prior_q"]).all()
        assert (m1["log_like_q"] == m2["log_like_q"]).all()

    def test_classify_recovers_labels(self, ray_session):
        from topicrawler_ray.stages.classify import naive_bayes_classify

        model = self._train(3)
        ds = ray.data.from_items(ROWS).repartition(2)
        out = {
            r["doc_id"]: r["pred_label"]
            for r in naive_bayes_classify(ds, model).take_all()
        }
        for row in ROWS:
            assert out[row["doc_id"]] == row["lang"]

    def test_empty_text_gets_prior_argmax(self, ray_session):
        from topicrawler_ray.stages.classify import naive_bayes_classify

        model = self._train(1)
        ds = ray.data.from_items([{"doc_id": 0, "text": None}])
        # None -> "" -> one empty token; deterministic single prediction
        r = naive_bayes_classify(ds, model).take_all()[0]
        assert r["pred_label"] in model["labels"]
        assert isinstance(r["nb_score_q"], int)
