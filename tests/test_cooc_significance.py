"""PMI/LLR collocation significance."""

import numpy as np
import ray.data


class TestCoocSignificance:
    def test_known_values(self, ray_session):
        from topicrawler_ray.stages.cooc import cooc_significance

        # pair table: ("a","b") 8x, ("a","c") 2x, ("d","b") 2x
        pairs = ray.data.from_items(
            [
                {"w1": "a", "w2": "b", "n": 8},
                {"w1": "a", "w2": "c", "n": 2},
                {"w1": "d", "w2": "b", "n": 2},
            ]
        )
        got = {
            (r["w1"], r["w2"]): r for r in cooc_significance(pairs).take_all()
        }
        N, n_ab, n1_a, n2_b = 12.0, 8.0, 10.0, 10.0
        pmi = np.log(n_ab) + np.log(N) - np.log(n1_a) - np.log(n2_b)
        assert got[("a", "b")]["pmi_e6"] == int(np.floor(pmi * 1e6))
        # the dominant pair is positively associated, the cross pairs not
        assert got[("a", "c")]["pmi_e6"] > 0  # 2*12/(10*2) = 1.2
        assert got[("a", "b")]["llr_e6"] >= 0
        assert got[("d", "b")]["n"] == 2

    def test_partition_invariant(self, ray_session):
        from topicrawler_ray.stages.cooc import cooc_significance, word_cooc

        docs = [
            {"doc_id": i, "text": "the cat sat on the mat near the cat"}
            for i in range(8)
        ]
        outs = []
        for parts in (1, 4):
            ds = ray.data.from_items(docs).repartition(parts)
            rows = cooc_significance(word_cooc(ds, window=2)).take_all()
            outs.append(
                sorted((r["w1"], r["w2"], r["n"], r["pmi_e6"], r["llr_e6"])
                       for r in rows)
            )
        assert outs[0] == outs[1]
