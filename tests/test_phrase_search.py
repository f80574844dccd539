"""Positional phrase search: exact consecutive-token matching."""

import pyarrow as pa


def _docs_ds(texts, block_rows=None):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    if block_rows:
        ds = ds.repartition(max(1, len(texts) // block_rows))
    return ds


class TestPhraseSearch:
    def test_hand_matches(self, ray_session):
        from topicrawler_ray.stages.retrieval import phrase_search

        texts = [
            "the cat sat on the mat",
            "a cat sat here and the cat sat there",
            "cat on the mat",
            "",
        ]
        out = phrase_search(_docs_ds(texts), [(0, ["cat", "sat"]), (1, ["the", "mat"])])
        got = {(r["phrase_id"], r["doc_id"]): r["n_matches"] for r in out.take_all()}
        assert got == {
            (0, 0): 1,
            (0, 1): 2,
            (1, 0): 1,
            (1, 2): 1,
        }

    def test_overlapping_occurrences_counted(self, ray_session):
        from topicrawler_ray.stages.retrieval import phrase_search

        out = phrase_search(_docs_ds(["a a a a"]), [(0, ["a", "a"])])
        (row,) = out.take_all()
        assert row["n_matches"] == 3

    def test_no_cross_document_windows(self, ray_session):
        from topicrawler_ray.stages.retrieval import phrase_search

        # "x y" would match if doc 0's tail token joined doc 1's head
        out = phrase_search(_docs_ds(["p q x", "y r s"]), [(0, ["x", "y"])])
        assert out.take_all() == []

    def test_multi_block_equals_single_block(self, ray_session):
        from topicrawler_ray.stages.retrieval import phrase_search

        texts = ["w%d the cat sat w%d" % (i, i) for i in range(40)]
        phrases = [(0, ["the", "cat", "sat"])]
        one = sorted(
            (r["phrase_id"], r["doc_id"], r["n_matches"])
            for r in phrase_search(_docs_ds(texts), phrases).take_all()
        )
        many = sorted(
            (r["phrase_id"], r["doc_id"], r["n_matches"])
            for r in phrase_search(
                _docs_ds(texts, block_rows=5), phrases
            ).take_all()
        )
        assert one == many and len(one) == 40
