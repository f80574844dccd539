"""Reciprocal-rank fusion (stages/retrieval.py::rrf_fuse)."""

import pyarrow as pa

from topicrawler_ray.stages.retrieval import rrf_fuse


def _t(rows, id_col):
    qs, ids, rks = zip(*rows)
    return pa.table(
        {
            "query_id": pa.array(qs, pa.int64()),
            "rank": pa.array(rks, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
        }
    )


def _r(k0, rank):
    return 10**9 // (k0 + rank + 1)


class TestRrfFuse:
    def test_hand_case(self):
        # q0: lex ranks a=0 b=1; dense ranks b=0 c=1
        lex = _t([(0, 10, 0), (0, 11, 1)], "doc_id")
        dense = _t([(0, 11, 0), (0, 12, 1)], "vec_id")
        out = rrf_fuse([(lex, "doc_id"), (dense, "vec_id")], k0=60, topk=10)
        rows = {
            r["doc_id"]: (r["rrf_e9"], r["rank"])
            for r in out.to_pylist()
        }
        assert rows[11] == (_r(60, 1) + _r(60, 0), 0)  # both lists
        assert rows[10] == (_r(60, 0), 1)
        assert rows[12] == (_r(60, 1), 2)

    def test_tie_breaks_to_smaller_id(self):
        lex = _t([(0, 5, 0)], "doc_id")
        dense = _t([(0, 3, 0)], "vec_id")
        out = rrf_fuse([(lex, "doc_id"), (dense, "vec_id")]).to_pylist()
        assert [r["doc_id"] for r in out] == [3, 5]

    def test_topk_bound_and_multi_query(self):
        lex = _t([(q, q * 100 + i, i) for q in (0, 1) for i in range(10)], "doc_id")
        dense = _t([(q, q * 100 + 50 + i, i) for q in (0, 1) for i in range(10)], "vec_id")
        out = rrf_fuse([(lex, "doc_id"), (dense, "vec_id")], topk=10)
        df = out.to_pandas()
        assert len(df) == 20
        assert sorted(df.query_id.unique()) == [0, 1]
        # ranks are dense 0..topk-1 per query
        for q in (0, 1):
            assert list(df[df.query_id == q]["rank"]) == list(range(10))


class TestRM3:
    def test_expansion_changes_ranking(self, ray_session, sf_dir):
        """RM3 re-ranking differs from plain BM25 for at least one
        query (the expansion terms really contribute), and every
        first-pass feedback doc scoring > 0 stays findable."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        rm3 = e.queries()["bm25_rm3"](sf_dir).to_pandas()
        base = e.queries()["bm25_topk"](sf_dir).to_pandas()
        assert len(rm3) == len(base) == 30
        merged = rm3.merge(
            base, on=["query_id", "rank"], suffixes=("_rm3", "_bm25")
        )
        assert (merged["doc_id_rm3"] != merged["doc_id_bm25"]).any()

    def test_weighted_pass_weight1_equals_plain(self, ray_session):
        """The weighted scorer with all weights 1 is EXACTLY bm25_topk
        (the algebra reduces term-by-term)."""
        import ray.data

        from topicrawler_ray.stages.retrieval import (
            _weighted_bm25_pass,
            bm25_topk,
            query_terms,
        )

        docs = ray.data.from_items(
            [
                {"doc_id": i, "text": t}
                for i, t in enumerate(
                    [
                        "fast scan of the fast table",
                        "slow merge of batches",
                        "window value agg over values",
                        "table scan window",
                    ]
                )
            ]
        ).repartition(2)
        queries = [(0, "fast table"), (1, "window value")]
        a = bm25_topk(docs, queries, k=3).to_pandas()
        weighted = [(qid, {t: 1 for t in query_terms(q)}) for qid, q in queries]
        b = _weighted_bm25_pass(docs, weighted, 3, "doc_id", "text").to_pandas()
        assert a.equals(b)
