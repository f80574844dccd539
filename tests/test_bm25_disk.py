"""Disk-backed BM25: artifact layout, postings pruning, scan-parity."""

import json
import os

import ray.data


DOCS = [
    {"doc_id": 0, "text": "fast table scan over rows"},
    {"doc_id": 1, "text": "slow full scan"},
    {"doc_id": 2, "text": "window agg value stream"},
    {"doc_id": 3, "text": "completely unrelated words"},
    {"doc_id": 4, "text": "fast fast fast scan"},
]


class TestBm25Disk:
    def test_parity_with_scan_path(self, ray_session, tmp_path):
        from topicrawler_ray.stages.retrieval import (
            bm25_disk_topk,
            bm25_topk,
            build_bm25_index,
        )

        ds = ray.data.from_items(DOCS).repartition(3)
        queries = [(0, "fast scan"), (1, "window value"), (2, "zzz missing")]
        idx = build_bm25_index(ds, str(tmp_path), num_buckets=8)
        disk = bm25_disk_topk(idx, queries, k=3).to_pylist()
        scan = bm25_topk(ds, queries, k=3).take_all()
        key = lambda r: (r["query_id"], r["rank"])
        assert sorted(
            [(r["query_id"], r["rank"], r["doc_id"], r["score_e6"]) for r in disk]
        ) == sorted(
            [(r["query_id"], r["rank"], r["doc_id"], r["score_e6"]) for r in scan]
        )

    def test_meta_and_buckets(self, ray_session, tmp_path):
        from topicrawler_ray.stages.retrieval import build_bm25_index

        ds = ray.data.from_items(DOCS)
        idx = build_bm25_index(ds, str(tmp_path), num_buckets=8)
        meta = json.load(open(os.path.join(idx, "meta.json")))
        assert meta["n_docs"] == 5
        assert meta["total_len"] == sum(len(d["text"].split(" ")) for d in DOCS)
        assert any(f.startswith("bucket=") for f in os.listdir(idx))

    def test_high_df_term_driver_memory_bounded(self, ray_session, tmp_path):
        """A stop-term query (term present in EVERY doc) must not pull
        full postings onto the driver: the rows the driver merges stay
        O(k * |queries| * num_blocks), not O(corpus)."""
        from topicrawler_ray.stages.retrieval import (
            bm25_disk_topk,
            bm25_topk,
            build_bm25_index,
        )

        n = 400
        docs = [
            {"doc_id": i, "text": f"the word{i} the filler{i % 7} the"}
            for i in range(n)
        ]
        ds = ray.data.from_items(docs).repartition(4)
        # "the" has df == n; "word3" is rare -> mixed-selectivity query
        queries = [(0, "the word3"), (1, "the")]
        idx = build_bm25_index(ds, str(tmp_path), num_buckets=8)
        dbg = {}
        k = 5
        disk = bm25_disk_topk(idx, queries, k=k, debug=dbg).to_pylist()
        scan = bm25_topk(ds, queries, k=k).take_all()
        assert sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score_e6"]) for r in disk
        ) == sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score_e6"]) for r in scan
        )
        # the groupby-sum output is partial-top-k'd per block before the
        # driver sees it; generous block allowance, but far below n*|q|
        assert dbg["merged_rows"] <= k * len(queries) * 64
        assert dbg["merged_rows"] < n

    def test_unmatched_query_empty(self, ray_session, tmp_path):
        from topicrawler_ray.stages.retrieval import (
            bm25_disk_topk,
            build_bm25_index,
        )

        ds = ray.data.from_items(DOCS)
        idx = build_bm25_index(ds, str(tmp_path), num_buckets=8)
        out = bm25_disk_topk(idx, [(9, "nonexistent tokens")], k=3)
        assert out.num_rows == 0
