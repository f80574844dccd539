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

    def test_unmatched_query_empty(self, ray_session, tmp_path):
        from topicrawler_ray.stages.retrieval import (
            bm25_disk_topk,
            build_bm25_index,
        )

        ds = ray.data.from_items(DOCS)
        idx = build_bm25_index(ds, str(tmp_path), num_buckets=8)
        out = bm25_disk_topk(idx, [(9, "nonexistent tokens")], k=3)
        assert out.num_rows == 0
