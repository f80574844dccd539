"""Duplicate-span detection (spans.py) and connected components
(components.py)."""

import pyarrow as pa
import pytest


class TestDupSpans:
    def test_gram_pos_hashes_matches_split_convention(self):
        from topicrawler_ray.stages.spans import gram_pos_hashes

        assert len(gram_pos_hashes("a b c d", 3)) == 2
        assert len(gram_pos_hashes("a b", 3)) == 0
        assert len(gram_pos_hashes("", 3)) == 0
        # same gram -> same hash, independent call sites
        import numpy as np

        h1 = gram_pos_hashes("x a b c", 3)
        h2 = gram_pos_hashes("y a b c", 3)
        assert h1[1] == h2[1]  # "a b c" window
        assert h1.dtype == np.int64

    def test_cross_and_within_doc_dup_spans(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.spans import dup_span_stats

        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b c d e f g h"},
                {"doc_id": 1, "text": "x a b c d y z w"},
                {"doc_id": 2, "text": "p q r s t u v k"},
                {"doc_id": 3, "text": "m m m m m m m m"},
            ]
        )
        out = (
            dup_span_stats(docs, n=4)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc0/doc1 share the single 4-gram "a b c d" (doc0 pos0,
        # doc1 pos1); doc3's five identical windows are within-doc dups
        assert out["n_tokens"].tolist() == [8, 8, 8, 8]
        assert out["n_spans"].tolist() == [5, 5, 5, 5]
        assert out["n_dup_spans"].tolist() == [1, 1, 0, 5]
        assert out["covered_tokens"].tolist() == [4, 4, 0, 8]
        # 20% default threshold: 4/8 and 8/8 coverage both fail it
        assert out["keep"].tolist() == [False, False, True, False]

    def test_no_dups_is_all_keep(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.spans import dup_span_stats

        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b c d e"},
                {"doc_id": 1, "text": "f g h i j"},
            ]
        )
        out = (
            dup_span_stats(docs, n=3)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out["n_dup_spans"].tolist() == [0, 0]
        assert out["covered_tokens"].tolist() == [0, 0]
        assert out["keep"].tolist() == [True, True]


class TestConnectedComponents:
    def test_triangle_plus_singletons(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import connected_components

        edges = ray.data.from_items(
            [{"src": 1, "dst": 0}, {"src": 1, "dst": 2}]
        )
        nodes = ray.data.from_items([{"doc_id": i} for i in range(5)])
        cc = (
            connected_components(edges, nodes)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert cc["component"].tolist() == [0, 0, 0, 3, 4]

    def test_chain_converges(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import connected_components

        edges = ray.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(7)]
        )
        nodes = ray.data.from_items([{"doc_id": i} for i in range(8)])
        cc = connected_components(edges, nodes, max_rounds=16).to_pandas()
        assert set(cc["component"]) == {0}
        assert len(cc) == 8

    def test_empty_edges_all_singletons(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import connected_components

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        )
        nodes = ray.data.from_items([{"doc_id": i} for i in range(4)])
        cc = (
            connected_components(empty, nodes)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert cc["component"].tolist() == [0, 1, 2, 3]

    def test_max_rounds_raises(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import connected_components

        # a 6-chain has diameter 5 > max_rounds=2 propagation budget
        edges = ray.data.from_items(
            [{"src": i, "dst": i + 1} for i in range(5)]
        )
        nodes = ray.data.from_items([{"doc_id": i} for i in range(6)])
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, nodes, max_rounds=2)

    def test_star_edges_from_keys(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import star_edges_from_keys

        mem = ray.data.from_items(
            [
                {"gh": 7, "doc_id": 5},
                {"gh": 7, "doc_id": 9},
                {"gh": 7, "doc_id": 2},
                {"gh": 7, "doc_id": 5},  # duplicate membership row
                {"gh": 8, "doc_id": 9},  # single-member key: no edge
            ]
        )
        se = (
            star_edges_from_keys(mem, "gh", "doc_id")
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
        assert list(map(tuple, se[["src", "dst"]].to_numpy())) == [
            (5, 2),
            (9, 2),
        ]

    def test_component_summary(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.components import (
            component_summary,
            connected_components,
        )

        edges = ray.data.from_items([{"src": 3, "dst": 1}])
        nodes = ray.data.from_items([{"doc_id": i} for i in range(4)])
        cc = connected_components(edges, nodes)
        out = (
            component_summary(cc)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out["component"].tolist() == [0, 1, 2, 1]
        assert out["cluster_size"].tolist() == [1, 2, 1, 2]
        assert out["is_canonical"].tolist() == [True, True, True, False]


class TestClusterStats:
    def test_counts_reconcile_with_labels(self, ray_session, sf_dir):
        """Per-size cluster/doc counts reconcile exactly with the
        underlying component labels: sum(n_docs) = corpus size,
        n_docs = cluster_size * n_clusters per row."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        labels = e.queries()["near_dup_clusters"](sf_dir).to_pandas()
        stats = e.queries()["dedup_cluster_stats"](sf_dir).to_pandas()
        assert stats["n_docs"].sum() == len(labels)
        assert (
            stats["n_docs"] == stats["cluster_size"] * stats["n_clusters"]
        ).all()
