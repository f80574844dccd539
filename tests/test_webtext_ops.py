"""Webtext curation operators added in round 3: segment-level dedup,
hopping windows, host rollup, anchor-text aggregation."""

import pyarrow as pa
import pytest


class TestSegmentDedup:
    def test_first_occurrence_kept(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dedup import segment_dedup

        # doc 0 seg0 == doc 1 seg1 == doc 1 seg2 ("a b"); doc1 seg0 unique
        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b"},
                {"doc_id": 1, "text": "x y a b a b"},
            ]
        )
        out = {
            (r["doc_id"], r["seg_idx"]): r["keep"]
            for r in segment_dedup(docs, words_per_seg=2).take_all()
        }
        assert out == {
            (0, 0): True,   # first "a b"
            (1, 0): True,   # "x y"
            (1, 1): False,  # dup "a b"
            (1, 2): False,  # dup "a b" (within-doc)
        }

    def test_empty_text_single_segment(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dedup import segment_dedup

        docs = ray.data.from_items(
            [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": ""}]
        )
        out = {
            (r["doc_id"], r["seg_idx"]): r["keep"]
            for r in segment_dedup(docs, words_per_seg=3).take_all()
        }
        # ''.split(' ') == [''] -> one (empty) segment per doc; doc 0 first
        assert out == {(0, 0): True, (1, 0): False}


class TestHoppingWindow:
    def test_each_event_in_two_windows(self, ray_session):
        import datetime

        import ray.data

        from topicrawler_ray.stages.timeseries import hopping_window_agg

        def ts(sec):
            return datetime.datetime(2024, 1, 1, 0, 0, sec)

        # explicit timestamp[us] (the parquet fixture dtype; from_items
        # would store ns and break the µs window math)
        events = ray.data.from_arrow(
            pa.table(
                {
                    "ts": pa.array([ts(10), ts(20), ts(40)], pa.timestamp("us")),
                    "event_type": ["a", "a", "b"],
                    "value": [1.0, 2.0, 0.5],
                }
            )
        )
        out = hopping_window_agg(
            events, width_seconds=60, hop_seconds=30
        ).take_all()
        # every event lands in exactly width/hop = 2 windows
        assert sum(r["n_events"] for r in out) == 6
        rows = {
            (r["window_start"].isoformat(), r["event_type"]): (
                r["n_events"],
                r["sum_value_e2"],
            )
            for r in out
        }
        base = datetime.datetime(2024, 1, 1).isoformat()
        prev = datetime.datetime(2023, 12, 31, 23, 59, 30).isoformat()
        assert rows[(base, "a")] == (2, 300)
        assert rows[(prev, "a")] == (2, 300)
        assert rows[(base + "", "b")] == (1, 50)

    def test_width_must_divide(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.timeseries import hopping_window_agg

        with pytest.raises(ValueError):
            hopping_window_agg(
                ray.data.from_items([{"ts": 0, "event_type": "a", "value": 0.0}]),
                width_seconds=500,
                hop_seconds=300,
            )


class TestHostRollup:
    def test_partial_then_sum(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.politeness import host_rollup

        pages = ray.data.from_arrow(
            pa.table(
                {
                    "url": [
                        "http://h1.example/",
                        "http://h1.example/p2",
                        "http://h1.example/robots.txt",
                        "http://h2.example/x",
                    ],
                    "html": [b"abc", b"defgh", b"ua", None],
                }
            )
        ).repartition(3)
        rows = {r["host"]: r for r in host_rollup(pages).take_all()}
        assert rows["h1.example"]["n_pages"] == 3
        assert rows["h1.example"]["n_robots"] == 1
        assert rows["h1.example"]["html_bytes"] == 10
        assert rows["h2.example"]["n_pages"] == 1
        assert rows["h2.example"]["html_bytes"] == 0


class TestAnchors:
    def test_extract_anchors_filters_and_cleans(self):
        from topicrawler_ray.functions.urls import extract_anchors

        html = (
            '<a href="/x">Hello <b>World</b></a>'
            '<a href="#frag">skip</a>'
            '<a href="javascript:f()">skip</a>'
            '<a href="http://a.example/p">  A\n  B </a>'
        )
        got = extract_anchors(html, "http://h.example/base")
        assert got == [
            ("http://h.example/x", "Hello World"),
            ("http://a.example/p", "A B"),
        ]

    def test_agg_caps_text_variety_not_counts(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.graph import anchor_text_agg

        html = "".join(
            '<a href="http://t.example/">t%02d</a>' % i for i in range(25)
        ) + '<a href="http://t.example/"></a>'  # empty text: counted, not listed
        pages = ray.data.from_arrow(
            pa.table(
                {"url": ["http://h.example/"], "html": [html.encode("utf-8")]}
            )
        )
        rows = anchor_text_agg(pages, max_texts=20).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_anchors"] == 26
        assert r["n_texts"] == 25
        texts = r["texts"].split("|")
        assert texts == ["t%02d" % i for i in range(20)]


class TestBM25:
    def test_topk_matches_bruteforce(self, ray_session):
        import math

        import ray.data

        from topicrawler_ray.stages.retrieval import bm25_topk

        docs = [
            (0, "fast table scan over table"),
            (1, "fast fast fast"),
            (2, "slow merge"),
            (3, "table"),
            (4, "nothing relevant here"),
        ]
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in docs]
        ).repartition(3)
        out = bm25_topk(ds, [(7, "fast table")], k=3).take_all()
        assert [r["query_id"] for r in out] == [7, 7, 7]
        assert [r["rank"] for r in out] == [0, 1, 2]
        # independent brute-force check of the ORDER (scores re-derived)
        K1, B = 1.5, 0.75
        n = len(docs)
        avgdl = sum(len(t.split(" ")) for _, t in docs) / n
        df = {"fast": 2, "table": 2}
        idf = {
            t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items()
        }
        def score(text):
            words = text.split(" ")
            dl = len(words)
            s = 0.0
            for t in ("fast", "table"):
                f = words.count(t)
                if f:
                    s += idf[t] * (f * (K1 + 1.0)) / (
                        f + K1 * (1.0 - B + B * dl / avgdl)
                    )
            return s
        order = sorted(
            ((score(t), i) for i, t in docs if score(t) > 0),
            key=lambda p: (-p[0], p[1]),
        )[:3]
        assert [r["doc_id"] for r in out] == [i for _, i in order]

    def test_zero_overlap_docs_never_rank(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.retrieval import bm25_topk

        ds = ray.data.from_items(
            [{"doc_id": 0, "text": "x y"}, {"doc_id": 1, "text": "z"}]
        )
        assert bm25_topk(ds, [(0, "missing term")], k=5).count() == 0


class TestExactDedupByHash:
    def test_min_id_per_text_and_replica_collapse(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dedup import exact_dedup_by_hash

        rows = [
            {"doc_id": 5, "text": "alpha"},
            {"doc_id": 2, "text": "alpha"},   # same text, smaller id wins
            {"doc_id": 3, "text": "beta"},
            {"doc_id": 3, "text": "beta"},    # exact replica (same id)
            {"doc_id": 9, "text": "gamma"},
        ]
        ds = ray.data.from_items(rows).repartition(3)
        out = sorted(
            (r["doc_id"], r["text"])
            for r in exact_dedup_by_hash(ds).take_all()
        )
        assert out == [(2, "alpha"), (3, "beta"), (9, "gamma")]


class TestCurationPipeline:
    def test_composite_matches_sequential_kernels(self, ray_session):
        import ray.data

        from topicrawler_ray.pipelines.curation import curated_docs
        from topicrawler_ray.stages.textstats import (
            LangId,
            gopher_repetition_batch,
            quality_batch,
        )

        base = (
            "the quick brown fox jumps over the lazy dog and then "
            "the dog was not amused by this at all it ran away fast "
        ) * 4
        docs = [
            {"doc_id": 0, "text": base + "zero"},
            {"doc_id": 1, "text": base + "one"},
            {"doc_id": 2, "text": base + "zero"},  # dup of 0
            {"doc_id": 3, "text": "short"},        # fails min_words
        ]
        ds = ray.data.from_items(docs).repartition(2)
        got = sorted(r["doc_id"] for r in curated_docs(ds, langid_concurrency=1).take_all())

        # sequential: same kernels, dedup + gates by hand
        seen_texts = {}
        survivors = []
        for d in sorted(docs, key=lambda d: d["doc_id"]):
            if d["text"] not in seen_texts:
                seen_texts[d["text"]] = d["doc_id"]
                survivors.append(d)
        lid = LangId()
        exp = []
        for d in survivors:
            t = pa.table({"doc_id": [d["doc_id"]], "text": [d["text"]]})
            t = quality_batch(t)
            t = gopher_repetition_batch(t)
            q = t.column("quality_score").to_pylist()[0]
            nw = t.column("n_words").to_pylist()[0]
            if nw >= 10 and q >= 0.1 and lid.classify(d["text"]) == "en":
                exp.append(d["doc_id"])
        assert got == sorted(exp)
        assert 0 in got and 1 in got and 2 not in got and 3 not in got


class TestCooc:
    def test_window_pairs(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.cooc import word_cooc

        ds = ray.data.from_items(
            [{"text": "a b a b"}, {"text": "a b"}]
        ).repartition(2)
        got = {(r["w1"], r["w2"]): r["n"] for r in word_cooc(ds, window=2).take_all()}
        # doc1 "a b a b": d=1 -> (a,b),(b,a),(a,b); d=2 -> (a,a),(b,b)
        # doc2 "a b":     d=1 -> (a,b)
        assert got == {
            ("a", "b"): 3,
            ("b", "a"): 1,
            ("a", "a"): 1,
            ("b", "b"): 1,
        }

    def test_min_count_filters_after_global_sum(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.cooc import word_cooc

        # 'a b' appears once per doc (per-batch partials each below the
        # threshold); the filter must apply AFTER the corpus-wide sum
        ds = ray.data.from_items([{"text": "a b"}] * 4).repartition(4)
        got = {(r["w1"], r["w2"]): r["n"] for r in word_cooc(ds, min_count=3).take_all()}
        assert got == {("a", "b"): 4}


class TestPerKeyLag:
    def test_lag_matches_window_semantics(self, ray_session):
        import datetime

        import ray.data

        from topicrawler_ray.stages.timeseries import per_key_lag

        def ts(sec):
            return datetime.datetime(2024, 1, 1, 0, 0, sec)

        t = pa.table(
            {
                "event_id": [1, 2, 3, 4],
                "ts": pa.array(
                    [ts(10), ts(5), ts(10), ts(7)], pa.timestamp("us")
                ),
                "user_id": [1, 1, 1, 2],
                "event_type": ["b", "a", "c", "x"],
            }
        )
        out = per_key_lag(
            ray.data.from_arrow(t).repartition(2),
            lag_columns=("ts", "event_type"),
        ).take_all()
        rows = {r["event_id"]: r for r in out}
        base = int(ts(5).timestamp() * 1e6)
        # user 1 order: (ts5,e2) -> (ts10,e1) -> (ts10,e3) [tie by id]
        assert rows[2]["lag_ts_us"] == -1 and rows[2]["lag_event_type"] == ""
        assert rows[1]["lag_ts_us"] == base and rows[1]["lag_event_type"] == "a"
        assert rows[3]["lag_event_type"] == "b"
        assert rows[4]["lag_ts_us"] == -1  # sole event of user 2


class TestDuplicateSubstrings:
    def test_cross_and_within_doc_windows(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dedup import duplicate_substring_stats

        shared = "S" * 64               # exactly one window when alone
        uniq_a = "a" * 16
        uniq_b = "b" * 16
        docs = ray.data.from_items(
            [
                # doc 0: shared block + unique tail -> some dup windows
                {"doc_id": 0, "text": shared + uniq_a * 4},
                # doc 1: same shared block, different tail
                {"doc_id": 1, "text": shared + uniq_b * 4},
                # doc 2: fully unique, long enough for windows
                {"doc_id": 2, "text": "c" + "d" * 100},
                # doc 3: too short for any window -> no output row
                {"doc_id": 3, "text": "tiny"},
            ]
        )
        rows = {
            r["doc_id"]: r
            for r in duplicate_substring_stats(
                docs, window=64, stride=16, num_partitions=2
            ).take_all()
        }
        assert set(rows) == {0, 1, 2}
        # the pure-shared window (offset 0) is identical in docs 0 and 1
        assert rows[0]["n_cross_dup_windows"] >= 1
        assert rows[1]["n_cross_dup_windows"] >= 1
        assert rows[0]["n_dup_windows"] >= rows[0]["n_cross_dup_windows"]
        # "d"*100 slides over identical all-d windows -> within-doc dups
        # but ZERO cross-doc dups
        assert rows[2]["n_cross_dup_windows"] == 0
        assert rows[2]["n_dup_windows"] >= 1
        # window arithmetic: len = 1 + 100 -> (101-64)//16 + 1 = 3 windows
        assert rows[2]["n_windows"] == 3

    def test_matches_sequential_derivation(self, ray_session):
        """Distributed rollup == dict derivation on a random corpus."""
        import random

        import ray.data

        from topicrawler_ray.functions.hashing import murmur3_x64_128
        from topicrawler_ray.stages.dedup import duplicate_substring_stats

        rng = random.Random(11)
        base = "".join(rng.choice("abcdef ") for _ in range(200))
        docs = []
        for i in range(20):
            body = "".join(rng.choice("abcdef ") for _ in range(150))
            text = base[:80] + body if i % 3 == 0 else body + base[100:170]
            docs.append({"doc_id": i, "text": text})
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["n_cross_dup_windows"])
            for r in duplicate_substring_stats(
                ray.data.from_items(docs), window=64, stride=16, num_partitions=2
            ).take_all()
        }
        occ, docs_of, per_doc = {}, {}, {}
        for d in docs:
            t = d["text"]
            if len(t) < 64:
                continue
            hs = []
            for off in range(0, len(t) - 64 + 1, 16):
                h = murmur3_x64_128(t[off : off + 64].encode("utf-8"))
                hs.append(h)
                occ[h] = occ.get(h, 0) + 1
                lo, hi = docs_of.get(h, (d["doc_id"], d["doc_id"]))
                docs_of[h] = (min(lo, d["doc_id"]), max(hi, d["doc_id"]))
            per_doc[d["doc_id"]] = hs
        want = {
            did: (
                len(hs),
                sum(1 for h in hs if occ[h] > 1),
                sum(1 for h in hs if docs_of[h][0] != docs_of[h][1]),
            )
            for did, hs in per_doc.items()
        }
        assert got == want


class TestExactDedupSharded:
    def test_parity_with_by_hash_randomized(self, ray_session):
        """exact_dedup_sharded must keep exactly the rows that
        exact_dedup_by_hash keeps (min doc_id per text) on a corpus
        with unique ids - randomized duplicate structure, several
        partitionings."""
        import random

        import ray.data

        from topicrawler_ray.stages.dedup import (
            exact_dedup_by_hash,
            exact_dedup_sharded,
        )

        rng = random.Random(505)
        texts = ["doc body %d lorem" % i for i in range(40)]
        rows = [
            {"doc_id": i, "text": rng.choice(texts)} for i in range(300)
        ]
        exp = {}
        for r in rows:
            if r["text"] not in exp or r["doc_id"] < exp[r["text"]]:
                exp[r["text"]] = r["doc_id"]
        expected = sorted(exp.values())
        for parts in (1, 3, 7):
            ds = ray.data.from_items(rows).repartition(parts)
            got = sorted(
                r["doc_id"]
                for r in exact_dedup_sharded(
                    ds, num_shards=2 if parts == 3 else None
                ).take_all()
            )
            assert got == expected, parts
            ref = sorted(
                r["doc_id"] for r in exact_dedup_by_hash(ds).take_all()
            )
            assert got == ref

    def test_curated_docs_flavours_agree(self, ray_session):
        import ray.data

        from topicrawler_ray.pipelines.curation import curated_docs

        base = (
            "the quick brown fox jumps over the lazy dog and then "
            "the dog was not amused by this at all it ran away fast "
        ) * 4
        docs = [
            {"doc_id": i, "text": base + "v%d" % (i % 5)} for i in range(20)
        ]
        ds = ray.data.from_items(docs).repartition(3)
        a = sorted(
            r["doc_id"]
            for r in curated_docs(
                ds, langid_concurrency=1, dedup="sharded"
            ).take_all()
        )
        b = sorted(
            r["doc_id"]
            for r in curated_docs(
                ds, langid_concurrency=1, dedup="hash"
            ).take_all()
        )
        assert a == b == [0, 1, 2, 3, 4]


class TestReadParquetClean:
    """The cleaned parquet reader's schema-probe paths: in-task strip
    for files AND directories, uniform-schema guard, missing-column
    error (sources/pages.py:read_parquet_clean)."""

    @staticmethod
    def _write(tmp_path, name, cols):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.Table.from_pandas(pd.DataFrame(cols))
        assert t.schema.metadata  # the b'pandas' key this reader strips
        pq.write_table(t, str(tmp_path / name))

    def test_directory_fast_path_strips_metadata(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray

        from topicrawler_ray.sources.pages import read_parquet_clean

        self._write(tmp_path, "p1.parquet", {"a": [1, 2], "b": ["x", "y"]})
        self._write(tmp_path, "p2.parquet", {"a": [3, 4], "b": ["z", "w"]})
        ds = read_parquet_clean(str(tmp_path))
        tabs = [ray.get(r) for r in ds.to_arrow_refs()]
        assert sum(t.num_rows for t in tabs) == 4
        # the strip happened INSIDE the read task, not downstream
        assert all(not t.schema.metadata for t in tabs)

    def test_single_file_column_projection(self, ray_session, tmp_path):
        import ray

        from topicrawler_ray.sources.pages import read_parquet_clean

        self._write(tmp_path, "p1.parquet", {"a": [1, 2, 3], "b": list("xyz")})
        ds = read_parquet_clean(str(tmp_path / "p1.parquet"), columns=["a"])
        tabs = [ray.get(r) for r in ds.to_arrow_refs()]
        assert ds.schema().names == ["a"]
        assert sorted(r["a"] for r in ds.take_all()) == [1, 2, 3]
        assert all(not t.schema.metadata for t in tabs)

    def test_mixed_schema_directory_falls_back(self, ray_session, tmp_path):
        """Files with differing schemas must NOT be forced onto the
        first file's plan schema - the reader falls back to Ray's own
        unification (all rows present)."""
        from topicrawler_ray.sources.pages import read_parquet_clean

        self._write(tmp_path, "p1.parquet", {"a": [1, 2], "b": ["x", "y"]})
        self._write(tmp_path, "p3.parquet", {"a": [9], "c": ["w"]})
        assert read_parquet_clean(str(tmp_path)).count() == 3

    def test_missing_column_raises(self, ray_session, tmp_path):
        import pytest

        from topicrawler_ray.sources.pages import read_parquet_clean

        self._write(tmp_path, "p1.parquet", {"a": [1]})
        with pytest.raises(Exception):
            read_parquet_clean(
                str(tmp_path / "p1.parquet"), columns=["zz"]
            ).take_all()


class TestCuratedDocsValidation:
    def test_unknown_dedup_value_raises(self, ray_session):
        import pytest
        import ray.data

        from topicrawler_ray.pipelines.curation import curated_docs

        ds = ray.data.from_items([{"doc_id": 1, "text": "hello"}])
        with pytest.raises(ValueError, match="sharded"):
            curated_docs(ds, dedup="shard")


class TestDedupBenchReplication:
    """The bench's volume axis for near-dup (`bench._dedup_input`)
    replicates documents as shingle-DISJOINT copies: copy k>0
    interleaves a per-copy marker between every pair of words, so no
    word 3-shingle of copy k can equal one of copy j != k.  The probe's
    linear-pairs claim rests on that invariant - pin it."""

    def test_no_cross_copy_pairs_and_linear_count(self, ray_session):
        import os
        import sys

        import pyarrow.parquet as pq

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench
        from topicrawler_ray.stages.dedup import minhash_near_dup_pairs

        sf = "/root/testdata/sf0.001"
        n = pq.read_metadata(os.path.join(sf, "documents.parquet")).num_rows
        base = minhash_near_dup_pairs(
            bench._dedup_input(sf, 4, 1), threshold=0.5
        ).count()
        rep = 3
        pairs = minhash_near_dup_pairs(
            bench._dedup_input(sf, 4, rep), threshold=0.5
        ).take_all()
        # every surviving pair stays inside one copy: ids are assigned
        # as doc_id + k*n, and doc_id < n in the fixture
        for p in pairs:
            assert p["id_a"] // n == p["id_b"] // n, p
        # copies reproduce the original near-dup structure ~linearly;
        # marker insertion perturbs borderline Jaccards, so allow a
        # small slack around exactly rep * base
        assert abs(len(pairs) - rep * base) <= max(2, base // 10)


class TestWinnowFingerprints:
    def test_engine_matches_sequential_oracle(self, ray_session, sf_dir):
        """Distributed winnowing equals the independent O(n*w) loop."""
        import ray.data

        from topicrawler_ray.oracles import _b_winnow_fingerprints
        from topicrawler_ray.stages.textstats import winnow_stats_batch

        import pyarrow.parquet as pq

        docs = ray.data.read_parquet(sf_dir + "/documents.parquet")
        got = (
            docs.map_batches(winnow_stats_batch, batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = (
            _b_winnow_fingerprints(sf_dir)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.equals(exp[got.columns])

    def test_density_bound(self, ray_session):
        """Winnowing guarantees >= one fingerprint per w-window: the
        selection density lands in [1/w, 1] for any non-trivial doc."""
        import numpy as np

        from topicrawler_ray.stages.textstats import (
            window_hash_array,
            winnow_select,
        )

        rng = np.random.default_rng(7)
        for _ in range(25):
            n = int(rng.integers(1, 400))
            text = "".join(
                chr(97 + int(c)) for c in rng.integers(0, 26, size=n)
            )
            hs = window_hash_array(text, 32)
            pos = winnow_select(hs, 8)
            if len(hs) == 0:
                assert len(pos) == 0
                continue
            assert 1 <= len(pos) <= len(hs)
            # every 8-window contains a selected position
            if len(hs) > 8:
                sel = np.zeros(len(hs), dtype=bool)
                sel[pos] = True
                for i in range(len(hs) - 8 + 1):
                    assert sel[i : i + 8].any()

    def test_rightmost_tiebreak(self, ray_session):
        """Equal hashes in a window select the rightmost index (the
        published winnowing rule), not argmin's leftmost."""
        import numpy as np

        from topicrawler_ray.stages.textstats import winnow_select

        hs = np.array([5, 5, 5, 5], dtype=np.uint64)
        pos = winnow_select(hs, 4)
        assert pos.tolist() == [3]


class TestVocabCoverage:
    def test_tiny_corpus_exact(self, ray_session):
        """v larger than the vocabulary -> full coverage; v=1 covers
        exactly the most frequent word's occurrences."""
        import ray.data

        from topicrawler_ray.lm.build import vocab_coverage

        docs = ray.data.from_items(
            [{"text": "a b a"}, {"text": "a c"}]
        )
        full = vocab_coverage(docs, v=10).take_all()[0]
        assert full["vocab_size"] == 3
        assert full["covered_tokens"] == full["total_tokens"] == 5
        assert full["coverage_e9"] == 10**9

        one = vocab_coverage(
            ray.data.from_items([{"text": "a b a"}, {"text": "a c"}]), v=1
        ).take_all()[0]
        assert one["vocab_size"] == 1
        assert one["covered_tokens"] == 3  # 'a' x3
        assert one["total_tokens"] == 5


class TestCrawlGainCurve:
    def test_first_seen_semantics(self, ray_session):
        """A host counts only at its FIRST wave; cum_hosts is the
        running total in wave order."""
        import ray.data

        from topicrawler_ray.stages.politeness import host_gain_curve

        log = ray.data.from_items(
            [
                {"host": "a", "wave": 0},
                {"host": "a", "wave": 3},
                {"host": "b", "wave": 1},
                {"host": "c", "wave": 1},
                {"host": "d", "wave": 4},
            ]
        )
        out = host_gain_curve(log).to_pylist()
        assert out == [
            {"wave": 0, "new_hosts": 1, "cum_hosts": 1},
            {"wave": 1, "new_hosts": 2, "cum_hosts": 3},
            {"wave": 4, "new_hosts": 1, "cum_hosts": 4},
        ]


class TestSplitManifest:
    def test_bucket_spec_and_totals(self, ray_session, sf_dir):
        """Splits cover every doc exactly once; the 90/5/5 md5 spec is
        re-derived inline and totals agree with the engine."""
        import hashlib
        import sys
        from pathlib import Path

        import pyarrow.parquet as pq

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        got = {
            r["split"]: (r["n_docs"], r["sum_chars"])
            for r in e.queries()["split_manifest"](sf_dir).take_all()
        }
        t = pq.read_table(sf_dir + "/documents.parquet", columns=["doc_id", "n_chars"])
        exp: dict[str, list[int]] = {}
        for i, n in zip(t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()):
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
            sp = "train" if b < 90 else ("val" if b < 95 else "test")
            c = exp.setdefault(sp, [0, 0])
            c[0] += 1
            c[1] += n
        assert got == {k: tuple(v) for k, v in exp.items()}
        assert sum(v[0] for v in got.values()) == t.num_rows


class TestScriptMix:
    def test_hand_counted_mixed_script(self, ray_session):
        """Hand-countable mixed-script doc: Latin, digits, CJK, spaces
        and 'other' (Cyrillic, punctuation) land in the right bins and
        always sum to the codepoint count."""
        import ray.data

        from topicrawler_ray.stages.textstats import script_mix_batch

        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "Ab1 中文, Ж!"},
                {"doc_id": 1, "text": ""},
                {"doc_id": 2, "text": "café"},
            ]
        )
        out = {
            r["doc_id"]: r
            for r in docs.map_batches(
                script_mix_batch, batch_format="pyarrow"
            ).take_all()
        }
        r0 = out[0]  # A b 1 ' ' 中 文 , ' ' Ж !
        assert (r0["n_latin"], r0["n_digit"], r0["n_cjk"]) == (2, 1, 2)
        assert r0["n_space"] == 2 and r0["n_other"] == 3  # ',' 'Ж' '!'
        assert sum(
            r0[k] for k in ("n_latin", "n_digit", "n_cjk", "n_space", "n_other")
        ) == len("Ab1 中文, Ж!")
        assert all(out[1][k] == 0 for k in ("n_latin", "n_digit", "n_cjk", "n_space", "n_other"))
        assert out[2]["n_latin"] == 4  # é is Latin-1 supplement
