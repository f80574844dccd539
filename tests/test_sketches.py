"""HyperLogLog sketch: rank math, merge semantics, accuracy band, and
partition-invariance (the determinism the oracle hash-check relies on)."""

import numpy as np
import pyarrow as pa

from topicrawler_ray.stages.sketches import HLLMap, _estimate, _hash64, _ranks


class TestRankMath:
    def test_ranks_match_bit_length(self):
        h = _hash64(np.arange(5000, dtype=np.int64))
        p = 12
        idx, rank = _ranks(h, p)
        for hh, i, r in zip(h.tolist(), idx.tolist(), rank.tolist()):
            assert i == hh >> (64 - p)
            w = (hh << p) & ((1 << 64) - 1)
            assert r == min(64 - w.bit_length() + 1, 64 - p + 1)

    def test_all_zero_remaining_bits_max_rank(self):
        p = 4
        h = np.array([0xF000000000000000], dtype=np.uint64)
        _, rank = _ranks(h, p)
        assert rank[0] == 64 - p + 1

    def test_estimate_accuracy(self):
        p = 12
        m = 1 << p
        regs = np.zeros(m, dtype=np.uint8)
        h = _hash64(np.arange(100_000, dtype=np.int64))
        idx, rank = _ranks(h, p)
        np.maximum.at(regs, idx, rank)
        est = _estimate(regs)
        assert abs(est - 100_000) / 100_000 < 0.05  # ~3 sigma at 1.6 %


class TestDistributedMerge:
    def test_partition_invariant(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sketches import hll_distinct

        rows = [
            {"g": "a" if i % 3 else "b", "v": i % 500} for i in range(3000)
        ]
        outs = []
        for parts in (1, 7):
            ds = ray.data.from_items(rows).repartition(parts)
            got = {
                r["g"]: r["n_distinct_hll"]
                for r in hll_distinct(ds, column="v", group_by="g").take_all()
            }
            outs.append(got)
        assert outs[0] == outs[1]
        # exact distincts: b sees i%3==0 -> i%500 over 0..2999 covers all 500
        for g, exact in (("a", 500), ("b", 500)):
            assert abs(outs[0][g] - exact) / exact < 0.1

    def test_map_emits_one_row_per_group(self):
        batch = pa.table({"g": ["x", "y", "x"], "v": [1, 2, 3]})
        out = HLLMap("g", "v", 8)(batch)
        assert sorted(out.column("g").to_pylist()) == ["x", "y"]
        assert all(len(b) == 256 for b in out.column("registers").to_pylist())


class TestPQTopk:
    def test_partition_invariance_and_golden(self, ray_session, sf_dir):
        """PQ/ADC scores are exact integers: any repartitioning gives a
        bit-identical result, and it equals the frozen golden."""
        import ray.data

        from topicrawler_ray.oracles import _b_knn_pq
        from topicrawler_ray.stages.similarity import pq_topk

        ds = ray.data.read_parquet(sf_dir + "/embeddings.parquet")
        a = pq_topk(ds).to_pandas()
        b = pq_topk(ds.repartition(5)).to_pandas()
        assert a.equals(b)
        exp = _b_knn_pq(sf_dir).to_pandas()
        assert a.reset_index(drop=True).equals(exp[a.columns].reset_index(drop=True))

    def test_pq_reasonable_vs_bruteforce(self, ray_session, sf_dir):
        """PQ recall@10 vs the exact scan is well above chance (the
        compression is 32x; the fixture demands > 0.3 mean recall)."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data

        from topicrawler_ray.stages.similarity import (
            _normalize,
            brute_force_topk,
            pq_topk,
        )

        t = pq.read_table(
            sf_dir + "/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = np.array(t.column("vec_id").to_pylist())
        vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
        q = _normalize(
            np.array(
                [vecs[np.nonzero(ids == i)[0][0]] for i in sorted(ids[ids < 5])],
                dtype=np.float32,
            )
        )
        ds = ray.data.read_parquet(sf_dir + "/embeddings.parquet")
        exact = brute_force_topk(ds, q, k=10).to_pandas()
        approx = pq_topk(ds).to_pandas()
        recalls = []
        for qi in exact["query_id"].unique():
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            recalls.append(len(e & a) / len(e))
        assert float(np.mean(recalls)) > 0.3
