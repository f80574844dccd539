"""Persistent content-hash registry: register/probe round trip,
multi-generation accumulation, manifest invariants."""

import pytest
import ray.data

from topicrawler_ray.state.dedupstore import (
    filter_unseen,
    read_manifest,
    register_hashes,
)


def _docs(texts, start=0):
    return ray.data.from_items(
        [{"doc_id": start + i, "text": t} for i, t in enumerate(texts)]
    ).repartition(2)


class TestRegistry:
    def test_round_trip(self, ray_session, tmp_path):
        reg = str(tmp_path / "reg")
        register_hashes(_docs(["a", "b", "c"]), "text", reg, "g0", num_shards=4)
        man = read_manifest(reg)
        assert man["num_shards"] == 4
        assert man["generations"][0]["n_hashes"] == 3

        out = filter_unseen(
            _docs(["b", "x", "c", "y"], start=10), "text", reg
        ).take_all()
        assert sorted(r["text"] for r in out) == ["x", "y"]

    def test_multiple_generations_accumulate(self, ray_session, tmp_path):
        reg = str(tmp_path / "reg")
        register_hashes(_docs(["a"]), "text", reg, "g0", num_shards=4)
        register_hashes(_docs(["b"]), "text", reg, "g1", num_shards=4)
        out = filter_unseen(_docs(["a", "b", "c"]), "text", reg).take_all()
        assert [r["text"] for r in out] == ["c"]

    def test_duplicate_generation_rejected(self, ray_session, tmp_path):
        reg = str(tmp_path / "reg")
        register_hashes(_docs(["a"]), "text", reg, "g0", num_shards=4)
        with pytest.raises(ValueError, match="already registered"):
            register_hashes(_docs(["b"]), "text", reg, "g0", num_shards=4)

    def test_shard_count_must_match(self, ray_session, tmp_path):
        reg = str(tmp_path / "reg")
        register_hashes(_docs(["a"]), "text", reg, "g0", num_shards=4)
        with pytest.raises(ValueError, match="num_shards"):
            register_hashes(_docs(["b"]), "text", reg, "g1", num_shards=8)

    def test_empty_registry_keeps_everything(self, ray_session, tmp_path):
        reg = str(tmp_path / "empty")
        out = filter_unseen(_docs(["a", "b"]), "text", reg).take_all()
        assert len(out) == 2


class TestNearDupRegistry:
    def test_cross_run_candidates(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import (
            flag_near_dups,
            register_minhash_bands,
        )

        # long doc so a one-word edit keeps Jaccard ~0.97 and the
        # 16x8 LSH bands collide with near-certainty
        base = " ".join("word%03d" % i for i in range(100)) + " lazy end"
        run1 = _docs([base, "completely different content here entirely"])
        reg = str(tmp_path / "nd")
        register_minhash_bands(run1, reg, "g0", num_shards=8)

        # near-dup of base (one word changed) + a fresh doc
        near = base.replace("lazy", "sleepy")
        run2 = _docs([near, "unrelated new words nothing shared at all"],
                     start=100)
        got = {
            r["doc_id"]: r["is_candidate"]
            for r in flag_near_dups(run2, reg).take_all()
        }
        assert got[100] is True
        assert got[101] is False


class TestCompaction:
    def test_compact_preserves_membership(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import (
            compact_registry,
            read_manifest,
        )

        reg = str(tmp_path / "creg")
        register_hashes(_docs(["a", "b"]), "text", reg, "g0", num_shards=4)
        register_hashes(_docs(["c"]), "text", reg, "g1", num_shards=4)
        man = compact_registry(reg)
        assert [g["name"] for g in man["generations"]] == ["compacted"]
        assert man["generations"][0]["n_hashes"] == 3
        assert [g["name"] for g in read_manifest(reg)["generations"]] == [
            "compacted"
        ]
        out = filter_unseen(_docs(["a", "b", "c", "d"]), "text", reg).take_all()
        assert [r["text"] for r in out] == ["d"]

    def test_compact_empty_registry_noop(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import compact_registry

        man = compact_registry(str(tmp_path / "none"))
        assert man["generations"] == []


class TestNgramNovelty:
    def test_novelty_fractions(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import (
            ngram_novelty,
            register_ngram_hashes,
        )

        reg = str(tmp_path / "nov")
        register_ngram_hashes(
            _docs(["a b c d e"]), reg, "g0", n=3, num_shards=4
        )
        # doc 100: same text -> novelty 0; doc 101: fresh -> 1e6;
        # doc 102: "a b c d x" shares 2 of 3 grams -> ~1/3
        run2 = _docs(["a b c d e", "x y z w v", "a b c d x"], start=100)
        got = {
            r["doc_id"]: r["novelty_e6"]
            for r in ngram_novelty(run2, reg, n=3).take_all()
        }
        assert got[100] == 0
        assert got[101] == 1_000_000
        assert got[102] == 333_333  # floor((1 - 2/3) * 1e6)

    def test_short_doc_scores_full_novelty(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import (
            ngram_novelty,
            register_ngram_hashes,
        )

        reg = str(tmp_path / "nov2")
        register_ngram_hashes(_docs(["a b c"]), reg, "g0", n=3, num_shards=4)
        got = ngram_novelty(_docs(["xy"], start=5), reg, n=3).take_all()
        assert got == [{"doc_id": 5, "novelty_e6": 1_000_000}]


class TestManifestShardValidation:
    def test_manifest_records_shards(self, ray_session, tmp_path):
        from topicrawler_ray.state.dedupstore import (
            read_manifest,
            register_hashes,
        )

        reg = str(tmp_path / "val")
        register_hashes(
            _docs(["a", "b", "c", "d"]), "text", reg, "g0", num_shards=4
        )
        man = read_manifest(reg)
        assert man["generations"][0]["shards"], "shard list missing"

    def test_missing_shard_raises_at_probe(self, ray_session, tmp_path):
        """A manifest-listed shard file that is not visible must raise
        (shared-filesystem guard), never read as empty/seen=False."""
        import os

        import pytest

        from topicrawler_ray.state.dedupstore import (
            RegistryProbe,
            read_manifest,
        )
        from topicrawler_ray.state.dedupstore import register_hashes

        reg = str(tmp_path / "val2")
        register_hashes(
            _docs(["a", "b", "c", "d"]), "text", reg, "g0", num_shards=4
        )
        man = read_manifest(reg)
        shard = man["generations"][0]["shards"][0]
        os.remove(os.path.join(reg, "gen-g0", "shard=%04d.parquet" % shard))
        with pytest.raises(RuntimeError, match="shared"):
            RegistryProbe(reg, "text")
