"""Disk-backed LM serving (lm/diskserve.py): the sharded n-gram index
artifact must score BIT-IDENTICALLY to the in-memory tables while
keeping reader memory bounded by the bucket LRU - the Ray-native
equivalent of the reference's Lucene-index model serving
(``lt.lm/.../lucenebased/CountingStringLM.java:58-159``)."""

import pickle
import shutil

import pytest


@pytest.fixture(scope="module")
def artifact(ray_session, sf_dir, tmp_path_factory):
    """A disk artifact + matching in-memory counts over sf0.001 docs."""
    import ray.data

    from topicrawler_ray.lm.build import (
        count_ngrams,
        counts_from_dataset,
        ngram_index,
    )
    from topicrawler_ray.lm.diskserve import write_lm_artifact

    docs = ray.data.read_parquet(sf_dir + "/documents.parquet", columns=["text"])
    order = 3
    out = str(tmp_path_factory.mktemp("disklm") / "artifact")
    shutil.rmtree(out, ignore_errors=True)
    write_lm_artifact(ngram_index(docs, order), order, out, num_buckets=16)
    counts = counts_from_dataset(count_ngrams(docs, order), order)
    return out, counts, order


def _sample_texts(sf_dir, n=30):
    import pyarrow.parquet as pq

    t = pq.read_table(sf_dir + "/documents.parquet", columns=["text"])
    return t.column("text").to_pylist()[:n]


class TestDiskVsMemory:
    def test_stupid_backoff_identical(self, artifact, sf_dir):
        from topicrawler_ray.lm.backoff import StupidBackoffLM
        from topicrawler_ray.lm.diskserve import load_disk_lm
        from topicrawler_ray.lm.perplexity import document_perplexity

        path, counts, _ = artifact
        mem = StupidBackoffLM(counts)
        disk = load_disk_lm(path, "stupid_backoff")
        for t in _sample_texts(sf_dir):
            assert document_perplexity(disk, t) == document_perplexity(mem, t)

    def test_kneser_ney_identical(self, artifact, sf_dir):
        from topicrawler_ray.lm.diskserve import load_disk_lm
        from topicrawler_ray.lm.kneserney import KneserNeyLM, KNStats
        from topicrawler_ray.lm.perplexity import document_perplexity

        path, counts, _ = artifact
        mem = KneserNeyLM(KNStats(counts))
        disk = load_disk_lm(path, "kneser_ney")
        for t in _sample_texts(sf_dir):
            assert document_perplexity(disk, t) == document_perplexity(mem, t)

    def test_sum_ngrams_stats_match(self, artifact):
        """__sum_ngrams__ folded from distributed partials == the
        sequential count-of-counts."""
        from topicrawler_ray.lm.diskserve import DiskLMIndex
        from topicrawler_ray.lm.kneserney import KNStats

        path, counts, order = artifact
        st = KNStats(counts)
        idx = DiskLMIndex(path)
        for n in range(1, order + 1):
            assert idx.stats["N"][n] == st.N[n]
            assert idx.stats["S"][n] == st.sum_ngrams[n]


class TestMemoryBound:
    def test_lru_bound_holds_and_scores_stay_exact(self, artifact, sf_dir):
        """Scoring with a 2-bucket cache (1/8th of the artifact) never
        holds more than 2 decoded buckets yet scores identically - the
        RSS-bounded serving property the driver-RAM bridge lacked."""
        from topicrawler_ray.lm.diskserve import load_disk_lm
        from topicrawler_ray.lm.kneserney import KneserNeyLM, KNStats
        from topicrawler_ray.lm.perplexity import document_perplexity

        path, counts, _ = artifact
        mem = KneserNeyLM(KNStats(counts))
        small = load_disk_lm(path, "kneser_ney", max_cached_buckets=2)
        for t in _sample_texts(sf_dir, 10):
            assert document_perplexity(small, t) == document_perplexity(mem, t)
        idx = small.stats._idx
        assert len(idx._cache) <= 2
        assert idx.n_bucket_loads > 2  # it really paged, not just cached

    def test_pickle_ships_path_not_model(self, artifact, sf_dir):
        """The broadcast object re-opens with an EMPTY cache (actors
        page their own buckets); pickled size is config-scale."""
        from topicrawler_ray.lm.diskserve import load_disk_lm
        from topicrawler_ray.lm.perplexity import document_perplexity

        path, _, _ = artifact
        disk = load_disk_lm(path, "kneser_ney")
        texts = _sample_texts(sf_dir, 3)
        for t in texts:
            document_perplexity(disk, t)  # warm the cache
        blob = pickle.dumps(disk)
        assert len(blob) < 100_000  # path + stats, never bucket dicts
        lm2 = pickle.loads(blob)
        assert lm2.stats._idx.n_bucket_loads == 0
        assert document_perplexity(lm2, texts[0]) == document_perplexity(
            disk, texts[0]
        )


class TestScorerRegistry:
    def test_disk_scorer_registry_key(self, ray_session, sf_dir):
        """build_scorer_lm('kneser_ney_disk') equals the in-memory KN
        scorer on the topic corpus (the crawl engine seam)."""
        from topicrawler_ray.lm.perplexity import document_perplexity
        from topicrawler_ray.lm.train import build_scorer_lm

        mem = build_scorer_lm(sf_dir, 3, "kneser_ney")
        disk = build_scorer_lm(sf_dir, 3, "kneser_ney_disk")
        for t in _sample_texts(sf_dir, 10):
            assert document_perplexity(disk, t) == document_perplexity(mem, t)
